"""Fused spatial-stack Pallas kernel vs the flax spatial path (interpret mode)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from uplift_upsample_tpu.models import UpliftUpsampleTransformer
from uplift_upsample_tpu.ops.pallas_spatial import spatial_stack_apply
from uplift_upsample_tpu.utils.weights_h5 import load_keras_h5

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


def _model_kwargs():
    return dict(
        num_frames=9, num_keypoints=17, spatial_d_model=16, temporal_d_model=32,
        spatial_depth=2, temporal_depth=2, strides=(3, 3), paddings=((0, 0), (0, 0)),
        num_heads=4, mlp_ratio=2.0, qkv_bias=True, drop_rate=0.0,
        drop_path_rate=(0.0, 0.0, 0.0), has_strided_input=True,
        first_strided_token_attention_layer=1)


@pytest.fixture(scope="module")
def fixture_case():
    h5 = os.path.join(FIXTURE_DIR, "small_strided.h5")
    if not os.path.exists(h5):
        pytest.skip("fixtures missing")
    model = UpliftUpsampleTransformer(**_model_kwargs())
    variables = load_keras_h5(h5, model)
    data = np.load(os.path.join(FIXTURE_DIR, "small_strided.npz"))
    return model, variables, data


def test_fused_spatial_stack_matches_model(fixture_case):
    model, variables, data = fixture_case
    x = jnp.asarray(data["x_masked"])
    sm = jnp.asarray(data["stride_mask"])

    # Reference: full model end-to-end
    full_ref, central_ref = model.apply(variables, x, stride_mask=sm, training=False)

    # Fused: pallas spatial stack + spatial_input model for the rest
    import jax as _jax
    with pltpu.force_tpu_interpret_mode():
        sp = spatial_stack_apply(variables["params"], x,
                                 num_blocks=model.spatial_depth,
                                 num_heads=model.num_heads, block_f=8,
                                 precision=_jax.lax.Precision.HIGHEST)
    tail = UpliftUpsampleTransformer(spatial_input=True, **_model_kwargs())
    full_f, central_f = tail.apply(variables, sp, stride_mask=sm, training=False)

    np.testing.assert_allclose(np.asarray(central_f), np.asarray(central_ref),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(full_f), np.asarray(full_ref),
                               atol=2e-5, rtol=1e-4)


def test_hpack_attention_matches_fma(fixture_case):
    """attn="hpack" (head-packed lanes: all heads' logits/softmax/ctx FMAs in
    one lane-packed set) is the same math as the per-head "fma" loops —
    element-for-element, only the op packing differs."""
    model, variables, data = fixture_case
    x = jnp.asarray(data["x_masked"])

    import jax as _jax
    with pltpu.force_tpu_interpret_mode():
        sp_fma = spatial_stack_apply(variables["params"], x,
                                     num_blocks=model.spatial_depth,
                                     num_heads=model.num_heads, block_f=8,
                                     precision=_jax.lax.Precision.HIGHEST,
                                     attn="fma")
        sp_hp = spatial_stack_apply(variables["params"], x,
                                    num_blocks=model.spatial_depth,
                                    num_heads=model.num_heads, block_f=8,
                                    precision=_jax.lax.Precision.HIGHEST,
                                    attn="hpack")
    np.testing.assert_allclose(np.asarray(sp_hp), np.asarray(sp_fma),
                               atol=1e-6, rtol=1e-6)
