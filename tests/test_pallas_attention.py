"""Pallas fused attention: correctness vs the XLA reference path.

Runs in interpreter mode on CPU (conftest forces the cpu platform; pallas
falls back to interpret there via force_tpu_interpret_mode).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uplift_upsample_tpu.ops.attention import scaled_dot_product_attention


def _reference(q, k, v, key_mask):
    # split-head XLA path: (F, S, C) → (F, H, S, D)
    f, s, c = q.shape
    h = NUM_HEADS
    d = c // h
    r = lambda t: t.reshape(f, s, h, d).transpose(0, 2, 1, 3)
    mask4 = None if key_mask is None else key_mask[:, None, None, :].astype(jnp.float32)
    out, _ = scaled_dot_product_attention(r(q), r(k), r(v), mask4)
    return out.transpose(0, 2, 1, 3).reshape(f, s, c)


NUM_HEADS = 8


@pytest.mark.parametrize("shape,mask", [
    ((24, 17, 32), False),    # spatial: depth 4 (VPU path)
    ((16, 71, 384), False),   # temporal: depth 48 (MXU path)
    ((16, 71, 384), True),    # temporal with key mask
    ((8, 9, 32), True),       # tiny
])
def test_packed_attention_matches_xla(shape, mask):
    from jax.experimental.pallas import tpu as pltpu
    from uplift_upsample_tpu.ops.pallas_attention import packed_multihead_attention

    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=shape).astype(np.float32)) for _ in range(3))
    key_mask = None
    if mask:
        key_mask = jnp.asarray(rng.uniform(size=shape[:2]) < 0.5)

    with pltpu.force_tpu_interpret_mode():
        out = packed_multihead_attention(q, k, v, key_mask, num_heads=NUM_HEADS)
    expected = _reference(q, k, v, key_mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=1e-5, rtol=1e-5)


def test_model_pallas_flag_matches(tmp_path):
    """Full model with use_pallas=True must match the XLA model (interpret mode)."""
    import os
    from jax.experimental.pallas import tpu as pltpu
    from uplift_upsample_tpu.models import UpliftUpsampleTransformer
    from uplift_upsample_tpu.utils.weights_h5 import load_keras_h5

    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "small_strided")
    if not os.path.exists(fixture + ".h5"):
        pytest.skip("fixtures missing")
    kwargs = dict(
        num_frames=9, num_keypoints=17, spatial_d_model=16, temporal_d_model=32,
        spatial_depth=2, temporal_depth=2, strides=(3, 3), paddings=((0, 0), (0, 0)),
        num_heads=4, mlp_ratio=2.0, qkv_bias=True, drop_rate=0.0,
        drop_path_rate=(0.0, 0.0, 0.0), has_strided_input=True,
        first_strided_token_attention_layer=1)
    model_x = UpliftUpsampleTransformer(use_pallas=False, **kwargs)
    model_p = UpliftUpsampleTransformer(use_pallas=True, **kwargs)
    variables = load_keras_h5(fixture + ".h5", model_x)
    data = np.load(fixture + ".npz")
    x = jnp.asarray(data["x_masked"])
    sm = jnp.asarray(data["stride_mask"])

    fx, cx = model_x.apply(variables, x, stride_mask=sm, training=False)
    with pltpu.force_tpu_interpret_mode():
        fp, cp = model_p.apply(variables, x, stride_mask=sm, training=False)
    np.testing.assert_allclose(np.asarray(cp), np.asarray(cx), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(fp), np.asarray(fx), atol=2e-5, rtol=1e-4)
