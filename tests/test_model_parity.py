"""Golden parity: JAX model + h5 converter vs the reference TF implementation.

Fixtures in tests/fixtures/ are produced by tools/make_reference_fixtures.py:
reference model with random weights → .h5 + input/output goldens.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from uplift_upsample_tpu.models import UpliftUpsampleTransformer  # noqa: E402
from uplift_upsample_tpu.utils.weights_h5 import load_keras_h5, save_keras_h5  # noqa: E402

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")

MODEL_KWARGS = {
    "small_strided": dict(
        num_frames=9, spatial_d_model=16, temporal_d_model=32, spatial_depth=2,
        temporal_depth=2, strides=(3, 3), paddings=((0, 0), (0, 0)), num_heads=4,
        mlp_ratio=2.0, qkv_bias=True, attn_drop_rate=0.0, drop_rate=0.0,
        drop_path_rate=(0.0, 0.0, 0.0), has_strided_input=True,
        first_strided_token_attention_layer=1),
    "default_pads": dict(
        num_frames=11, spatial_d_model=16, temporal_d_model=32, spatial_depth=1,
        temporal_depth=2, strides=(4, 3), paddings=None, num_heads=4,
        mlp_ratio=2.0, qkv_bias=True, attn_drop_rate=0.0, drop_rate=0.0,
        has_strided_input=True),
    "no_strided_input": dict(
        num_frames=9, spatial_d_model=16, temporal_d_model=32, spatial_depth=2,
        temporal_depth=2, strides=(3, 3), paddings=((0, 0), (0, 0)), num_heads=4,
        mlp_ratio=2.0, qkv_bias=True, drop_rate=0.0, has_strided_input=False),
    "no_qkv_bias_bn": dict(
        num_frames=9, spatial_d_model=16, temporal_d_model=32, spatial_depth=1,
        temporal_depth=1, strides=(3, 3), paddings=((0, 0), (0, 0)), num_heads=4,
        mlp_ratio=2.0, qkv_bias=False, drop_rate=0.0, output_bn=True,
        has_strided_input=True),
    "no_spatial": dict(
        num_frames=9, spatial_d_model=16, temporal_d_model=32, spatial_depth=0,
        temporal_depth=2, strides=(3, 3), paddings=((0, 0), (0, 0)), num_heads=4,
        mlp_ratio=2.0, qkv_bias=True, drop_rate=0.0, has_strided_input=True),
    "no_strides": dict(
        num_frames=9, spatial_d_model=16, temporal_d_model=32, spatial_depth=2,
        temporal_depth=2, strides=(), paddings=None, num_heads=4,
        mlp_ratio=2.0, qkv_bias=True, drop_rate=0.0, has_strided_input=True),
    "h36m_351": dict(
        num_frames=71, spatial_d_model=32, temporal_d_model=384, spatial_depth=4,
        temporal_depth=4, strides=(3, 10, 3), paddings=((0, 0), (0, 0), (0, 0)),
        num_heads=8, mlp_ratio=2.0, qkv_bias=True, drop_rate=0.0,
        drop_path_rate=(0.1, 0.1, 0.0), has_strided_input=True,
        first_strided_token_attention_layer=1),
}


def _load_case(name):
    h5_path = os.path.join(FIXTURE_DIR, f"{name}.h5")
    npz_path = os.path.join(FIXTURE_DIR, f"{name}.npz")
    if not (os.path.exists(h5_path) and os.path.exists(npz_path)):
        pytest.skip(f"fixture {name} missing; run tools/make_reference_fixtures.py")
    data = np.load(npz_path)
    model = UpliftUpsampleTransformer(num_keypoints=17, **MODEL_KWARGS[name])
    variables = load_keras_h5(h5_path, model)
    return model, variables, data


def _run(model, variables, data):
    x = jnp.asarray(data["x_masked"])
    sm = jnp.asarray(data["stride_mask"]) if model.has_strided_input else None
    return model.apply(variables, x, stride_mask=sm, training=False)


@pytest.mark.parametrize("name", list(MODEL_KWARGS.keys()))
def test_forward_parity(name):
    model, variables, data = _load_case(name)
    full, central = _run(model, variables, data)
    np.testing.assert_allclose(np.asarray(central), data["central"], atol=2e-5, rtol=1e-4)
    if "full" in data:
        assert full is not None
        np.testing.assert_allclose(np.asarray(full), data["full"], atol=2e-5, rtol=1e-4)


def test_h5_roundtrip():
    name = "small_strided"
    model, variables, data = _load_case(name)
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "rt.h5")
        save_keras_h5(path, variables, model)
        variables2 = load_keras_h5(path, model)
    f1, c1 = _run(model, variables, data)
    f2, c2 = _run(model, variables2, data)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_jit_and_param_count():
    model, variables, data = _load_case("small_strided")
    fn = jax.jit(lambda v, x, m: model.apply(v, x, stride_mask=m, training=False))
    full, central = fn(variables, jnp.asarray(data["x_masked"]), jnp.asarray(data["stride_mask"]))
    np.testing.assert_allclose(np.asarray(central), data["central"], atol=2e-5, rtol=1e-4)
