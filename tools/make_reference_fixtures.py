"""Generate golden parity fixtures from the reference TF implementation.

Runs the reference model (read-only at /root/reference) under legacy tf_keras,
with random weights, over a set of architecture configurations; saves for each:
  - the Keras `.h5` weight file (as produced by `save_weights`)
  - random inputs and the reference outputs (npz)

The JAX model + h5 converter are then validated against these in
tests/test_model_parity.py. Run once:

    python tools/make_reference_fixtures.py

The reference needs a small compat patch: its layers call
`super().__init__(self, **kwargs)` (a TF-2.4-tolerated bug, rejected by newer
Keras), so we sanitize the `trainable` argument.
"""

import os
import sys

os.environ["TF_USE_LEGACY_KERAS"] = "1"
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_DIR = os.path.join(REPO, "tests", "fixtures")

sys.path.insert(0, "/root/reference")

import tf_keras  # noqa: E402
from tf_keras.src.engine.base_layer import Layer  # noqa: E402

_orig_init = Layer.__init__


def _patched_init(self, trainable=True, name=None, dtype=None, dynamic=False, **kwargs):
    if not isinstance(trainable, bool):
        trainable = True
    _orig_init(self, trainable=trainable, name=name, dtype=dtype, dynamic=dynamic, **kwargs)


Layer.__init__ = _patched_init

import tensorflow as tf  # noqa: E402
from common.net.uplift_upsample_transformer import UpliftUpsampleTransformer  # noqa: E402

CASES = {
    # name -> model kwargs
    "small_strided": dict(
        full_output=True, num_frames=9, num_keypoints=17,
        spatial_d_model=16, temporal_d_model=32, spatial_depth=2, temporal_depth=2,
        strides=[3, 3], paddings=[[0, 0], [0, 0]], num_heads=4, mlp_ratio=2.0,
        qkv_bias=True, attn_drop_rate=0.0, drop_rate=0.0, drop_path_rate=[0.0, 0.0, 0.0],
        output_bn=False, has_strided_input=True, first_strided_token_attention_layer=1,
        token_mask_rate=0.0, learnable_masked_token=False),
    "default_pads": dict(
        full_output=True, num_frames=11, num_keypoints=17,
        spatial_d_model=16, temporal_d_model=32, spatial_depth=1, temporal_depth=2,
        strides=[4, 3], paddings=None, num_heads=4, mlp_ratio=2.0,
        qkv_bias=True, attn_drop_rate=0.0, drop_rate=0.0, drop_path_rate=0.0,
        output_bn=False, has_strided_input=True, first_strided_token_attention_layer=0,
        token_mask_rate=0.0, learnable_masked_token=False),
    "no_strided_input": dict(
        full_output=True, num_frames=9, num_keypoints=17,
        spatial_d_model=16, temporal_d_model=32, spatial_depth=2, temporal_depth=2,
        strides=[3, 3], paddings=[[0, 0], [0, 0]], num_heads=4, mlp_ratio=2.0,
        qkv_bias=True, attn_drop_rate=0.0, drop_rate=0.0, drop_path_rate=0.0,
        output_bn=False, has_strided_input=False, first_strided_token_attention_layer=0,
        token_mask_rate=0.0, learnable_masked_token=False),
    "no_qkv_bias_bn": dict(
        full_output=True, num_frames=9, num_keypoints=17,
        spatial_d_model=16, temporal_d_model=32, spatial_depth=1, temporal_depth=1,
        strides=[3, 3], paddings=[[0, 0], [0, 0]], num_heads=4, mlp_ratio=2.0,
        qkv_bias=False, attn_drop_rate=0.0, drop_rate=0.0, drop_path_rate=0.0,
        output_bn=True, has_strided_input=True, first_strided_token_attention_layer=0,
        token_mask_rate=0.0, learnable_masked_token=False),
    "no_spatial": dict(
        full_output=True, num_frames=9, num_keypoints=17,
        spatial_d_model=16, temporal_d_model=32, spatial_depth=0, temporal_depth=2,
        strides=[3, 3], paddings=[[0, 0], [0, 0]], num_heads=4, mlp_ratio=2.0,
        qkv_bias=True, attn_drop_rate=0.0, drop_rate=0.0, drop_path_rate=0.0,
        output_bn=False, has_strided_input=True, first_strided_token_attention_layer=0,
        token_mask_rate=0.0, learnable_masked_token=False),
    "no_strides": dict(
        full_output=True, num_frames=9, num_keypoints=17,
        spatial_d_model=16, temporal_d_model=32, spatial_depth=2, temporal_depth=2,
        strides=[], paddings=None, num_heads=4, mlp_ratio=2.0,
        qkv_bias=True, attn_drop_rate=0.0, drop_rate=0.0, drop_path_rate=0.0,
        output_bn=False, has_strided_input=True, first_strided_token_attention_layer=0,
        token_mask_rate=0.0, learnable_masked_token=False),
    "h36m_351": dict(
        full_output=True, num_frames=71, num_keypoints=17,
        spatial_d_model=32, temporal_d_model=384, spatial_depth=4, temporal_depth=4,
        strides=[3, 10, 3], paddings=[[0, 0], [0, 0], [0, 0]], num_heads=8, mlp_ratio=2.0,
        qkv_bias=True, attn_drop_rate=0.0, drop_rate=0.0, drop_path_rate=[0.1, 0.1, 0.0],
        output_bn=False, has_strided_input=True, first_strided_token_attention_layer=1,
        token_mask_rate=0.0, learnable_masked_token=False),
}


def main():
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    rng = np.random.default_rng(1234)
    for name, kwargs in CASES.items():
        print(f"=== {name} ===")
        tf_keras.backend.clear_session()
        model = UpliftUpsampleTransformer(**kwargs)
        b, n, p = 4, kwargs["num_frames"], kwargs["num_keypoints"]
        x = rng.normal(size=(b, n, p, 2)).astype(np.float32) * 0.5
        # Stride mask: mark every 3rd frame valid plus the central frame
        sm = (np.arange(n) % 3 == 0)[None].repeat(b, axis=0)
        sm[:, n // 2] = True
        if kwargs["has_strided_input"]:
            x_masked = x * sm[:, :, None, None].astype(np.float32)
            inputs = [tf.constant(x_masked), tf.constant(sm)]
        else:
            x_masked = x
            inputs = tf.constant(x)
        full, central = model(inputs, training=False)
        # Run twice for BN models: inference mode must not change stats
        full2, central2 = model(inputs, training=False)
        np.testing.assert_allclose(central.numpy(), central2.numpy(), rtol=0, atol=0)

        h5_path = os.path.join(FIXTURE_DIR, f"{name}.h5")
        model.save_weights(h5_path)
        out = {
            "x": x, "x_masked": x_masked, "stride_mask": sm,
            "central": central.numpy(),
        }
        if full is not None:
            out["full"] = full.numpy()
        np.savez(os.path.join(FIXTURE_DIR, f"{name}.npz"), **out)
        print(f"  saved {h5_path} central={central.shape}")


if __name__ == "__main__":
    main()
