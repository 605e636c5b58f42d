"""Generate a golden LOSS + GRADIENT fixture from the reference TF training step.

Runs the reference model (read-only at /root/reference) under legacy tf_keras
with random weights, replicates the reference train_step's loss exactly
(reference train.py:465-498: root-relative 3D, central Σ‖·‖/(B·K) +
sequence Σ‖·‖/(B·N·K), weighted sum), and records

  - grad_small_strided.h5        — the random weights (Keras save_weights)
  - grad_small_strided_grads.h5  — tape.gradient per variable, written through
                                   the SAME Keras h5 layout (each variable is
                                   assigned its own gradient, then
                                   save_weights) so the JAX side can map them
                                   with the ordinary by-name h5 converter
  - grad_small_strided.npz       — inputs, stride mask, 3D targets, loss
                                   value, loss weights

tests/test_train.py::test_grad_parity_vs_reference then loads both h5 files
with utils/weights_h5.load_keras_h5 (layout transforms are pure permutations,
so they map gradients exactly like weights), computes jax.grad of
parallel/train_step.make_loss_fn on the same batch, and compares leaf by
leaf — validating the loss weighting AND the full backward pass against the
reference implementation.

Run once (needs TF + tf_keras, see tools/make_reference_fixtures.py):

    python tools/make_grad_fixture.py
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


def _patched_init(self, trainable=True, name=None, dtype=None, dynamic=False,
                  **kwargs):
    # The reference's layers call super().__init__(self, **kwargs) — a
    # TF-2.4-tolerated bug; sanitize the trainable argument (see
    # tools/make_reference_fixtures.py).
    if not isinstance(trainable, bool):
        trainable = True
    _orig_init(self, trainable=trainable, name=name, dtype=dtype,
               dynamic=dynamic, **kwargs)


Layer.__init__ = _patched_init

import tensorflow as tf  # noqa: E402
from common.net.uplift_upsample_transformer import UpliftUpsampleTransformer  # noqa: E402
from common.utils import losses_3d  # noqa: E402

# Matches tests/test_model_parity.py MODEL_KWARGS["small_strided"], the full
# feature mix: spatial+temporal+strided stacks, strided-input token, temporal
# attention masking of masked-frame tokens (first_strided_token_attention_layer=1).
CASE = "grad_small_strided"
KWARGS = dict(
    full_output=True, num_frames=9, num_keypoints=17,
    spatial_d_model=16, temporal_d_model=32, spatial_depth=2, temporal_depth=2,
    strides=[3, 3], paddings=[[0, 0], [0, 0]], num_heads=4, mlp_ratio=2.0,
    qkv_bias=True, attn_drop_rate=0.0, drop_rate=0.0,
    drop_path_rate=[0.0, 0.0, 0.0], output_bn=False, has_strided_input=True,
    first_strided_token_attention_layer=1, token_mask_rate=0.0,
    learnable_masked_token=False)
# Distinct weights so a center/sequence swap or mis-normalization cannot
# cancel out.
LOSS_WEIGHT_CENTER = 1.0
LOSS_WEIGHT_SEQUENCE = 2.0
ROOT_KEYPOINT = 0
B = 4


def main():
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    rng = np.random.default_rng(20260818)
    tf_keras.backend.clear_session()
    model = UpliftUpsampleTransformer(**KWARGS)

    n, k = KWARGS["num_frames"], KWARGS["num_keypoints"]
    keypoints2d = rng.normal(size=(B, n, k, 2)).astype(np.float32) * 0.5
    keypoints3d = rng.normal(size=(B, n, k, 3)).astype(np.float32) * 0.4
    sm = (np.arange(n) % 3 == 0)[None].repeat(B, axis=0)
    sm[:, n // 2] = True

    # Reference train_step body (train.py:465-498), dropout-free so
    # training=True is deterministic.
    kp3d = keypoints3d - keypoints3d[:, :, ROOT_KEYPOINT: ROOT_KEYPOINT + 1, :]
    central_gt = kp3d[:, n // 2]
    x_masked = keypoints2d * sm[:, :, None, None].astype(np.float32)
    inputs = [tf.constant(x_masked), tf.constant(sm)]

    with tf.GradientTape() as tape:
        pred_seq, pred_central = model(inputs, training=True)
        central_loss = losses_3d.tf_mpjpe(pred=pred_central,
                                          gt=tf.constant(central_gt))
        central_loss = tf.math.reduce_sum(central_loss) / (B * k)
        sequence_loss = losses_3d.tf_mpjpe(pred=pred_seq, gt=tf.constant(kp3d))
        sequence_loss = tf.math.reduce_sum(sequence_loss) / (B * n * k)
        loss = (LOSS_WEIGHT_CENTER * central_loss
                + LOSS_WEIGHT_SEQUENCE * sequence_loss)

    train_vars = model.trainable_variables
    assert len(train_vars) == len(model.weights), (
        "grads h5 would carry stale values for non-trainable weights")
    grads = tape.gradient(loss, train_vars)

    weights_path = os.path.join(FIXTURE_DIR, f"{CASE}.h5")
    model.save_weights(weights_path)

    # Write the gradients through the SAME h5 layout: assign each variable
    # its own gradient, save_weights again. Unused variables (None grad)
    # become zeros — matching JAX, whose grads for unused params are zeros.
    for v, g in zip(train_vars, grads):
        v.assign(tf.zeros_like(v) if g is None else g)
    grads_path = os.path.join(FIXTURE_DIR, f"{CASE}_grads.h5")
    model.save_weights(grads_path)

    np.savez(os.path.join(FIXTURE_DIR, f"{CASE}.npz"),
             keypoints2d=keypoints2d, keypoints3d=keypoints3d,
             stride_mask=sm, loss=np.float32(loss.numpy()),
             central_loss=np.float32(central_loss.numpy()),
             sequence_loss=np.float32(sequence_loss.numpy()),
             loss_weight_center=np.float32(LOSS_WEIGHT_CENTER),
             loss_weight_sequence=np.float32(LOSS_WEIGHT_SEQUENCE))
    print(f"saved {weights_path}, {grads_path}; loss={float(loss.numpy()):.6f} "
          f"(central={float(central_loss.numpy()):.6f}, "
          f"sequence={float(sequence_loss.numpy()):.6f})")


if __name__ == "__main__":
    main()
