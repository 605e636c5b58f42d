"""Generate golden multi-step TRAINING TRAJECTORY fixtures from the reference.

Runs the reference model + the reference training-loop semantics
(reference train.py:404-506,552-574) for a few dozen steps on a fixed
synthetic data stream and records the per-step losses and the final
(+ final-EMA) weights. tests/test_train.py::test_trajectory_parity_* then
replays the identical stream through parallel/train_step.make_train_step and
asserts the loss curve and final weights match — pinning the full optimizer
semantics over a trajectory, not just one gradient:

  - tfa.AdamW = Keras optimizer_v2 Adam (ε-hat formulation, schedule read at
    `iterations` pre-increment) + decoupled weight decay with its own
    schedule applied as `var -= wd(step)·var` inside apply_gradients
    (tfa DecoupledWeightDecayExtension._decay_weights_op). tfa itself is not
    installable next to TF 2.21, so the decay op is replicated manually —
    gradients are computed first, decay uses the pre-update variable, then
    the Adam step applies (identical to tfa's control-dependency order).
  - Keras Adam with amsgrad (reference "Adam" optimizer path,
    train.py:416-417 + config OPTIMIZER_PARAMS {"amsgrad": true}).
  - ExponentialDecay staircase boundary crossings (decay_steps small enough
    that the staircase steps mid-trajectory) and the custom
    ExponentialDecayWithSteps two-tier staircase (schedules.py:36-99,
    re-implemented here because the reference file imports the removed
    tensorflow.python.keras paths under TF 2.21).
  - EMA with warmup: decay = min(EMA_DECAY, (1+g)/(10+g)) at the 0-based
    global step BEFORE increment; ema_w -= (1-d)(ema_w - w) after the
    optimizer step (train.py:502-504,554-556).

Artifacts per case (tests/fixtures/):
  - <case>_init.h5    — initial random weights (Keras save_weights)
  - <case>_final.h5   — weights after S steps
  - <case>_ema.h5     — EMA weights after S steps (AdamW case only)
  - <case>.npz        — the data stream (S,B,...), per-step losses, lr/wd

Run once (needs TF + tf_keras; see tools/make_reference_fixtures.py):

    python tools/make_trajectory_fixture.py
"""

import os
import sys

os.environ["TF_USE_LEGACY_KERAS"] = "1"
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
# Deterministic reference numerics (oneDNN reorders f32 accumulation)
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

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

# Same architecture as the gradient fixture (full feature mix: strided-input
# token, temporal attention masking, strided stack ending at 1 token).
MODEL_KWARGS = dict(
    full_output=True, num_frames=9, num_keypoints=17,
    spatial_d_model=16, temporal_d_model=32, spatial_depth=2, temporal_depth=2,
    strides=[3, 3], paddings=[[0, 0], [0, 0]], num_heads=4, mlp_ratio=2.0,
    qkv_bias=True, attn_drop_rate=0.0, drop_rate=0.0,
    drop_path_rate=[0.0, 0.0, 0.0], output_bn=False, has_strided_input=True,
    first_strided_token_attention_layer=1, token_mask_rate=0.0,
    learnable_masked_token=False)
LOSS_WEIGHT_CENTER = 1.0
LOSS_WEIGHT_SEQUENCE = 2.0
ROOT_KEYPOINT = 0
B = 4

# h36m_81-like geometry for the long-horizon case (config/h36m_81.json scaled
# down): padded FIRST strided block (paddings [[1,1],…] — the h81 signature,
# identity path cropped/ZeroPad1D'd differently from the pad-0 flagship),
# learnable masked token, EMA on. 11 →(s4,p[1,1])→ 3 →(s3,p0)→ 1.
MODEL_KWARGS_H81 = dict(
    full_output=True, num_frames=11, num_keypoints=17,
    spatial_d_model=16, temporal_d_model=32, spatial_depth=2, temporal_depth=2,
    strides=[4, 3], paddings=[[1, 1], [0, 0]], num_heads=4, mlp_ratio=2.0,
    qkv_bias=True, attn_drop_rate=0.0, drop_rate=0.0,
    drop_path_rate=[0.0, 0.0, 0.0], output_bn=False, has_strided_input=True,
    first_strided_token_attention_layer=1, token_mask_rate=0.0,
    learnable_masked_token=True)


class ExponentialDecayWithSteps(tf_keras.optimizers.schedules.LearningRateSchedule):
    """Reference two-tier staircase (schedules.py:36-99): a small decay every
    `decay_steps` whose exponent EXCLUDES the large-decay count, times a large
    decay every `large_decay_steps`."""

    def __init__(self, initial_learning_rate, decay_steps, decay_rate,
                 large_decay_steps, large_decay_rate):
        super().__init__()
        self.initial_learning_rate = initial_learning_rate
        self.decay_steps = decay_steps
        self.decay_rate = decay_rate
        self.large_decay_steps = large_decay_steps
        self.large_decay_rate = large_decay_rate

    def __call__(self, step):
        lr0 = tf.convert_to_tensor(self.initial_learning_rate)
        dtype = lr0.dtype
        step = tf.cast(step, dtype)
        p = tf.floor(step / tf.cast(self.decay_steps, dtype))
        large_p = tf.floor(step / tf.cast(self.large_decay_steps, dtype))
        p = p - large_p
        return (lr0 * tf.pow(tf.cast(self.decay_rate, dtype), p)
                * tf.pow(tf.cast(self.large_decay_rate, dtype), large_p))


def make_stream(seed, steps, model_kwargs):
    """Deterministic synthetic (2d, 3d, stride_mask) stream, shaped like the
    generator output; stride-mask period varies per step (from {2,3,4}) and
    the central frame is always real (generator invariant)."""
    rng = np.random.default_rng(seed)
    n, k = model_kwargs["num_frames"], model_kwargs["num_keypoints"]
    kp2d = rng.normal(size=(steps, B, n, k, 2)).astype(np.float32) * 0.5
    kp3d = rng.normal(size=(steps, B, n, k, 3)).astype(np.float32) * 0.4
    sm = np.zeros((steps, B, n), bool)
    for s in range(steps):
        for b in range(B):
            period = int(rng.integers(2, 5))
            shift = int(rng.integers(0, period))
            sm[s, b] = (np.arange(n) + shift) % period == 0
            sm[s, b, n // 2] = True
    return kp2d, kp3d, sm


def run_case(case, steps, optimizer_name, lr_schedule, wd_schedule=None,
             amsgrad=False, ema_decay_cap=None, seed=20260819,
             model_kwargs=MODEL_KWARGS):
    tf_keras.backend.clear_session()
    tf.random.set_seed(seed)
    model = UpliftUpsampleTransformer(**model_kwargs)
    n, k = model_kwargs["num_frames"], model_kwargs["num_keypoints"]
    kp2d, kp3d, sm = make_stream(seed, steps, model_kwargs)

    # Build variables with one forward pass, then save the INITIAL weights.
    _ = model([tf.constant(kp2d[0] * sm[0][:, :, None, None]),
               tf.constant(sm[0])], training=False)
    init_path = os.path.join(FIXTURE_DIR, f"{case}_init.h5")
    model.save_weights(init_path)

    ema_weights = None
    if ema_decay_cap is not None:
        ema_weights = [tf.Variable(w) for w in model.weights]

    opt = tf_keras.optimizers.legacy.Adam(learning_rate=lr_schedule,
                                          epsilon=1e-8, amsgrad=amsgrad)

    losses, lrs, wds = [], [], []
    for s in range(steps):
        kp3d_c = kp3d[s] - kp3d[s][:, :, ROOT_KEYPOINT: ROOT_KEYPOINT + 1, :]
        central_gt = tf.constant(kp3d_c[:, n // 2])
        x_masked = kp2d[s] * sm[s][:, :, None, None].astype(np.float32)
        inputs = [tf.constant(x_masked), tf.constant(sm[s])]

        with tf.GradientTape() as tape:
            pred_seq, pred_central = model(inputs, training=True)
            central_loss = tf.math.reduce_sum(losses_3d.tf_mpjpe(
                pred=pred_central, gt=central_gt)) / (B * k)
            sequence_loss = tf.math.reduce_sum(losses_3d.tf_mpjpe(
                pred=pred_seq, gt=tf.constant(kp3d_c))) / (B * n * k)
            loss = (LOSS_WEIGHT_CENTER * central_loss
                    + LOSS_WEIGHT_SEQUENCE * sequence_loss)
        train_vars = model.trainable_variables
        grads = tape.gradient(loss, train_vars)

        lrs.append(float(lr_schedule(opt.iterations)))
        if wd_schedule is not None:
            # tfa DecoupledWeightDecayExtension: decay op runs inside
            # apply_gradients BEFORE the Adam update, wd evaluated at the
            # pre-increment iteration count, decay uses the pre-update var.
            wd_t = tf.cast(wd_schedule(opt.iterations), tf.float32)
            wds.append(float(wd_t))
            for v in train_vars:
                v.assign_sub(wd_t * v)
        opt.apply_gradients(zip(grads, train_vars))

        if ema_weights is not None:
            # reference train.py:554-556: g = 0-based global step BEFORE
            # increment; train.py:502-504: ema -= (1-d)(ema - w).
            g = float(s)
            d = min(ema_decay_cap, (1.0 + g) / (10.0 + g))
            for w, ema_w in zip(model.weights, ema_weights):
                ema_w.assign_sub((1.0 - d) * (ema_w - w))

        losses.append(float(loss))

    final_path = os.path.join(FIXTURE_DIR, f"{case}_final.h5")
    model.save_weights(final_path)
    ema_path = None
    if ema_weights is not None:
        for w, ema_w in zip(model.weights, ema_weights):
            w.assign(ema_w)
        ema_path = os.path.join(FIXTURE_DIR, f"{case}_ema.h5")
        model.save_weights(ema_path)

    np.savez(os.path.join(FIXTURE_DIR, f"{case}.npz"),
             keypoints2d=kp2d, keypoints3d=kp3d, stride_mask=sm,
             losses=np.asarray(losses, np.float64),
             lrs=np.asarray(lrs, np.float64),
             wds=np.asarray(wds, np.float64),
             loss_weight_center=np.float32(LOSS_WEIGHT_CENTER),
             loss_weight_sequence=np.float32(LOSS_WEIGHT_SEQUENCE))
    print(f"{case}: {steps} steps, loss {losses[0]:.6f} -> {losses[-1]:.6f}; "
          f"lr {lrs[0]:.2e} -> {lrs[-1]:.2e}"
          + (f"; wd {wds[0]:.2e} -> {wds[-1]:.2e}" if wds else "")
          + f"; saved {final_path}" + (f", {ema_path}" if ema_path else ""))


def main():
    os.makedirs(FIXTURE_DIR, exist_ok=True)

    # Case 1: the flagship optimizer stack — AdamW + decoupled scheduled wd +
    # staircase ExponentialDecay (decay_steps=7 → 5 boundary crossings in 40
    # steps) + EMA with warmup (cap crossed at g≥... never here: warmup active
    # the whole trajectory, which is the interesting regime).
    run_case(
        "traj_adamw", steps=40, optimizer_name="AdamW",
        lr_schedule=tf_keras.optimizers.schedules.ExponentialDecay(
            1e-3, decay_steps=7, decay_rate=0.8, staircase=True),
        wd_schedule=tf_keras.optimizers.schedules.ExponentialDecay(
            1e-4, decay_steps=7, decay_rate=0.8, staircase=True),
        ema_decay_cap=0.999)

    # Case 2: the "Adam" config path — keras Adam with amsgrad + the custom
    # two-tier ExponentialDecayWithSteps (small decay every 6, large every 15).
    run_case(
        "traj_adam_ams", steps=30, optimizer_name="Adam",
        lr_schedule=ExponentialDecayWithSteps(
            1e-3, decay_steps=6, decay_rate=0.7,
            large_decay_steps=15, large_decay_rate=0.5),
        amsgrad=True)

    # Case 3 (long horizon, h36m_81-like geometry): 200 steps, AdamW with
    # decoupled scheduled wd where BOTH schedules are the two-tier
    # ExponentialDecayWithSteps crossing the LARGE-decay boundary at step 120
    # (plus 9 small boundaries), EMA on throughout, padded first strided
    # block + learnable masked token. Pins the full optimizer/EMA semantics
    # over a horizon 5x the short cases (VERDICT r3 item 4).
    run_case(
        "traj_h81_long", steps=200, optimizer_name="AdamW",
        lr_schedule=ExponentialDecayWithSteps(
            1e-3, decay_steps=20, decay_rate=0.9,
            large_decay_steps=120, large_decay_rate=0.3),
        wd_schedule=ExponentialDecayWithSteps(
            1e-4, decay_steps=20, decay_rate=0.9,
            large_decay_steps=120, large_decay_rate=0.3),
        ema_decay_cap=0.999, model_kwargs=MODEL_KWARGS_H81)


if __name__ == "__main__":
    main()
