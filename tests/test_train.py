"""Training harness tests: optimizer semantics, schedules, EMA, end-to-end smoke."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uplift_upsample_tpu.config import UpliftUpsampleConfig
from uplift_upsample_tpu.parallel import TrainState, make_optimizer, make_train_step
from uplift_upsample_tpu.utils.schedules import (cosine_decay_restarts,
                                                 exponential_decay,
                                                 exponential_decay_with_steps,
                                                 piecewise_constant_decay)

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")
SYNTH_DIR = os.path.join(FIXTURE_DIR, "synth")


def test_exponential_decay_staircase():
    sched = exponential_decay(4e-5, decay_steps=6000, decay_rate=0.99, staircase=True)
    assert np.isclose(float(sched(0)), 4e-5)
    assert np.isclose(float(sched(5999)), 4e-5)
    assert np.isclose(float(sched(6000)), 4e-5 * 0.99)
    assert np.isclose(float(sched(18001)), 4e-5 * 0.99 ** 3)


def test_exponential_decay_with_steps():
    # Two-tier: small decay every 12k steps, large every 60k; the small-decay
    # exponent excludes the large-decay count (reference schedules.py:86-99)
    sched = exponential_decay_with_steps(1e-3, decay_steps=12000, decay_rate=0.95,
                                         large_decay_steps=60000, large_decay_rate=0.5)
    assert np.isclose(float(sched(0)), 1e-3)
    assert np.isclose(float(sched(12000)), 1e-3 * 0.95)
    assert np.isclose(float(sched(60000)), 1e-3 * 0.95 ** (5 - 1) * 0.5, rtol=1e-5)
    assert np.isclose(float(sched(72000)), 1e-3 * 0.95 ** (6 - 1) * 0.5, rtol=1e-5)


def test_piecewise_constant_decay_keras_semantics():
    """Goldens from tf.keras PiecewiseConstantDecay: values[i] holds for
    boundaries[i-1] < step <= boundaries[i] (boundary step keeps the old value)."""
    sched = piecewise_constant_decay(boundaries=[100, 110], values=[1.0, 0.5, 0.1])
    golden = [(0, 1.0), (99, 1.0), (100, 1.0), (101, 0.5), (110, 0.5),
              (111, 0.1), (500, 0.1)]
    for step, expected in golden:
        assert np.isclose(float(sched(step)), expected), (step, float(sched(step)))


def test_cosine_decay_restarts_keras_semantics():
    """Goldens from tf.keras CosineDecayRestarts (t_mul=2, m_mul=.5, alpha=.1)."""
    sched = cosine_decay_restarts(1.0, first_decay_steps=10, t_mul=2.0,
                                  m_mul=0.5, alpha=0.1)
    golden = [(0, 1.0), (3, 0.8145033717), (5, 0.5499999523), (10, 0.5500000119),
              (13, 0.5254764557), (20, 0.3249999881), (30, 0.3249999881),
              (37, 0.3084219992), (70, 0.212500006), (100, 0.1777759492)]
    for step, expected in golden:
        assert np.isclose(float(sched(step)), expected, rtol=1e-5), (
            step, float(sched(step)))


def test_cosine_decay_restarts_tmul1():
    """t_mul=1 path (plain periodic restarts); goldens from tf.keras."""
    sched = cosine_decay_restarts(4e-5, first_decay_steps=6000, t_mul=1.0,
                                  m_mul=1.0, alpha=0.0)
    golden = [(0, 4e-5), (2999, 2.0010471416753717e-05), (3000, 2e-5),
              (5999, 2.384185730786026e-12), (6000, 4e-5), (9000, 2e-5),
              (12345, 3.967457087128423e-05)]
    for step, expected in golden:
        assert np.isclose(float(sched(step)), expected, rtol=1e-4, atol=1e-9), (
            step, float(sched(step)))


def test_adamw_decoupled_wd_semantics():
    """One AdamW step must match tfa.AdamW = Keras Adam direction + decoupled wd.

    Keras optimizer_v2 Adam uses the ε-hat formulation (ε outside the bias
    correction): update = lr·√(1−β₂ᵗ)/(1−β₁ᵗ)·m/(√v+ε) — NOT optax's
    m̂/(√v̂+ε). Reference: tfa.optimizers.AdamW(train.py:407-415) inheriting
    keras Adam's _resource_apply_dense."""
    config = UpliftUpsampleConfig()
    config.OPTIMIZER = "AdamW"
    config.OPTIMIZER_PARAMS = {}
    config.WEIGHT_DECAY = 1e-2
    config.SCHEDULE = "ExponentialDecay"
    config.SCHEDULE_PARAMS = {"initial_learning_rate": 1e-3, "decay_steps": 10,
                              "decay_rate": 0.5, "staircase": True}
    tx, lr_s, wd_s = make_optimizer(config)

    p0 = jnp.array([1.0, -2.0])
    g = jnp.array([0.5, 0.25])
    opt_state = tx.init(p0)
    updates, opt_state = tx.update(g, opt_state, p0)
    p1 = p0 + updates

    lr, wd, b1, b2, eps = 1e-3, 1e-2, 0.9, 0.999, 1e-8
    m = (1 - b1) * g
    v = (1 - b2) * g ** 2
    alpha = np.sqrt(1 - b2) / (1 - b1)  # t = 1
    expected = p0 - lr * alpha * m / (np.sqrt(v) + eps) - wd * p0
    np.testing.assert_allclose(np.asarray(p1), expected, rtol=1e-6)

    # second step: bias correction exponent advances, wd/lr schedules at t=1
    g2 = jnp.array([0.1, -0.3])
    updates2, _ = tx.update(g2, opt_state, p1)
    m2 = b1 * m + (1 - b1) * np.asarray(g2)
    v2 = b2 * v + (1 - b2) * np.asarray(g2) ** 2
    alpha2 = np.sqrt(1 - b2 ** 2) / (1 - b1 ** 2)
    expected2 = -lr * alpha2 * m2 / (np.sqrt(v2) + eps) - wd * np.asarray(p1)
    np.testing.assert_allclose(np.asarray(updates2), expected2, rtol=1e-6)


def _tiny_config():
    config = UpliftUpsampleConfig()
    config.update_from({
        "SEQUENCE_LENGTH": 9, "SEQUENCE_STRIDE": 5, "SPATIAL_EMBED_DIM": 16,
        "TEMPORAL_EMBED_DIM": 32, "SPATIAL_TRANSFORMER_BLOCKS": 1,
        "TEMPORAL_TRANSFORMER_BLOCKS": 2, "STRIDES": [3, 3],
        "PADDINGS": [[0, 0], [0, 0]], "NUM_HEADS": 4, "MASK_STRIDE": [5, 10, 20],
        "FIRST_STRIDED_TOKEN_ATTENTION_LAYER": 1, "BATCH_SIZE": 16,
        "DROP_PATH_RATE": [0.1, 0.1, 0.0], "EPOCHS": 2, "STEPS_PER_EPOCH": 4,
        "VALIDATION_INTERVAL": 1, "CHECKPOINT_INTERVAL": 1, "VALIDATION_EXAMPLES": 24,
        "OPTIMIZER": "AdamW", "OPTIMIZER_PARAMS": {}, "WEIGHT_DECAY": 4e-6,
        "SCHEDULE": "ExponentialDecay",
        "SCHEDULE_PARAMS": {"initial_learning_rate": 4e-5, "decay_steps": 6000,
                            "decay_rate": 0.99, "staircase": True},
        "EMA_ENABLED": True, "EMA_DECAY": 0.999,
        "STRIDE_MASK_RAND_SHIFT": True, "IN_BATCH_AUGMENT": True,
        "DATASET_VAL_3D_SUBSAMPLE_STEP": 10,
    })
    return config


@pytest.mark.skipif(not os.path.exists(os.path.join(SYNTH_DIR, "data_3d_h36m.npz")),
                    reason="synthetic npz missing")
@pytest.mark.slow
def test_train_smoke_and_resume(tmp_path):
    """Two-epoch training on synthetic data, then resume for a third epoch."""
    from uplift_upsample_tpu.train import train_and_validate
    from uplift_upsample_tpu.models import build_uplift_upsample_transformer
    from uplift_upsample_tpu.utils.weights_h5 import load_keras_h5

    config = _tiny_config()
    out_dir = str(tmp_path / "run")
    kwargs = dict(
        out_dir=out_dir, dataset_name="h36m",
        h36m_path=os.path.join(SYNTH_DIR, "data_3d_h36m.npz"),
        dataset_2d_path=os.path.join(SYNTH_DIR, "data_2d_h36m_synth.npz"),
        train_subset="train", val_subset="val", test_subset=None)

    hist, best_path, last_path = train_and_validate(config=config.copy(), **kwargs)
    assert best_path is not None and os.path.exists(best_path)
    assert last_path is not None and os.path.exists(last_path)
    assert hist.latest_value("MPJPE") is not None
    assert os.path.exists(os.path.join(out_dir, "scalars.jsonl"))
    with open(os.path.join(out_dir, "scalars.jsonl")) as f:
        tags = {json.loads(line)["tag"] for line in f}
    assert {"train/loss", "train/LR", "train/WD", "val/MPJPE", "val/AW-MPJPE"} <= tags

    # exported h5 must be loadable back into the model
    model = build_uplift_upsample_transformer(config)
    variables = load_keras_h5(last_path, model)
    assert "params" in variables

    # resume: epoch 3 only
    config3 = config.copy()
    config3.EPOCHS = 3
    hist2, best2, last2 = train_and_validate(config=config3, continue_training=True, **kwargs)
    assert last2.endswith("last_weights_0003.h5")
    # Best-checkpoint continuity across the resume: the pre-resume history is
    # restored, so epochs 1-2 still participate in best tracking...
    for epoch in (1, 2, 3):
        assert hist2.value_at_step("MPJPE", epoch) is not None, epoch
    assert hist2.value_at_step("MPJPE", 1) == hist.value_at_step("MPJPE", 1)
    # ...and the surviving best .h5 is the best epoch over ALL epochs.
    _, best_epoch = hist2.best_value(config.BEST_CHECKPOINT_METRIC)
    assert best2 is not None and best2.endswith(f"best_weights_{best_epoch:04d}.h5")
    assert os.path.exists(best2)


@pytest.mark.skipif(not os.path.exists(os.path.join(SYNTH_DIR, "amass")),
                    reason="synthetic amass missing")
@pytest.mark.slow
def test_train_amass_smoke(tmp_path):
    """End-to-end AMASS pre-training path: cam18 batches → device-side
    world→cam + 2D projection inside the jitted step, frame-wise validation,
    h5 export (reference train.py create_amass_datasets path)."""
    from uplift_upsample_tpu.train import train_and_validate
    from uplift_upsample_tpu.models import build_uplift_upsample_transformer
    from uplift_upsample_tpu.utils.weights_h5 import load_keras_h5

    config = _tiny_config()
    config.EPOCHS = 2
    # AMASS configs use plain MPJPE (no action-wise metrics; amass_351.json)
    config.BEST_CHECKPOINT_METRIC = "MPJPE"
    out_dir = str(tmp_path / "amass_run")
    hist, best_path, last_path = train_and_validate(
        config=config.copy(), out_dir=out_dir, dataset_name="amass",
        amass_path=os.path.join(SYNTH_DIR, "amass"),
        h36m_path=os.path.join(SYNTH_DIR, "data_3d_h36m.npz"),
        train_subset="train_debug", val_subset="val", test_subset=None)
    assert hist.latest_value("MPJPE") is not None
    assert np.isfinite(hist.latest_value("MPJPE"))
    assert best_path is not None and os.path.exists(best_path)
    assert last_path.endswith("last_weights_0002.h5")
    model = build_uplift_upsample_transformer(config)
    assert "params" in load_keras_h5(last_path, model)


def test_train_step_loss_decreases():
    """Direct train-step loop on a deterministic batch must reduce the loss."""
    from uplift_upsample_tpu.models import build_uplift_upsample_transformer, init_model_params

    config = _tiny_config()
    config.SCHEDULE_PARAMS = {"initial_learning_rate": 1e-3, "decay_steps": 6000,
                              "decay_rate": 0.99, "staircase": True}
    config.EMA_ENABLED = False
    model = build_uplift_upsample_transformer(config)
    params = init_model_params(model, seed=0)["params"]
    tx, _, _ = make_optimizer(config)
    state = TrainState(params=params, opt_state=tx.init(params),
                       ema_params=None, step=jnp.zeros([], jnp.int32))
    step = make_train_step(model, tx, config, dataset_name="h36m")

    rng = np.random.default_rng(0)
    b, n, k = config.BATCH_SIZE, config.SEQUENCE_LENGTH, config.NUM_KEYPOINTS
    batch = (
        rng.normal(size=(b, n, k, 3)).astype(np.float32) * 0.1,
        rng.normal(size=(b, n, k, 2)).astype(np.float32) * 0.1,
        np.ones((b, n), np.float32),
        np.zeros((b, 11), np.float32),
        np.zeros((b,), np.int32), np.zeros((b,), np.int32), np.zeros((b,), np.int32),
        (np.arange(n) % 5 == 4)[None].repeat(b, 0),
    )
    losses = []
    for _ in range(30):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses[::10]


def _traj_config(case):
    """Config matching tools/make_trajectory_fixture.py's cases."""
    config = UpliftUpsampleConfig()
    config.update_from({
        "SEQUENCE_LENGTH": 9, "SEQUENCE_STRIDE": 5, "SPATIAL_EMBED_DIM": 16,
        "TEMPORAL_EMBED_DIM": 32, "SPATIAL_TRANSFORMER_BLOCKS": 2,
        "TEMPORAL_TRANSFORMER_BLOCKS": 2, "STRIDES": [3, 3],
        "PADDINGS": [[0, 0], [0, 0]], "NUM_HEADS": 4, "BATCH_SIZE": 4,
        "FIRST_STRIDED_TOKEN_ATTENTION_LAYER": 1,
        "DROP_PATH_RATE": [0.0, 0.0, 0.0], "MASK_STRIDE": 3,
        "ROOT_KEYTPOINT": 0, "LOSS_WEIGHT_CENTER": 1.0,
        "LOSS_WEIGHT_SEQUENCE": 2.0,
    })
    if case == "traj_adamw":
        config.update_from({
            "OPTIMIZER": "AdamW", "OPTIMIZER_PARAMS": {},
            "WEIGHT_DECAY": 1e-4, "SCHEDULE": "ExponentialDecay",
            "SCHEDULE_PARAMS": {"initial_learning_rate": 1e-3,
                                "decay_steps": 7, "decay_rate": 0.8,
                                "staircase": True},
            "EMA_ENABLED": True, "EMA_DECAY": 0.999,
        })
    elif case == "traj_h81_long":
        # 200-step h36m_81-like case (tools/make_trajectory_fixture.py
        # MODEL_KWARGS_H81): padded first strided block, learnable masked
        # token, AdamW + two-tier ExponentialDecayWithSteps for BOTH lr and
        # decoupled wd (large-decay boundary at step 120), EMA throughout.
        config.update_from({
            "SEQUENCE_LENGTH": 11, "STRIDES": [4, 3],
            "PADDINGS": [[1, 1], [0, 0]], "LEARNABLE_MASKED_TOKEN": True,
            "OPTIMIZER": "AdamW", "OPTIMIZER_PARAMS": {},
            "WEIGHT_DECAY": 1e-4, "SCHEDULE": "ExponentialDecayWithSteps",
            "SCHEDULE_PARAMS": {"initial_learning_rate": 1e-3,
                                "decay_steps": 20, "decay_rate": 0.9,
                                "large_decay_steps": 120,
                                "large_decay_rate": 0.3},
            "EMA_ENABLED": True, "EMA_DECAY": 0.999,
        })
    else:
        config.update_from({
            "OPTIMIZER": "Adam",
            "OPTIMIZER_PARAMS": {"amsgrad": True, "epsilon": 1e-8},
            "SCHEDULE": "ExponentialDecayWithSteps",
            "SCHEDULE_PARAMS": {"initial_learning_rate": 1e-3,
                                "decay_steps": 6, "decay_rate": 0.7,
                                "large_decay_steps": 15,
                                "large_decay_rate": 0.5},
            "EMA_ENABLED": False,
        })
    return config


@pytest.mark.parametrize("case", ["traj_adamw", "traj_adam_ams",
                                  "traj_h81_long"])
def test_trajectory_parity_vs_reference(case):
    """Multi-step TRAINING TRAJECTORY parity vs the reference loop.

    Fixture from tools/make_trajectory_fixture.py: the reference model +
    reference optimizer semantics (tfa.AdamW decoupled scheduled wd / keras
    amsgrad Adam, staircase schedule boundary crossings, EMA warmup) run for
    30-40 steps on a fixed stream; this side replays the identical stream
    through make_train_step and pins the per-step loss curve, the final
    weights, and the final EMA weights. Reference: train.py:404-506,552-574,
    schedules.py:36-99."""
    from uplift_upsample_tpu.models import build_uplift_upsample_transformer
    from uplift_upsample_tpu.utils.weights_h5 import load_keras_h5

    init_h5 = os.path.join(FIXTURE_DIR, f"{case}_init.h5")
    final_h5 = os.path.join(FIXTURE_DIR, f"{case}_final.h5")
    npz = os.path.join(FIXTURE_DIR, f"{case}.npz")
    if not all(os.path.exists(p) for p in (init_h5, final_h5, npz)):
        pytest.skip(f"fixture {case} missing; run tools/make_trajectory_fixture.py")
    data = np.load(npz)
    steps = len(data["losses"])

    config = _traj_config(case)
    model = build_uplift_upsample_transformer(config)
    params = jax.tree.map(jnp.asarray, load_keras_h5(init_h5, model)["params"])

    tx, lr_schedule, wd_schedule = make_optimizer(config)
    ema = jax.tree.map(jnp.copy, params) if config.EMA_ENABLED else None
    state = TrainState(params=params, opt_state=tx.init(params),
                       ema_params=ema, step=jnp.zeros([], jnp.int32))
    step = make_train_step(model, tx, config, dataset_name="h36m")

    b, n = 4, config.SEQUENCE_LENGTH
    losses = []
    for s in range(steps):
        # schedule pins: evaluated at the pre-increment step like keras
        np.testing.assert_allclose(float(lr_schedule(s)), data["lrs"][s],
                                   rtol=1e-6)
        if wd_schedule is not None:
            np.testing.assert_allclose(float(wd_schedule(s)), data["wds"][s],
                                       rtol=1e-6)
        batch = (
            jnp.asarray(data["keypoints3d"][s]),
            jnp.asarray(data["keypoints2d"][s]),
            jnp.ones((b, n), jnp.float32), jnp.zeros((b, 11), jnp.float32),
            jnp.zeros((b,), jnp.int32), jnp.zeros((b,), jnp.int32),
            jnp.zeros((b,), jnp.int32), jnp.asarray(data["stride_mask"][s]),
        )
        state, loss = step(state, batch)
        losses.append(float(loss))

    # Per-step loss curve: f32 TF vs JAX CPU accumulation-order drift only
    # (the 200-step case accumulates ~3x more of it than the 30/40-step ones).
    loss_rtol = 1e-3 if steps > 100 else 3e-4
    np.testing.assert_allclose(losses, data["losses"], rtol=loss_rtol,
                               atol=1e-5)

    def assert_weights_close(ours, ref_h5, what):
        ref = load_keras_h5(ref_h5, model)["params"]
        flat_ours = jax.tree_util.tree_leaves_with_path(ours)
        flat_ref = dict(jax.tree_util.tree_leaves_with_path(ref))
        assert len(flat_ours) == len(flat_ref) > 20
        for path, w in flat_ours:
            key = jax.tree_util.keystr(path)
            r = np.asarray(flat_ref[path])
            scale = max(np.abs(r).max(), 1e-3)
            if "['wk']['bias']" in key:
                # The key bias shifts every logit in a row equally, so the
                # softmax is invariant and its TRUE gradient is exactly zero;
                # what autodiff returns is f32 cancellation noise (~1e-9),
                # which Adam normalizes to O(lr) steps (√v ≈ noise ≫ ε).
                # Its trajectory is therefore a pure noise random walk in the
                # reference too — bound it by the walk's reach, don't pin it.
                atol = steps * float(data["lrs"][0])
                np.testing.assert_allclose(
                    np.asarray(w), r, atol=atol,
                    err_msg=f"{what} wk-bias walk out of range at {key}")
                continue
            np.testing.assert_allclose(
                np.asarray(w), r, atol=1e-3 * scale, rtol=2e-3,
                err_msg=f"{what} mismatch at {key}")

    assert_weights_close(state.params, final_h5, "final weights")
    ema_h5 = os.path.join(FIXTURE_DIR, f"{case}_ema.h5")
    if config.EMA_ENABLED and os.path.exists(ema_h5):
        assert_weights_close(state.ema_params, ema_h5, "EMA weights")

    # loss accumulator (reference train.py:505 all-steps epoch mean)
    np.testing.assert_allclose(float(state.loss_sum), np.sum(losses),
                               rtol=1e-5)


def test_grad_parity_vs_reference():
    """Loss + FULL BACKWARD parity vs the reference TF train step.

    Fixture from tools/make_grad_fixture.py: the reference model's random
    weights and its tape.gradient per variable, both written through Keras
    save_weights so this side can map them with the ordinary h5 converter
    (layout transforms are pure permutations, so they map gradients exactly
    like weights). Validates the loss weighting (reference train.py:477-494)
    and every gradient leaf of jax.grad(make_loss_fn)."""
    from uplift_upsample_tpu.models import build_uplift_upsample_transformer
    from uplift_upsample_tpu.parallel.train_step import make_loss_fn
    from uplift_upsample_tpu.utils.weights_h5 import load_keras_h5

    case = "grad_small_strided"
    weights_h5 = os.path.join(FIXTURE_DIR, f"{case}.h5")
    grads_h5 = os.path.join(FIXTURE_DIR, f"{case}_grads.h5")
    npz = os.path.join(FIXTURE_DIR, f"{case}.npz")
    if not all(os.path.exists(p) for p in (weights_h5, grads_h5, npz)):
        pytest.skip(f"fixture {case} missing; run tools/make_grad_fixture.py")
    data = np.load(npz)

    config = UpliftUpsampleConfig()
    config.update_from({
        "SEQUENCE_LENGTH": 9, "SEQUENCE_STRIDE": 5, "SPATIAL_EMBED_DIM": 16,
        "TEMPORAL_EMBED_DIM": 32, "SPATIAL_TRANSFORMER_BLOCKS": 2,
        "TEMPORAL_TRANSFORMER_BLOCKS": 2, "STRIDES": [3, 3],
        "PADDINGS": [[0, 0], [0, 0]], "NUM_HEADS": 4, "BATCH_SIZE": 4,
        "FIRST_STRIDED_TOKEN_ATTENTION_LAYER": 1,
        "DROP_PATH_RATE": [0.0, 0.0, 0.0], "MASK_STRIDE": 3,
        "ROOT_KEYTPOINT": 0, "LOSS_WEIGHT_CENTER": 1.0,
        "LOSS_WEIGHT_SEQUENCE": 2.0, "EMA_ENABLED": False,
    })
    model = build_uplift_upsample_transformer(config)
    assert model.full_output and model.has_strided_input
    params = load_keras_h5(weights_h5, model)["params"]
    ref_grads = load_keras_h5(grads_h5, model)["params"]

    b, n, k = 4, 9, 17
    batch = (
        data["keypoints3d"], data["keypoints2d"],
        np.ones((b, n), np.float32), np.zeros((b, 11), np.float32),
        np.zeros((b,), np.int32), np.zeros((b,), np.int32),
        np.zeros((b,), np.int32), data["stride_mask"],
    )
    batch = tuple(jnp.asarray(a) for a in batch)
    loss_fn = make_loss_fn(model, config, dataset_name="h36m")
    key = jax.random.PRNGKey(0)  # all dropout/droppath/token-mask rates are 0
    rngs = {name: jax.random.fold_in(key, i)
            for i, name in enumerate(("dropout", "droppath", "token_mask"))}
    loss, grads = jax.value_and_grad(loss_fn)(params, batch, rngs)

    np.testing.assert_allclose(float(loss), float(data["loss"]), rtol=1e-5)

    flat_ours = jax.tree_util.tree_leaves_with_path(grads)
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(ref_grads))
    assert len(flat_ours) == len(flat_ref) > 20
    for path, g in flat_ours:
        r = np.asarray(flat_ref[path])
        g = np.asarray(g)
        # f32 CPU TF vs JAX: identical math, different accumulation order.
        scale = max(np.abs(r).max(), 1e-3)
        np.testing.assert_allclose(
            g, r, atol=2e-4 * scale, rtol=2e-3,
            err_msg=f"gradient mismatch at {jax.tree_util.keystr(path)}")
