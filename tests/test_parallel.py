"""Multi-device parallelism tests on the virtual 8-device CPU mesh.

Data-parallel and tensor-parallel executions must match the single-device
result (GSPMD inserts the collectives; math is identical up to fp reduction
order).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uplift_upsample_tpu.config import UpliftUpsampleConfig
from uplift_upsample_tpu.models import build_uplift_upsample_transformer, init_model_params
from uplift_upsample_tpu.parallel import (TrainState, make_mesh, make_optimizer,
                                          make_train_step, shard_batch)
from uplift_upsample_tpu.parallel.sharding import shard_params_tp


def _tiny_config(batch=16):
    config = UpliftUpsampleConfig()
    config.update_from({
        "SEQUENCE_LENGTH": 9, "SEQUENCE_STRIDE": 5, "SPATIAL_EMBED_DIM": 16,
        "TEMPORAL_EMBED_DIM": 32, "SPATIAL_TRANSFORMER_BLOCKS": 1,
        "TEMPORAL_TRANSFORMER_BLOCKS": 2, "STRIDES": [3, 3],
        "PADDINGS": [[0, 0], [0, 0]], "NUM_HEADS": 4, "MASK_STRIDE": [5, 10, 20],
        "FIRST_STRIDED_TOKEN_ATTENTION_LAYER": 1, "BATCH_SIZE": batch,
        "DROP_PATH_RATE": 0.0, "DROP_RATE": 0.0, "TOKEN_MASK_RATE": 0.0,
        "OPTIMIZER": "AdamW", "OPTIMIZER_PARAMS": {}, "WEIGHT_DECAY": 4e-6,
        "EMA_ENABLED": False,
        "SCHEDULE": "ExponentialDecay",
        "SCHEDULE_PARAMS": {"initial_learning_rate": 1e-4, "decay_steps": 6000,
                            "decay_rate": 0.99, "staircase": True},
    })
    return config


def _batch(config, seed=0):
    rng = np.random.default_rng(seed)
    b, n, k = config.BATCH_SIZE, config.SEQUENCE_LENGTH, config.NUM_KEYPOINTS
    return (
        rng.normal(size=(b, n, k, 3)).astype(np.float32) * 0.1,
        rng.normal(size=(b, n, k, 2)).astype(np.float32) * 0.1,
        np.ones((b, n), np.float32),
        np.zeros((b, 11), np.float32),
        np.zeros((b,), np.int32), np.zeros((b,), np.int32), np.zeros((b,), np.int32),
        (np.arange(n) % 5 == 4)[None].repeat(b, 0),
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_dp_train_step_matches_single_device():
    config = _tiny_config()
    model = build_uplift_upsample_transformer(config)
    params = init_model_params(model, seed=0)["params"]
    tx, _, _ = make_optimizer(config)
    batch = _batch(config)

    def run(mesh):
        state = TrainState(params=jax.tree.map(jnp.copy, params),
                           opt_state=tx.init(params), ema_params=None,
                           step=jnp.zeros([], jnp.int32))
        step = make_train_step(model, tx, config, mesh=mesh, rng_seed=0)
        b = shard_batch(batch, mesh) if mesh is not None else batch
        losses = []
        for _ in range(3):
            state, loss = step(state, b)
            losses.append(float(loss))
        return losses, jax.device_get(state.params)

    losses_1, params_1 = run(None)
    mesh = make_mesh(num_devices=8)
    losses_8, params_8 = run(mesh)
    np.testing.assert_allclose(losses_1, losses_8, rtol=2e-5)
    # Adam's rsqrt amplifies gradient reduction-order noise at early steps;
    # updates are ~1e-4 (lr), so agree to a fraction of one update.
    for a, b in zip(jax.tree.leaves(params_1), jax.tree.leaves(params_8)):
        np.testing.assert_allclose(a, b, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tp_forward_matches_unsharded():
    config = _tiny_config()
    model = build_uplift_upsample_transformer(config)
    params = init_model_params(model, seed=0)["params"]
    batch = _batch(config)
    x = jnp.asarray(batch[1])
    sm = jnp.asarray(batch[7])

    fn = jax.jit(lambda p, x, sm: model.apply({"params": p}, x, stride_mask=sm,
                                              training=False))
    full_ref, central_ref = fn(params, x, sm)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("dp", "mp"))
    tp_params = shard_params_tp(params, mesh, tp_axis="mp")
    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
    sms = jax.device_put(sm, NamedSharding(mesh, P("dp")))
    full_tp, central_tp = fn(tp_params, xs, sms)

    np.testing.assert_allclose(np.asarray(central_tp), np.asarray(central_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(full_tp), np.asarray(full_ref), atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_eval_step_matches_single_device():
    """make_test_step(mesh=...) must reproduce the unsharded step exactly —
    both the dense signature and the shared-spatial (unique frames +
    win_idx) signature, on the XLA path the CPU mesh can execute."""
    from uplift_upsample_tpu.data.keypoint_order import H36MOrder17P
    from uplift_upsample_tpu.eval import make_test_step

    config = _tiny_config(batch=16)
    model = build_uplift_upsample_transformer(config)
    variables = init_model_params(model, seed=0)
    mesh = make_mesh(num_devices=8)
    flip_idx = H36MOrder17P.flip_lr_indices()

    rng = np.random.default_rng(3)
    b, n, k = 16, config.SEQUENCE_LENGTH, config.NUM_KEYPOINTS
    x = rng.normal(size=(b, n, k, 2)).astype(np.float32) * 0.3
    sm = (np.arange(n) % 3 == 0)[None].repeat(b, 0)
    sm[:, n // 2] = True

    for flip in (False, True):
        ref_step = make_test_step(model, variables, flip_tta=flip,
                                  flip_lr_indices=flip_idx, fused="none")
        dp_step = make_test_step(model, variables, flip_tta=flip,
                                 flip_lr_indices=flip_idx, fused="none",
                                 mesh=mesh)
        ref_full, ref_central = ref_step(x, sm)
        dp_full, dp_central = dp_step(x, sm)
        np.testing.assert_allclose(np.asarray(dp_central),
                                   np.asarray(ref_central), atol=2e-5)
        np.testing.assert_allclose(np.asarray(dp_full),
                                   np.asarray(ref_full), atol=2e-5)

    # Shared-spatial signature: unique frames replicated, windows sharded
    from uplift_upsample_tpu.utils.dedup import dedup_rows
    xm = x * sm[:, :, None, None]
    uniq, inv = dedup_rows(xm.reshape(b * n, -1))
    u_max = -(-len(uniq) // 8) * 8
    uq = np.zeros((u_max, k, 2), np.float32)
    uq[:len(uniq)] = uniq.reshape(-1, k, 2)
    idx = inv.reshape(b, n).astype(np.int32)

    ref_step = make_test_step(model, variables, flip_tta=False,
                              flip_lr_indices=flip_idx, fused="none",
                              shared_spatial=True)
    dp_step = make_test_step(model, variables, flip_tta=False,
                             flip_lr_indices=flip_idx, fused="none",
                             shared_spatial=True, mesh=mesh)
    _, ref_central = ref_step(uq, idx, sm)
    _, dp_central = dp_step(uq, idx, sm)
    np.testing.assert_allclose(np.asarray(dp_central),
                               np.asarray(ref_central), atol=2e-5)


def test_tta_batched_matches_two_call():
    """Batched flip-TTA (one concatenated [unflipped; flipped] forward) must
    equal the two-call TTA exactly — same math, different batching — on both
    the dense and the shared-spatial step signatures (XLA path on CPU; the
    fused path shares the identical _step_inner code)."""
    from uplift_upsample_tpu.data.keypoint_order import H36MOrder17P
    from uplift_upsample_tpu.eval import make_test_step
    from uplift_upsample_tpu.utils.dedup import dedup_rows

    config = _tiny_config(batch=8)
    model = build_uplift_upsample_transformer(config)
    variables = init_model_params(model, seed=0)
    flip_idx = H36MOrder17P.flip_lr_indices()

    rng = np.random.default_rng(5)
    b, n, k = 8, config.SEQUENCE_LENGTH, config.NUM_KEYPOINTS
    x = rng.normal(size=(b, n, k, 2)).astype(np.float32) * 0.3
    sm = (np.arange(n) % 3 == 0)[None].repeat(b, 0)
    sm[:, n // 2] = True

    def mk(batched, shared=False):
        return make_test_step(model, variables, flip_tta=True,
                              flip_lr_indices=flip_idx, fused="none",
                              shared_spatial=shared, tta_batched=batched)

    # Same math, different batching: XLA fuses/reassociates the f32
    # reductions (LN, attention softmax) differently for the 2B batch, so
    # the comparison is reassociation-tight, not bit-tight (measured max
    # 1.9e-6 on CPU).
    full_b, central_b = mk(True)(x, sm)
    full_2, central_2 = mk(False)(x, sm)
    np.testing.assert_allclose(np.asarray(central_b), np.asarray(central_2),
                               atol=5e-6)
    np.testing.assert_allclose(np.asarray(full_b), np.asarray(full_2),
                               atol=5e-6)

    xm = x * sm[:, :, None, None]
    uniq, inv = dedup_rows(xm.reshape(b * n, -1))
    u_max = -(-len(uniq) // 8) * 8
    uq = np.zeros((u_max, k, 2), np.float32)
    uq[:len(uniq)] = uniq.reshape(-1, k, 2)
    idx = inv.reshape(b, n).astype(np.int32)
    _, central_sb = mk(True, shared=True)(uq, idx, sm)
    _, central_s2 = mk(False, shared=True)(uq, idx, sm)
    np.testing.assert_allclose(np.asarray(central_sb), np.asarray(central_s2),
                               atol=5e-6)
    # and the shared batched TTA equals the dense batched TTA (different
    # dedup/gather route, same reassociation bound)
    np.testing.assert_allclose(np.asarray(central_sb), np.asarray(central_b),
                               atol=5e-6)
