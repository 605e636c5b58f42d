"""Fused-spatial training path: gradients must match the flax path.

Runs in interpreter mode on CPU; stochastic depth disabled for the exact
comparison (the masks differ between paths by construction), plus a smoke
test with stochastic depth enabled.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from uplift_upsample_tpu.config import UpliftUpsampleConfig
from uplift_upsample_tpu.models import build_uplift_upsample_transformer, init_model_params
from uplift_upsample_tpu.parallel import TrainState, make_optimizer, make_train_step


def _config(**over):
    config = UpliftUpsampleConfig()
    config.update_from({
        "SEQUENCE_LENGTH": 9, "SEQUENCE_STRIDE": 5, "SPATIAL_EMBED_DIM": 16,
        "TEMPORAL_EMBED_DIM": 32, "SPATIAL_TRANSFORMER_BLOCKS": 2,
        "TEMPORAL_TRANSFORMER_BLOCKS": 2, "STRIDES": [3, 3],
        "PADDINGS": [[0, 0], [0, 0]], "NUM_HEADS": 4, "MASK_STRIDE": [5, 10, 20],
        "FIRST_STRIDED_TOKEN_ATTENTION_LAYER": 1, "BATCH_SIZE": 8,
        "DROP_PATH_RATE": 0.0, "DROP_RATE": 0.0, "TOKEN_MASK_RATE": 0.0,
        "OPTIMIZER": "AdamW", "OPTIMIZER_PARAMS": {}, "WEIGHT_DECAY": 4e-6,
        "EMA_ENABLED": False,
        "SCHEDULE": "ExponentialDecay",
        "SCHEDULE_PARAMS": {"initial_learning_rate": 1e-4, "decay_steps": 6000,
                            "decay_rate": 0.99, "staircase": True},
    })
    config.update_from(over)
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


def _run_steps(config, n_steps=2):
    from uplift_upsample_tpu.parallel.train_step import make_loss_fn
    model = build_uplift_upsample_transformer(config)
    params = init_model_params(model, seed=0)["params"]
    loss_fn = make_loss_fn(model, config)
    batch = tuple(jnp.asarray(a) for a in _batch(config))
    rngs = {name: jax.random.PRNGKey(i) for i, name in
            enumerate(("dropout", "droppath", "token_mask"))}
    loss, grads = jax.value_and_grad(loss_fn)(params, batch, rngs)
    return float(loss), grads


@pytest.mark.slow
def test_fused_train_grads_match_flax():
    with pltpu.force_tpu_interpret_mode():
        loss_f, grads_f = _run_steps(_config(TRAIN_FUSED_SPATIAL=True))
    loss_x, grads_x = _run_steps(_config(TRAIN_FUSED_SPATIAL=False))

    assert np.isclose(loss_f, loss_x, atol=1e-5), (loss_f, loss_x)
    flat_f = jax.tree_util.tree_flatten_with_path(grads_f)[0]
    flat_x = {"/".join(str(k) for k in kp): v
              for kp, v in jax.tree_util.tree_flatten_with_path(grads_x)[0]}
    for kp, gf in flat_f:
        key = "/".join(str(k) for k in kp)
        gx = flat_x[key]
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   atol=5e-5, rtol=1e-3, err_msg=key)


@pytest.mark.slow
def test_fused_train_step_with_droppath_smoke():
    config = _config(TRAIN_FUSED_SPATIAL=True, DROP_PATH_RATE=[0.2, 0.0, 0.0])
    model = build_uplift_upsample_transformer(config)
    params = init_model_params(model, seed=0)["params"]
    tx, _, _ = make_optimizer(config)
    state = TrainState(params=params, opt_state=tx.init(params), ema_params=None,
                       step=jnp.zeros([], jnp.int32))
    step = make_train_step(model, tx, config)
    batch = tuple(jnp.asarray(a) for a in _batch(config))
    with pltpu.force_tpu_interpret_mode():
        losses = []
        for _ in range(3):
            state, loss = step(state, batch)
            losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)


@pytest.mark.slow
def test_pallas_bwd_kernel_vs_xla_vjp():
    """Direct check of the hand-written backward kernel, droppath active."""
    from uplift_upsample_tpu.ops.pallas_spatial import (_xla_spatial_stack,
                                                        stack_spatial_params)
    from uplift_upsample_tpu.ops.pallas_spatial_bwd import fused_spatial_stack_bwd

    config = _config()
    model = build_uplift_upsample_transformer(config)
    params = init_model_params(model, seed=3)["params"]
    stacked = stack_spatial_params(params, model.spatial_depth)

    rng = np.random.default_rng(7)
    f = 128
    x_t = jnp.asarray(rng.normal(size=(17, 2, f)).astype(np.float32) * 0.3)
    g = jnp.asarray(rng.normal(size=(17, model.spatial_d_model, f))
                    .astype(np.float32))
    two_l = 2 * model.spatial_depth
    keep = (rng.uniform(size=(two_l, f)) > 0.25).astype(np.float32) / 0.75
    dps = jnp.asarray(keep)

    _, vjp_fn = jax.vjp(
        lambda s, x, d: _xla_spatial_stack(s, x, d, model.num_heads),
        stacked, x_t, dps)
    ds_ref, dx_ref, ddp_ref = vjp_fn(g)

    with pltpu.force_tpu_interpret_mode():
        ds, dx, ddp = fused_spatial_stack_bwd(
            x_t, stacked, dps, g, num_blocks=model.spatial_depth,
            num_heads=model.num_heads)

    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               atol=2e-4, rtol=1e-3, err_msg="dx")
    np.testing.assert_allclose(np.asarray(ddp), np.asarray(ddp_ref),
                               atol=2e-4, rtol=1e-3, err_msg="ddp")
    for name in ds:
        np.testing.assert_allclose(np.asarray(ds[name]),
                                   np.asarray(ds_ref[name]),
                                   atol=3e-4, rtol=1e-3, err_msg=name)


@pytest.mark.slow
def test_pallas_bwd_hpack_matches_fma():
    """attn="hpack" backward (head-packed lanes) == the per-head "fma"
    backward — identical math, only the vector-op packing differs."""
    from uplift_upsample_tpu.ops.pallas_spatial import stack_spatial_params
    from uplift_upsample_tpu.ops.pallas_spatial_bwd import fused_spatial_stack_bwd

    config = _config()
    model = build_uplift_upsample_transformer(config)
    params = init_model_params(model, seed=5)["params"]
    stacked = stack_spatial_params(params, model.spatial_depth)

    rng = np.random.default_rng(17)
    f = 128
    x_t = jnp.asarray(rng.normal(size=(17, 2, f)).astype(np.float32) * 0.3)
    g = jnp.asarray(rng.normal(size=(17, model.spatial_d_model, f))
                    .astype(np.float32))
    two_l = 2 * model.spatial_depth
    keep = (rng.uniform(size=(two_l, f)) > 0.25).astype(np.float32) / 0.75
    dps = jnp.asarray(keep)

    with pltpu.force_tpu_interpret_mode():
        ds_f, dx_f, ddp_f = fused_spatial_stack_bwd(
            x_t, stacked, dps, g, num_blocks=model.spatial_depth,
            num_heads=model.num_heads, attn="fma")
        ds_h, dx_h, ddp_h = fused_spatial_stack_bwd(
            x_t, stacked, dps, g, num_blocks=model.spatial_depth,
            num_heads=model.num_heads, attn="hpack")

    np.testing.assert_allclose(np.asarray(dx_h), np.asarray(dx_f),
                               atol=1e-6, rtol=1e-6, err_msg="dx")
    np.testing.assert_allclose(np.asarray(ddp_h), np.asarray(ddp_f),
                               atol=1e-6, rtol=1e-6, err_msg="ddp")
    for name in ds_f:
        np.testing.assert_allclose(np.asarray(ds_h[name]),
                                   np.asarray(ds_f[name]),
                                   atol=1e-6, rtol=1e-6, err_msg=name)


@pytest.mark.slow
def test_fused_train_grads_high3_rung():
    """TRAIN_MATMUL_PRECISION='high' (bf16x3 fwd+bwd): gradients must track
    the flax f32 reference to bf16x3 accuracy (~2^-16 relative) — the rung
    that halves the HIGHEST dot cost while staying above the reference's
    effective TF32 training precision."""
    with pltpu.force_tpu_interpret_mode():
        loss_h, grads_h = _run_steps(_config(TRAIN_FUSED_SPATIAL=True,
                                             TRAIN_MATMUL_PRECISION="high"))
    loss_x, grads_x = _run_steps(_config(TRAIN_FUSED_SPATIAL=False))

    assert np.isclose(loss_h, loss_x, atol=1e-4), (loss_h, loss_x)
    flat_h = jax.tree_util.tree_flatten_with_path(grads_h)[0]
    flat_x = {"/".join(str(k) for k in kp): v
              for kp, v in jax.tree_util.tree_flatten_with_path(grads_x)[0]}
    for kp, gh in flat_h:
        key = "/".join(str(k) for k in kp)
        gx = flat_x[key]
        scale = max(1e-3, float(np.max(np.abs(np.asarray(gx)))))
        np.testing.assert_allclose(np.asarray(gh), np.asarray(gx),
                                   atol=2e-4 * scale, rtol=0, err_msg=key)


def test_keyframe_sparse_train_grads_match_dense():
    """TRAIN_KEYFRAME_SPARSE gathers only real-input frames through the
    spatial kernels — masked frames' spatial compute has zero gradient, so
    sparse and dense paths must produce identical losses and gradients on a
    mixed-mask-stride batch."""
    config = _config(TRAIN_FUSED_SPATIAL=True, BATCH_SIZE=16,
                     TRAIN_KEYFRAME_SPARSE=False)
    # Mixed strides per sample (like the real generator's per-sample draw):
    # n=9 → counts 5 (stride 2 pattern) and 3 (stride 4), total 64 < 128.
    n = config.SEQUENCE_LENGTH
    masks = np.zeros((16, n), bool)
    masks[0::2, 0::2] = True
    masks[1::2, 0::4] = True
    batch = list(_batch(config))
    batch[-1] = masks
    batch = tuple(jnp.asarray(a) for a in batch)
    rngs = {name: jax.random.PRNGKey(i) for i, name in
            enumerate(("dropout", "droppath", "token_mask"))}

    from uplift_upsample_tpu.parallel.train_step import make_loss_fn
    model = build_uplift_upsample_transformer(config)
    params = init_model_params(model, seed=0)["params"]

    outs = {}
    for sparse in (False, True):
        config.TRAIN_KEYFRAME_SPARSE = sparse
        config.TRAIN_KEYFRAME_BUDGET = 128 if sparse else 0
        loss_fn = make_loss_fn(model, config)
        with pltpu.force_tpu_interpret_mode():
            outs[sparse] = jax.value_and_grad(loss_fn)(params, batch, rngs)

    loss_d, grads_d = outs[False]
    loss_s, grads_s = outs[True]
    assert np.isclose(float(loss_s), float(loss_d), atol=1e-5), \
        (float(loss_s), float(loss_d))
    flat_d = {"/".join(str(k) for k in kp): v for kp, v in
              jax.tree_util.tree_flatten_with_path(grads_d)[0]}
    for kp, gs in jax.tree_util.tree_flatten_with_path(grads_s)[0]:
        key = "/".join(str(k) for k in kp)
        np.testing.assert_allclose(np.asarray(gs), np.asarray(flat_d[key]),
                                   atol=5e-5, rtol=1e-3, err_msg=key)


def test_keyframe_sparse_overflow_poisons_loss():
    """A batch with more keyframes than the budget must NaN the loss (the
    loud-failure contract) instead of silently dropping keyframes.

    TRAIN_SPATIAL_BLOCK_F pinned to 128: the budget aligns up to the
    spatial tile (256 default would lift 128 past frames_total=144 and
    legitimately fall back to the dense path — no overflow to poison)."""
    config = _config(TRAIN_FUSED_SPATIAL=True, BATCH_SIZE=16,
                     TRAIN_KEYFRAME_SPARSE=True, TRAIN_KEYFRAME_BUDGET=128,
                     TRAIN_SPATIAL_BLOCK_F=128)
    batch = list(_batch(config))
    batch[-1] = np.ones((16, config.SEQUENCE_LENGTH), bool)  # 144 > 128
    batch = tuple(jnp.asarray(a) for a in batch)
    rngs = {name: jax.random.PRNGKey(i) for i, name in
            enumerate(("dropout", "droppath", "token_mask"))}

    from uplift_upsample_tpu.parallel.train_step import make_loss_fn
    model = build_uplift_upsample_transformer(config)
    params = init_model_params(model, seed=0)["params"]
    loss_fn = make_loss_fn(model, config)
    with pltpu.force_tpu_interpret_mode():
        loss = loss_fn(params, batch, rngs)
    assert not np.isfinite(float(loss))
