"""Jitted train/val step builders with data-parallel sharding.

Optimizer parity targets (reference `train.py:404-506`):
  - tfa.AdamW semantics: decoupled weight decay applied with its *own*
    schedule (same shape as the LR schedule, re-based to WEIGHT_DECAY), NOT
    multiplied by the learning rate.
  - Keras Adam (+amsgrad) for the "Adam" config.
  - Loss: central Σ‖·‖/(B·K) + sequence Σ‖·‖/(B·N·K), weighted; without
    temporal blocks, (w_c + w_s)·central.
  - EMA: ema ← ema − (1−d)(ema − w), d = min(EMA_DECAY, (1+g)/(10+g)).

The whole step — optional AMASS world→cam+projection, input masking,
forward, backward, optimizer, EMA — is one jitted function; with a Mesh the
batch is sharded on "dp", params replicated, and XLA emits the gradient psum
over ICI.
"""

from __future__ import annotations

import copy
import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import UpliftUpsampleConfig
from ..ops.camera import world_to_cam_and_2d
from ..utils.schedules import scheduler_by_name
from .mesh import batch_sharding, replicated_sharding


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_params: Any  # None when EMA disabled
    step: jax.Array  # global step (0-based)
    # Device-side per-step loss accumulator. The reference averages the epoch
    # loss over EVERY step (train.py:505,552-574 train_epoch_loss.update_state);
    # summing on device and fetching once per epoch reproduces that exactly
    # without a per-step device_get. Reset by the epoch loop at epoch start.
    loss_sum: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros([], jnp.float32))


class ScaleByKerasAdamState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any
    nu_max: Any  # None unless amsgrad


def _scale_by_keras_adam(b1=0.9, b2=0.999, eps=1e-8, amsgrad=False):
    """Adam direction with Keras optimizer_v2 semantics.

    The reference optimizers (tfa.AdamW's inner Adam and keras.Adam,
    reference train.py:407-419) use the ε-hat formulation:

        α_t = √(1−β₂ᵗ) / (1−β₁ᵗ)
        update = α_t · m_t / (√v_t + ε)        (v̂_max instead of v for amsgrad)

    — ε sits OUTSIDE the bias correction. optax.scale_by_adam computes
    m̂/(√v̂+ε) instead, which at early steps is equivalent to scaling ε by
    1/√(1−β₂ᵗ) (≈32× at t=1 for β₂=0.999): a real trajectory divergence
    that the multi-step parity test (tests/test_train.py) pins down.
    """

    def init_fn(params):
        mu = jax.tree.map(jnp.zeros_like, params)
        nu = jax.tree.map(jnp.zeros_like, params)
        nu_max = jax.tree.map(jnp.zeros_like, params) if amsgrad else None
        return ScaleByKerasAdamState(jnp.zeros([], jnp.int32), mu, nu, nu_max)

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree.map(lambda m, g: b1 * m + (1.0 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1.0 - b2) * g * g,
                          state.nu, updates)
        count = state.count + 1
        t = count.astype(jnp.float32)
        alpha = jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
        if amsgrad:
            nu_max = jax.tree.map(jnp.maximum, state.nu_max, nu)
            denom = nu_max
        else:
            nu_max = None
            denom = nu
        updates = jax.tree.map(lambda m, v: alpha * m / (jnp.sqrt(v) + eps),
                               mu, denom)
        return updates, ScaleByKerasAdamState(count, mu, nu, nu_max)

    return optax.GradientTransformation(init_fn, update_fn)


def _scheduled_decoupled_weight_decay(wd_schedule):
    """update ← update − wd(step)·param, independent of the learning rate."""

    def init_fn(params):
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("weight decay requires params")
        wd = wd_schedule(state.count)
        updates = jax.tree.map(lambda u, p: u - wd * p, updates, params)
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(config: UpliftUpsampleConfig):
    """Build the optax optimizer + (lr_schedule, wd_schedule) from config."""
    lr_schedule = scheduler_by_name(config.SCHEDULE)(**config.SCHEDULE_PARAMS)

    def keras_adam_kwargs(opt_params):
        # Keras spells them beta_1/beta_2/epsilon/amsgrad
        return dict(b1=opt_params.pop("beta_1", 0.9),
                    b2=opt_params.pop("beta_2", 0.999),
                    eps=opt_params.pop("epsilon", 1e-8),
                    amsgrad=opt_params.pop("amsgrad", False))

    if config.OPTIMIZER == "AdamW":
        wd_params = copy.deepcopy(config.SCHEDULE_PARAMS)
        wd_params["initial_learning_rate"] = config.WEIGHT_DECAY
        wd_schedule = scheduler_by_name(config.SCHEDULE)(**wd_params)
        opt_params = dict(config.OPTIMIZER_PARAMS)
        tx = optax.chain(
            _scale_by_keras_adam(**keras_adam_kwargs(opt_params)),
            optax.scale_by_learning_rate(lr_schedule),  # negates
            _scheduled_decoupled_weight_decay(wd_schedule),
        )
        assert not opt_params, f"unknown OPTIMIZER_PARAMS: {opt_params}"
        return tx, lr_schedule, wd_schedule
    elif config.OPTIMIZER == "Adam":
        opt_params = dict(config.OPTIMIZER_PARAMS)
        tx = optax.chain(
            _scale_by_keras_adam(**keras_adam_kwargs(opt_params)),
            optax.scale_by_learning_rate(lr_schedule))
        assert not opt_params, f"unknown OPTIMIZER_PARAMS: {opt_params}"
        return tx, lr_schedule, None
    raise ValueError(config.OPTIMIZER)


def _prepare_batch(batch, config, dataset_name):
    """Normalize a generator batch to (keypoints2d, keypoints3d_cam, stride_mask)."""
    if dataset_name == "amass":
        seq3d_world, cam18, _mask, _s, _a, _i, stride_mask = batch
        keypoints3d, keypoints2d = world_to_cam_and_2d(seq3d_world, cam18)
    else:
        seq3d, seq2d, _mask, _cam, _s, _a, _i, stride_mask = batch
        keypoints3d, keypoints2d = seq3d, seq2d
    return keypoints2d, keypoints3d, stride_mask


def make_loss_fn(model, config: UpliftUpsampleConfig, dataset_name: str = "h36m"):
    root = config.ROOT_KEYTPOINT
    mid = config.SEQUENCE_LENGTH // 2
    b, n, k = config.BATCH_SIZE, config.SEQUENCE_LENGTH, config.NUM_KEYPOINTS

    # Fused Pallas spatial forward with custom VJP (XLA backward). Requires
    # no spatial-stage dropout (shipped configs have DROP_RATE=0); stochastic
    # depth is handled via precomputed per-frame scales.
    from ..utils.backend import is_tpu_backend
    tfs = getattr(config, "TRAIN_FUSED_SPATIAL", "auto")
    if tfs == "auto":
        # Pallas train kernels only where Mosaic can lower them (TPU); XLA
        # elsewhere (CPU interpret mode is orders of magnitude slower, GPU
        # can't lower pltpu at all).
        tfs = is_tpu_backend()
    # The Pallas kernels implement no attention dropout, so fused paths are
    # only eligible when every dropout knob is 0 (all shipped configs).
    fused_spatial = (bool(tfs)
                     and model.spatial_depth > 0 and config.DROP_RATE == 0
                     and config.ATTENTION_DROP_RATE == 0
                     and config.TOKEN_MASK_RATE == 0)
    # Frames per grid step for the fused spatial kernels: fatter tiles
    # amortize the per-grid-step floor (PERF_NOTES round-6 decomposition —
    # the kernel is floor-bound at the sparse budget).
    sp_block_f = int(getattr(config, "TRAIN_SPATIAL_BLOCK_F", 128) or 128)
    # Attention packing inside the fused spatial kernels ("fma" per-head
    # rank-3 loops | "hpack" head-packed lanes — identical math, ~8x fewer
    # vector-op issues; see ops/pallas_spatial.attention_hpack).
    sp_attn = str(getattr(config, "TRAIN_SPATIAL_ATTN", "fma") or "fma")
    # Fused Pallas temporal blocks in training (custom VJP fwd+bwd,
    # ops/pallas_temporal_bwd.py). Same eligibility rules.
    tft = getattr(config, "TRAIN_FUSED_TEMPORAL", "auto")
    if tft == "auto":
        tft = is_tpu_backend()
    fused_temporal = (bool(tft)
                      and fused_spatial and model.temporal_depth > 0)
    # Strided block 1 through its own Pallas fwd+bwd pair
    # (ops/pallas_strided_bwd.py); head1 computed inline from the temporal
    # output, blocks 2+ and head2 stay in the flax tail. The first strided
    # block's drop-path rate is structurally 0 (top·i/(depth-1) at i=0), so
    # the kernel needs no stochastic-depth machinery.
    tfs2 = getattr(config, "TRAIN_FUSED_STRIDED", "auto")
    if tfs2 == "auto":
        tfs2 = is_tpu_backend()
    fused_strided = (bool(tfs2) and fused_temporal
                     and len(model.strides) > 0
                     and model.paddings is not None
                     and tuple(model.paddings[0]) == (0, 0)
                     and model.full_output and not model.output_bn)
    tail = model.clone(spatial_input=True) if fused_spatial else None
    tail_t = (model.clone(temporal_input=True) if fused_temporal else None)
    tail_st = (model.clone(temporal_input=True, strided_entry=1)
               if fused_strided else None)
    # Train matmul-precision rung for the fused kernels (fwd AND bwd dots).
    # "mixed" preserves the shipped round-2 behavior (spatial HIGHEST,
    # temporal DEFAULT); "high" = bf16x3 everywhere — above the reference's
    # effective training precision (TF 2.4 on Ampere runs matmuls in TF32,
    # 10-bit mantissa) at roughly half the HIGHEST dot cost.
    from ..ops.pallas_spatial import HIGH3
    _rung = getattr(config, "TRAIN_MATMUL_PRECISION", "mixed") or "mixed"
    sp_train_prec, tm_train_prec = {
        "mixed": (jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT),
        "default": (jax.lax.Precision.DEFAULT, jax.lax.Precision.DEFAULT),
        "high": (HIGH3, HIGH3),
        "highest": (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGHEST),
    }[_rung]
    if fused_spatial:
        def _rates(stage, depth):
            rate = config.DROP_PATH_RATE
            top = (rate[stage] if isinstance(rate, (list, tuple)) else rate)
            return ([0.0] * depth if depth <= 1 else
                    [top * i / (depth - 1) for i in range(depth)])
        dp_rates = _rates(0, model.spatial_depth)
        dp_rates_t = _rates(1, model.temporal_depth) if fused_temporal else []

    def _temporal_train(params, y, stride_mask, rngs):
        """s2t dense + strided-token + PE (XLA) → fused train stack → tail.

        All temporal blocks run through grouped multi-block kernel calls
        (fused_temporal_stack_train) that stay in the tiled layout across
        blocks — one pad/transpose pair per direction instead of one per
        block (the dominant cost of the per-block path)."""
        from ..ops.pallas_temporal_bwd import fused_temporal_stack_train
        fc = params["spatial_to_temporal_fc"]
        y = y @ fc["kernel"] + fc["bias"]
        inv_mask = jnp.zeros((y.shape[0], y.shape[1]), jnp.float32)
        if model.has_strided_input:
            sm = stride_mask.astype(y.dtype)[..., None]
            y = sm * y + (1.0 - sm) * params["strided_input_token"][None, None, :]
            inv_mask = 1.0 - stride_mask.astype(jnp.float32)
        y = y + params["temporal_pe"]
        fmb = (model.first_strided_token_attention_layer
               if model.has_strided_input else 0)
        dp_rows = []
        for i in range(model.temporal_depth):
            key = jax.random.fold_in(rngs["droppath"], 100 + i)
            rate = dp_rates_t[i]
            if rate == 0.0:
                dp_rows.append(jnp.ones((2, y.shape[0]), jnp.float32))
            else:
                keep = 1.0 - rate
                dp_rows.append(jnp.floor(keep + jax.random.uniform(
                    key, (2, y.shape[0]))) / keep)
        dp_all = jnp.stack(dp_rows, axis=0)  # (L, 2, B)
        params_tuple = tuple(params[f"temporal_block_{i + 1}"]
                             for i in range(model.temporal_depth))
        y = fused_temporal_stack_train(
            y, params_tuple, inv_mask, dp_all, model.num_heads,
            int(getattr(config, "TRAIN_TEMPORAL_WPT", 4) or 4),
            jnp.float32, fmb, 2, tm_train_prec)
        if fused_strided:
            from ..ops.pallas_strided_bwd import fused_strided_block1_train
            fc_t = params["temporal_fc"]
            full = (y @ fc_t["kernel"] + fc_t["bias"]).reshape(
                y.shape[0], y.shape[1], config.NUM_KEYPOINTS, 3)
            pre = fused_strided_block1_train(
                y, (params["strided_temporal_block_1"],
                    params["strided_temporal_pe_1"]),
                model.num_heads,
                int(getattr(config, "TRAIN_TEMPORAL_WPT", 4) or 4),
                model.num_frames, tm_train_prec)
            s0 = model.strides[0]
            n_out = (model.num_frames - 3) // s0 + 1
            y2 = pre[:, : (n_out - 1) * s0 + 1: s0]
            _, central = tail_st.apply({"params": params}, y2,
                                       stride_mask=stride_mask,
                                       training=True, rngs=rngs)
            return full, central
        return tail_t.apply({"params": params}, y, stride_mask=stride_mask,
                            training=True, rngs=rngs)

    # Keyframe-sparse spatial training: the model replaces every masked
    # frame's s2t feature with the learned token (uplift_upsample.py:177), so
    # masked frames' spatial compute contributes ZERO gradient — only the
    # ~59% of frames carrying real input (mask strides {5,10,20} → densities
    # {1, 1/2, 1/4}) need the spatial fwd+bwd. The per-batch keyframe count
    # is data-dependent, so frames are gathered into a STATIC budget =
    # mean + 8σ of the config's mask-stride mix (overflow odds ~1e-11/step;
    # an overflow poisons the loss with NaN so it can never pass silently).
    # Multichip note: the gather spans the global batch, so under a dp mesh
    # GSPMD may insert cross-device collectives — shard-local budgets
    # (shard_map) are the refinement if that shows up in profiles; small
    # per-chip batches fall back to dense anyway (budget ≥ frames).
    kf_budget = None
    if (fused_spatial and model.has_strided_input
            and bool(getattr(config, "TRAIN_KEYFRAME_SPARSE", True))):
        ms = config.MASK_STRIDE
        ms_list = ms if isinstance(ms, (list, tuple)) else [ms]
        if ms_list and all(isinstance(m, int) and m >= 1 for m in ms_list):
            import math as _math
            counts = [-(-model.num_frames
                        // (m // _math.gcd(config.SEQUENCE_STRIDE, m)))
                      for m in ms_list]
            mean = sum(counts) / len(counts)
            var = sum((cnt - mean) ** 2 for cnt in counts) / len(counts)
            frames_total = b * model.num_frames
            want = (mean * b + 8.0 * _math.sqrt(var * b)
                    + model.num_frames)
            budget_cfg = int(getattr(config, "TRAIN_KEYFRAME_BUDGET", 0) or 0)
            if budget_cfg:
                want = budget_cfg
            align = max(128, sp_block_f)
            budget = int(min(frames_total, -(-want // align) * align))
            if budget < frames_total:
                kf_budget = budget

    def apply_model(params, x, stride_mask, rngs):
        if fused_spatial:
            from ..ops.pallas_spatial import (fused_spatial_train,
                                              make_droppath_scales,
                                              stack_spatial_params)
            bb, nn_, pp, cc = x.shape
            frames = bb * nn_
            stacked = stack_spatial_params(params, model.spatial_depth)
            if kf_budget is not None:
                flat_sm = stride_mask.reshape(frames).astype(bool)
                ids = jnp.arange(frames, dtype=jnp.int32)
                # keyframes first (ascending), then non-keyframes: the first
                # kf_budget rows hold every keyframe unless overflow
                order = jnp.argsort(jnp.where(flat_sm, ids, frames + ids)
                                    )[:kf_budget]
                xg = x.reshape(frames, pp, cc)[order]
                x_t = xg.transpose(1, 2, 0)  # (P, 2, budget); budget % 128 == 0
                scales = make_droppath_scales(rngs["droppath"], dp_rates,
                                              frames)[:, order]
                y = fused_spatial_train(stacked, x_t, scales,
                                        model.spatial_depth, model.num_heads,
                                        sp_train_prec, sp_block_f,
                                        sp_attn)
                inv = (jnp.cumsum(flat_sm.astype(jnp.int32)) - 1).clip(0)
                sp = y.transpose(2, 0, 1).reshape(
                    kf_budget, pp * model.spatial_d_model)[inv]
                sp = sp.reshape(bb, nn_, pp * model.spatial_d_model)
                # Overflow guard: a dropped keyframe would silently read a
                # wrong row — poison the loss instead (NaN trips the train
                # loop's guards loudly).
                overflow = jnp.sum(flat_sm) > kf_budget
                sp = jnp.where(overflow, jnp.float32(jnp.nan), sp)
            else:
                x_t = x.reshape(frames, pp, cc).transpose(1, 2, 0)
                pad = (-frames) % max(128, sp_block_f)
                if pad:
                    x_t = jnp.pad(x_t, ((0, 0), (0, 0), (0, pad)))
                scales = make_droppath_scales(rngs["droppath"], dp_rates,
                                              frames + pad)
                y = fused_spatial_train(stacked, x_t, scales,
                                        model.spatial_depth, model.num_heads,
                                        sp_train_prec, sp_block_f,
                                        sp_attn)
                sp = y[:, :, :frames].transpose(2, 0, 1).reshape(
                    bb, nn_, pp * model.spatial_d_model)
            if fused_temporal:
                return _temporal_train(params, sp, stride_mask, rngs)
            if model.has_strided_input:
                return tail.apply({"params": params}, sp, stride_mask=stride_mask,
                                  training=True, rngs=rngs)
            return tail.apply({"params": params}, sp, training=True, rngs=rngs)
        if model.has_strided_input:
            return model.apply({"params": params}, x, stride_mask=stride_mask,
                               training=True, rngs=rngs)
        return model.apply({"params": params}, x, training=True, rngs=rngs)

    def loss_fn(params, batch, rngs):
        keypoints2d, keypoints3d, stride_mask = _prepare_batch(batch, config, dataset_name)
        keypoints3d = keypoints3d - keypoints3d[:, :, root:root + 1, :]
        central_gt = keypoints3d[:, mid]

        x = keypoints2d
        if model.has_strided_input:
            x = x * stride_mask[:, :, None, None].astype(x.dtype)
        pred_seq, pred_central = apply_model(params, x, stride_mask, rngs)

        central_loss = jnp.sum(jnp.linalg.norm(
            central_gt - pred_central.astype(jnp.float32), axis=-1)) / (b * k)
        if config.TEMPORAL_TRANSFORMER_BLOCKS > 0:
            sequence_loss = jnp.sum(jnp.linalg.norm(
                keypoints3d - pred_seq.astype(jnp.float32), axis=-1)) / (b * n * k)
            loss = (config.LOSS_WEIGHT_CENTER * central_loss
                    + config.LOSS_WEIGHT_SEQUENCE * sequence_loss)
        else:
            loss = (config.LOSS_WEIGHT_CENTER + config.LOSS_WEIGHT_SEQUENCE) * central_loss
        return loss

    return loss_fn


def make_train_step(model, tx, config: UpliftUpsampleConfig, dataset_name: str = "h36m",
                    mesh=None, rng_seed: int = 0, device_feed=None):
    """Returns jitted train_step(state, batch) → (state, loss).

    device_feed: a data.device_feed.*DeviceFeed — the step then takes the
    feed's per-row PLAN tuple instead of a materialized batch and gathers the
    windows on device from the feed's resident pose store (~200x less
    host→device traffic per step; bit-identical batches)."""
    loss_fn = make_loss_fn(model, config, dataset_name)
    base_key = jax.random.PRNGKey(rng_seed)
    ema_enabled = bool(config.EMA_ENABLED)
    ema_decay_cap = config.EMA_DECAY if ema_enabled else 0.0
    if device_feed is not None:
        store, mat = device_feed.store, device_feed.materialize
        pad_edge = device_feed.pad_edge

    def step_fn(state: TrainState, batch):
        if device_feed is not None:
            batch = mat(store, batch, pad_edge)
        step_key = jax.random.fold_in(base_key, state.step)
        rngs = {name: jax.random.fold_in(step_key, i)
                for i, name in enumerate(("dropout", "droppath", "token_mask"))}
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rngs)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        ema_params = state.ema_params
        if ema_enabled:
            g = state.step.astype(jnp.float32)
            decay = jnp.minimum(ema_decay_cap, (1.0 + g) / (10.0 + g))
            ema_params = jax.tree.map(
                lambda e, w: e - (1.0 - decay) * (e - w), ema_params, params)

        return TrainState(params=params, opt_state=opt_state,
                          ema_params=ema_params, step=state.step + 1,
                          loss_sum=state.loss_sum + loss), loss

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=0)
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(step_fn, donate_argnums=0,
                   in_shardings=(repl, data), out_shardings=(repl, repl))


def make_val_step(model, config: UpliftUpsampleConfig, dataset_name: str = "h36m",
                  mesh=None, device_feed=None):
    """Returns jitted val_step(params, batch) → (pred_central, loss).

    Applies optional flip-TTA averaging on the central prediction, like the
    reference validation loop (`train.py:608-627`). With `device_feed`, batch
    is the feed's plan tuple and materializes on device (see make_train_step).
    """
    root = config.ROOT_KEYTPOINT
    mid = config.SEQUENCE_LENGTH // 2
    b, n, k = config.BATCH_SIZE, config.SEQUENCE_LENGTH, config.NUM_KEYPOINTS
    flip_idx = jnp.asarray(config.AUGM_FLIP_KEYPOINT_ORDER, dtype=jnp.int32)
    if device_feed is not None:
        feed_store, feed_mat = device_feed.store, device_feed.materialize
        feed_pad_edge = device_feed.pad_edge

    def forward(params, keypoints2d, stride_mask):
        x = keypoints2d
        if model.has_strided_input:
            x = x * stride_mask[:, :, None, None].astype(x.dtype)
            return model.apply({"params": params}, x, stride_mask=stride_mask,
                               training=False)
        return model.apply({"params": params}, x, training=False)

    def step_fn(params, batch):
        if device_feed is not None:
            batch = feed_mat(feed_store, batch, feed_pad_edge)
        keypoints2d, keypoints3d, stride_mask = _prepare_batch(batch, config, dataset_name)
        keypoints3d = keypoints3d - keypoints3d[:, :, root:root + 1, :]
        central_gt = keypoints3d[:, mid]

        pred_seq, pred_central = forward(params, keypoints2d, stride_mask)
        central_loss = jnp.sum(jnp.linalg.norm(
            central_gt - pred_central.astype(jnp.float32), axis=-1)) / (b * k)
        loss = central_loss
        if config.TEMPORAL_TRANSFORMER_BLOCKS > 0:
            sequence_loss = jnp.sum(jnp.linalg.norm(
                keypoints3d - pred_seq.astype(jnp.float32), axis=-1)) / (b * n * k)
            loss = central_loss + sequence_loss

        if config.EVAL_FLIP:
            flipped_in = jnp.concatenate(
                [-keypoints2d[..., :1], keypoints2d[..., 1:]], axis=-1)[:, :, flip_idx]
            _, f_central = forward(params, flipped_in, stride_mask)
            f_central = jnp.concatenate(
                [-f_central[..., :1], f_central[..., 1:]], axis=-1)[:, flip_idx]
            pred_central = (pred_central + f_central) / 2.0

        return pred_central, central_gt, loss

    if mesh is None:
        return jax.jit(step_fn)
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(step_fn, in_shardings=(repl, data),
                   out_shardings=(data, data, repl))
