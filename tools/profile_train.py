"""Train-step stage decomposition (VERDICT r2 item 7).

Times pieces of the flagship training step (fwd+bwd+AdamW at B=512,
h36m_351 geometry, the bench.py --train configuration) with the same
dispatch-amortized slope method as bench.py: M steps chained through a
carried state inside one jitted lax.scan, slope between M=4 and M=16.

Variants:
  full      the whole step: value_and_grad + Keras-Adam/AdamW update
            (bench.py --train equivalent; EMA off like the bench)
  grad      value_and_grad only (params nudged by -1e-30*grads to keep the
            scan chain data-dependent; the nudge is one param-tree FMA)
  fwd       loss forward only (input nudged by the carried loss * 1e-30)
  opt       optimizer only: tx.update + apply_updates on captured grads
            (grads nudged by carry; opt_state/params carried)
  spatial   isolated fused spatial stack fwd+bwd (ops/pallas_spatial
            fused_spatial_train + its custom VJP) at the keyframe-sparse
            budget the shipped step uses; `spatial_dense` = all B*71 frames
  temporal  isolated fused temporal stack fwd+bwd
            (ops/pallas_temporal_bwd.fused_temporal_stack_train)

The residual full - (grad + opt) is jit/scan bookkeeping; grad - (spatial +
temporal + fwd-side glue) is the XLA tail's backward (s2t dense, strided
blocks 2+, heads, loss). Feed cost is measured separately end-to-end
(PERF_NOTES device-feed section): the materialize gather lives inside the
jitted step in real training and adds ~0 at B=512.

Usage: python tools/profile_train.py full --batch 512
Serialize through tools/tpu_queue.sh — one TPU process at a time.
"""

import argparse
import math
import os
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from uplift_upsample_tpu.configs import get_config
from uplift_upsample_tpu.models import (build_uplift_upsample_transformer,
                                        init_model_params)
from uplift_upsample_tpu.parallel import TrainState, make_optimizer
from uplift_upsample_tpu.parallel.train_step import make_loss_fn

M_SMALL = int(os.environ.get("PT_M_SMALL", 4))
M_LARGE = int(os.environ.get("PT_M_LARGE", 16))
REPS = int(os.environ.get("PT_REPS", 3))


def slope(loop, state0):
    """Best-of-REPS slope between M_SMALL and M_LARGE scan lengths."""

    def run(m):
        jax.device_get(loop(state0, m))  # compile + warm
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            jax.device_get(loop(state0, m))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(M_LARGE) - run(M_SMALL)) / (M_LARGE - M_SMALL)


def build(args):
    config = get_config(args.config)
    config.update_from({
        "BATCH_SIZE": args.batch,
        "OPTIMIZER": "AdamW", "OPTIMIZER_PARAMS": {}, "WEIGHT_DECAY": 4e-6,
        "EMA_ENABLED": False, "SCHEDULE": "ExponentialDecay",
        "SCHEDULE_PARAMS": {"initial_learning_rate": 4e-5,
                            "decay_steps": 6000, "decay_rate": 0.99,
                            "staircase": True},
        "TRAIN_MATMUL_PRECISION": args.precision,
        "TRAIN_TEMPORAL_WPT": args.wpt,
    })
    model = build_uplift_upsample_transformer(config)
    params = init_model_params(model, seed=0)["params"]
    return config, model, params


def make_batch(config, b):
    n, k = config.SEQUENCE_LENGTH, config.NUM_KEYPOINTS
    ms = config.MASK_STRIDE
    ms0 = (ms[0] if isinstance(ms, (list, tuple)) else ms) or 1
    rng = np.random.default_rng(0)
    return tuple(jnp.asarray(a) for a in (
        rng.normal(size=(b, n, k, 3)).astype(np.float32) * 0.1,
        rng.normal(size=(b, n, k, 2)).astype(np.float32) * 0.1,
        np.ones((b, n), np.float32),
        np.zeros((b, 11), np.float32),
        np.zeros((b,), np.int32), np.zeros((b,), np.int32),
        np.zeros((b,), np.int32),
        (np.arange(n) % ms0 == 0)[None].repeat(b, 0),
    ))


def rngs_for(base_key, step):
    step_key = jax.random.fold_in(base_key, step)
    return {name: jax.random.fold_in(step_key, i)
            for i, name in enumerate(("dropout", "droppath", "token_mask"))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variant")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--config", default="h36m_351")
    ap.add_argument("--precision", default="default")
    ap.add_argument("--wpt", type=int, default=8)
    args = ap.parse_args()
    v = args.variant
    b = args.batch

    config, model, params = build(args)
    batch = make_batch(config, b)
    base_key = jax.random.PRNGKey(0)

    if v in ("full", "grad", "fwd", "opt"):
        import optax
        tx, _, _ = make_optimizer(config)
        loss_fn = make_loss_fn(model, config, dataset_name="h36m")
        state0 = TrainState(params=params, opt_state=tx.init(params),
                            ema_params=None, step=jnp.zeros([], jnp.int32))

        if v == "full":
            @partial(jax.jit, static_argnums=1)
            def loop(state, m):
                def body(state, _):
                    loss, grads = jax.value_and_grad(loss_fn)(
                        state.params, batch, rngs_for(base_key, state.step))
                    updates, opt_state = tx.update(grads, state.opt_state,
                                                   state.params)
                    new = optax.apply_updates(state.params, updates)
                    return state.replace(params=new, opt_state=opt_state,
                                         step=state.step + 1), loss
                state, losses = jax.lax.scan(body, state, None, length=m)
                return losses[-1]
        elif v == "grad":
            @partial(jax.jit, static_argnums=1)
            def loop(state, m):
                def body(state, _):
                    loss, grads = jax.value_and_grad(loss_fn)(
                        state.params, batch, rngs_for(base_key, state.step))
                    new = jax.tree.map(lambda p, g: p - 1e-30 * g,
                                       state.params, grads)
                    return state.replace(params=new, step=state.step + 1), loss
                state, losses = jax.lax.scan(body, state, None, length=m)
                return losses[-1]
        elif v == "fwd":
            @partial(jax.jit, static_argnums=1)
            def loop(state, m):
                def body(carry, _):
                    c, step = carry
                    nudged = (batch[0], batch[1] + c * 1e-30) + batch[2:]
                    loss = loss_fn(state0.params, nudged,
                                   rngs_for(base_key, step))
                    return (loss, step + 1), loss
                (_, _), losses = jax.lax.scan(
                    body, (jnp.zeros([], jnp.float32), state.step),
                    None, length=m)
                return losses[-1]
        else:  # opt
            grads0 = jax.jit(jax.grad(loss_fn))(params, batch,
                                                rngs_for(base_key, 0))
            @partial(jax.jit, static_argnums=1)
            def loop(state, m):
                def body(state, _):
                    # carry-dependent grads (one tree-add) prevent hoisting
                    c = state.loss_sum * 1e-30
                    grads = jax.tree.map(lambda g: g + c, grads0)
                    updates, opt_state = tx.update(grads, state.opt_state,
                                                   state.params)
                    new = optax.apply_updates(state.params, updates)
                    lead = jax.tree.leaves(new)[0]
                    return state.replace(
                        params=new, opt_state=opt_state, step=state.step + 1,
                        loss_sum=jnp.sum(lead.ravel()[:1]) * 1e-10), None
                state, _ = jax.lax.scan(body, state, None, length=m)
                return state.loss_sum
        sec = slope(loop, state0)

    elif v.startswith("spatial"):
        from uplift_upsample_tpu.ops.pallas_spatial import (
            HIGH3, fused_spatial_train, make_droppath_scales,
            stack_spatial_params)
        prec = {"default": jax.lax.Precision.DEFAULT, "high": HIGH3,
                "mixed": jax.lax.Precision.HIGHEST,
                "highest": jax.lax.Precision.HIGHEST}[args.precision]
        frames_total = b * model.num_frames
        if v == "spatial_dense":
            frames = -(-frames_total // 128) * 128
        else:
            # the shipped keyframe-sparse budget (train_step.py kf_budget)
            ms_list = config.MASK_STRIDE
            counts = [-(-model.num_frames
                        // (m // math.gcd(config.SEQUENCE_STRIDE, m)))
                      for m in ms_list]
            mean = sum(counts) / len(counts)
            var = sum((c - mean) ** 2 for c in counts) / len(counts)
            want = mean * b + 8.0 * math.sqrt(var * b) + model.num_frames
            frames = int(min(frames_total, -(-want // 128) * 128))
            frames = -(-frames // 128) * 128  # kernel wants F % 128 == 0
        block_f = int(os.environ.get("PT_BLOCK_F", 128))
        sp_attn = os.environ.get("PT_SPATIAL_ATTN", "fma")
        frames = -(-frames // block_f) * block_f  # tile-exact for the sweep
        print(f"# frames={frames} (dense {frames_total}) block_f={block_f}",
              file=sys.stderr)
        rng = np.random.default_rng(0)
        x_t = jnp.asarray(rng.normal(size=(model.num_keypoints, 2, frames))
                          .astype(np.float32) * 0.3)
        stacked = stack_spatial_params(params, model.spatial_depth)
        rate = config.DROP_PATH_RATE
        top = rate[0] if isinstance(rate, (list, tuple)) else rate
        d = model.spatial_depth
        dp_rates = ([0.0] * d if d <= 1
                    else [top * i / (d - 1) for i in range(d)])
        scales = make_droppath_scales(jax.random.PRNGKey(1), dp_rates, frames)

        def fwd_loss(stacked_p, x):
            y = fused_spatial_train(stacked_p, x, scales, d,
                                    model.num_heads, prec, block_f,
                                    attn=sp_attn)
            return jnp.sum(y * 1e-3)

        grad_fn = jax.value_and_grad(fwd_loss, argnums=(0, 1))

        @partial(jax.jit, static_argnums=1)
        def loop(x0, m):
            def body(x, _):
                loss, (gs, gx) = grad_fn(stacked, x)
                return x + 1e-30 * gx, loss
            x, losses = jax.lax.scan(body, x0, None, length=m)
            return losses[-1]
        sec = slope(loop, x_t)

    elif v == "temporal":
        from uplift_upsample_tpu.ops.pallas_spatial import HIGH3
        from uplift_upsample_tpu.ops.pallas_temporal_bwd import (
            fused_temporal_stack_train)
        prec = {"default": jax.lax.Precision.DEFAULT, "high": HIGH3,
                "mixed": jax.lax.Precision.DEFAULT,
                "highest": jax.lax.Precision.HIGHEST}[args.precision]
        n = model.num_frames
        rng = np.random.default_rng(0)
        y0 = jnp.asarray(rng.normal(size=(b, n, model.temporal_d_model))
                         .astype(np.float32) * 0.3)
        inv_mask = jnp.zeros((b, n), jnp.float32)
        depth = model.temporal_depth
        dp_all = jnp.ones((depth, 2, b), jnp.float32)
        params_tuple = tuple(params[f"temporal_block_{i + 1}"]
                             for i in range(depth))
        fmb = (model.first_strided_token_attention_layer
               if model.has_strided_input else 0)

        def fwd_loss(pt, y):
            out = fused_temporal_stack_train(
                y, pt, inv_mask, dp_all, model.num_heads, args.wpt,
                jnp.float32, fmb, 2, prec)
            return jnp.sum(out * 1e-3)

        grad_fn = jax.value_and_grad(fwd_loss, argnums=(0, 1))

        @partial(jax.jit, static_argnums=1)
        def loop(y_in, m):
            def body(y, _):
                loss, (gp, gy) = grad_fn(params_tuple, y)
                return y + 1e-30 * gy, loss
            y, losses = jax.lax.scan(body, y_in, None, length=m)
            return losses[-1]
        sec = slope(loop, y0)

    elif v in ("tail", "tail_nohead1", "tail_strided1"):
        # DIRECT XLA-tail fwd+bwd (the round-6 decomposition's ~12.5 ms was
        # grad − spatial − temporal, a subtraction — this measures the stage
        # itself): the temporal_input splice (strided stack + heads) plus a
        # production-shaped loss, under the train rung's precision context.
        #   tail          full tail: strided blocks + head1 (full seq) +
        #                 head2 (central) + both loss terms
        #   tail_nohead1  central head + loss only (full_output cloned off)
        #                 → head1's share by subtraction
        #   tail_strided1 strided_entry=1 splice (blocks 2+ only)
        #                 → block 1's share by subtraction
        n = model.num_frames
        mid_f = n // 2
        kwargs = {"temporal_input": True}
        if v == "tail_nohead1":
            kwargs["full_output"] = False
        if v == "tail_strided1":
            kwargs["strided_entry"] = 1
        tail_model = model.clone(**kwargs)
        rng = np.random.default_rng(0)
        n_in = n
        if v == "tail_strided1":
            s0 = model.strides[0]
            n_in = (n - 3) // s0 + 1
        y0 = jnp.asarray(rng.normal(size=(b, n_in, model.temporal_d_model))
                         .astype(np.float32) * 0.3)
        sm = batch[7]
        seq_gt, central_gt = batch[0], batch[0][:, mid_f]

        def tail_loss(p, y):
            full, central = tail_model.apply({"params": p}, y,
                                             stride_mask=sm, training=False)
            loss = jnp.mean(jnp.sqrt(jnp.sum(
                (central - central_gt) ** 2, axis=-1) + 1e-12))
            if full is not None:
                loss += jnp.mean(jnp.sqrt(jnp.sum(
                    (full - seq_gt[:, : full.shape[1]]) ** 2, axis=-1)
                    + 1e-12))
            return loss

        grad_fn = jax.value_and_grad(tail_loss, argnums=(0, 1))

        @partial(jax.jit, static_argnums=1)
        def loop(y_in, m):
            def body(y, _):
                loss, (gp, gy) = grad_fn(params, y)
                return y + 1e-30 * gy, loss
            y, losses = jax.lax.scan(body, y_in, None, length=m)
            return losses[-1]
        sec = slope(loop, y0)

    else:
        raise ValueError(f"unknown variant {v!r}")

    print(f"{v} batch={b} precision={args.precision} wpt={args.wpt}: "
          f"{sec * 1e3:.2f} ms/step  ({b / sec:.0f} windows/s)")


if __name__ == "__main__":
    main()
