"""Training path for the temporal transformer stack: fused forward with
stochastic depth + a hand-written single-block Pallas backward.

Counterpart of ops/pallas_spatial_bwd.py for the temporal stage (reference
TransformerBlock semantics, vision_transformer.py:159-195, relu MLP). The
layout is v3's transposed one: channels (C=384) on sublanes, wpt·72
window-tokens on lanes; stochastic depth enters as per-window scale rows
(0 or 1/keep_prob tiled across each window's 72 lanes), so the kernel stays
RNG-free.

One kernel per block, both directions:
  - forward: LN1 → qkv → per-head masked attention → proj (·s1 row) →
    residual → LN2 → fc1/relu/fc2 (·s2 row) → residual; the block INPUT is
    the only residual saved for backward.
  - backward: replays the forward from the saved input, then walks the chain
    in reverse. Parameter grads are written as per-tile partials (leading
    grid axis) and summed by XLA; droppath-scale grads come back as
    sublane-reduced (1, R) rows segment-summed outside.

Enabled by default on TPU (TRAIN_FUSED_TEMPORAL="auto" in
parallel/train_step.py — measured faster than XLA autodiff at every batch
size; PERF_NOTES.md training table); gradient parity vs flax is pinned by
tests/test_fused_temporal_train.py.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_temporal_v3 import _dot_maker


def _ln_fwd(x, gamma, beta, eps):
    # x: (C, R); stats over C (sublanes)
    mu = jnp.mean(x, axis=0, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=0, keepdims=True)
    inv = 1.0 / jnp.sqrt(var + eps)
    xhat = xc * inv
    return xhat * gamma + beta, xhat, inv


def _ln_bwd(dy, xhat, inv, gamma):
    dxhat = dy * gamma
    m1 = jnp.mean(dxhat, axis=0, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=0, keepdims=True)
    return (dxhat - m1 - xhat * m2) * inv


def _block_ops(params: Dict, weights_dtype):
    """Operand list for one block: weights, their transposes, bias/LN cols."""
    col = lambda a: jnp.asarray(a, jnp.float32)[:, None]
    wqkv = jnp.concatenate(
        [jnp.asarray(params["attn"][w]["kernel"], jnp.float32).T
         for w in ("wq", "wk", "wv")], axis=0)  # (3C, C)
    bqkv = jnp.concatenate(
        [col(params["attn"][w]["bias"]) for w in ("wq", "wk", "wv")], axis=0)
    wp = jnp.asarray(params["attn"]["proj"]["kernel"], jnp.float32).T
    w1 = jnp.asarray(params["mlp"]["fc1"]["kernel"], jnp.float32).T
    w2 = jnp.asarray(params["mlp"]["fc2"]["kernel"], jnp.float32).T
    wd = lambda a: a.astype(weights_dtype)
    return [
        col(params["norm1"]["scale"]), col(params["norm1"]["bias"]),
        wd(wqkv), bqkv, wd(wqkv.T),
        wd(wp), col(params["attn"]["proj"]["bias"]), wd(wp.T),
        col(params["norm2"]["scale"]), col(params["norm2"]["bias"]),
        wd(w1), col(params["mlp"]["fc1"]["bias"]), wd(w1.T),
        wd(w2), col(params["mlp"]["fc2"]["bias"]), wd(w2.T),
    ]


_N_OPS = 16


def _vmem_limit(precision, r=288):
    """Scoped-VMEM cap for the train kernels (v5e: 128 MB physical).

    Measured needs: 65.76M at wpt=4 HIGH3 (hi/lo temporaries), 82.69M at
    wpt=8 DEFAULT (R=576 doubles the stack activations) — both past the
    64 MB default cap. Grant headroom by rung/tile-width, clamped to
    112 MB so the program still fits."""
    from .pallas_temporal_v3 import HIGH3
    mb = 64
    if precision == HIGH3:
        mb += 32
    if r > 288:
        mb += 32
    return min(mb, 112) * 1024 * 1024


def _make_block_kernels(wpt: int, s: int, c: int, hidden: int, num_heads: int,
                        precision):
    depth = c // num_heads
    scale_q = np.float32(1.0 / np.sqrt(depth))
    r = wpt * s
    dot = _dot_maker((((1,), (0,)), ((), ())), precision)
    dot_tt = _dot_maker((((0,), (0,)), ((), ())), precision)
    dot_nt = _dot_maker((((1,), (1,)), ((), ())), precision)

    def replay(x, addmask, ops):
        (ln1_g, ln1_b, wqkv, bqkv, _wqkv_t, wp, bp, _wp_t,
         ln2_g, ln2_b, w1, b1, _w1_t, w2, b2, _w2_t) = ops
        y, xhat1, inv1 = _ln_fwd(x, ln1_g[:], ln1_b[:], 1e-5)
        qkv = dot(wqkv[:].astype(jnp.float32), y) + bqkv[:]
        heads = []
        for h in range(num_heads):
            qh = qkv[h * depth:(h + 1) * depth] * scale_q
            kh = qkv[c + h * depth: c + (h + 1) * depth]
            vh = qkv[2 * c + h * depth: 2 * c + (h + 1) * depth]
            logits = dot_tt(qh, kh) + addmask
            m = jnp.max(logits, axis=1, keepdims=True)
            ex = jnp.exp(logits - m)
            attn = ex / jnp.sum(ex, axis=1, keepdims=True)  # (R_q, R_k)
            heads.append((qh, kh, vh, attn))
        ctx = jnp.concatenate([dot_nt(vh, attn) for _, _, vh, attn in heads],
                              axis=0)
        return y, xhat1, inv1, qkv, heads, ctx

    def fwd_kernel(x_ref, addmask_ref, keyrow_ref, dp_ref, *ops_and_out):
        ops, o_ref = ops_and_out[:_N_OPS], ops_and_out[-1]
        (ln1_g, ln1_b, wqkv, bqkv, _wqkv_t, wp, bp, _wp_t,
         ln2_g, ln2_b, w1, b1, _w1_t, w2, b2, _w2_t) = ops
        x = x_ref[0].astype(jnp.float32)
        addmask = addmask_ref[:] + keyrow_ref[0]
        s1 = dp_ref[0, 0:1, :]  # (1, R) droppath scale rows
        s2 = dp_ref[0, 1:2, :]
        _, _, _, _, _, ctx = replay(x, addmask, ops)
        proj = dot(wp[:].astype(jnp.float32), ctx) + bp[:]
        x2 = x + proj * s1
        z, _, _ = _ln_fwd(x2, ln2_g[:], ln2_b[:], 1e-5)
        h1 = jnp.maximum(dot(w1[:].astype(jnp.float32), z) + b1[:], 0.0)
        z2 = dot(w2[:].astype(jnp.float32), h1) + b2[:]
        o_ref[0] = x2 + z2 * s2

    def bwd_kernel(x_ref, addmask_ref, keyrow_ref, dp_ref, g_ref,
                   *ops_and_outs):
        ops = ops_and_outs[:_N_OPS]
        (dx_ref, ddp_ref, dln1_g_ref, dln1_b_ref, dwqkv_ref, dbqkv_ref,
         dwp_ref, dbp_ref, dln2_g_ref, dln2_b_ref, dw1_ref, db1_ref,
         dw2_ref, db2_ref) = ops_and_outs[_N_OPS:]
        (ln1_g, ln1_b, wqkv, bqkv, wqkv_t, wp, bp, wp_t,
         ln2_g, ln2_b, w1, b1, w1_t, w2, b2, w2_t) = ops

        x = x_ref[0].astype(jnp.float32)
        g = g_ref[0].astype(jnp.float32)
        addmask = addmask_ref[:] + keyrow_ref[0]
        s1 = dp_ref[0, 0:1, :]
        s2 = dp_ref[0, 1:2, :]

        # ---- replay ----
        y, xhat1, inv1 = _ln_fwd(x, ln1_g[:], ln1_b[:], 1e-5)
        qkv = dot(wqkv[:].astype(jnp.float32), y) + bqkv[:]
        heads = []
        for h in range(num_heads):
            qh = qkv[h * depth:(h + 1) * depth] * scale_q
            kh = qkv[c + h * depth: c + (h + 1) * depth]
            vh = qkv[2 * c + h * depth: 2 * c + (h + 1) * depth]
            logits = dot_tt(qh, kh) + addmask
            m = jnp.max(logits, axis=1, keepdims=True)
            ex = jnp.exp(logits - m)
            attn = ex / jnp.sum(ex, axis=1, keepdims=True)
            heads.append((qh, kh, vh, attn))
        ctx = jnp.concatenate([dot_nt(vh, attn) for _, _, vh, attn in heads],
                              axis=0)
        proj = dot(wp[:].astype(jnp.float32), ctx) + bp[:]
        x2 = x + proj * s1
        z, xhat2, inv2 = _ln_fwd(x2, ln2_g[:], ln2_b[:], 1e-5)
        pre1 = dot(w1[:].astype(jnp.float32), z) + b1[:]
        h1 = jnp.maximum(pre1, 0.0)
        z2 = dot(w2[:].astype(jnp.float32), h1) + b2[:]

        # ---- MLP branch backward: out = x2 + s2*z2 ----
        dz2 = g * s2
        ddp_row2 = jnp.sum(g * z2, axis=0, keepdims=True)  # (1, R)
        dw2_ref[0] = dot_nt(dz2, h1)              # (C, hidden)
        db2_ref[0] = jnp.sum(dz2, axis=1)[None, :]
        dh1 = dot(w2_t[:].astype(jnp.float32), dz2)
        dh1 = dh1 * (pre1 > 0.0).astype(jnp.float32)
        dw1_ref[0] = dot_nt(dh1, z)               # (hidden, C)
        db1_ref[0] = jnp.sum(dh1, axis=1)[None, :]
        dz = dot(w1_t[:].astype(jnp.float32), dh1)
        dln2_g_ref[0] = jnp.sum(dz * xhat2, axis=1)[None, :]
        dln2_b_ref[0] = jnp.sum(dz, axis=1)[None, :]
        dx2 = g + _ln_bwd(dz, xhat2, inv2, ln2_g[:])

        # ---- attention branch backward: x2 = x + s1*proj ----
        dproj = dx2 * s1
        ddp_row1 = jnp.sum(dx2 * proj, axis=0, keepdims=True)
        dwp_ref[0] = dot_nt(dproj, ctx)           # (C, C)
        dbp_ref[0] = jnp.sum(dproj, axis=1)[None, :]
        dctx = dot(wp_t[:].astype(jnp.float32), dproj)  # (C, R)

        dq_parts, dk_parts, dv_parts = [], [], []
        for h in range(num_heads):
            qh, kh, vh, attn = heads[h]
            dctx_h = dctx[h * depth:(h + 1) * depth]
            dattn = dot_tt(dctx_h, vh)            # (R_q, R_k)
            dv_h = dot(dctx_h, attn)              # (48, R_k)
            srow = jnp.sum(dattn * attn, axis=1, keepdims=True)
            dlogits = attn * (dattn - srow)
            dq_parts.append(dot_nt(kh, dlogits) * scale_q)  # (48, R_q)
            dk_parts.append(dot(qh, dlogits))     # (48, R_k)
            dv_parts.append(dv_h)
        dqkv = jnp.concatenate(dq_parts + dk_parts + dv_parts, axis=0)
        dwqkv_ref[0] = dot_nt(dqkv, y)            # (3C, C)
        dbqkv_ref[0] = jnp.sum(dqkv, axis=1)[None, :]
        dy = dot(wqkv_t[:].astype(jnp.float32), dqkv)
        dln1_g_ref[0] = jnp.sum(dy * xhat1, axis=1)[None, :]
        dln1_b_ref[0] = jnp.sum(dy, axis=1)[None, :]
        dx_ref[0] = dx2 + _ln_bwd(dy, xhat1, inv1, ln1_g[:])
        ddp_ref[0] = jnp.concatenate([ddp_row1, ddp_row2], axis=0)  # (2, R)

    return fwd_kernel, bwd_kernel


def _common_masks(b, s_in, s, wpt, key_mask):
    r = wpt * s
    n_tiles = (b * s) // r
    blkdiag = np.full((r, r), -1e9, np.float32)
    for w in range(wpt):
        blkdiag[w * s:(w + 1) * s, w * s:(w + 1) * s] = 0.0
    pad_row = np.zeros((s,), np.float32)
    pad_row[s_in:] = -1e9
    padrow_tile = jnp.asarray(np.tile(pad_row, wpt))[None, :]
    if key_mask is not None:
        km = jnp.pad(key_mask.astype(jnp.float32), ((0, 0), (0, s - s_in)),
                     constant_values=1.0) * -1e9
        km = jnp.minimum(km, jnp.asarray(pad_row)[None])
        keyrow = km.reshape(n_tiles, 1, r)
    else:
        keyrow = jnp.broadcast_to(padrow_tile, (n_tiles, 1, r))
    return jnp.asarray(blkdiag), keyrow, n_tiles, r


def _to_tiles(x, s, wpt):
    b, s_in, c = x.shape
    xp = jnp.pad(x, ((0, 0), (0, s - s_in), (0, 0))) if s != s_in else x
    n_tiles = (b * s) // (wpt * s)
    return xp.reshape(n_tiles, wpt * s, c).transpose(0, 2, 1)


def _from_tiles(xt, b, s, c, s_in):
    return xt.transpose(0, 2, 1).reshape(b, s, c)[:, :s_in]


def _scale_rows(dp_scales, s, wpt):
    """(2, B) per-branch per-window scales → (n_tiles, 2, R) lane rows."""
    two, b = dp_scales.shape
    rows = jnp.repeat(dp_scales, s, axis=1)            # (2, B·S)
    n_tiles = (b * s) // (wpt * s)
    return rows.reshape(two, n_tiles, wpt * s).transpose(1, 0, 2)


@functools.partial(jax.jit, static_argnames=("num_heads", "windows_per_tile",
                                             "precision", "weights_dtype"))
def fused_temporal_block_fwd(x, params: Dict, key_mask, dp_scales, *,
                             num_heads: int, windows_per_tile: int = 4,
                             precision=jax.lax.Precision.DEFAULT,
                             weights_dtype=jnp.float32):
    """One training-mode transformer block. dp_scales: (2, B) droppath."""
    b, s_in, c = x.shape
    s = -(-s_in // 8) * 8
    wpt = windows_per_tile
    while b % wpt != 0 and wpt > 1:
        wpt //= 2
    hidden = params["mlp"]["fc1"]["kernel"].shape[1]
    blkdiag, keyrow, n_tiles, r = _common_masks(b, s_in, s, wpt, key_mask)
    x_t = _to_tiles(x, s, wpt)
    dp_rows = _scale_rows(dp_scales, s, wpt)
    ops = _block_ops(params, weights_dtype)
    fwd_kernel, _ = _make_block_kernels(wpt, s, c, hidden, num_heads, precision)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    tile3 = lambda shape: pl.BlockSpec(shape, lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        fwd_kernel,
        grid=(n_tiles,),
        in_specs=[tile3((1, c, r)), full(blkdiag), tile3((1, 1, r)),
                  tile3((1, 2, r))] + [full(op) for op in ops],
        out_specs=tile3((1, c, r)),
        out_shape=jax.ShapeDtypeStruct((n_tiles, c, r), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit(precision, r)),
    )(x_t, blkdiag, keyrow, dp_rows, *ops)
    return _from_tiles(out, b, s, c, s_in)


@functools.partial(jax.jit, static_argnames=("num_heads", "windows_per_tile",
                                             "precision", "weights_dtype"))
def fused_temporal_block_bwd(x, params: Dict, key_mask, dp_scales, g, *,
                             num_heads: int, windows_per_tile: int = 4,
                             precision=jax.lax.Precision.DEFAULT,
                             weights_dtype=jnp.float32):
    """VJP of the block w.r.t. (x, params, dp_scales); recomputes in-kernel.

    Returns (dx (B,S,C), dparams dict, ddp (2, B))."""
    b, s_in, c = x.shape
    s = -(-s_in // 8) * 8
    wpt = windows_per_tile
    while b % wpt != 0 and wpt > 1:
        wpt //= 2
    hidden = params["mlp"]["fc1"]["kernel"].shape[1]
    blkdiag, keyrow, n_tiles, r = _common_masks(b, s_in, s, wpt, key_mask)
    x_t = _to_tiles(x, s, wpt)
    g_t = _to_tiles(g.astype(jnp.float32), s, wpt)
    dp_rows = _scale_rows(dp_scales, s, wpt)
    ops = _block_ops(params, weights_dtype)
    _, bwd_kernel = _make_block_kernels(wpt, s, c, hidden, num_heads, precision)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    tile3 = lambda shape: pl.BlockSpec(shape, lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)

    grad_shapes = [
        ("dln1_g", (1, c)), ("dln1_b", (1, c)),
        ("dwqkv", (3 * c, c)), ("dbqkv", (1, 3 * c)),
        ("dwp", (c, c)), ("dbp", (1, c)),
        ("dln2_g", (1, c)), ("dln2_b", (1, c)),
        ("dw1", (hidden, c)), ("db1", (1, hidden)),
        ("dw2", (c, hidden)), ("db2", (1, c)),
    ]
    out_specs = [tile3((1, c, r)), tile3((1, 2, r))]
    out_shapes = [jax.ShapeDtypeStruct((n_tiles, c, r), jnp.float32),
                  jax.ShapeDtypeStruct((n_tiles, 2, r), jnp.float32)]
    for _, shape in grad_shapes:
        out_specs.append(pl.BlockSpec(
            (1,) + shape, lambda i, nd=1 + len(shape): (i,) + (0,) * (nd - 1),
            memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((n_tiles,) + shape, jnp.float32))

    outs = pl.pallas_call(
        bwd_kernel,
        grid=(n_tiles,),
        in_specs=[tile3((1, c, r)), full(blkdiag), tile3((1, 1, r)),
                  tile3((1, 2, r)), tile3((1, c, r))]
        + [full(op) for op in ops],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit(precision, r)),
    )(x_t, blkdiag, keyrow, dp_rows, g_t, *ops)

    dx = _from_tiles(outs[0], b, s, c, s_in)
    # droppath rows: (n_tiles, 2, R) → (2, B) via per-window segment sums;
    # padded lanes carry zero grads (g is zero there)
    ddp_rows = outs[1].transpose(1, 0, 2).reshape(2, b, s)
    ddp = jnp.sum(ddp_rows, axis=2)
    partials = dict(zip([n for n, _ in grad_shapes], outs[2:]))
    summed = {k: jnp.sum(v, axis=0) for k, v in partials.items()}

    def split3(a):  # (3C, C) / (1, 3C) → per-projection pieces
        return a[:c], a[c:2 * c], a[2 * c:]

    dwq, dwk, dwv = split3(summed["dwqkv"])
    dbq, dbk, dbv = (summed["dbqkv"].reshape(-1)[:c],
                     summed["dbqkv"].reshape(-1)[c:2 * c],
                     summed["dbqkv"].reshape(-1)[2 * c:])
    dparams = {
        "norm1": {"scale": summed["dln1_g"].reshape(-1),
                  "bias": summed["dln1_b"].reshape(-1)},
        "attn": {
            "wq": {"kernel": dwq.T, "bias": dbq},
            "wk": {"kernel": dwk.T, "bias": dbk},
            "wv": {"kernel": dwv.T, "bias": dbv},
            "proj": {"kernel": summed["dwp"].T, "bias": summed["dbp"].reshape(-1)},
        },
        "norm2": {"scale": summed["dln2_g"].reshape(-1),
                  "bias": summed["dln2_b"].reshape(-1)},
        "mlp": {
            "fc1": {"kernel": summed["dw1"].T, "bias": summed["db1"].reshape(-1)},
            "fc2": {"kernel": summed["dw2"].T, "bias": summed["db2"].reshape(-1)},
        },
    }
    return dx, dparams, ddp


# ---------------------------------------------------------------------------
# Multi-block path: the whole temporal stack as grouped kernel calls that
# stay in the tiled (C, R) layout across blocks — one pad/transpose pair per
# step instead of one per block per direction (the wrapper round-trips
# measured to dominate the per-block path; PERF_NOTES round 3). Weights use
# the eval kernels' 12-operand layout (no transposed copies: backward
# contracts the other way via dot_tt), halving weight VMEM.
# ---------------------------------------------------------------------------


def _make_group_kernels(n_grp: int, wpt: int, s: int, c: int, hidden: int,
                        num_heads: int, precision, masked_flags):
    """Kernels for a group of `n_grp` blocks chained in-kernel.

    masked_flags: per-block bool — apply the key-mask row (True) or the
    pad-only row (False) to that block's attention.
    Operand layout per block: the 12 eval operands (_transposed_operands
    with q_scale=None — scale_q stays explicit here so weight grads are
    grads of the true parameters).
    """
    depth = c // num_heads
    scale_q = np.float32(1.0 / np.sqrt(depth))
    dot = _dot_maker((((1,), (0,)), ((), ())), precision)
    dot_tt = _dot_maker((((0,), (0,)), ((), ())), precision)
    dot_nt = _dot_maker((((1,), (1,)), ((), ())), precision)
    NB = 12

    def block_fwd(x, addmask, ops, s1, s2, want_saved=False):
        (ln1_g, ln1_b, wqkv, bqkv, wp, bp, ln2_g, ln2_b,
         w1, b1, w2, b2) = ops
        y, xhat1, inv1 = _ln_fwd(x, ln1_g[:], ln1_b[:], 1e-5)
        qkv = dot(wqkv[:].astype(jnp.float32), y) + bqkv[:]
        heads = []
        for h in range(num_heads):
            qh = qkv[h * depth:(h + 1) * depth] * scale_q
            kh = qkv[c + h * depth: c + (h + 1) * depth]
            vh = qkv[2 * c + h * depth: 2 * c + (h + 1) * depth]
            logits = dot_tt(qh, kh) + addmask
            m = jnp.max(logits, axis=1, keepdims=True)
            ex = jnp.exp(logits - m)
            attn = ex / jnp.sum(ex, axis=1, keepdims=True)
            heads.append((qh, kh, vh, attn))
        ctx = jnp.concatenate([dot_nt(vh, attn) for _, _, vh, attn in heads],
                              axis=0)
        proj = dot(wp[:].astype(jnp.float32), ctx) + bp[:]
        x2 = x + proj * s1
        z, xhat2, inv2 = _ln_fwd(x2, ln2_g[:], ln2_b[:], 1e-5)
        pre1 = dot(w1[:].astype(jnp.float32), z) + b1[:]
        h1 = jnp.maximum(pre1, 0.0)
        z2 = dot(w2[:].astype(jnp.float32), h1) + b2[:]
        out = x2 + z2 * s2
        if not want_saved:
            return out
        return out, (y, xhat1, inv1, heads, ctx, proj, x2, z, xhat2, inv2,
                     pre1, h1, z2)

    def fwd_kernel(x_ref, blkdiag_ref, keyrow_ref, padrow_ref, dp_ref,
                   *ops_and_out):
        ops_all = ops_and_out[:NB * n_grp]
        inter_refs = ops_and_out[NB * n_grp:-1]
        o_ref = ops_and_out[-1]
        x = x_ref[0].astype(jnp.float32)
        for b in range(n_grp):
            row = keyrow_ref if masked_flags[b] else padrow_ref
            addmask = blkdiag_ref[:] + row[0]
            s1 = dp_ref[0, 2 * b: 2 * b + 1, :]
            s2 = dp_ref[0, 2 * b + 1: 2 * b + 2, :]
            x = block_fwd(x, addmask, ops_all[NB * b: NB * (b + 1)], s1, s2)
            if b < n_grp - 1:
                inter_refs[b][0] = x
        o_ref[0] = x

    def bwd_kernel(x_ref, blkdiag_ref, keyrow_ref, padrow_ref, dp_ref, g_ref,
                   *rest):
        # rest: (n_grp-1) inter inputs, then n_grp*12 ops, then outputs:
        # dx, ddp (1, 2*n_grp, R), then 12 grad partials per block.
        inters = rest[:n_grp - 1]
        ops_all = rest[n_grp - 1: n_grp - 1 + NB * n_grp]
        outs = rest[n_grp - 1 + NB * n_grp:]
        dx_ref, ddp_ref = outs[0], outs[1]
        grad_refs = outs[2:]

        g = g_ref[0].astype(jnp.float32)
        ddp_rows = [None] * (2 * n_grp)
        for b in range(n_grp - 1, -1, -1):
            xb = (x_ref[0] if b == 0 else inters[b - 1][0]).astype(jnp.float32)
            row = keyrow_ref if masked_flags[b] else padrow_ref
            addmask = blkdiag_ref[:] + row[0]
            s1 = dp_ref[0, 2 * b: 2 * b + 1, :]
            s2 = dp_ref[0, 2 * b + 1: 2 * b + 2, :]
            ops = ops_all[NB * b: NB * (b + 1)]
            (ln1_g, ln1_b, wqkv, bqkv, wp, bp, ln2_g, ln2_b,
             w1, b1, w2, b2) = ops
            _, saved = block_fwd(xb, addmask, ops, s1, s2, want_saved=True)
            (y, xhat1, inv1, heads, ctx, proj, x2, z, xhat2, inv2,
             pre1, h1, z2) = saved
            gr = grad_refs[NB * b: NB * (b + 1)]
            (dln1_g_ref, dln1_b_ref, dwqkv_ref, dbqkv_ref, dwp_ref, dbp_ref,
             dln2_g_ref, dln2_b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref) = gr

            # MLP branch: out = x2 + s2*z2
            dz2 = g * s2
            ddp_rows[2 * b + 1] = jnp.sum(g * z2, axis=0, keepdims=True)
            dw2_ref[0] = dot_nt(dz2, h1)
            db2_ref[0] = jnp.sum(dz2, axis=1)[None, :]
            dh1 = dot_tt(w2[:].astype(jnp.float32), dz2)
            dh1 = dh1 * (pre1 > 0.0).astype(jnp.float32)
            dw1_ref[0] = dot_nt(dh1, z)
            db1_ref[0] = jnp.sum(dh1, axis=1)[None, :]
            dz = dot_tt(w1[:].astype(jnp.float32), dh1)
            dln2_g_ref[0] = jnp.sum(dz * xhat2, axis=1)[None, :]
            dln2_b_ref[0] = jnp.sum(dz, axis=1)[None, :]
            dx2 = g + _ln_bwd(dz, xhat2, inv2, ln2_g[:])

            # attention branch: x2 = x + s1*proj
            dproj = dx2 * s1
            ddp_rows[2 * b] = jnp.sum(dx2 * proj, axis=0, keepdims=True)
            dwp_ref[0] = dot_nt(dproj, ctx)
            dbp_ref[0] = jnp.sum(dproj, axis=1)[None, :]
            dctx = dot_tt(wp[:].astype(jnp.float32), dproj)

            dq_parts, dk_parts, dv_parts = [], [], []
            for h in range(num_heads):
                qh, kh, vh, attn = heads[h]
                dctx_h = dctx[h * depth:(h + 1) * depth]
                dattn = dot_tt(dctx_h, vh)
                dv_h = dot(dctx_h, attn)
                srow = jnp.sum(dattn * attn, axis=1, keepdims=True)
                dlogits = attn * (dattn - srow)
                dq_parts.append(dot_nt(kh, dlogits) * scale_q)
                dk_parts.append(dot(qh, dlogits))
                dv_parts.append(dv_h)
            dqkv = jnp.concatenate(dq_parts + dk_parts + dv_parts, axis=0)
            dwqkv_ref[0] = dot_nt(dqkv, y)
            dbqkv_ref[0] = jnp.sum(dqkv, axis=1)[None, :]
            dy = dot_tt(wqkv[:].astype(jnp.float32), dqkv)
            dln1_g_ref[0] = jnp.sum(dy * xhat1, axis=1)[None, :]
            dln1_b_ref[0] = jnp.sum(dy, axis=1)[None, :]
            g = dx2 + _ln_bwd(dy, xhat1, inv1, ln1_g[:])
        dx_ref[0] = g
        ddp_ref[0] = jnp.concatenate(ddp_rows, axis=0)  # (2*n_grp, R)

    return fwd_kernel, bwd_kernel


def _stack_group_masks(b, s_in, s, wpt, key_mask):
    """blkdiag, keyrow (mask+pad), padrow (pad only), tile counts."""
    r = wpt * s
    n_tiles = (b * s) // r
    blkdiag = np.full((r, r), -1e9, np.float32)
    for w in range(wpt):
        blkdiag[w * s:(w + 1) * s, w * s:(w + 1) * s] = 0.0
    pad_row = np.zeros((s,), np.float32)
    pad_row[s_in:] = -1e9
    padrow_tile = jnp.asarray(np.tile(pad_row, wpt))[None, :]
    padrow = jnp.broadcast_to(padrow_tile, (n_tiles, 1, r))
    if key_mask is not None:
        km = jnp.pad(key_mask.astype(jnp.float32), ((0, 0), (0, s - s_in)),
                     constant_values=1.0) * -1e9
        km = jnp.minimum(km, jnp.asarray(pad_row)[None])
        keyrow = km.reshape(n_tiles, 1, r)
    else:
        keyrow = padrow
    return jnp.asarray(blkdiag), keyrow, padrow, n_tiles, r


_GRAD_NAMES = ["dln1_g", "dln1_b", "dwqkv", "dbqkv", "dwp", "dbp",
               "dln2_g", "dln2_b", "dw1", "db1", "dw2", "db2"]


def _group_ops(params_tuple, weights_dtype):
    """12 eval-layout operands per block for the whole stack."""
    from .pallas_temporal import stack_temporal_params
    params = {f"temporal_block_{i + 1}": p
              for i, p in enumerate(params_tuple)}
    from .pallas_temporal_v3 import _transposed_operands
    stacked = stack_temporal_params(params, len(params_tuple))
    return _transposed_operands(stacked, len(params_tuple), weights_dtype)


def _grad_shapes(c, hidden):
    return [(1, c), (1, c), (3 * c, c), (1, 3 * c), (c, c), (1, c),
            (1, c), (1, c), (hidden, c), (1, hidden), (c, hidden), (1, c)]


def _fts_impl_fwd(x, params_tuple, key_mask, dp_all, num_heads, wpt_req,
                  weights_dtype, fmb, group_size,
                  precision=jax.lax.Precision.DEFAULT):
    """Forward through all blocks; returns (out, (x_t, inters, geometry))."""
    b, s_in, c = x.shape
    s = -(-s_in // 8) * 8
    wpt = wpt_req
    while b % wpt != 0 and wpt > 1:
        wpt //= 2
    hidden = params_tuple[0]["mlp"]["fc1"]["kernel"].shape[1]
    num_blocks = len(params_tuple)
    blkdiag, keyrow, padrow, n_tiles, r = _stack_group_masks(
        b, s_in, s, wpt, key_mask if fmb > 0 else None)
    x_t = _to_tiles(x, s, wpt)
    # (L, 2, B) → (n_tiles, 2L, R) lane rows, block-major
    dp_rows = _scale_rows(dp_all.reshape(2 * num_blocks, b), s, wpt)
    ops = _group_ops(params_tuple, weights_dtype)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    tile3 = lambda shape: pl.BlockSpec(shape, lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)

    inters = []
    out = x_t
    done = 0
    while done < num_blocks:
        n_grp = min(group_size, num_blocks - done)
        flags = tuple(done + i < fmb for i in range(n_grp))
        fwd_kernel, _ = _make_group_kernels(
            n_grp, wpt, s, c, hidden, num_heads, precision, flags)
        grp_ops = ops[12 * done: 12 * (done + n_grp)]
        dp_slice = dp_rows[:, 2 * done: 2 * (done + n_grp), :]
        n_inter = n_grp - 1
        out_shapes = ([jax.ShapeDtypeStruct((n_tiles, c, r), jnp.float32)]
                      * n_inter
                      + [jax.ShapeDtypeStruct((n_tiles, c, r), jnp.float32)])
        outs = pl.pallas_call(
            fwd_kernel,
            grid=(n_tiles,),
            in_specs=[tile3((1, c, r)), full(blkdiag), tile3((1, 1, r)),
                      tile3((1, 1, r)), tile3((1, 2 * n_grp, r))]
            + [full(op) for op in grp_ops],
            out_specs=[tile3((1, c, r))] * (n_inter + 1),
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_vmem_limit(precision, r)),
        )(out, blkdiag, keyrow, padrow, dp_slice, *grp_ops)
        group_input = out
        inters.append((group_input, list(outs[:n_inter])))
        out = outs[-1]
        done += n_grp

    geometry = (b, s_in, s, wpt, n_tiles, r, c, hidden, num_blocks)
    return _from_tiles(out, b, s, c, s_in), (inters, blkdiag, keyrow, padrow,
                                             dp_rows, ops, geometry)


def _fts_impl_bwd(res, g, num_heads, fmb, group_size, params_tuple,
                  weights_dtype, precision=jax.lax.Precision.DEFAULT):
    inters, blkdiag, keyrow, padrow, dp_rows, ops, geometry = res
    b, s_in, s, wpt, n_tiles, r, c, hidden, num_blocks = geometry

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    tile3 = lambda shape: pl.BlockSpec(shape, lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)

    g_t = _to_tiles(g.astype(jnp.float32), s, wpt)
    grad_shapes = _grad_shapes(c, hidden)
    summed_all = [None] * (12 * num_blocks)
    ddp_all = [None] * num_blocks

    # Walk groups in reverse, chaining the grad through tiled layout
    group_bounds = []
    done = 0
    while done < num_blocks:
        n_grp = min(group_size, num_blocks - done)
        group_bounds.append((done, n_grp))
        done += n_grp

    for gi in range(len(group_bounds) - 1, -1, -1):
        done, n_grp = group_bounds[gi]
        flags = tuple(done + i < fmb for i in range(n_grp))
        _, bwd_kernel = _make_group_kernels(
            n_grp, wpt, s, c, hidden, num_heads, precision, flags)
        grp_ops = ops[12 * done: 12 * (done + n_grp)]
        dp_slice = dp_rows[:, 2 * done: 2 * (done + n_grp), :]
        group_input, intra = inters[gi]

        out_specs = [tile3((1, c, r)), tile3((1, 2 * n_grp, r))]
        out_shapes = [jax.ShapeDtypeStruct((n_tiles, c, r), jnp.float32),
                      jax.ShapeDtypeStruct((n_tiles, 2 * n_grp, r),
                                           jnp.float32)]
        for bidx in range(n_grp):
            for shape in grad_shapes:
                out_specs.append(pl.BlockSpec(
                    (1,) + shape,
                    lambda i, nd=1 + len(shape): (i,) + (0,) * (nd - 1),
                    memory_space=pltpu.VMEM))
                out_shapes.append(
                    jax.ShapeDtypeStruct((n_tiles,) + shape, jnp.float32))

        outs = pl.pallas_call(
            bwd_kernel,
            grid=(n_tiles,),
            in_specs=[tile3((1, c, r)), full(blkdiag), tile3((1, 1, r)),
                      tile3((1, 1, r)), tile3((1, 2 * n_grp, r)),
                      tile3((1, c, r))]
            + [tile3((1, c, r))] * len(intra)
            + [full(op) for op in grp_ops],
            out_specs=out_specs,
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_vmem_limit(precision, r)),
        )(group_input, blkdiag, keyrow, padrow, dp_slice, g_t,
          *intra, *grp_ops)
        g_t = outs[0]
        ddp_rows = outs[1].transpose(1, 0, 2).reshape(2 * n_grp, b, s)
        for bidx in range(n_grp):
            ddp_all[done + bidx] = jnp.sum(
                ddp_rows[2 * bidx: 2 * bidx + 2], axis=2)
            for k in range(12):
                summed_all[12 * (done + bidx) + k] = jnp.sum(
                    outs[2 + 12 * bidx + k], axis=0)

    dx = _from_tiles(g_t, b, s, c, s_in)

    dparams = []
    for bidx in range(num_blocks):
        sm = dict(zip(_GRAD_NAMES, summed_all[12 * bidx: 12 * (bidx + 1)]))

        def split3(a):
            return a[:c], a[c:2 * c], a[2 * c:]

        dwq, dwk, dwv = split3(sm["dwqkv"])
        flat_b = sm["dbqkv"].reshape(-1)
        dparams.append({
            "norm1": {"scale": sm["dln1_g"].reshape(-1),
                      "bias": sm["dln1_b"].reshape(-1)},
            "attn": {
                "wq": {"kernel": dwq.T, "bias": flat_b[:c]},
                "wk": {"kernel": dwk.T, "bias": flat_b[c:2 * c]},
                "wv": {"kernel": dwv.T, "bias": flat_b[2 * c:]},
                "proj": {"kernel": sm["dwp"].T,
                         "bias": sm["dbp"].reshape(-1)},
            },
            "norm2": {"scale": sm["dln2_g"].reshape(-1),
                      "bias": sm["dln2_b"].reshape(-1)},
            "mlp": {
                "fc1": {"kernel": sm["dw1"].T,
                        "bias": sm["db1"].reshape(-1)},
                "fc2": {"kernel": sm["dw2"].T,
                        "bias": sm["db2"].reshape(-1)},
            },
        })
    ddp = jnp.stack(ddp_all, axis=0)  # (L, 2, B)
    return dx, tuple(dparams), ddp


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def fused_temporal_stack_train(x, params_tuple, key_mask, dp_all,
                               num_heads, windows_per_tile, weights_dtype,
                               first_masked_blocks, group_size=2,
                               precision=jax.lax.Precision.DEFAULT):
    """Training-mode temporal stack: all blocks through grouped Pallas
    kernels that stay tiled across blocks (fwd + hand-written bwd).

    x: (B, S, C); params_tuple: per-block param dicts; key_mask: (B, S)
    float 1=blocked (used for the first `first_masked_blocks` blocks);
    dp_all: (L, 2, B) stochastic-depth scales.
    """
    out, _ = _fts_impl_fwd(x, params_tuple, key_mask, dp_all, num_heads,
                           windows_per_tile, weights_dtype,
                           first_masked_blocks, group_size, precision)
    return out


def _fts_fwd_rule(x, params_tuple, key_mask, dp_all, num_heads, wpt,
                  weights_dtype, fmb, group_size, precision):
    out, res = _fts_impl_fwd(x, params_tuple, key_mask, dp_all, num_heads,
                             wpt, weights_dtype, fmb, group_size, precision)
    return out, (res, params_tuple)


def _fts_bwd_rule(num_heads, wpt, weights_dtype, fmb, group_size, precision,
                  residuals, g):
    res, params_tuple = residuals
    dx, dparams, ddp = _fts_impl_bwd(res, g, num_heads, fmb, group_size,
                                     params_tuple, weights_dtype, precision)
    return dx, dparams, None, ddp


fused_temporal_stack_train.defvjp(_fts_fwd_rule, _fts_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_temporal_block_train(x, params, key_mask, dp_scales,
                               num_heads, windows_per_tile, weights_dtype):
    """Training-mode transformer block (Pallas fwd + Pallas bwd).

    x: (B, S, C); key_mask: (B, S) float 1=blocked or None semantics handled
    by caller (pass an all-zeros mask when unmasked); dp_scales: (2, B)."""
    return fused_temporal_block_fwd(
        x, params, key_mask, dp_scales, num_heads=num_heads,
        windows_per_tile=windows_per_tile, weights_dtype=weights_dtype)


def _ftb_fwd(x, params, key_mask, dp_scales, num_heads, wpt, wdtype):
    out = fused_temporal_block_train(x, params, key_mask, dp_scales,
                                     num_heads, wpt, wdtype)
    return out, (x, params, key_mask, dp_scales)


def _ftb_bwd(num_heads, wpt, wdtype, residuals, g):
    x, params, key_mask, dp_scales = residuals
    dx, dparams, ddp = fused_temporal_block_bwd(
        x, params, key_mask, dp_scales, g, num_heads=num_heads,
        windows_per_tile=wpt, weights_dtype=wdtype)
    return dx, dparams, None, ddp


fused_temporal_block_train.defvjp(_ftb_fwd, _ftb_bwd)
