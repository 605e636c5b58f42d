"""Training path for strided block 1: fused forward + hand-written backward.

Counterpart of ops/pallas_temporal_bwd.py for the first strided transformer
block (reference StridedTransformerBlock, uplift_upsample_transformer.py:
93-160: per-call PE, full attention over the window, StridedMLP with a
k=3/VALID conv, crop-both-ends + ::stride residual). Layout is the v3
transposed one: channels on sublanes, wpt·s window-tokens on lanes; the
conv and the crop-residual are lane shifts, applied pre-selection —
the caller slices `out[:, :(n_out-1)·s0+1 : s0]` and XLA's slice transpose
routes cotangents back to the selected lanes only.

Stochastic depth is structurally absent here: the reference's per-stage
drop-path schedule assigns rate top·i/(depth-1), which is 0 for the first
block of the strided stage — asserted at the call site.

Backward replays the forward from the saved block input (the only residual
kept) and writes per-tile parameter-gradient partials summed by XLA.
Gradient parity vs flax pinned by tests/test_fused_strided_train.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_strided import _OP_ORDER, stack_strided_block1_params
from .pallas_temporal_bwd import _ln_bwd, _ln_fwd
from .pallas_temporal_v3 import _dot_maker


def _make_kernels(wpt: int, s: int, c: int, hidden: int, num_heads: int,
                  precision):
    depth = c // num_heads
    scale_q = np.float32(1.0 / np.sqrt(depth))
    r = wpt * s
    dot = _dot_maker((((1,), (0,)), ((), ())), precision)
    dot_tt = _dot_maker((((0,), (0,)), ((), ())), precision)
    dot_nt = _dot_maker((((1,), (1,)), ((), ())), precision)

    def shl(a, j):  # shift lanes left by j, zero-fill tail
        if j == 0:
            return a
        return jnp.concatenate(
            [a[:, j:], jnp.zeros((a.shape[0], j), a.dtype)], axis=1)

    def shr(a, j):  # shift lanes right by j, zero-fill head
        if j == 0:
            return a
        return jnp.concatenate(
            [jnp.zeros((a.shape[0], j), a.dtype), a[:, :-j]], axis=1)

    def replay(x_in, addmask, ops):
        (ln1_g, ln1_b, wqkv, bqkv, wp, bp, ln2_g, ln2_b,
         w1, b1, wc0, wc1, wc2, bc, pe) = ops
        pe_t = jnp.concatenate([pe[:].astype(jnp.float32)] * wpt, axis=1)
        x = x_in + pe_t
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
        x2 = x + proj
        z, xhat2, inv2 = _ln_fwd(x2, ln2_g[:], ln2_b[:], 1e-5)
        pre1 = dot(w1[:].astype(jnp.float32), z) + b1[:]
        h1 = jnp.maximum(pre1, 0.0)
        return (x, y, xhat1, inv1, qkv, heads, ctx, proj, x2, z, xhat2, inv2,
                pre1, h1)

    N_OPS = len(_OP_ORDER)

    def fwd_kernel(x_ref, addmask_ref, padrow_ref, *ops_and_out):
        ops, o_ref = ops_and_out[:N_OPS], ops_and_out[-1]
        (_, _, wqkv, _, _, _, _, _, _, _, wc0, wc1, wc2, bc, _) = ops
        x_in = x_ref[0].astype(jnp.float32)
        addmask = addmask_ref[:] + padrow_ref[0]
        out = replay(x_in, addmask, ops)
        x2, h1 = out[8], out[13]
        conv = dot(wc0[:].astype(jnp.float32), h1)
        conv += shl(dot(wc1[:].astype(jnp.float32), h1), 1)
        conv += shl(dot(wc2[:].astype(jnp.float32), h1), 2)
        o_ref[0] = shl(x2, 1) + conv + bc[:]

    def bwd_kernel(x_ref, addmask_ref, padrow_ref, g_ref, esum_ref,
                   *ops_and_outs):
        ops = ops_and_outs[:N_OPS]
        (dx_ref, dln1_g_ref, dln1_b_ref, dwqkv_ref, dbqkv_ref, dwp_ref,
         dbp_ref, dln2_g_ref, dln2_b_ref, dw1_ref, db1_ref, dwc0_ref,
         dwc1_ref, dwc2_ref, dbc_ref, dpe_ref) = ops_and_outs[N_OPS:]
        (ln1_g, ln1_b, wqkv, bqkv, wp, bp, ln2_g, ln2_b,
         w1, b1, wc0, wc1, wc2, bc, pe) = ops

        x_in = x_ref[0].astype(jnp.float32)
        g = g_ref[0].astype(jnp.float32)
        addmask = addmask_ref[:] + padrow_ref[0]
        (x, y, xhat1, inv1, qkv, heads, ctx, proj, x2, z, xhat2, inv2,
         pre1, h1) = replay(x_in, addmask, ops)

        # out = shl(x2, 1) + Σ_j shl(Wcj h1, j) + bc
        dbc_ref[0] = jnp.sum(g, axis=1)[None, :]
        dh1 = None
        for j, (wc, dwc_ref) in enumerate(((wc0, dwc0_ref), (wc1, dwc1_ref),
                                           (wc2, dwc2_ref))):
            gj = shr(g, j)
            dwc_ref[0] = dot_nt(gj, h1)
            piece = dot_tt(wc[:].astype(jnp.float32), gj)
            dh1 = piece if dh1 is None else dh1 + piece
        dpre1 = dh1 * (pre1 > 0.0).astype(jnp.float32)
        dw1_ref[0] = dot_nt(dpre1, z)
        db1_ref[0] = jnp.sum(dpre1, axis=1)[None, :]
        dz = dot_tt(w1[:].astype(jnp.float32), dpre1)
        dln2_g_ref[0] = jnp.sum(dz * xhat2, axis=1)[None, :]
        dln2_b_ref[0] = jnp.sum(dz, axis=1)[None, :]
        dx2 = shr(g, 1) + _ln_bwd(dz, xhat2, inv2, ln2_g[:])

        # x2 = x + proj
        dwp_ref[0] = dot_nt(dx2, ctx)
        dbp_ref[0] = jnp.sum(dx2, axis=1)[None, :]
        dctx = dot_tt(wp[:].astype(jnp.float32), dx2)

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
        dx = dx2 + _ln_bwd(dy, xhat1, inv1, ln1_g[:])
        dx_ref[0] = dx
        # dpe: per-window sum over the tile's windows via a one-hot dot
        dpe_ref[0] = dot(dx, esum_ref[:])

    return fwd_kernel, bwd_kernel


def _geometry(b, s_in, wpt_req):
    s = -(-s_in // 8) * 8
    wpt = wpt_req
    while b % wpt != 0 and wpt > 1:
        wpt //= 2
    r = wpt * s
    n_tiles = (b * s) // r
    blkdiag = np.full((r, r), -1e9, np.float32)
    for w in range(wpt):
        blkdiag[w * s:(w + 1) * s, w * s:(w + 1) * s] = 0.0
    pad_row = np.zeros((s,), np.float32)
    pad_row[s_in:] = -1e9
    padrow = jnp.broadcast_to(jnp.asarray(np.tile(pad_row, wpt))[None, :],
                              (n_tiles, 1, r))
    esum = jnp.asarray(np.tile(np.eye(s, dtype=np.float32), (wpt, 1)))
    return s, wpt, r, n_tiles, jnp.asarray(blkdiag), padrow, esum


def _to_tiles(x, s, wpt):
    b, s_in, c = x.shape
    xp = jnp.pad(x, ((0, 0), (0, s - s_in), (0, 0))) if s != s_in else x
    n_tiles = (b * s) // (wpt * s)
    return xp.reshape(n_tiles, wpt * s, c).transpose(0, 2, 1)


def _full(a):
    return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                        memory_space=pltpu.VMEM)


def _tile3(shape):
    return pl.BlockSpec(shape, lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_strided_block1_train(x, blk_and_pe, num_heads, windows_per_tile,
                               s_in, precision=jax.lax.Precision.DEFAULT):
    """x: (B, S, C) temporal output → (B, S_pad, C) pre-selection block-1
    output (caller slices ::stride). blk_and_pe = (block params subtree,
    pe param (N, C)). Pallas fwd + hand-written Pallas bwd."""
    out, _ = _fsb_fwd_impl(x, blk_and_pe, num_heads, windows_per_tile, s_in,
                           precision)
    return out


def _operands(blk_and_pe, s_in, num_heads):
    blk, pe = blk_and_pe
    params = {"strided_temporal_block_1": blk, "strided_temporal_pe_1": pe}
    ops = stack_strided_block1_params(params, s_in,
                                      weights_dtype=jnp.float32,
                                      num_heads=num_heads,
                                      fold_q_scale=False)
    return [ops[name] for name in _OP_ORDER]


def _fsb_fwd_impl(x, blk_and_pe, num_heads, wpt_req, s_in, precision):
    b, _, c = x.shape
    ops = _operands(blk_and_pe, s_in, num_heads)
    hidden = ops[_OP_ORDER.index("w1")].shape[0]
    s, wpt, r, n_tiles, blkdiag, padrow, esum = _geometry(b, s_in, wpt_req)
    x_t = _to_tiles(x, s, wpt)
    fwd_kernel, _ = _make_kernels(wpt, s, c, hidden, num_heads, precision)
    out = pl.pallas_call(
        fwd_kernel,
        grid=(n_tiles,),
        in_specs=[_tile3((1, c, r)), _full(blkdiag), _tile3((1, 1, r))]
        + [_full(op) for op in ops],
        out_specs=_tile3((1, c, r)),
        out_shape=jax.ShapeDtypeStruct((n_tiles, c, r), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x_t, blkdiag, padrow, *ops)
    out = out.transpose(0, 2, 1).reshape(b, s, c)
    return out, (x, blk_and_pe)


def _fsb_fwd_rule(x, blk_and_pe, num_heads, wpt, s_in, precision):
    return _fsb_fwd_impl(x, blk_and_pe, num_heads, wpt, s_in, precision)


def _fsb_bwd_rule(num_heads, wpt_req, s_in, precision, residuals, g):
    x, blk_and_pe = residuals
    b, _, c = x.shape
    ops = _operands(blk_and_pe, s_in, num_heads)
    hidden = ops[_OP_ORDER.index("w1")].shape[0]
    s, wpt, r, n_tiles, blkdiag, padrow, esum = _geometry(b, s_in, wpt_req)
    x_t = _to_tiles(x, s, wpt)
    g_t = _to_tiles(g.astype(jnp.float32), s, wpt)
    _, bwd_kernel = _make_kernels(wpt, s, c, hidden, num_heads, precision)

    grad_shapes = [
        ("dx", (c, r)), ("dln1_g", (1, c)), ("dln1_b", (1, c)),
        ("dwqkv", (3 * c, c)), ("dbqkv", (1, 3 * c)),
        ("dwp", (c, c)), ("dbp", (1, c)),
        ("dln2_g", (1, c)), ("dln2_b", (1, c)),
        ("dw1", (hidden, c)), ("db1", (1, hidden)),
        ("dwc0", (c, hidden)), ("dwc1", (c, hidden)), ("dwc2", (c, hidden)),
        ("dbc", (1, c)), ("dpe", (c, s)),
    ]
    out_specs, out_shapes = [], []
    for _, shape in grad_shapes:
        out_specs.append(pl.BlockSpec(
            (1,) + shape, lambda i, nd=1 + len(shape): (i,) + (0,) * (nd - 1),
            memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((n_tiles,) + shape,
                                               jnp.float32))
    outs = pl.pallas_call(
        bwd_kernel,
        grid=(n_tiles,),
        in_specs=[_tile3((1, c, r)), _full(blkdiag), _tile3((1, 1, r)),
                  _tile3((1, c, r)), _full(esum)]
        + [_full(op) for op in ops],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(x_t, blkdiag, padrow, g_t, esum, *ops)

    named = dict(zip([nm for nm, _ in grad_shapes], outs))
    dx = named["dx"].transpose(0, 2, 1).reshape(b, s, c)[:, :s_in]
    sm = {nm: jnp.sum(v, axis=0) for nm, v in named.items() if nm != "dx"}
    dwqkv = sm["dwqkv"]
    flat_bqkv = sm["dbqkv"].reshape(-1)
    dblk = {
        "norm1": {"scale": sm["dln1_g"].reshape(-1),
                  "bias": sm["dln1_b"].reshape(-1)},
        "attn": {
            "wq": {"kernel": dwqkv[:c].T, "bias": flat_bqkv[:c]},
            "wk": {"kernel": dwqkv[c:2 * c].T, "bias": flat_bqkv[c:2 * c]},
            "wv": {"kernel": dwqkv[2 * c:].T, "bias": flat_bqkv[2 * c:]},
            "proj": {"kernel": sm["dwp"].T, "bias": sm["dbp"].reshape(-1)},
        },
        "norm2": {"scale": sm["dln2_g"].reshape(-1),
                  "bias": sm["dln2_b"].reshape(-1)},
        "mlp": {
            "fc1": {"kernel": sm["dw1"].T, "bias": sm["db1"].reshape(-1)},
            "fc2": {"kernel": jnp.stack([sm["dwc0"].T, sm["dwc1"].T,
                                         sm["dwc2"].T]),
                    "bias": sm["dbc"].reshape(-1)},
        },
    }
    dpe = sm["dpe"].T[:s_in]
    return dx, (dblk, dpe)


fused_strided_block1_train.defvjp(_fsb_fwd_rule, _fsb_bwd_rule)
