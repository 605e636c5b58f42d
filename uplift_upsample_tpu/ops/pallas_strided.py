"""Fused first strided-transformer block (transposed layout, eval path).

The strided stack (reference uplift_upsample_transformer.py:93-160: pre-norm
attention + StridedMLP with a k=3 strided conv, max-pool(1)/crop residual) is
dominated by its FIRST block, which attends over the full N=71 window; blocks
2-3 run on 23 and 3 tokens and stay in XLA.

Same layout as ops/pallas_temporal_v3.py: channels on sublanes, wpt windows x
72 padded tokens on lanes. The per-block positional encoding is added
in-kernel (tiled (C, R) operand). The strided conv becomes three full-width
dots with lane shifts; the residual is the input shifted by one lane (the
pad==0 crop). Both produce values at *every* position u; cross-window bleed
and the conv's tail positions only land at lanes the caller never selects
(valid outputs are u = s*t <= L-3). The caller applies the stride-s lane
selection in XLA:

    x_next[:, t] = out[:, w*72 + s*t],  out[:, u] = x[:, u+1] + conv(h)[:, u]

Supports kernel_size=3, padding=(0,0) (the shipped h36m/amass configs);
other geometries fall back to the XLA model path.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def stack_strided_block1_params(params: Dict, num_frames: int,
                                weights_dtype=jnp.bfloat16,
                                name: str = "strided_temporal_block_1",
                                pe_name: str = "strided_temporal_pe_1",
                                num_heads: int = 8,
                                fold_q_scale: bool = True):
    """Kernel operands for the first strided block, transposed layout.

    fold_q_scale folds the attention 1/sqrt(d) into the q projection (the
    eval kernels/epilogues do not rescale q). The TRAIN kernel keeps the
    scale explicit so weight grads are grads of the true parameters — it
    passes False.
    """
    blk = params[name]
    # shape access only — tracer-safe (params may be traced under jit)
    c = blk["attn"]["wq"]["kernel"].shape[0]
    hidden = blk["mlp"]["fc1"]["kernel"].shape[1]

    def col(a):
        return jnp.asarray(a, jnp.float32)[:, None]

    def bias_col(p, key, n):
        b = p.get(key, {}).get("bias")
        return (jnp.zeros((n, 1), jnp.float32) if b is None
                else jnp.asarray(b, jnp.float32)[:, None])

    q_scale = (jnp.float32(1.0 / np.sqrt(c // num_heads)) if fold_q_scale
               else jnp.float32(1.0))
    wqkv = jnp.concatenate(
        [jnp.asarray(blk["attn"]["wq"]["kernel"], jnp.float32).T * q_scale,
         jnp.asarray(blk["attn"]["wk"]["kernel"], jnp.float32).T,
         jnp.asarray(blk["attn"]["wv"]["kernel"], jnp.float32).T], axis=0)
    bqkv = jnp.concatenate(
        [bias_col(blk["attn"], "wq", c) * q_scale,
         bias_col(blk["attn"], "wk", c),
         bias_col(blk["attn"], "wv", c)], axis=0)
    conv_k = jnp.asarray(blk["mlp"]["fc2"]["kernel"], jnp.float32)  # (3, hidden, C)

    s_pad = -(-num_frames // 8) * 8
    pe = jnp.asarray(params[pe_name], jnp.float32)  # (N, C)
    pe_pad = jnp.pad(pe, ((0, s_pad - num_frames), (0, 0))).T  # (C, s_pad)

    return dict(
        ln1_g=col(blk["norm1"]["scale"]), ln1_b=col(blk["norm1"]["bias"]),
        wqkv=wqkv.astype(weights_dtype), bqkv=bqkv,
        wp=jnp.asarray(blk["attn"]["proj"]["kernel"], jnp.float32)
            .T.astype(weights_dtype),
        bp=bias_col(blk["attn"], "proj", c),
        ln2_g=col(blk["norm2"]["scale"]), ln2_b=col(blk["norm2"]["bias"]),
        w1=jnp.asarray(blk["mlp"]["fc1"]["kernel"], jnp.float32)
            .T.astype(weights_dtype),
        b1=bias_col(blk["mlp"], "fc1", hidden),
        wc0=conv_k[0].T.astype(weights_dtype),
        wc1=conv_k[1].T.astype(weights_dtype),
        wc2=conv_k[2].T.astype(weights_dtype),
        bc=bias_col(blk["mlp"], "fc2", c),
        pe=pe_pad,
    )


_OP_ORDER = ["ln1_g", "ln1_b", "wqkv", "bqkv", "wp", "bp", "ln2_g", "ln2_b",
             "w1", "b1", "wc0", "wc1", "wc2", "bc", "pe"]


def _make_kernel(wpt: int, s: int, c: int, num_heads: int, activation: str,
                 precision=jax.lax.Precision.DEFAULT):
    depth = c // num_heads
    scale_q = np.float32(1.0 / np.sqrt(depth))
    r = wpt * s
    inv_c = np.float32(1.0 / c)

    from .pallas_temporal_v3 import _dot_maker
    dot = _dot_maker((((1,), (0,)), ((), ())), precision)
    dot_tt = _dot_maker((((0,), (0,)), ((), ())), precision)
    dot_nt = _dot_maker((((1,), (1,)), ((), ())), precision)

    def ln(x, ones_row, gamma, beta, eps):
        # VPU cross-sublane stats (faster than M=1 MXU dots between big dots)
        del ones_row
        mu = jnp.mean(x, axis=0, keepdims=True)
        xc = x - mu
        var = jnp.mean(xc * xc, axis=0, keepdims=True)
        return xc / jnp.sqrt(var + eps) * gamma + beta

    def shl(a, j):  # shift lanes left by j, zero-fill the tail
        if j == 0:
            return a
        return jnp.concatenate([a[:, j:], jnp.zeros((a.shape[0], j),
                                                    a.dtype)], axis=1)

    def kernel(x_ref, blkdiag_ref, padrow_ref, ones_ref,
               ln1_g, ln1_b, wqkv, bqkv, wp, bp, ln2_g, ln2_b,
               w1, b1, wc0, wc1, wc2, bc, pe, o_ref):
        # Grid-tiled refs are 3D (tile, C, R), block (1, C, R): R is not
        # 128-divisible so blocks must equal the array's trailing dims.
        ones_row = ones_ref[:1]
        # PE is (C, s) per window, tiled over the wpt windows
        x = x_ref[0].astype(jnp.float32) + pe_tiled(pe)

        y = ln(x, ones_row, ln1_g[:], ln1_b[:], 1e-5)
        qkv = dot(wqkv[:].astype(jnp.float32), y) + bqkv[:]
        addmask = blkdiag_ref[:] + padrow_ref[0]
        ctx_parts = []
        for h in range(num_heads):
            qh = qkv[h * depth:(h + 1) * depth]  # scale folded in wqkv
            kh = qkv[c + h * depth: c + (h + 1) * depth]
            vh = qkv[2 * c + h * depth: 2 * c + (h + 1) * depth]
            logits = dot_tt(qh, kh) + addmask
            m = jnp.max(logits, axis=1, keepdims=True)
            ex = jnp.exp(logits - m)
            wgt = ex / jnp.sum(ex, axis=1, keepdims=True)
            ctx_parts.append(dot_nt(vh, wgt))
        ctx = jnp.concatenate(ctx_parts, axis=0)

        x = x + dot(wp[:].astype(jnp.float32), ctx) + bp[:]
        z = ln(x, ones_row, ln2_g[:], ln2_b[:], 1e-5)
        h1 = dot(w1[:].astype(jnp.float32), z) + b1[:]
        if activation == "relu":
            h1 = jnp.maximum(h1, 0.0)
        else:
            from .pallas_spatial import _erf
            h1 = 0.5 * h1 * (1.0 + _erf(h1 * np.float32(1.0 / np.sqrt(2.0))))
        conv = dot(wc0[:].astype(jnp.float32), h1)
        conv += shl(dot(wc1[:].astype(jnp.float32), h1), 1)
        conv += shl(dot(wc2[:].astype(jnp.float32), h1), 2)
        # out[:, u] = x[:, u+1] + conv[:, u] + bias; valid at u = stride*t
        o_ref[0] = shl(x, 1) + conv + bc[:]

    def pe_tiled(pe_ref):
        # (C, s) -> (C, R) by repeating along lanes; built from concatenation
        # (wpt is small and static)
        pe = pe_ref[:].astype(jnp.float32)
        return jnp.concatenate([pe] * wpt, axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("num_heads", "windows_per_tile",
                                             "activation", "weights_dtype",
                                             "precision"))
def fused_strided_block1(x: jax.Array, operands: Dict, *, num_heads: int,
                         windows_per_tile: int = 4, activation: str = "relu",
                         weights_dtype=jnp.float32,
                         precision=jax.lax.Precision.DEFAULT) -> jax.Array:
    """x: (B, N, C) → (B, N_pad, C) pre-selection output of strided block 1.

    Caller selects `out[:, ::stride_eff]` over the first N-2 positions, i.e.
    x_next[:, t] = out[:, stride*t] for t < floor((N-3)/stride)+1.
    """
    b, s_in, c = x.shape
    s = -(-s_in // 8) * 8
    wpt = windows_per_tile
    while b % wpt != 0 and wpt > 1:
        wpt //= 2
    r = wpt * s

    xp = jnp.pad(x, ((0, 0), (0, s - s_in), (0, 0))) if s != s_in else x
    n_tiles = (b * s) // r
    x_t = xp.reshape(n_tiles, r, c).transpose(0, 2, 1)  # (tile, C, R)

    blkdiag = np.full((r, r), -1e9, np.float32)
    for w in range(wpt):
        blkdiag[w * s:(w + 1) * s, w * s:(w + 1) * s] = 0.0
    blkdiag = jnp.asarray(blkdiag)
    pad_row = np.zeros((s,), np.float32)
    pad_row[s_in:] = -1e9
    padrow = jnp.broadcast_to(jnp.asarray(np.tile(pad_row, wpt))[None, :],
                              (n_tiles, 1, r))
    ones_row = jnp.ones((8, c), jnp.float32)

    kernel = _make_kernel(wpt, s, c, num_heads, activation, precision)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    ops = [operands[name] for name in _OP_ORDER]
    in_specs = [pl.BlockSpec((1, c, r), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                full(blkdiag),
                pl.BlockSpec((1, 1, r), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                full(ones_row)]
    in_specs += [full(op) for op in ops]

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, c, r), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, c, r), jnp.float32),
    )(x_t, blkdiag, padrow, ones_row, *ops)
    return out.transpose(0, 2, 1).reshape(b, s, c)


def make_strided_b1_epilogue(num_heads: int, wpt: int, s: int, c: int,
                             paddings=(0, 0)):
    """Epilogue for `fused_temporal_stack_v3`: runs strided block 1 in the
    same kernel invocation (saves one full grid pass + a transpose pair).

    Receives the temporal stack output x (C, R) in-kernel and the operands of
    `stack_strided_block1_params` (in _OP_ORDER); returns the pre-selection
    output aligned so the caller selects lanes u = stride*t:

      paddings (0,0)  (h36m_351/amass: crop-1 residual, no conv padding):
        out[:, u] = x[:, u+1] + conv(h)[:, u] + bias
      general p0,p1 ∈ {0,1} (h36m_81: paddings (1,1), reference
      uplift_upsample_transformer.py:67-89,139-152 — zero-padded conv,
      uncropped max-pool(1) residual where padding != 0):
        out[:, u] = x[:, u + (p0==0)]
                    + Σ_j wcj·h1[:, u − p0 + j] (taps outside the window = 0)
                    + bias
      The padded variants expect ONE extra epilogue operand after `pe`: a
      (1, R) lane-validity row (1.0 on lanes < s_in of each window, 0.0 on
      pad lanes). h1's pad lanes are zeroed with it, which makes every
      cross-window / out-of-window lane shift pull exactly the zero the
      reference's ZeroPad1D provides.
    """
    depth = c // num_heads
    scale_q = np.float32(1.0 / np.sqrt(depth))
    p0, p1 = int(paddings[0]), int(paddings[1])
    assert 0 <= p0 <= 1 and 0 <= p1 <= 1, paddings
    padded = (p0, p1) != (0, 0)
    res_shift = 1 if p0 == 0 else 0

    def shl(a, j):
        if j == 0:
            return a
        if j < 0:  # shift lanes right by |j|, zero-fill the head
            j = -j
            return jnp.concatenate([jnp.zeros((a.shape[0], j), a.dtype),
                                    a[:, :-j]], axis=1)
        return jnp.concatenate([a[:, j:], jnp.zeros((a.shape[0], j),
                                                    a.dtype)], axis=1)

    def epilogue(x, ep_refs, ln, ones_row, dot, dot_tt, dot_nt, padmask):
        if padded:
            (ln1_g, ln1_b, wqkv, bqkv, wp, bp, ln2_g, ln2_b,
             w1, b1, wc0, wc1, wc2, bc, pe, lane_valid) = ep_refs
        else:
            (ln1_g, ln1_b, wqkv, bqkv, wp, bp, ln2_g, ln2_b,
             w1, b1, wc0, wc1, wc2, bc, pe) = ep_refs
        pe_t = jnp.concatenate([pe[:].astype(jnp.float32)] * wpt, axis=1)
        x = x + pe_t
        y = ln(x, ones_row, ln1_g[:], ln1_b[:], 1e-5)
        qkv = dot(wqkv[:].astype(jnp.float32), y) + bqkv[:]
        ctx_parts = []
        for h in range(num_heads):
            qh = qkv[h * depth:(h + 1) * depth]  # scale folded in wqkv
            kh = qkv[c + h * depth: c + (h + 1) * depth]
            vh = qkv[2 * c + h * depth: 2 * c + (h + 1) * depth]
            logits = dot_tt(qh, kh) + padmask
            m = jnp.max(logits, axis=1, keepdims=True)
            ex = jnp.exp(logits - m)
            wgt = ex / jnp.sum(ex, axis=1, keepdims=True)
            ctx_parts.append(dot_nt(vh, wgt))
        ctx = jnp.concatenate(ctx_parts, axis=0)
        x = x + dot(wp[:].astype(jnp.float32), ctx) + bp[:]
        z = ln(x, ones_row, ln2_g[:], ln2_b[:], 1e-5)
        h1 = jnp.maximum(dot(w1[:].astype(jnp.float32), z) + b1[:], 0.0)
        if padded:
            h1 = h1 * lane_valid[:]  # zero pad lanes = the conv's zero pad
        conv = shl(dot(wc0[:].astype(jnp.float32), h1), -p0)
        conv += shl(dot(wc1[:].astype(jnp.float32), h1), 1 - p0)
        conv += shl(dot(wc2[:].astype(jnp.float32), h1), 2 - p0)
        return shl(x, res_shift) + conv + bc[:]

    return epilogue


def make_strided_b1_epilogue_sel(num_heads: int, wpt: int, s: int, c: int):
    """Full-softmax strided-block-1 epilogue with in-kernel lane selection.

    The selection twin of `make_strided_b1_epilogue` for paddings (0,0)
    (h36m_351/amass geometry): instead of returning the full (C, R) pre-
    selection output — which the wrapper then transposes through XLA
    (226 MB each way at B=2048) only for the caller to keep the 23 of 72
    lanes per window at u = stride·t — the lane shifts AND the stride
    selection collapse into three one-hot selection dots
    (`make_strided_sel` with shifts 0/1/2) and the kernel writes only
    (C, wpt·n_out):

        out[:, w·n_out + t] = x[u+1] + c0[u] + c1[u+1] + c2[u+2] + bias,
        u = w·s + stride·t

    — identical math to shl(x,1)+conv+bias followed by the caller's
    u = stride·t slice (reference StridedMLP k3/pad-0 semantics,
    uplift_upsample_transformer.py:67-89,139-152). Expects the `_OP_ORDER`
    operands (pe un-tiled (C, s), tiled in-kernel like the non-sel
    epilogue) followed by sel0, sel1, sel2.
    """
    depth = c // num_heads

    def epilogue(x, ep_refs, ln, ones_row, dot, dot_tt, dot_nt, padmask):
        (ln1_g, ln1_b, wqkv, bqkv, wp, bp, ln2_g, ln2_b,
         w1, b1, wc0, wc1, wc2, bc, pe, sel0, sel1, sel2) = ep_refs
        pe_t = jnp.concatenate([pe[:].astype(jnp.float32)] * wpt, axis=1)
        x = x + pe_t
        y = ln(x, ones_row, ln1_g[:], ln1_b[:], 1e-5)
        qkv = dot(wqkv[:].astype(jnp.float32), y) + bqkv[:]
        ctx_parts = []
        for h in range(num_heads):
            qh = qkv[h * depth:(h + 1) * depth]  # scale folded in wqkv
            kh = qkv[c + h * depth: c + (h + 1) * depth]
            vh = qkv[2 * c + h * depth: 2 * c + (h + 1) * depth]
            logits = dot_tt(qh, kh) + padmask
            m = jnp.max(logits, axis=1, keepdims=True)
            ex = jnp.exp(logits - m)
            wgt = ex / jnp.sum(ex, axis=1, keepdims=True)
            ctx_parts.append(dot_nt(vh, wgt))
        ctx = jnp.concatenate(ctx_parts, axis=0)
        x = x + dot(wp[:].astype(jnp.float32), ctx) + bp[:]
        z = ln(x, ones_row, ln2_g[:], ln2_b[:], 1e-5)
        h1 = jnp.maximum(dot(w1[:].astype(jnp.float32), z) + b1[:], 0.0)
        c0 = dot(wc0[:].astype(jnp.float32), h1)
        c1 = dot(wc1[:].astype(jnp.float32), h1)
        c2 = dot(wc2[:].astype(jnp.float32), h1)
        return (dot(x + c1, sel1[:]) + dot(c0, sel0[:]) + dot(c2, sel2[:])
                + bc[:])

    return epilogue


def make_strided_sel(wpt: int, s: int, stride: int, n_out: int,
                     shift: int = 0):
    """(R, wpt·n_out) one-hot lane selector: column w·n_out + t picks lane
    w·s + stride·t + shift. Applied as the last epilogue dots so the kernel
    writes only the wpt·n_out selected lanes instead of the full R (12x
    smaller output for h36m_351); the `shift` variants fold the strided
    conv's lane shifts and the crop residual into pure MXU selection —
    in-kernel lane concatenation/shifting conflicts with the banded
    attention's 72-lane band arrays in Mosaic layout inference (observed
    'limits[i] <= dim(i)' compiler crashes)."""
    r = wpt * s
    sel = np.zeros((r, wpt * n_out), np.float32)
    for w in range(wpt):
        for t in range(n_out):
            sel[w * s + stride * t + shift, w * n_out + t] = 1.0
    return jnp.asarray(sel)


def make_strided_b1_epilogue_banded_sel(num_heads: int, wpt: int, s: int,
                                        c: int):
    """Banded strided-block-1 epilogue with shift-free in-kernel selection.

    Expects `_OP_ORDER` operands with a PRE-TILED (C, R) `pe`, followed by
    three selectors (make_strided_sel with shift 0, 1, 2); returns
    (C, wpt·n_out). out[:, w·n+t] = x[u+1] + conv(h1)[u] + bc at
    u = w·s + stride·t — the reference StridedMLP k=3/pad-0 semantics
    (uplift_upsample_transformer.py:67-89,139-152) with every lane shift
    expressed as a selection dot.
    """
    depth = c // num_heads
    r = wpt * s

    def epilogue(x, ep_refs, ln, ones_row, dot, dot_tt, dot_nt, band_ctx):
        eband_ref, ebandT_ref, padband_ref, dot_band = band_ctx
        (ln1_g, ln1_b, wqkv, bqkv, wp, bp, ln2_g, ln2_b,
         w1, b1, wc0, wc1, wc2, bc, pe, sel0, sel1, sel2) = ep_refs
        eband = eband_ref[:]
        ebandT = ebandT_ref[:]
        mask2 = padband_ref[:]                  # (1, s), rank-2 broadcast
        x = x + pe[:].astype(jnp.float32)       # pe pre-tiled (C, R)
        y = ln(x, ones_row, ln1_g[:], ln1_b[:], 1e-5)
        qkv = dot(wqkv[:].astype(jnp.float32), y) + bqkv[:]
        ctx_parts = []
        for h in range(num_heads):
            qh = qkv[h * depth:(h + 1) * depth]  # scale folded in wqkv
            kh = qkv[c + h * depth: c + (h + 1) * depth]
            vh = qkv[2 * c + h * depth: 2 * c + (h + 1) * depth]
            logits = dot_tt(qh, kh)
            band = dot_band(logits.reshape(wpt, s, r), eband)
            band = band.reshape(r, s) + mask2
            m = jnp.max(band, axis=1, keepdims=True)
            ex = jnp.exp(band - m)
            wgt = ex / jnp.sum(ex, axis=1, keepdims=True)
            wfull = dot_band(wgt.reshape(wpt, s, s), ebandT).reshape(r, r)
            ctx_parts.append(dot_nt(vh, wfull))
        ctx = jnp.concatenate(ctx_parts, axis=0)
        x = x + dot(wp[:].astype(jnp.float32), ctx) + bp[:]
        z = ln(x, ones_row, ln2_g[:], ln2_b[:], 1e-5)
        h1 = jnp.maximum(dot(w1[:].astype(jnp.float32), z) + b1[:], 0.0)
        c0 = dot(wc0[:].astype(jnp.float32), h1)
        c1 = dot(wc1[:].astype(jnp.float32), h1)
        c2 = dot(wc2[:].astype(jnp.float32), h1)
        # out[:, col] = x[u+1] + c0[u] + c1[u+1] + c2[u+2] + bias
        out = (dot(x + c1, sel1[:]) + dot(c0, sel0[:]) + dot(c2, sel2[:])
               + bc[:])
        return out

    return epilogue


def make_strided_b1_epilogue_banded(num_heads: int, wpt: int, s: int, c: int):
    """Banded-attention variant of `make_strided_b1_epilogue` for
    `fused_temporal_stack_v3(attn_mode="banded")`: per-window softmax runs on
    the extracted (wpt, s, s) band instead of the full (R, R) logits. The
    final argument is the kernel's band context (eband, ebandT, padband,
    dot_band) instead of an (R, R) padmask.
    """
    depth = c // num_heads
    scale_q = np.float32(1.0 / np.sqrt(depth))
    r = wpt * s

    def shl(a, j):
        if j == 0:
            return a
        return jnp.concatenate([a[:, j:], jnp.zeros((a.shape[0], j),
                                                    a.dtype)], axis=1)

    def epilogue(x, ep_refs, ln, ones_row, dot, dot_tt, dot_nt, band_ctx):
        eband_ref, ebandT_ref, padband_ref, dot_band = band_ctx
        (ln1_g, ln1_b, wqkv, bqkv, wp, bp, ln2_g, ln2_b,
         w1, b1, wc0, wc1, wc2, bc, pe) = ep_refs
        eband = eband_ref[:]
        ebandT = ebandT_ref[:]
        mask2 = padband_ref[:]  # (1, s), rank-2 broadcast over (R, s)
        x = x + pe[:].astype(jnp.float32)  # pe pre-tiled (C, R)
        y = ln(x, ones_row, ln1_g[:], ln1_b[:], 1e-5)
        qkv = dot(wqkv[:].astype(jnp.float32), y) + bqkv[:]
        ctx_parts = []
        for h in range(num_heads):
            qh = qkv[h * depth:(h + 1) * depth]  # scale folded in wqkv
            kh = qkv[c + h * depth: c + (h + 1) * depth]
            vh = qkv[2 * c + h * depth: 2 * c + (h + 1) * depth]
            logits = dot_tt(qh, kh)                        # (R, R)
            band = dot_band(logits.reshape(wpt, s, r), eband)
            band = band.reshape(r, s) + mask2
            m = jnp.max(band, axis=1, keepdims=True)
            ex = jnp.exp(band - m)
            wgt = ex / jnp.sum(ex, axis=1, keepdims=True)
            wfull = dot_band(wgt.reshape(wpt, s, s), ebandT).reshape(r, r)
            ctx_parts.append(dot_nt(vh, wfull))
        ctx = jnp.concatenate(ctx_parts, axis=0)
        x = x + dot(wp[:].astype(jnp.float32), ctx) + bp[:]
        z = ln(x, ones_row, ln2_g[:], ln2_b[:], 1e-5)
        h1 = jnp.maximum(dot(w1[:].astype(jnp.float32), z) + b1[:], 0.0)
        conv = dot(wc0[:].astype(jnp.float32), h1)
        conv += shl(dot(wc1[:].astype(jnp.float32), h1), 1)
        conv += shl(dot(wc2[:].astype(jnp.float32), h1), 2)
        return shl(x, 1) + conv + bc[:]

    return epilogue
