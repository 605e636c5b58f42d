"""Fused temporal transformer stack, v3: transposed (channels-on-sublanes) layout.

Why v1/v2 lost to XLA (PERF_NOTES round 1): with activations (rows, C) the
per-head attention needs 48-wide lane slices of the channel axis, which
Mosaic can only express as masked full-width dots — 8x the MXU passes and
pathological codegen. v3 flips the layout:

    activations: (C=384 sublanes, R = wpt·72 window-tokens on lanes)

so a head is a 48-row **sublane** slice (48 = 6×8, always aligned, free),
and per-head attention is two genuine MXU dots over all wpt windows at once:

    logits_h = q_hᵀ k_h            (R, R), contraction over 48 sublanes
    ctx_h    = v_h · softmax(…)ᵀ   (48, R), contraction over R_k lanes

with a block-diagonal additive mask confining attention to each window
(cross-window logits are computed and discarded — at wpt=4 that's 4x FLOPs
on an op that is ~2% of the block's MXU work). Dense layers are single
full-width dots (C_out, C) @ (C, R); LayerNorm statistics ride the MXU as
ones-row dots. Weights are passed in bfloat16: DEFAULT-precision f32 dots
lower to one bf16 pass anyway, and halving weight VMEM lets all four blocks
fuse into one kernel (weights stay resident across the grid).

Replaces the reference's temporal stage (4 pre-norm blocks, relu MLP,
key-mask on masked frames for the first `first_strided_token_attention_layer`
blocks: uplift_upsample_transformer.py:356-364). Eval path only.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_temporal import stack_temporal_params  # reuse the param stacker


HIGH3 = "high3"  # manual bf16x3 dots (Mosaic has no Precision.HIGH)


def _dot_maker(dims, precision):
    """dot_general factory for the given dims; HIGH3 = 3-pass bf16 hi/lo."""
    if precision == HIGH3:
        def dot(a, b):
            a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
            a_lo = a - a_hi
            b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
            b_lo = b - b_hi
            y = jax.lax.dot_general(a_hi, b_hi, dims,
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.DEFAULT)
            y += jax.lax.dot_general(a_hi, b_lo, dims,
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.DEFAULT)
            y += jax.lax.dot_general(a_lo, b_hi, dims,
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.DEFAULT)
            return y
        return dot

    def dot(a, b):
        return jax.lax.dot_general(a, b, dims,
                                   preferred_element_type=jnp.float32,
                                   precision=precision)
    return dot


def _make_kernel_v3(num_blocks: int, wpt: int, s: int, c: int, hidden: int,
                    num_heads: int, first_masked_blocks: int,
                    activation: str, precision=jax.lax.Precision.DEFAULT,
                    attn_mode: str = "full", num_epilogue_refs: int = 0,
                    epilogue=None, attn_precision=None, s2t: bool = False,
                    s2t_mode: str = "full", presplit: bool = False):
    depth = c // num_heads
    scale_q = np.float32(1.0 / np.sqrt(depth))
    r = wpt * s
    inv_c = np.float32(1.0 / c)

    # Per-site precision split (mixed rung): `precision` drives the
    # residual-stream dense dots (qkv/proj/MLP — the drift-compounding
    # path); `attn_precision` drives the attention logits/ctx/band dots
    # (softmax-normalized — drift there barely reaches the output).
    if attn_precision is None:
        attn_precision = precision
    dot = _dot_maker((((1,), (0,)), ((), ())), precision)
    dot_tt = _dot_maker((((0,), (0,)), ((), ())), attn_precision)  # contract sublanes
    dot_nt = _dot_maker((((1,), (1,)), ((), ())), attn_precision)  # contract lanes

    def dense(wr, x):
        """Residual-stream dense dot on a weight ref.

        presplit (HIGH3 rung): the ref holds host-pre-split (2, out, in)
        bf16 hi/lo planes, so the kernel does three bf16 MXU passes with
        only the ACTIVATION split on the VPU — the in-kernel weight hi/lo
        split of the generic HIGH3 dot (3 VPU passes over ~1.2M weight
        elements per block, re-executed every grid step) disappears.
        """
        if presplit:
            w_hi, w_lo = wr[0], wr[1]             # bf16 (out, in)
            x_hi = x.astype(jnp.bfloat16)
            x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            dims = (((1,), (0,)), ((), ()))
            # Pin DEFAULT explicitly: an ambient default_matmul_precision
            # ("high") context otherwise leaks in and Mosaic cannot lower
            # Precision.HIGH (the 928d578 bug class).
            dflt = jax.lax.Precision.DEFAULT
            y = jax.lax.dot_general(w_hi, x_hi, dims,
                                    preferred_element_type=jnp.float32,
                                    precision=dflt)
            y += jax.lax.dot_general(w_hi, x_lo, dims,
                                     preferred_element_type=jnp.float32,
                                     precision=dflt)
            y += jax.lax.dot_general(w_lo, x_hi, dims,
                                     preferred_element_type=jnp.float32,
                                     precision=dflt)
            return y
        return dot(wr[:].astype(jnp.float32), x)
    # Banded mode: batched (over windows) band-select/expand dots. These
    # contract one-hot selectors, so DEFAULT (1-pass bf16) is exact on the
    # selector side; the logits side follows the attention precision.
    dot_band = _dot_maker((((2,), (1,)), ((0,), (0,))), attn_precision)

    def ln(x, ones_row, gamma, beta, eps):
        # x: (C, R); stats over C via cross-sublane VPU reductions (measured
        # faster than M=1 MXU ones-row dots interleaved with big dots)
        del ones_row
        mu = jnp.mean(x, axis=0, keepdims=True)  # (1, R)
        xc = x - mu
        var = jnp.mean(xc * xc, axis=0, keepdims=True)
        return xc / jnp.sqrt(var + eps) * gamma + beta

    def kernel(*refs):
        # refs: x, blkdiag, keyrow, padrow, ones (banded: x, eband, ebandT,
        # keyband, padband, ones), then 12 per block, then
        # `num_epilogue_refs` epilogue operands, then out.
        # Grid-tiled operands are 3D (tile, C, R) with block (1, C, R): R is
        # not 128-divisible, so blocks must EQUAL the array's trailing dims
        # (the Mosaic block-shape rule); the leading axis is the grid.
        if attn_mode == "banded":
            (x_ref, eband_ref, ebandT_ref, keyband_ref,
             padband_ref, ones_ref) = refs[:6]
            base = 6
            blkdiag_ref = keyrow_ref = padrow_ref = None
        else:
            x_ref, blkdiag_ref, keyrow_ref, padrow_ref, ones_ref = refs[:5]
            base = 5
        o_ref = refs[-1]
        x = x_ref[0].astype(jnp.float32)  # (C, R); s2t: (C_in=P·C_sp, R)
        ones_row = ones_ref[:1]           # (1, C) of ones

        if s2t:
            # Fused spatial→temporal prologue (reference model order,
            # uplift_upsample_transformer.py:332-352): s2t Dense on the
            # spatial output, masked-token substitution, temporal PE — all
            # on the already-tiled (C_in, R) input, one K=C_in dot.
            ws_ref, bs_ref, tok_ref, tm_ref, pes_ref = refs[base: base + 5]
            base += 5
            x = dot(ws_ref[:].astype(jnp.float32), x) + bs_ref[:]  # (C, R)
            if s2t_mode != "dotonly":
                tm = tm_ref[0]                      # (1, R), 1=real input
                x = x * tm + tok_ref[:] * (1.0 - tm)
            if s2t_mode == "full":
                x = x + pes_ref[:]  # temporal PE, pre-tiled (C, R)

        for blk in range(num_blocks):
            (ln1_g, ln1_b, wqkv, bqkv, wp, bp, ln2_g, ln2_b,
             w1, b1, w2, b2) = refs[base + 12 * blk: base + 12 * (blk + 1)]
            y = ln(x, ones_row, ln1_g[:], ln1_b[:], 1e-5)
            qkv = dense(wqkv, y) + bqkv[:]  # (3C, R)

            if attn_mode == "banded":
                # Softmax only on the block-diagonal band: the (R, R) logits
                # contain wpt×(s, s) useful windows; extract them into a
                # (wpt, s, s) band via batched one-hot dots (sublane slicing
                # is 8-aligned at s=72; lane slicing would not be), softmax
                # on 1/wpt of the elements, expand back for the ctx dot.
                # Mask-add + softmax run on the rank-2 (R, s) view: rank-3
                # middle-dim-1 broadcasts ((wpt, 1, s) → (wpt, s, s)) crash
                # Mosaic's ApplyVectorLayoutPass ('limits[i] <= dim(i)
                # (9 vs. 1)'); dim-1 sublane broadcasts over rank-2 are the
                # proven pattern everywhere else in this kernel.
                eband = eband_ref[:]
                ebandT = ebandT_ref[:]
                if blk < first_masked_blocks:
                    mask2 = keyband_ref[0]   # (R, s), pre-broadcast in XLA
                else:
                    mask2 = padband_ref[:]   # (1, s) broadcast over (R, s)
                ctx_parts = []
                for h in range(num_heads):
                    qh = qkv[h * depth:(h + 1) * depth]  # scale folded in wqkv
                    kh = qkv[c + h * depth: c + (h + 1) * depth]
                    vh = qkv[2 * c + h * depth: 2 * c + (h + 1) * depth]
                    logits = dot_tt(qh, kh)                      # (R, R)
                    band = dot_band(logits.reshape(wpt, s, r), eband)
                    band = band.reshape(r, s) + mask2            # (R, s)
                    m = jnp.max(band, axis=1, keepdims=True)
                    ex = jnp.exp(band - m)
                    wgt = ex / jnp.sum(ex, axis=1, keepdims=True)
                    wfull = dot_band(wgt.reshape(wpt, s, s),
                                     ebandT).reshape(r, r)       # (R, R)
                    ctx_parts.append(dot_nt(vh, wfull))          # (48, R)
                ctx = jnp.concatenate(ctx_parts, axis=0)
                x = x + dense(wp, ctx) + bp[:]
                z = ln(x, ones_row, ln2_g[:], ln2_b[:], 1e-5)
                z = dense(w1, z) + b1[:]
                if activation == "relu":
                    z = jnp.maximum(z, 0.0)
                else:
                    from .pallas_spatial import _erf
                    z = 0.5 * z * (1.0 + _erf(z * np.float32(1.0 / np.sqrt(2.0))))
                x = x + dense(w2, z) + b2[:]
                continue

            if blk < first_masked_blocks:
                addmask = blkdiag_ref[:] + keyrow_ref[0]  # (R,R) + (1,R)
            else:
                addmask = blkdiag_ref[:] + padrow_ref[0]
            if attn_mode == "qkvonly":  # bisection: LN + qkv dot only
                x = x + qkv[:c] + qkv[c:2 * c] + qkv[2 * c:]
                continue
            if attn_mode == "none":  # perf bisection: ctx := v
                ctx = qkv[2 * c:] + addmask[:1] * 0.0
            elif attn_mode == "logits_only":  # dots, no softmax
                ctx_parts = []
                for h in range(num_heads):
                    qh = qkv[h * depth:(h + 1) * depth]  # scale folded in wqkv
                    kh = qkv[c + h * depth: c + (h + 1) * depth]
                    vh = qkv[2 * c + h * depth: 2 * c + (h + 1) * depth]
                    logits = dot_tt(qh, kh) + addmask
                    ctx_parts.append(dot_nt(vh, logits))
                ctx = jnp.concatenate(ctx_parts, axis=0)
            elif attn_mode == "softmax_only":  # softmax on a fake logits
                ctx_parts = []
                fake = addmask  # (R, R), data-independent
                for h in range(num_heads):
                    vh = qkv[2 * c + h * depth: 2 * c + (h + 1) * depth]
                    m = jnp.max(fake, axis=1, keepdims=True)
                    ex = jnp.exp(fake - m)
                    wgt = ex / jnp.sum(ex, axis=1, keepdims=True)
                    ctx_parts.append(dot_nt(vh, wgt))
                ctx = jnp.concatenate(ctx_parts, axis=0)
            else:
              ctx_parts = []
              for h in range(num_heads):
                qh = qkv[h * depth:(h + 1) * depth]  # scale folded in wqkv
                kh = qkv[c + h * depth: c + (h + 1) * depth]
                vh = qkv[2 * c + h * depth: 2 * c + (h + 1) * depth]
                logits = dot_tt(qh, kh) + addmask                    # (R, R)
                m = jnp.max(logits, axis=1, keepdims=True)
                ex = jnp.exp(logits - m)
                wgt = ex / jnp.sum(ex, axis=1, keepdims=True)
                ctx_parts.append(dot_nt(vh, wgt))                    # (48, R)
              ctx = jnp.concatenate(ctx_parts, axis=0)               # (C, R)

            x = x + dense(wp, ctx) + bp[:]
            if attn_mode == "nomlp":
                continue
            z = ln(x, ones_row, ln2_g[:], ln2_b[:], 1e-5)
            z = dense(w1, z) + b1[:]
            if activation == "relu":
                z = jnp.maximum(z, 0.0)
            else:
                from .pallas_spatial import _erf
                z = 0.5 * z * (1.0 + _erf(z * np.float32(1.0 / np.sqrt(2.0))))
            x = x + dense(w2, z) + b2[:]
        if epilogue is not None:
            ep_refs = refs[base + 12 * num_blocks: base + 12 * num_blocks
                           + num_epilogue_refs]
            if attn_mode == "banded":
                # Band context for a banded epilogue (see
                # pallas_strided.make_strided_b1_epilogue_banded)
                band_ctx = (eband_ref, ebandT_ref, padband_ref, dot_band)
                x = epilogue(x, ep_refs, ln, ones_row, dot, dot_tt, dot_nt,
                             band_ctx)
            else:
                padmask = blkdiag_ref[:] + padrow_ref[0]
                x = epilogue(x, ep_refs, ln, ones_row, dot, dot_tt, dot_nt,
                             padmask)
        o_ref[0] = x

    return kernel


def _transposed_operands(stacked: Dict, num_blocks: int, weights_dtype,
                         q_scale=None, presplit: bool = False):
    """Per-block kernel operands in the transposed layout.

    stacked: `stack_temporal_params` output (wqkv (L,C,3C) etc., row-major
    for y @ W). v3 computes W_t @ x, so kernels are transposed here; biases
    become (n, 1) sublane vectors; LN scales (C, 1). With `q_scale`, the
    attention 1/sqrt(d) is folded into the q rows of wqkv/bqkv so the
    kernel does not rescale q (one fewer (depth, R) pass per head/block) —
    the kernel's `fold_q_scale` must match.

    presplit (HIGH3 rung): weight matrices become stacked (2, out, in) bf16
    hi/lo planes (hi = bf16(w), lo = bf16(w − hi)) computed once on host,
    so the kernel's bf16x3 dense dots skip the per-grid-step weight split
    (see `_make_kernel_v3.dense`). Same VMEM bytes as one f32 plane.
    """
    c = stacked["wqkv"].shape[1]

    def wmat(a):
        a = jnp.asarray(a, jnp.float32)
        if not presplit:
            return a.astype(weights_dtype)
        hi = a.astype(jnp.bfloat16)
        lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.stack([hi, lo])

    ops = []
    for blk in range(num_blocks):
        col = lambda a: jnp.asarray(a, jnp.float32)[:, None]
        wqkv_t = jnp.asarray(stacked["wqkv"][blk], jnp.float32).T
        bqkv_c = col(stacked["bqkv"][blk])
        if q_scale is not None:
            qs = jnp.float32(q_scale)
            wqkv_t = jnp.concatenate([wqkv_t[:c] * qs, wqkv_t[c:]], axis=0)
            bqkv_c = jnp.concatenate([bqkv_c[:c] * qs, bqkv_c[c:]], axis=0)
        ops += [
            col(stacked["ln1_g"][blk]), col(stacked["ln1_b"][blk]),
            wmat(wqkv_t),
            bqkv_c,
            wmat(jnp.asarray(stacked["wp"][blk]).T),
            col(stacked["bp"][blk]),
            col(stacked["ln2_g"][blk]), col(stacked["ln2_b"][blk]),
            wmat(jnp.asarray(stacked["w1"][blk]).T),
            col(stacked["b1"][blk]),
            wmat(jnp.asarray(stacked["w2"][blk]).T),
            col(stacked["b2"][blk]),
        ]
    return ops


@functools.partial(jax.jit, static_argnames=(
    "num_blocks", "num_heads", "first_masked_blocks", "windows_per_tile",
    "activation", "weights_dtype", "precision", "attn_mode", "token_pad_to",
    "epilogue", "attn_precision", "out_width"))
def fused_temporal_stack_v3(x: jax.Array, stacked: Dict,
                            key_mask: Optional[jax.Array] = None, *,
                            num_blocks: int, num_heads: int,
                            first_masked_blocks: int = 0,
                            windows_per_tile: int = 4,
                            activation: str = "relu",
                            weights_dtype=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT,
                            attn_mode: str = "full",
                            token_pad_to: int = 0,
                            prepped_ops=None,
                            epilogue=None,
                            epilogue_ops=(),
                            attn_precision=None,
                            out_width: int = 0) -> jax.Array:
    """x: (B, S, C) → (B, S, C) through the fused transformer stack.

    key_mask: (B, S), 1/True = blocked key, applied to the first
    `first_masked_blocks` blocks; the S→8-pad token is always blocked.

    out_width: with a selection epilogue (make_strided_b1_epilogue_sel),
    the last kernel group writes only (C, out_width = wpt·n_out) selected
    lanes instead of the full (C, R) — the output transpose then moves
    ~R/n_out× fewer bytes — and the return shape is (B, n_out, C).

    weights_dtype f32 with DEFAULT dots is the parity-default: on TPU the MXU
    rounds f32 DEFAULT dots to 1-pass bf16 anyway (same arithmetic as bf16
    weights) while CPU/interpret stays exact f32. bf16 weights halve weight
    VMEM so more blocks fit per kernel (one fewer HBM round-trip); HIGHEST
    restores full f32 dots for strict checkpoint parity. Blocks are chunked
    into groups whose resident weights fit VMEM.
    """
    b, s_in, c = x.shape
    s = -(-s_in // 8) * 8
    # Optional stronger token padding (e.g. 96) so R = wpt*s hits an exact
    # 128-lane-tile multiple — Mosaic perf probe
    s = max(s, token_pad_to)
    wpt = windows_per_tile
    while b % wpt != 0 and wpt > 1:
        wpt //= 2
    r = wpt * s
    hidden = stacked["w1"].shape[2]

    xp = jnp.pad(x, ((0, 0), (0, s - s_in), (0, 0))) if s != s_in else x
    n_tiles_ = (b * s) // (wpt * s)
    # (tile, C, R): per-tile transposed layout; 3D so the grid block (1,C,R)
    # equals the array's trailing dims (R is not 128-divisible)
    x_t = xp.reshape(n_tiles_, wpt * s, c).transpose(0, 2, 1)

    # Block-diagonal window mask (R, R)
    blkdiag = np.full((r, r), -1e9, np.float32)
    for w in range(wpt):
        blkdiag[w * s:(w + 1) * s, w * s:(w + 1) * s] = 0.0
    blkdiag = jnp.asarray(blkdiag)

    # Pad-token row mask (per tile): -1e9 at lanes t >= s_in within each window
    pad_row = np.zeros((s,), np.float32)
    pad_row[s_in:] = -1e9
    padrow_tile = jnp.asarray(np.tile(pad_row, wpt))[None, :]  # (1, R)
    n_tiles = (b * s) // r

    banded = attn_mode == "banded"
    if key_mask is not None and first_masked_blocks > 0:
        km = jnp.pad(key_mask.astype(jnp.float32), ((0, 0), (0, s - s_in)),
                     constant_values=1.0) * -1e9
        km = jnp.minimum(km, jnp.asarray(pad_row)[None])  # both masks
        keyrow = km.reshape(n_tiles, 1, r)
        # Rank-2 band-space key mask (R, s): every query lane of window w
        # gets window w's key row (the kernel adds it to the (R, s) band —
        # rank-3 middle-dim broadcasts crash Mosaic, see _make_kernel_v3)
        keyband = jnp.broadcast_to(
            km.reshape(n_tiles, wpt, 1, s),
            (n_tiles, wpt, s, s)).reshape(n_tiles, r, s)
    else:
        keyrow = jnp.broadcast_to(padrow_tile, (n_tiles, 1, r))
        keyband = None
        first_masked_blocks = 0

    padrow_full = jnp.broadcast_to(padrow_tile, (n_tiles, 1, r))
    ones_row = jnp.ones((8, c), jnp.float32)

    if banded:
        # One-hot band selectors: eband[w] embeds window w's keys from the
        # full R lanes into s band columns.
        eband_np = np.zeros((wpt, r, s), np.float32)
        for w in range(wpt):
            eband_np[w, w * s:(w + 1) * s, :] = np.eye(s, dtype=np.float32)
        eband = jnp.asarray(eband_np)
        ebandT = jnp.asarray(eband_np.transpose(0, 2, 1))
        padband = jnp.asarray(pad_row)[None, :]  # (1, s)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    # Weight VMEM per block ≈ (3C² + C² + 2·C·hidden) · itemsize; keep the
    # resident group under ~10 MB so activations + logits still fit.
    itemsize = jnp.dtype(weights_dtype).itemsize
    per_block = (3 * c * c + c * c + 2 * c * hidden) * itemsize
    group = max(1, min(num_blocks, int(10e6 // max(per_block, 1))))

    # HIGH3 rung: pre-split weight hi/lo planes on host (the in-kernel split
    # would re-run every grid step); prepped_ops callers keep the in-kernel
    # split.
    presplit = precision == HIGH3 and prepped_ops is None
    block_ops = (list(prepped_ops) if prepped_ops is not None
                 else _transposed_operands(
                     stacked, num_blocks, weights_dtype,
                     q_scale=1.0 / np.sqrt(c // num_heads),
                     presplit=presplit))
    out = x_t
    done = 0
    while done < num_blocks:
        n_grp = min(group, num_blocks - done)
        last_group = done + n_grp >= num_blocks
        ep = epilogue if last_group else None
        ep_ops = list(epilogue_ops) if (last_group and epilogue is not None) else []
        fmb_grp = max(0, min(n_grp, first_masked_blocks - done))
        kernel = _make_kernel_v3(n_grp, wpt, s, c, hidden, num_heads,
                                 fmb_grp, activation, precision, attn_mode,
                                 num_epilogue_refs=len(ep_ops), epilogue=ep,
                                 attn_precision=attn_precision,
                                 presplit=presplit)
        grp_ops = block_ops[12 * done: 12 * (done + n_grp)]
        x_spec = pl.BlockSpec((1, c, r), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        if banded:
            if fmb_grp > 0:
                kb_arg, kb_spec = keyband, pl.BlockSpec(
                    (1, r, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            else:  # unused by this group's kernel — skip the 42 MB stream
                kb_arg, kb_spec = padband, full(padband)
            fixed_specs = [
                x_spec, full(eband), full(ebandT), kb_spec,
                full(padband), full(ones_row),
            ]
            fixed_args = (eband, ebandT, kb_arg, padband, ones_row)
        else:
            fixed_specs = [
                x_spec, full(blkdiag),
                pl.BlockSpec((1, 1, r), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, r), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                full(ones_row),
            ]
            fixed_args = (blkdiag, keyrow, padrow_full, ones_row)
        in_specs = fixed_specs + [full(op) for op in grp_ops] \
            + [full(op) for op in ep_ops]
        ow = out_width if (last_group and out_width) else r
        out = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, c, ow), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles, c, ow), jnp.float32),
            # Lane-padded (n,1) column operands + weights overflow the 16 MB
            # default scoped-VMEM budget, silently demoting operands to
            # streaming; raise the cap (proven safe by the backward kernel).
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(out, *fixed_args, *grp_ops, *ep_ops)
        done += n_grp
    if out_width:
        # Selection epilogue: (n_tiles, C, wpt·n_out) → (B, n_out, C)
        n_out = out_width // wpt
        return out.transpose(0, 2, 1).reshape(b, n_out, c)
    return out.transpose(0, 2, 1).reshape(b, s, c)[:, :s_in]


@functools.partial(jax.jit, static_argnames=(
    "num_blocks", "num_heads", "s_in", "first_masked_blocks",
    "windows_per_tile", "activation", "weights_dtype", "precision",
    "attn_precision", "epilogue", "out_width", "s2t_mode"))
def fused_temporal_stack_v3_tiled(x_tiles: jax.Array, stacked: Dict,
                                  key_mask: Optional[jax.Array] = None, *,
                                  num_blocks: int, num_heads: int, s_in: int,
                                  first_masked_blocks: int = 0,
                                  windows_per_tile: int = 4,
                                  activation: str = "relu",
                                  weights_dtype=jnp.float32,
                                  precision=jax.lax.Precision.DEFAULT,
                                  attn_precision=None,
                                  s2t_ops=None,
                                  stride_mask: Optional[jax.Array] = None,
                                  epilogue=None, epilogue_ops=(),
                                  out_width: int = 0,
                                  s2t_mode: str = "full") -> jax.Array:
    """Tiled-I/O temporal stack: consumes/produces the kernel's transposed
    tile layout directly, with the spatial→temporal Dense fused as a kernel
    prologue — no XLA pad/transpose round-trip between the spatial and
    temporal kernels (measured to dominate the non-tiled wrapper).

    x_tiles: (n_tiles, C_in, R) with R = windows_per_tile·s and frames
    window-padded to s (the layout `fused_spatial_stack_tiled` writes).
    s2t_ops: (w_s2t_T (C, C_in), b_s2t (C, 1), token (C, 1), pe (C, s)) —
    when given, the prologue computes s2t Dense + masked-token substitution
    (from `stride_mask` (B, s_in)) + temporal PE in-kernel.
    epilogue/epilogue_ops: as in `fused_temporal_stack_v3`; with
    `out_width` > 0 the last group's output is (n_tiles, C, out_width)
    (an epilogue that applies in-kernel lane selection).
    Banded attention only. Returns (n_tiles, C, out_width or R).
    """
    n_tiles, c_in, r = x_tiles.shape
    wpt = windows_per_tile
    s = r // wpt
    assert s * wpt == r
    b = n_tiles * wpt
    c = stacked["wqkv"].shape[1]
    hidden = stacked["w1"].shape[2]

    pad_row = np.zeros((s,), np.float32)
    pad_row[s_in:] = -1e9

    if key_mask is not None and first_masked_blocks > 0:
        km = jnp.pad(key_mask.astype(jnp.float32), ((0, 0), (0, s - s_in)),
                     constant_values=1.0) * -1e9
        km = jnp.minimum(km, jnp.asarray(pad_row)[None])
        # Rank-2 band-space key mask (R, s) — see fused_temporal_stack_v3
        keyband = jnp.broadcast_to(
            km.reshape(n_tiles, wpt, 1, s),
            (n_tiles, wpt, s, s)).reshape(n_tiles, r, s)
    else:
        keyband = None
        first_masked_blocks = 0

    eband_np = np.zeros((wpt, r, s), np.float32)
    for w in range(wpt):
        eband_np[w, w * s:(w + 1) * s, :] = np.eye(s, dtype=np.float32)
    eband = jnp.asarray(eband_np)
    ebandT = jnp.asarray(eband_np.transpose(0, 2, 1))
    padband = jnp.asarray(pad_row)[None, :]
    ones_row = jnp.ones((8, c), jnp.float32)

    s2t_args, tokmask = (), None
    if s2t_ops is not None:
        w_s2t, b_s2t, token, pe = s2t_ops
        if stride_mask is not None:
            tm = jnp.pad(stride_mask.astype(jnp.float32),
                         ((0, 0), (0, s - s_in)), constant_values=1.0)
        else:
            tm = jnp.ones((b, s), jnp.float32)
        tokmask = tm.reshape(n_tiles, 1, r)
        s2t_args = (w_s2t, b_s2t, token, pe)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    itemsize = jnp.dtype(weights_dtype).itemsize
    per_block = (3 * c * c + c * c + 2 * c * hidden) * itemsize
    group = max(1, min(num_blocks, int(10e6 // max(per_block, 1))))
    presplit = precision == HIGH3
    block_ops = _transposed_operands(stacked, num_blocks, weights_dtype,
                                     q_scale=1.0 / np.sqrt(c // num_heads),
                                     presplit=presplit)

    out = x_tiles
    done = 0
    while done < num_blocks:
        n_grp = min(group, num_blocks - done)
        first_group = done == 0
        last_group = done + n_grp >= num_blocks
        ep = epilogue if last_group else None
        ep_ops = list(epilogue_ops) if (last_group and epilogue is not None) else []
        fmb_grp = max(0, min(n_grp, first_masked_blocks - done))
        with_s2t = first_group and s2t_ops is not None
        kernel = _make_kernel_v3(n_grp, wpt, s, c, hidden, num_heads,
                                 fmb_grp, activation, precision, "banded",
                                 num_epilogue_refs=len(ep_ops), epilogue=ep,
                                 attn_precision=attn_precision, s2t=with_s2t,
                                 s2t_mode=s2t_mode, presplit=presplit)
        grp_ops = block_ops[12 * done: 12 * (done + n_grp)]
        cur_cin = out.shape[1]
        if fmb_grp > 0:
            kb_arg, kb_spec = keyband, pl.BlockSpec(
                (1, r, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        else:
            kb_arg, kb_spec = padband, full(padband)
        in_specs = [
            pl.BlockSpec((1, cur_cin, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full(eband), full(ebandT), kb_spec,
            full(padband), full(ones_row),
        ]
        args = [out, eband, ebandT, kb_arg, padband, ones_row]
        if with_s2t:
            in_specs += [full(op) for op in s2t_args[:3]]
            in_specs.append(pl.BlockSpec((1, 1, r), lambda i: (i, 0, 0),
                                         memory_space=pltpu.VMEM))
            in_specs.append(full(s2t_args[3]))
            args += [*s2t_args[:3], tokmask, s2t_args[3]]
        in_specs += [full(op) for op in grp_ops] + [full(op) for op in ep_ops]
        args += [*grp_ops, *ep_ops]
        ow = out_width if (last_group and out_width) else r
        out = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, c, ow), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles, c, ow), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(*args)
        done += n_grp
    return out
