"""Fully-fused spatial-transformer stack as one Pallas kernel.

The spatial stage (embedding → 4 pre-norm blocks over 17 joint tokens →
LayerNorm) is ~73% of forward time in XLA, dominated not by FLOPs but by
tile padding: every (…, 17, 4|17|32) intermediate pads its trailing dims to
the (8, 128) register tile in HBM *and* between fusions.

This kernel runs the entire stack per tile of F = B·N frames with the
frame axis on the 128-lane dimension:

    activations: (P=17, C, bt)   — C∈{32, 64} sublane-exact, bt lanes full
    logits:      (17, 17, bt)    — only the 17→24 sublane pad remains

Dense layers are per-joint MXU dots ((C_out, C_in) @ (C_in, bt)); attention
logits/context are rank-3 broadcast FMAs on the VPU; everything between the
HBM read of the (17, 2, F) input and the write of the (17, C, F) output
lives in VMEM.

Deterministic (eval) path only — the XLA path remains for training (which
needs dropout/drop-path RNG and autodiff).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """Abramowitz–Stegun 7.1.26 rational approximation (|err| ≤ 1.5e-7).

    Mosaic has no erf primitive; this is within f32 noise of exact for the
    gelu used by the spatial blocks.
    """
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _layer_norm(x, gamma, beta, eps):
    # x: (P, C, bt); normalize over C (axis 1). Exact sqrt + divide — Mosaic's
    # rsqrt is a fast approximation (~1e-3 rel) that drifts across 9 norms.
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * gamma + beta


HIGH3 = "high3"  # manual bf16x3 (Precision.HIGH equivalent; Mosaic lacks HIGH)


def _dense_per_joint(x, w_t, bias, p_tokens, precision):
    """x: (P, C_in, bt) → (P, C_out, bt) via per-joint MXU dots.

    w_t: (C_out, C_in) transposed kernel; bias: (C_out, 1) or None.
    Precision: Mosaic's DEFAULT lowers f32 dots to 1-pass bf16, which drifts
    ~1e-1 through the 4-block stack (random weights); HIGHEST matches CPU f32
    to ~6e-6 but costs ~2x. HIGH3 implements the bf16x3 split manually
    (hi/lo decomposition, three DEFAULT passes): ~1e-6 accuracy at ~half the
    HIGHEST dot cost.
    """
    if precision == HIGH3:
        w_hi = w_t.astype(jnp.bfloat16).astype(jnp.float32)
        w_lo = w_t - w_hi

        def dot(xp):
            x_hi = xp.astype(jnp.bfloat16).astype(jnp.float32)
            x_lo = xp - x_hi
            dims = (((1,), (0,)), ((), ()))
            y = jax.lax.dot_general(w_hi, x_hi, dims,
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.DEFAULT)
            y += jax.lax.dot_general(w_hi, x_lo, dims,
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.DEFAULT)
            y += jax.lax.dot_general(w_lo, x_hi, dims,
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.DEFAULT)
            return y
    else:
        def dot(xp):
            return jax.lax.dot_general(w_t, xp, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32,
                                       precision=precision)

    rows = []
    for p in range(p_tokens):
        y = dot(x[p])
        rows.append(y if bias is None else y + bias)
    return jnp.stack(rows, axis=0)


def _qkv_per_joint(x, wq_b, wk_b, wv_b, p_tokens, precision):
    """q/k/v per-joint dots sharing ONE per-joint activation split.

    Under HIGH3 the generic path splits x[p] into bf16 hi/lo once per dot —
    3x per joint for q/k/v on the same LN output. This computes the split
    once per joint and reuses it for all three projections (the weight
    hi/lo split already happens once per projection). Identical math.
    """
    if precision != HIGH3:
        return tuple(_dense_per_joint(x, w_t, bias, p_tokens, precision)
                     for w_t, bias in (wq_b, wk_b, wv_b))
    dims = (((1,), (0,)), ((), ()))
    splits = []
    for p in range(p_tokens):
        x_hi = x[p].astype(jnp.bfloat16).astype(jnp.float32)
        splits.append((x_hi, x[p] - x_hi))
    outs = []
    for w_t, bias in (wq_b, wk_b, wv_b):
        w_hi = w_t.astype(jnp.bfloat16).astype(jnp.float32)
        w_lo = w_t - w_hi
        rows = []
        for p in range(p_tokens):
            x_hi, x_lo = splits[p]
            y = jax.lax.dot_general(w_hi, x_hi, dims,
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.DEFAULT)
            y += jax.lax.dot_general(w_hi, x_lo, dims,
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.DEFAULT)
            y += jax.lax.dot_general(w_lo, x_hi, dims,
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.DEFAULT)
            rows.append(y + bias)
        outs.append(jnp.stack(rows, axis=0))
    return tuple(outs)


def _dense_per_joint_t(x, w_t, bias, p_tokens, num_heads, depth, precision):
    """Per-joint dots emitted in head-major T-layout (H, D, P, bt).

    Identical MXU work to `_dense_per_joint`; only the stacking differs —
    each joint's (C_out, bt) result is viewed as (H, D, bt) (a free
    leading-dim split) and joints stack on axis 2.
    """
    if precision == HIGH3:
        w_hi = w_t.astype(jnp.bfloat16).astype(jnp.float32)
        w_lo = w_t - w_hi

        def dot(xp):
            x_hi = xp.astype(jnp.bfloat16).astype(jnp.float32)
            x_lo = xp - x_hi
            dims = (((1,), (0,)), ((), ()))
            y = jax.lax.dot_general(w_hi, x_hi, dims,
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.DEFAULT)
            y += jax.lax.dot_general(w_hi, x_lo, dims,
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.DEFAULT)
            y += jax.lax.dot_general(w_lo, x_hi, dims,
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.DEFAULT)
            return y
    else:
        def dot(xp):
            return jax.lax.dot_general(w_t, xp, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32,
                                       precision=precision)

    bt = x.shape[-1]
    rows = []
    for p in range(p_tokens):
        y = dot(x[p])
        if bias is not None:
            y = y + bias
        rows.append(y.reshape(num_heads, depth, bt))
    return jnp.stack(rows, axis=2)  # (H, D, P, bt)


def _make_kernel(num_blocks: int, p_tokens: int, c: int, hidden: int,
                 num_heads: int, mlp_gelu: bool, precision,
                 have_droppath: bool = False, attn: str = "fma",
                 bisect: str = "full", tiled_io: bool = False):
    depth = c // num_heads
    scale = 1.0 / float(depth) ** 0.5

    def attention_fma(q, k, v):
        # Per-head FMA loops: q/k/v (P, C, bt). The 1/sqrt(d) scale is folded
        # into wq/bq at operand build (saves one (P, P, bt) pass per head);
        # the softmax denominator divides the (P, depth, bt) context instead
        # of the (P, P, bt) weights (same math, 1/heads'th the elements).
        ctx_heads = []
        for h in range(num_heads):
            sl = slice(h * depth, (h + 1) * depth)
            if bisect == "softmax_only":
                # Perf bisection: skip the logits FMAs, softmax a cheap
                # data-dependent broadcast instead.
                logits = jnp.broadcast_to(q[:, h * depth, :][:, None, :],
                                          (p_tokens, p_tokens, q.shape[-1]))
            else:
                logits = None
                for d in range(depth):
                    e = h * depth + d
                    qd = q[:, e, :][:, None, :]   # (P, 1, bt)
                    kd = k[:, e, :][None, :, :]   # (1, P, bt)
                    contrib = qd * kd
                    logits = contrib if logits is None else logits + contrib
            if bisect == "logits_only":
                w, denom = logits, None  # skip softmax, keep the ctx FMAs
            else:
                m = jnp.max(logits, axis=1, keepdims=True)
                w = jnp.exp(logits - m)               # unnormalized (P, P, bt)
                denom = jnp.sum(w, axis=1, keepdims=True)  # (P, 1, bt)
            ctx_h = None
            for kk in range(p_tokens):
                piece = w[:, kk, :][:, None, :] * v[kk, sl, :][None, :, :]
                ctx_h = piece if ctx_h is None else ctx_h + piece  # (P, depth, bt)
            if denom is not None:
                ctx_h = ctx_h / denom
            ctx_heads.append(ctx_h)
        return jnp.concatenate(ctx_heads, axis=1)  # (P, C, bt)

    def attention_hpack(q, k, v):
        # Head-packed LANES: all 8 heads' rank-3 FMAs fused into one set by
        # packing heads onto the lane axis (lane index = h·bt + t). Identical
        # element counts to the per-head loops, ~5x fewer vector-op issues
        # (the spatial kernel is issue-bound — PERF_NOTES stage decomposition).
        # q/k/v: (P, C, bt) → packed (P, depth, H·bt) via 8 lane-offset
        # copies per tensor (lane concat is cheap; bt is a 128-multiple).
        # Mosaic requires every concat input at sublane offset 0, but head
        # slice h starts at sublane (h·depth) mod 8 — so slice each piece
        # from a copy pre-rolled by that offset (one roll per distinct
        # offset, e.g. one for depth=4).
        bt = q.shape[-1]

        def pack(x):
            rolled = {0: x}
            pieces = []
            for h in range(num_heads):
                off = (h * depth) % 8
                if off not in rolled:
                    rolled[off] = pltpu.roll(x, x.shape[1] - off, axis=1)
                base = rolled[off]
                lo = h * depth - off
                pieces.append(base[:, lo:lo + depth, :])
            return jnp.concatenate(pieces, axis=-1)  # (P, depth, H·bt)

        qp, kp, vp = pack(q), pack(k), pack(v)
        logits = None
        for d in range(depth):
            qd = qp[:, d, :][:, None, :]   # (P, 1, H·bt)
            kd = kp[:, d, :][None, :, :]   # (1, P, H·bt)
            contrib = qd * kd
            logits = contrib if logits is None else logits + contrib
        # softmax over keys (axis 1) for all heads at once
        m = jnp.max(logits, axis=1, keepdims=True)
        w = jnp.exp(logits - m)                      # (P, P, H·bt)
        denom = jnp.sum(w, axis=1, keepdims=True)    # (P, 1, H·bt)
        ctx = None
        for kk in range(p_tokens):
            piece = w[:, kk, :][:, None, :] * vp[kk][None, :, :]
            ctx = piece if ctx is None else ctx + piece  # (P, depth, H·bt)
        ctx = ctx / denom
        # unpack lanes back to channels: (P, depth, H·bt) → (P, C, bt)
        return jnp.concatenate(
            [ctx[:, :, h * bt:(h + 1) * bt] for h in range(num_heads)],
            axis=1)

    def attention_batched(qT, kT, vT):
        # Head-batched 4D FMAs: q/k/v in T-layout (H, D, P, bt). 21 vector
        # ops instead of ~170: logits for ALL heads via `depth` rank-4 FMAs
        # (head/depth slices are free leading-dim indexing), one batched
        # softmax, ctx via `P` rank-4 FMAs.
        logits = None
        for d in range(depth):
            piece = qT[:, d][:, :, None, :] * kT[:, d][:, None, :, :]
            logits = piece if logits is None else logits + piece
        # (H, P_q, P_k, bt); 1/sqrt(d) pre-folded into wq/bq
        m = jnp.max(logits, axis=2, keepdims=True)
        ex = jnp.exp(logits - m)
        w = ex / jnp.sum(ex, axis=2, keepdims=True)
        ctxT = None
        for kk in range(p_tokens):
            piece = (w[:, :, kk, :][:, None, :, :]     # (H, 1, P_q, bt)
                     * vT[:, :, kk, :][:, :, None, :])  # (H, D, 1, bt)
            ctxT = piece if ctxT is None else ctxT + piece  # (H, D, P_q, bt)
        return ctxT

    def kernel(x_ref, emb_w_ref, emb_b_ref, pe_ref,
               ln1_g_ref, ln1_b_ref, wq_ref, bq_ref, wk_ref, bk_ref,
               wv_ref, bv_ref, wp_ref, bp_ref, ln2_g_ref, ln2_b_ref,
               w1_ref, b1_ref, w2_ref, b2_ref, norm_g_ref, norm_b_ref,
               *rest):
        # rest = (dp_ref, o_ref) with stochastic-depth scales, else (o_ref,)
        dp_ref = rest[0] if have_droppath else None
        o_ref = rest[-1]
        # Embedding: (P, 2, bt) → (P, C, bt), then + PE
        emb_w_t = emb_w_ref[:].T  # (C, 2)
        emb_b = emb_b_ref[:].reshape(c, 1)
        x_in = x_ref[0] if tiled_io else x_ref[:]
        x = _dense_per_joint(x_in.astype(jnp.float32), emb_w_t, emb_b, p_tokens, precision)
        x = x + pe_ref[:][:, :, None]  # (P, C) broadcast over lanes

        for blk in range(num_blocks):
            g1 = ln1_g_ref[blk].reshape(c, 1)
            b1_ = ln1_b_ref[blk].reshape(c, 1)
            y = _layer_norm(x, g1, b1_, 1e-5)

            if attn == "batched":
                qT = _dense_per_joint_t(y, wq_ref[blk].T, bq_ref[blk].reshape(c, 1),
                                        p_tokens, num_heads, depth, precision)
                kT = _dense_per_joint_t(y, wk_ref[blk].T, bk_ref[blk].reshape(c, 1),
                                        p_tokens, num_heads, depth, precision)
                vT = _dense_per_joint_t(y, wv_ref[blk].T, bv_ref[blk].reshape(c, 1),
                                        p_tokens, num_heads, depth, precision)
                ctxT = attention_batched(qT, kT, vT)  # (H, D, P, bt)
                # Per-joint (C, bt) views are free leading-dim merges
                ctx = jnp.stack([ctxT[:, :, p_, :].reshape(c, -1)
                                 for p_ in range(p_tokens)], axis=0)
            else:
                q, k, v = _qkv_per_joint(
                    y, (wq_ref[blk].T, bq_ref[blk].reshape(c, 1)),
                    (wk_ref[blk].T, bk_ref[blk].reshape(c, 1)),
                    (wv_ref[blk].T, bv_ref[blk].reshape(c, 1)),
                    p_tokens, precision)
                if bisect == "qkvonly":  # LN + qkv dots only
                    x = x + q + k + v
                    continue
                if bisect == "noattn":
                    ctx = v
                elif attn == "hpack":
                    ctx = attention_hpack(q, k, v)  # (P, C, bt)
                else:
                    ctx = attention_fma(q, k, v)  # (P, C, bt)

            proj = _dense_per_joint(ctx, wp_ref[blk].T, bp_ref[blk].reshape(c, 1),
                                    p_tokens, precision)
            if dp_ref is not None:
                # per-frame stochastic-depth scale (0 or 1/keep_prob)
                proj = proj * dp_ref[2 * blk, :][None, None, :]
            x = x + proj

            if bisect == "nomlp":
                continue
            g2 = ln2_g_ref[blk].reshape(c, 1)
            b2_ = ln2_b_ref[blk].reshape(c, 1)
            z = _layer_norm(x, g2, b2_, 1e-5)
            h1 = _dense_per_joint(z, w1_ref[blk].T, b1_ref[blk].reshape(hidden, 1),
                                  p_tokens, precision)
            if mlp_gelu:
                h1 = 0.5 * h1 * (1.0 + _erf(h1 * np.float32(1.0 / np.sqrt(2.0))))
            else:
                h1 = jnp.maximum(h1, 0.0)
            z = _dense_per_joint(h1, w2_ref[blk].T, b2_ref[blk].reshape(c, 1),
                                 p_tokens, precision)
            if dp_ref is not None:
                z = z * dp_ref[2 * blk + 1, :][None, None, :]
            x = x + z

        # Final spatial_norm (eps 1e-6)
        x = _layer_norm(x, norm_g_ref[:].reshape(c, 1), norm_b_ref[:].reshape(c, 1),
                        1e-6)
        if tiled_io:
            # Merge (P, C, R) → (P·C, R): p-major row order, matching the
            # reference's `b n p c -> b n (p c)` flatten before the s2t
            # Dense — the layout `fused_temporal_stack_v3_tiled` consumes.
            o_ref[0] = x.reshape(p_tokens * c, -1).astype(o_ref.dtype)
        else:
            o_ref[:] = x.astype(o_ref.dtype)

    return kernel


def stack_spatial_params(params: Dict, num_blocks: int):
    """Collect the spatial-stack params into the kernel's stacked operands."""
    blocks = [params[f"spatial_block_{i + 1}"] for i in range(num_blocks)]
    st = lambda get: jnp.stack([jnp.asarray(get(b), jnp.float32) for b in blocks])
    return dict(
        emb_w=jnp.asarray(params["keypoint_embedding"]["kernel"], jnp.float32),
        emb_b=jnp.asarray(params["keypoint_embedding"]["bias"], jnp.float32),
        pe=jnp.asarray(params["spatial_pe"], jnp.float32),
        ln1_g=st(lambda b: b["norm1"]["scale"]), ln1_b=st(lambda b: b["norm1"]["bias"]),
        wq=st(lambda b: b["attn"]["wq"]["kernel"]), bq=st(lambda b: b["attn"]["wq"]["bias"]),
        wk=st(lambda b: b["attn"]["wk"]["kernel"]), bk=st(lambda b: b["attn"]["wk"]["bias"]),
        wv=st(lambda b: b["attn"]["wv"]["kernel"]), bv=st(lambda b: b["attn"]["wv"]["bias"]),
        wp=st(lambda b: b["attn"]["proj"]["kernel"]), bp=st(lambda b: b["attn"]["proj"]["bias"]),
        ln2_g=st(lambda b: b["norm2"]["scale"]), ln2_b=st(lambda b: b["norm2"]["bias"]),
        w1=st(lambda b: b["mlp"]["fc1"]["kernel"]), b1=st(lambda b: b["mlp"]["fc1"]["bias"]),
        w2=st(lambda b: b["mlp"]["fc2"]["kernel"]), b2=st(lambda b: b["mlp"]["fc2"]["bias"]),
        norm_g=jnp.asarray(params["spatial_norm"]["scale"], jnp.float32),
        norm_b=jnp.asarray(params["spatial_norm"]["bias"], jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("num_blocks", "num_heads", "mlp_gelu",
                                             "block_f", "precision", "attn",
                                             "bisect"))
def fused_spatial_stack(x_t: jax.Array, stacked: Dict, *, num_blocks: int,
                        num_heads: int, mlp_gelu: bool = True,
                        block_f: int = 128,
                        precision=jax.lax.Precision.HIGHEST,
                        droppath_scales=None, attn: str = "fma",
                        bisect: str = "full") -> jax.Array:
    """x_t: (P, 2, F) transposed input → (P, C, F) spatial-stack output.

    bisect: perf-bisection modes ("full" | "qkvonly" | "noattn" |
    "logits_only" | "softmax_only" | "nomlp") — profiling only, wrong math.
    """
    p_tokens, c_in, f = x_t.shape
    c = stacked["emb_w"].shape[1]
    hidden = stacked["w1"].shape[2]
    # The lane (frame) dim must tile by block_f with block_f % 128 == 0
    assert block_f % 128 == 0 and f % block_f == 0, (f, block_f)

    # Fold the attention 1/sqrt(d) into the q projection (free host-side op;
    # removes one full (P, P, bt) scaling pass per head per block in-kernel)
    scale = 1.0 / float(c // num_heads) ** 0.5
    stacked = dict(stacked, wq=stacked["wq"] * scale, bq=stacked["bq"] * scale)

    kernel = _make_kernel(num_blocks, p_tokens, c, hidden, num_heads, mlp_gelu,
                          precision, have_droppath=droppath_scales is not None,
                          attn=attn, bisect=bisect)

    def full(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)

    param_order = ["emb_w", "emb_b", "pe", "ln1_g", "ln1_b", "wq", "bq", "wk", "bk",
                   "wv", "bv", "wp", "bp", "ln2_g", "ln2_b", "w1", "b1", "w2", "b2",
                   "norm_g", "norm_b"]
    in_specs = [pl.BlockSpec((p_tokens, c_in, block_f), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM)]
    in_specs += [full(stacked[name].shape) for name in param_order]
    args = [x_t] + [stacked[name] for name in param_order]
    if droppath_scales is not None:
        assert droppath_scales.shape == (2 * num_blocks, f)
        in_specs.append(pl.BlockSpec((2 * num_blocks, block_f), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        args.append(droppath_scales.astype(jnp.float32))

    return pl.pallas_call(
        kernel,
        grid=(f // block_f,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((p_tokens, c, block_f), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p_tokens, c, f), jnp.float32),
    )(*args)


def spatial_stack_apply(params: Dict, x2d: jax.Array, *, num_blocks: int,
                        num_heads: int, block_f: int = 128,
                        precision=HIGH3, bisect: str = "full",
                        attn: str = "fma") -> jax.Array:
    """(B, N, P, 2) masked keypoints → (B, N, P·C) spatial output.

    Drop-in replacement for the model's spatial_transformation +
    reshape (pre spatial_to_temporal Dense), eval mode.
    """
    b, n, p, c_in = x2d.shape
    f = b * n
    x_t = x2d.reshape(f, p, c_in).transpose(1, 2, 0)  # (P, 2, F)
    # Pad frames to a block_f multiple (block_f itself must be 128-aligned)
    while block_f > 128 and f < block_f:
        block_f //= 2
    block_f = max(block_f, 128)
    f_pad = -(-f // block_f) * block_f
    if f_pad != f:
        x_t = jnp.pad(x_t, ((0, 0), (0, 0), (0, f_pad - f)))
    stacked = stack_spatial_params(params, num_blocks)
    y = fused_spatial_stack(x_t, stacked, num_blocks=num_blocks,
                            num_heads=num_heads, block_f=block_f,
                            precision=precision, bisect=bisect,
                            attn=attn)  # (P, C, F_pad)
    c = y.shape[1]
    return y[:, :, :f].transpose(2, 0, 1).reshape(b, n, p * c)


@functools.partial(jax.jit, static_argnames=("num_blocks", "num_heads",
                                             "mlp_gelu", "precision"))
def fused_spatial_stack_tiled(x_t4: jax.Array, stacked: Dict, *,
                              num_blocks: int, num_heads: int,
                              mlp_gelu: bool = True,
                              precision=HIGH3) -> jax.Array:
    """Spatial stack with tiled I/O for direct kernel→kernel hand-off.

    x_t4: (n_tiles, P, 2, R) — frames window-padded and grouped exactly as
    the temporal kernel's tiles (R = wpt·s lanes). Output (n_tiles, P·C, R):
    the temporal kernel's s2t-prologue input, written without any XLA
    transpose between the two kernels. Per-frame math is identical to
    `fused_spatial_stack` (frames are independent in the spatial stage; the
    window-pad frames compute garbage that later stages mask/slice away).
    """
    n_tiles, p_tokens, c_in, r = x_t4.shape
    c = stacked["emb_w"].shape[1]
    hidden = stacked["w1"].shape[2]

    # 1/sqrt(d) folded into wq/bq (see fused_spatial_stack)
    scale = 1.0 / float(c // num_heads) ** 0.5
    stacked = dict(stacked, wq=stacked["wq"] * scale, bq=stacked["bq"] * scale)

    kernel = _make_kernel(num_blocks, p_tokens, c, hidden, num_heads,
                          mlp_gelu, precision, tiled_io=True)

    def full(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)

    param_order = ["emb_w", "emb_b", "pe", "ln1_g", "ln1_b", "wq", "bq", "wk",
                   "bk", "wv", "bv", "wp", "bp", "ln2_g", "ln2_b", "w1", "b1",
                   "w2", "b2", "norm_g", "norm_b"]
    in_specs = [pl.BlockSpec((1, p_tokens, c_in, r), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [full(stacked[name].shape) for name in param_order]
    args = [x_t4] + [stacked[name] for name in param_order]

    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, p_tokens * c, r), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, p_tokens * c, r),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(*args)


# ---------------------------------------------------------------------------
# Training path: fused forward with a custom VJP whose backward runs through
# an XLA-equivalent function (rematerializing forward). Stochastic depth is
# supplied as precomputed per-frame scales so forward and backward agree.
# ---------------------------------------------------------------------------

def _xla_spatial_stack(stacked: Dict, x_t: jax.Array, droppath_scales,
                       num_heads: int):
    """jnp reference of the kernel math, (P, 2, F) → (P, C, F).

    Internally uses the standard frames-major layout with split-head
    attention — the fast XLA form — since this runs (and is differentiated)
    inside the custom-VJP backward.
    """
    p_tokens, c_in, f = x_t.shape
    c = stacked["emb_w"].shape[1]
    num_blocks = stacked["wq"].shape[0]
    depth = c // num_heads

    def ln(x, g, b, eps):  # x: (F, P, C), normalize over C
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + eps) * g + b

    x = x_t.astype(jnp.float32).transpose(2, 0, 1)  # (F, P, 2)
    x = x @ stacked["emb_w"] + stacked["emb_b"]
    x = x + stacked["pe"][None]
    for blk in range(num_blocks):
        y = ln(x, stacked["ln1_g"][blk], stacked["ln1_b"][blk], 1e-5)
        split = lambda t: t.reshape(f, p_tokens, num_heads, depth).transpose(0, 2, 1, 3)
        q = split(y @ stacked["wq"][blk] + stacked["bq"][blk])
        k = split(y @ stacked["wk"][blk] + stacked["bk"][blk])
        v = split(y @ stacked["wv"][blk] + stacked["bv"][blk])
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / np.float32(np.sqrt(depth))
        w = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", w, v,
                         preferred_element_type=jnp.float32)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(f, p_tokens, c)
        proj = ctx @ stacked["wp"][blk] + stacked["bp"][blk]
        if droppath_scales is not None:
            proj = proj * droppath_scales[2 * blk][:, None, None]
        x = x + proj
        z = ln(x, stacked["ln2_g"][blk], stacked["ln2_b"][blk], 1e-5)
        z = z @ stacked["w1"][blk] + stacked["b1"][blk]
        z = 0.5 * z * (1.0 + jax.lax.erf(z * np.float32(1.0 / np.sqrt(2.0))))
        z = z @ stacked["w2"][blk] + stacked["b2"][blk]
        if droppath_scales is not None:
            z = z * droppath_scales[2 * blk + 1][:, None, None]
        x = x + z
    x = ln(x, stacked["norm_g"], stacked["norm_b"], 1e-6)
    return x.transpose(1, 2, 0)  # (P, C, F)


# Backward implementation switch: "pallas" = hand-written backward kernel
# (ops/pallas_spatial_bwd.py, the fast path), "xla" = differentiate the jnp
# reference above with the Pallas forward rematerialized (slow; kept as the
# correctness oracle for tests and as a fallback).
SPATIAL_BWD_IMPL = "pallas"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_spatial_train(stacked: Dict, x_t: jax.Array, droppath_scales,
                        num_blocks: int, num_heads: int,
                        precision=jax.lax.Precision.HIGHEST,
                        block_f: int = 128, attn: str = "fma"):
    """Fused Pallas forward with a hand-written Pallas backward.

    stacked: stack_spatial_params output; x_t: (P, 2, F);
    droppath_scales: (2*num_blocks, F) stochastic-depth scales (0 or
    1/keep_prob per frame per residual branch), or ones at eval.
    precision: the TRAIN_MATMUL_PRECISION rung for fwd AND bwd dots
    (HIGHEST = full f32, HIGH3 = bf16x3 — both above the reference's
    effective TF32 training precision; DEFAULT = 1-pass bf16).
    block_f: frames per grid step for BOTH the forward and backward kernels
    (128-multiple; shrunk to fit if F isn't divisible). Measured sweet spot
    256 at the flagship budget (config TRAIN_SPATIAL_BLOCK_F; PERF_NOTES
    round-6 — 512 regresses on VMEM pressure).
    """
    f = x_t.shape[-1]
    while block_f > 128 and f % block_f:
        block_f //= 2
    # Non-power-of-two block_f (e.g. 384) can shrink below 128 without ever
    # dividing f; clamp to the always-legal 128 (f itself is 128-aligned).
    block_f = max(block_f, 128)
    if f % block_f:
        block_f = 128
    return fused_spatial_stack(x_t, stacked, num_blocks=num_blocks,
                               num_heads=num_heads,
                               precision=precision,
                               droppath_scales=droppath_scales,
                               block_f=block_f, attn=attn)


def _fst_fwd(stacked, x_t, droppath_scales, num_blocks, num_heads, precision,
             block_f, attn):
    out = fused_spatial_train(stacked, x_t, droppath_scales, num_blocks,
                              num_heads, precision, block_f, attn)
    return out, (stacked, x_t, droppath_scales)


def _fst_bwd(num_blocks, num_heads, precision, block_f, attn, residuals, g):
    stacked, x_t, droppath_scales = residuals

    if SPATIAL_BWD_IMPL == "pallas":
        from .pallas_spatial_bwd import fused_spatial_stack_bwd
        dps = droppath_scales
        if dps is None:
            dps = jnp.ones((2 * num_blocks, x_t.shape[-1]), jnp.float32)
        f = x_t.shape[-1]
        bf = block_f
        while bf > 128 and f % bf:
            bf //= 2
        ds, dx, ddp = fused_spatial_stack_bwd(
            x_t, stacked, dps, g, num_blocks=num_blocks, num_heads=num_heads,
            precision=precision, block_f=bf, attn=attn)
        return ds, dx, (None if droppath_scales is None else ddp)

    def ref(stacked, x_t, dps):
        return _xla_spatial_stack(stacked, x_t, dps, num_heads)

    if droppath_scales is None:
        _, vjp_fn = jax.vjp(lambda s, x: ref(s, x, None), stacked, x_t)
        ds, dx = vjp_fn(g)
        return ds, dx, None
    _, vjp_fn = jax.vjp(ref, stacked, x_t, droppath_scales)
    ds, dx, ddp = vjp_fn(g)
    return ds, dx, ddp


fused_spatial_train.defvjp(_fst_fwd, _fst_bwd)


def make_droppath_scales(rng, rates, num_frames, batch_frames_first=True):
    """(2*num_blocks, F) stochastic-depth scales from per-block rates.

    rates: per-block drop probabilities (linspace 0..top like the model);
    each residual branch draws an independent per-frame keep mask scaled by
    1/keep_prob (reference drop_path semantics, vision_transformer.py:16-28).
    """
    num_blocks = len(rates)
    rows = []
    for blk in range(num_blocks):
        rate = float(rates[blk])
        for branch in range(2):
            key = jax.random.fold_in(rng, blk * 2 + branch)
            if rate == 0.0:
                rows.append(jnp.ones((num_frames,), jnp.float32))
            else:
                keep = 1.0 - rate
                mask = jnp.floor(keep + jax.random.uniform(key, (num_frames,)))
                rows.append(mask / keep)
    return jnp.stack(rows, axis=0)
