"""Fused temporal transformer block as a Pallas kernel.

One kernel per block: LN → q/k/v → per-window attention → proj → residual →
LN → MLP (relu) → residual, entirely in VMEM per tile of windows. Saves the
LayerNorm HBM round-trips (~0.5 ms each) and the split-head attention's
transposed/padded intermediates that dominate the XLA temporal stage.

Layout: windows are padded 71 → 72 tokens (8-aligned) and flattened to
(bt·72, 384) tiles, so every Dense is a single full-width MXU dot and
per-window slices land on aligned sublanes. Per-head attention avoids
48-lane slicing by masking the contraction dim: logits_h = (q_w ⊙ m_h) k_wᵀ
with m_h selecting head h's channels — 3x the minimum MXU passes but zero
lane shuffles. The pad token is blocked via the additive key mask.

Deterministic (eval) path only; XLA remains for training.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _layer_norm_rows(x, gamma, beta, eps):
    # x: (R, C); normalize over C (lanes)
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * gamma[None, :] + beta[None, :]


def _make_kernel(windows_per_tile: int, tokens: int, c: int, hidden: int,
                 num_heads: int, have_mask: bool, precision):
    depth = c // num_heads
    scale = 1.0 / float(depth) ** 0.5
    s = tokens  # padded token count (72)

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=precision)

    def body(x_ref, mask_ref, ln1_g_ref, ln1_b_ref, wq_ref, bq_ref, wk_ref,
             bk_ref, wv_ref, bv_ref, wp_ref, bp_ref, ln2_g_ref, ln2_b_ref,
             w1_ref, b1_ref, w2_ref, b2_ref, head_mask_ref, o_ref):
        x = x_ref[:].astype(jnp.float32)  # (bt*72, 384)
        y = _layer_norm_rows(x, ln1_g_ref[:], ln1_b_ref[:], 1e-5)
        q = dot(y, wq_ref[:]) + bq_ref[:][None, :]
        k = dot(y, wk_ref[:]) + bk_ref[:][None, :]
        v = dot(y, wv_ref[:]) + bv_ref[:][None, :]

        attn_rows = []
        for w in range(windows_per_tile):
            rows = slice(w * s, (w + 1) * s)
            qw, kw, vw = q[rows], k[rows], v[rows]  # (72, 384)
            if have_mask:
                # (bt, 72) additive key mask, 1 = blocked (incl. the pad token)
                neg = mask_ref[w][None, :] * -1e9  # (1, 72)
            else:
                neg = None
            ctx = None
            kt = kw.T  # (384, 72)
            for h in range(num_heads):
                mh = head_mask_ref[h][None, :]  # (1, 384): 1 on head h's lanes
                logits = dot(qw * mh, kt) * scale  # (72, 72)
                if neg is not None:
                    logits = logits + neg
                m = jnp.max(logits, axis=1, keepdims=True)
                ex = jnp.exp(logits - m)
                wgt = ex / jnp.sum(ex, axis=1, keepdims=True)
                piece = dot(wgt, vw * mh)  # (72, 384), nonzero only on head lanes
                ctx = piece if ctx is None else ctx + piece
            attn_rows.append(ctx)
        attn = jnp.concatenate(attn_rows, axis=0)  # (bt*72, 384)

        x = x + dot(attn, wp_ref[:]) + bp_ref[:][None, :]
        z = _layer_norm_rows(x, ln2_g_ref[:], ln2_b_ref[:], 1e-5)
        z = jnp.maximum(dot(z, w1_ref[:]) + b1_ref[:][None, :], 0.0)
        z = dot(z, w2_ref[:]) + b2_ref[:][None, :]
        o_ref[:] = (x + z).astype(o_ref.dtype)

    if have_mask:
        return body
    return lambda *refs: body(refs[0], None, *refs[1:])


@functools.partial(jax.jit, static_argnames=("num_heads", "windows_per_tile",
                                             "precision"))
def fused_temporal_block(x: jax.Array, block_params: Dict,
                         key_mask: Optional[jax.Array] = None, *,
                         num_heads: int, windows_per_tile: int = 8,
                         precision=jax.lax.Precision.DEFAULT) -> jax.Array:
    """x: (B, S, C) → (B, S, C), one transformer block (relu MLP).

    key_mask: optional (B, S) with 1/True = blocked key. S is padded to a
    multiple of 8 internally; B must divide by windows_per_tile.
    """
    b, s_in, c = x.shape
    s = -(-s_in // 8) * 8
    hidden = block_params["mlp"]["fc1"]["kernel"].shape[1]
    while b % windows_per_tile != 0 and windows_per_tile > 1:
        windows_per_tile //= 2

    xp = jnp.pad(x, ((0, 0), (0, s - s_in), (0, 0))) if s != s_in else x
    flat = xp.reshape(b * s, c)

    # Key mask including pad tokens (always needed when padding exists)
    have_mask = key_mask is not None or s != s_in
    if have_mask:
        km = jnp.zeros((b, s_in), jnp.float32) if key_mask is None else \
            key_mask.astype(jnp.float32)
        km = jnp.pad(km, ((0, 0), (0, s - s_in)), constant_values=1.0)

    depth = c // num_heads
    head_mask = np.zeros((num_heads, c), np.float32)
    for h in range(num_heads):
        head_mask[h, h * depth:(h + 1) * depth] = 1.0

    p = block_params
    operands = dict(
        ln1_g=p["norm1"]["scale"], ln1_b=p["norm1"]["bias"],
        wq=p["attn"]["wq"]["kernel"], bq=p["attn"]["wq"]["bias"],
        wk=p["attn"]["wk"]["kernel"], bk=p["attn"]["wk"]["bias"],
        wv=p["attn"]["wv"]["kernel"], bv=p["attn"]["wv"]["bias"],
        wp=p["attn"]["proj"]["kernel"], bp=p["attn"]["proj"]["bias"],
        ln2_g=p["norm2"]["scale"], ln2_b=p["norm2"]["bias"],
        w1=p["mlp"]["fc1"]["kernel"], b1=p["mlp"]["fc1"]["bias"],
        w2=p["mlp"]["fc2"]["kernel"], b2=p["mlp"]["fc2"]["bias"],
        head_mask=jnp.asarray(head_mask),
    )
    operands = {k: jnp.asarray(v, jnp.float32) for k, v in operands.items()}

    kernel = _make_kernel(windows_per_tile, s, c, hidden, num_heads,
                          have_mask, precision)

    rows = windows_per_tile * s
    def full(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)

    in_specs = [pl.BlockSpec((rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    args = [flat]
    if have_mask:
        in_specs.append(pl.BlockSpec((windows_per_tile, s), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(km)
    order = ["ln1_g", "ln1_b", "wq", "bq", "wk", "bk", "wv", "bv", "wp", "bp",
             "ln2_g", "ln2_b", "w1", "b1", "w2", "b2", "head_mask"]
    in_specs += [full(operands[name].shape) for name in order]
    args += [operands[name] for name in order]

    out = pl.pallas_call(
        kernel,
        grid=(b // windows_per_tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * s, c), jnp.float32),
    )(*args)
    return out.reshape(b, s, c)[:, :s_in]


def temporal_stack_apply(params: Dict, x: jax.Array,
                         key_mask: Optional[jax.Array], *, num_blocks: int,
                         num_heads: int, first_masked_blocks: int = 0,
                         precision=jax.lax.Precision.DEFAULT) -> jax.Array:
    """Run the temporal transformer stack (x already has PE added).

    `key_mask` (B, S) blocks masked-frame keys for the first
    `first_masked_blocks` blocks (the reference's
    first_strided_token_attention_layer)."""
    for i in range(num_blocks):
        mask = key_mask if i < first_masked_blocks else None
        x = fused_temporal_block(x, params[f"temporal_block_{i + 1}"], mask,
                                 num_heads=num_heads, precision=precision)
    return x


# ---------------------------------------------------------------------------
# v2: one kernel per block with a fused qkv projection, q-side head masking,
# and the same DEFAULT/HIGH3/HIGHEST dot-precision options as the spatial
# kernel. Unlike v1 (kept above as the documented baseline), all Dense work
# per block is 3 full-width MXU dots (qkv / proj / mlp) over the flattened
# (windows_per_tile · S, C) tile.
# ---------------------------------------------------------------------------

HIGH3 = "high3"  # manual bf16x3 (Precision.HIGH equivalent; Mosaic lacks HIGH)


def _make_dot(precision):
    """(M, K) @ (K, N) f32 dot with the chosen Mosaic precision strategy."""
    dims = (((1,), (0,)), ((), ()))
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


def stack_temporal_params(params: Dict, num_blocks: int,
                          prefix: str = "temporal_block_"):
    """Stack the temporal blocks' params into fused-kernel operands.

    q/k/v kernels are concatenated into one (C, 3C) matrix per block so the
    projection is a single MXU dot. Missing biases become zeros.
    """
    blocks = [params[f"{prefix}{i + 1}"] for i in range(num_blocks)]
    # shape access only — tracer-safe (this runs inside jit for the fused
    # TRAIN path, where params are traced arrays)
    c = blocks[0]["attn"]["wq"]["kernel"].shape[0]
    hidden = blocks[0]["mlp"]["fc1"]["kernel"].shape[1]

    def bias(p, name, n):
        b = p.get(name, {}).get("bias")
        return jnp.zeros((n,), jnp.float32) if b is None else jnp.asarray(b, jnp.float32)

    def st(get):
        return jnp.stack([jnp.asarray(get(b), jnp.float32) for b in blocks])

    return dict(
        ln1_g=st(lambda b: b["norm1"]["scale"]),
        ln1_b=st(lambda b: b["norm1"]["bias"]),
        wqkv=st(lambda b: jnp.concatenate(
            [jnp.asarray(b["attn"][w]["kernel"], jnp.float32)
             for w in ("wq", "wk", "wv")], axis=1)),
        bqkv=st(lambda b: jnp.concatenate(
            [bias(b["attn"], w, c) for w in ("wq", "wk", "wv")])),
        wp=st(lambda b: b["attn"]["proj"]["kernel"]),
        bp=st(lambda b: bias(b["attn"], "proj", c)),
        ln2_g=st(lambda b: b["norm2"]["scale"]),
        ln2_b=st(lambda b: b["norm2"]["bias"]),
        w1=st(lambda b: b["mlp"]["fc1"]["kernel"]),
        b1=st(lambda b: bias(b["mlp"], "fc1", hidden)),
        w2=st(lambda b: b["mlp"]["fc2"]["kernel"]),
        b2=st(lambda b: bias(b["mlp"], "fc2", c)),
    )


_STACK_ORDER = ["ln1_g", "ln1_b", "wqkv", "bqkv", "wp", "bp",
                "ln2_g", "ln2_b", "w1", "b1", "w2", "b2"]


def _make_block_kernel_v2(windows_per_tile: int, tokens: int, c: int,
                          num_heads: int, precision, activation: str,
                          attn_mode: str = "maskq"):
    depth = c // num_heads
    scale = np.float32(1.0 / float(depth) ** 0.5)
    s = tokens
    dot = _make_dot(precision)

    def kernel(x_ref, addmask_ref, ln1_g_ref, ln1_b_ref, wqkv_ref, bqkv_ref,
               wp_ref, bp_ref, ln2_g_ref, ln2_b_ref, w1_ref, b1_ref,
               w2_ref, b2_ref, o_ref):
        x = x_ref[:].astype(jnp.float32)  # (wpt*s, c)
        y = _layer_norm_rows(x, ln1_g_ref[:], ln1_b_ref[:], 1e-5)
        qkv = dot(y, wqkv_ref[:]) + bqkv_ref[:][None, :]
        q = qkv[:, :c] * scale
        k = qkv[:, c:2 * c]
        v = qkv[:, 2 * c:]
        # Per-head channel selectors, built in-kernel (captured host arrays
        # are rejected by pallas_call)
        head_of_lane = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1) // depth

        if attn_mode == "batched":
            # Window-batched attention: rank-3 dot_generals with the window
            # dim as a batch dim. Explicit per-window slices + concatenate
            # measure ~33 µs/step of pure copy overhead on Mosaic (see
            # PERF_NOTES); reshapes of the leading dim are layout-preserving
            # and batched dots avoid the copies entirely.
            q3 = q.reshape(windows_per_tile, s, c)
            k3 = k.reshape(windows_per_tile, s, c)
            v3 = v.reshape(windows_per_tile, s, c)
            neg3 = addmask_ref[:][:, None, :]  # (wpt, 1, s)
            mh3 = head_of_lane[None]  # (1, 1, c)
            bprec = (jax.lax.Precision.HIGHEST if precision == HIGH3
                     else precision)  # HIGH3 matters for the wide C dots only
            ctx3 = None
            for h in range(num_heads):
                mh = (mh3 == h).astype(jnp.float32)
                logits = jax.lax.dot_general(
                    q3 * mh, k3, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32, precision=bprec) + neg3
                m = jnp.max(logits, axis=2, keepdims=True)
                ex = jnp.exp(logits - m)
                wgt = ex / jnp.sum(ex, axis=2, keepdims=True)
                piece = jax.lax.dot_general(
                    wgt, v3 * mh, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32, precision=bprec)
                ctx3 = piece if ctx3 is None else ctx3 + piece
            attn = ctx3.reshape(windows_per_tile * s, c)
        else:
            attn_rows = []
            for w in range(windows_per_tile):
                rows = slice(w * s, (w + 1) * s)
                qw, kw, vw = q[rows], k[rows], v[rows]
                neg = addmask_ref[w][None, :]  # (1, s) additive, -1e9 on blocked
                if attn_mode == "none":  # perf bisection: skip attention math
                    attn_rows.append(vw + neg.T * 0.0)
                    continue
                kt = kw.T
                ctx = None
                heads = 1 if attn_mode == "onehead" else num_heads
                for h in range(heads):
                    mh = (head_of_lane == h).astype(jnp.float32)
                    # Masking q alone selects head h's channels in the contraction
                    logits = dot(qw * mh, kt) + neg
                    m = jnp.max(logits, axis=1, keepdims=True)
                    ex = jnp.exp(logits - m)
                    wgt = ex / jnp.sum(ex, axis=1, keepdims=True)
                    piece = dot(wgt, vw * mh)
                    ctx = piece if ctx is None else ctx + piece
                attn_rows.append(ctx)
            attn = jnp.concatenate(attn_rows, axis=0)

        x = x + dot(attn, wp_ref[:]) + bp_ref[:][None, :]
        z = _layer_norm_rows(x, ln2_g_ref[:], ln2_b_ref[:], 1e-5)
        z = dot(z, w1_ref[:]) + b1_ref[:][None, :]
        if activation == "relu":
            z = jnp.maximum(z, 0.0)
        else:  # exact gelu via erf approximation (Mosaic has no erf)
            from .pallas_spatial import _erf
            z = 0.5 * z * (1.0 + _erf(z * np.float32(1.0 / np.sqrt(2.0))))
        z = dot(z, w2_ref[:]) + b2_ref[:][None, :]
        o_ref[:] = (x + z).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "num_heads", "num_blocks", "first_masked_blocks", "windows_per_tile",
    "precision", "activation", "attn_mode"))
def fused_temporal_stack(x: jax.Array, stacked: Dict,
                         key_mask: Optional[jax.Array] = None, *,
                         num_blocks: int, num_heads: int,
                         first_masked_blocks: int = 0,
                         windows_per_tile: int = 8,
                         precision=jax.lax.Precision.DEFAULT,
                         activation: str = "relu",
                         attn_mode: str = "maskq") -> jax.Array:
    """x: (B, S, C) → (B, S, C) through `num_blocks` fused transformer blocks.

    `key_mask` (B, S), True/1 = blocked key, applied to the first
    `first_masked_blocks` blocks (reference
    first_strided_token_attention_layer); the padding token (S→8-aligned) is
    always blocked. Eval path only (no dropout/droppath RNG).
    """
    b, s_in, c = x.shape
    s = -(-s_in // 8) * 8
    while b % windows_per_tile != 0 and windows_per_tile > 1:
        windows_per_tile //= 2

    xp = jnp.pad(x, ((0, 0), (0, s - s_in), (0, 0))) if s != s_in else x
    flat = xp.reshape(b * s, c)

    pad_row = np.zeros((s,), np.float32)
    pad_row[s_in:] = 1.0
    a_pad = jnp.broadcast_to(jnp.asarray(pad_row) * -1e9, (b, s))
    if key_mask is not None and first_masked_blocks > 0:
        km = jnp.pad(key_mask.astype(jnp.float32), ((0, 0), (0, s - s_in)),
                     constant_values=1.0)
        a_key = jnp.maximum(km, jnp.asarray(pad_row)[None]) * -1e9
    else:
        a_key = a_pad
        first_masked_blocks = 0

    kernel = _make_block_kernel_v2(windows_per_tile, s, c, num_heads,
                                   precision, activation, attn_mode)
    rows = windows_per_tile * s

    out = flat
    for blk in range(num_blocks):
        addmask = a_key if blk < first_masked_blocks else a_pad
        in_specs = [
            pl.BlockSpec((rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((windows_per_tile, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = [out, addmask]
        for name in _STACK_ORDER:
            # Per-block 2D operands with whole-array BlockSpecs: a stacked
            # (L, …) operand read as ref[0] in-kernel forces a per-step VMEM
            # materialization (measured ~30 µs/step — the difference between
            # 42 ms and ~8 ms for the dense path); slicing at the XLA level
            # keeps the kernel refs rank-exact and resident.
            arr = stacked[name][blk]
            in_specs.append(pl.BlockSpec(
                arr.shape, lambda i, n_=arr.ndim: (0,) * n_,
                memory_space=pltpu.VMEM))
            args.append(arr)
        out = pl.pallas_call(
            kernel,
            grid=(b // windows_per_tile,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b * s, c), jnp.float32),
        )(*args)
    return out.reshape(b, s, c)[:, :s_in]
