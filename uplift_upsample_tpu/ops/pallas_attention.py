"""Fused multi-head attention Pallas kernel for small-token sequences.

Why: the spatial transformer runs attention over 17 joint tokens with head
depth 4 across ~72k frames; the temporal blocks over 71 tokens with depth 48.
In plain XLA the head split materializes (F, H, S, D) and (F, H, S, S)
tensors in HBM whose trailing dims (4 / 17 / 71) pad to the 128-lane tile —
a many-x memory blowup that makes the spatial stage ~73% of forward time.

This kernel takes Q/K/V in the *packed* (F, S, H·D) layout the q/k/v
projections already produce — no head-split transpose ever exists — and
computes per-head logits, softmax, and context entirely in VMEM (heads
unrolled; tiny depths accumulate logits as rank-3 broadcast FMAs on the VPU,
larger depths use batched MXU dots). One HBM read per operand, one write,
zero padded intermediates.

Constraints: S ≤ 128 (full S×S logits per tile in VMEM), static shapes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Depth at or below which logits are accumulated with VPU broadcast-FMAs
_SMALL_DEPTH = 8


def _head_attention(qh, kh, vh, scale, neg, depth):
    """One head on (bt, S, D) float32 operands → (bt, S, D) context."""
    if depth <= _SMALL_DEPTH:
        logits = None
        for d in range(depth):
            qd = qh[:, :, d:d + 1]                      # (bt, S, 1)
            kd = kh[:, :, d:d + 1].transpose(0, 2, 1)   # (bt, 1, S)
            contrib = qd * kd
            logits = contrib if logits is None else logits + contrib
    else:
        logits = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
    logits = logits * scale
    if neg is not None:
        logits = logits + neg
    weights = jax.nn.softmax(logits, axis=-1)
    return jax.lax.dot_general(weights, vh, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


def _make_kernel(num_heads: int, depth: int, scale: float, have_mask: bool):
    def body(q_ref, k_ref, v_ref, mask_ref, o_ref):
        neg = None
        if mask_ref is not None:
            neg = mask_ref[:].astype(jnp.float32)[:, None, :] * -1e9
        # One head at a time, stored straight into the output lane slice —
        # only one transient context is live, so Mosaic reuses the scratch
        # across the unrolled head loop instead of keeping H padded buffers.
        for h in range(num_heads):
            sl = slice(h * depth, (h + 1) * depth)
            ctx = _head_attention(
                q_ref[:, :, sl].astype(jnp.float32),
                k_ref[:, :, sl].astype(jnp.float32),
                v_ref[:, :, sl].astype(jnp.float32), scale, neg, depth)
            o_ref[:, :, sl] = ctx.astype(o_ref.dtype)

    if have_mask:
        return body
    return lambda q_ref, k_ref, v_ref, o_ref: body(q_ref, k_ref, v_ref, None, o_ref)


@functools.partial(jax.jit, static_argnames=("num_heads", "block_f"))
def packed_multihead_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                               mask: Optional[jax.Array] = None, *,
                               num_heads: int, block_f: int = 0) -> jax.Array:
    """Fused MHA on packed (F, S, H·D) operands; returns the packed context.

    `mask` is optional (F, S) with 1/True marking *blocked* keys (the
    reference's additive-mask convention). Scale is 1/sqrt(D).
    """
    f, s, c = q.shape
    assert c % num_heads == 0
    depth = c // num_heads
    scale = 1.0 / float(depth) ** 0.5

    if block_f <= 0:
        # VMEM budget with lane padding: every (bt, S, *) buffer costs
        # pad8(S) sublanes x 128-lane tiles x 4B per f-row. Live: q/k/v/out
        # (C lane tiles each) + logits/weights + one transient head context.
        pad_sub = -(-s // 8) * 8
        lane_tiles_c = -(-c // 128)
        buffers = 4 * lane_tiles_c + 2 * (-(-s // 128)) + 1
        per_row = pad_sub * 128 * 4 * buffers
        block_f = max(8, min(512, (8 * 1024 * 1024) // per_row))
    # Largest power of two ≤ block_f that divides f (grid steps must tile f)
    p = 1
    while p * 2 <= block_f and f % (p * 2) == 0:
        p *= 2
    block_f = p

    kernel = _make_kernel(num_heads, depth, scale, mask is not None)
    operand_spec = pl.BlockSpec((block_f, s, c), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    in_specs = [operand_spec] * 3
    operands = [q, k, v]
    if mask is not None:
        in_specs.append(pl.BlockSpec((block_f, s), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(mask.astype(jnp.float32))

    return pl.pallas_call(
        kernel,
        grid=(f // block_f,),
        in_specs=in_specs,
        out_specs=operand_spec,
        out_shape=jax.ShapeDtypeStruct((f, s, c), q.dtype),
    )(*operands)


def supported(seq_len: int, mask_shape) -> bool:
    """Shape gate used by the model to choose the Pallas path."""
    return seq_len <= 128


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    mask: Optional[jax.Array] = None):
    """Adapter for split-head (B, H, S, D) callers; None if unsupported."""
    b, h, s, d = q.shape
    if s > 128:
        return None
    key_mask = None
    if mask is not None:
        if mask.ndim != 4 or mask.shape[1] != 1 or mask.shape[2] != 1:
            return None
        key_mask = jnp.broadcast_to(mask[:, 0, 0, :], (b, s))
    packed = lambda t: t.transpose(0, 2, 1, 3).reshape(b, s, h * d)
    out = packed_multihead_attention(packed(q), packed(k), packed(v), key_mask,
                                     num_heads=h)
    return out.reshape(b, s, h, d).transpose(0, 2, 1, 3)
