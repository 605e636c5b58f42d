"""Scaled dot-product attention.

The default path is plain XLA (einsum + softmax): at the model's shapes
(17 or ≤71 tokens, head dim 4-48) XLA fuses this into a handful of MXU/VPU
ops. A fused Pallas kernel for the temporal blocks lives in
`pallas_attention.py` and is selected via `use_pallas=True` when shapes allow.

Semantics match reference `vision_transformer.py:99-130`: logits scaled by
1/sqrt(head_dim); an optional additive mask with 1 marking *blocked* keys is
applied as `logits += mask * -1e9` before the softmax.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def scaled_dot_product_attention(
    q: jax.Array,  # (B, H, Sq, D)
    k: jax.Array,  # (B, H, Sk, D)
    v: jax.Array,  # (B, H, Sk, D)
    mask: Optional[jax.Array] = None,  # broadcastable to (B, H, Sq, Sk); 1 = blocked
    *,
    use_pallas: bool = False,
):
    """Returns (output (B, H, Sq, D), attention weights (B, H, Sq, Sk))."""
    if use_pallas:
        from .pallas_attention import fused_attention
        out = fused_attention(q, k, v, mask)
        if out is not None:
            return out, None

    dtype = q.dtype
    depth = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(depth, dtype=jnp.float32))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = logits + mask.astype(jnp.float32) * -1e9
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights.astype(dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(dtype), weights


def head_sliced_attention(
    q: jax.Array,  # (B, S, C) packed heads
    k: jax.Array,
    v: jax.Array,
    key_mask: Optional[jax.Array] = None,  # (B, S), 1 = blocked key
    *,
    num_heads: int,
):
    """Multi-head attention without the head-split transpose.

    Operating per-head on contiguous channel slices of the packed (B, S, H·D)
    projections avoids materializing the (B, H, S, D) layout whose trailing
    dims lane-pad badly on TPU for small S/D — ~3x faster than the split-head
    path at the spatial blocks' shapes (S=17, D=4). Identical math.
    """
    b, s, c = q.shape
    depth = c // num_heads
    scale = 1.0 / jnp.sqrt(jnp.asarray(depth, dtype=jnp.float32))
    neg = None
    if key_mask is not None:
        neg = key_mask.astype(jnp.float32)[:, None, :] * -1e9

    outs = []
    for h in range(num_heads):
        sl = slice(h * depth, (h + 1) * depth)
        logits = jnp.einsum("fqd,fkd->fqk", q[..., sl], k[..., sl],
                            preferred_element_type=jnp.float32) * scale
        if neg is not None:
            logits = logits + neg
        weights = jax.nn.softmax(logits, axis=-1)
        outs.append(jnp.einsum("fqk,fkd->fqd", weights.astype(q.dtype), v[..., sl],
                               preferred_element_type=jnp.float32).astype(q.dtype))
    return jnp.concatenate(outs, axis=-1)
