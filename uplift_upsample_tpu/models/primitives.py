"""Transformer primitives (flax.linen).

Numeric parity targets (reference `vision_transformer.py`, strided variants in
`uplift_upsample_transformer.py:53-160`):
  - MHA with *separate* q/k/v projections and optional bias; per-head scaling
    1/sqrt(head_dim); additive `mask * -1e9` with 1 = blocked key.
  - Pre-norm blocks with LayerNorm eps 1e-5.
  - MLP: Dense(hidden) → act → inner_dropout → Dense(out) → dropout.
  - StridedMLP: pointwise conv → act → inner_dropout → explicit zero-pad →
    Conv1D(k=3, stride=s, VALID) → dropout; this is the temporal downsampler.
  - StridedTransformerBlock's residual path: crop one frame per unpadded end,
    then take every s-th frame (MaxPool1D(pool_size=1, strides=s) semantics).
  - DropPath (stochastic depth) scales by 1/keep_prob at *train* time.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import scaled_dot_product_attention

KERNEL_INIT = nn.initializers.glorot_uniform()  # Keras Dense/Conv default
PE_INIT = nn.initializers.truncated_normal(stddev=0.02)


def drop_path(x: jax.Array, rate: float, rng: jax.Array) -> jax.Array:
    """Stochastic depth on the batch dim, scaling by 1/keep_prob at train time."""
    keep_prob = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    rand = jnp.floor(keep_prob + jax.random.uniform(rng, shape, dtype=jnp.float32))
    return (x / keep_prob) * rand.astype(x.dtype)


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        return drop_path(x, self.rate, self.make_rng("droppath"))


class Mlp(nn.Module):
    out_features: int
    hidden_features: Optional[int] = None
    activation: Callable = nn.gelu
    dropout: float = 0.0
    inner_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        hidden = self.out_features if self.hidden_features is None else self.hidden_features
        x = nn.Dense(hidden, kernel_init=KERNEL_INIT, dtype=self.dtype, name="fc1")(x)
        x = self.activation(x)
        if self.inner_dropout > 0:
            x = nn.Dropout(self.inner_dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.out_features, kernel_init=KERNEL_INIT, dtype=self.dtype, name="fc2")(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class MultiHeadAttention(nn.Module):
    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        assert self.dim % self.num_heads == 0
        depth = self.dim // self.num_heads
        b, s, _ = x.shape

        dense = lambda name: nn.Dense(self.dim, use_bias=self.qkv_bias,
                                      kernel_init=KERNEL_INIT, dtype=self.dtype, name=name)
        qp = dense("wq")(x)
        kp = dense("wk")(x)
        vp = dense("wv")(x)

        # Optional fused Pallas path (logits stay in VMEM). The default is the
        # split-head XLA form: measured as the *robust* fastest at all of this
        # model's shapes — head-sliced/packed XLA variants look faster in
        # isolation (no transposes) but XLA's fusion of their tiny-lane
        # intermediates is fragile and regresses 5-10x inside the full graph.
        packed_ok = self.attn_drop == 0 or deterministic
        mask_ok = mask is None or (mask.ndim == 4 and mask.shape[1] == 1
                                   and mask.shape[2] == 1)
        if self.use_pallas and packed_ok and mask_ok and s <= 128:
            key_mask = None
            if mask is not None:
                key_mask = jnp.broadcast_to(mask[:, 0, 0, :], (b, s))
            from ..ops.pallas_attention import packed_multihead_attention
            out = packed_multihead_attention(qp, kp, vp, key_mask,
                                             num_heads=self.num_heads)
            out = nn.Dense(self.dim, kernel_init=KERNEL_INIT, dtype=self.dtype,
                           name="proj")(out)
            if self.proj_drop > 0:
                out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
            return out, None

        reshape = lambda t: t.reshape(b, s, self.num_heads, depth).transpose(0, 2, 1, 3)
        q, k, v = reshape(qp), reshape(kp), reshape(vp)
        out, weights = scaled_dot_product_attention(q, k, v, mask)
        if self.attn_drop > 0 and weights is not None:
            # Attention-weight dropout (rare in configs; forces the XLA path)
            weights = nn.Dropout(self.attn_drop)(weights, deterministic=deterministic)
            out = jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
                             preferred_element_type=jnp.float32).astype(v.dtype)

        out = out.transpose(0, 2, 1, 3).reshape(b, s, self.dim)
        out = nn.Dense(self.dim, kernel_init=KERNEL_INIT, dtype=self.dtype, name="proj")(out)
        if self.proj_drop > 0:
            out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out, weights


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    attn_dropout: float = 0.0
    dropout: float = 0.0
    inner_dropout: float = 0.0
    drop_path_rate: float = 0.0
    activation: Callable = nn.gelu
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, pos_encoding=None, mask=None, deterministic: bool = True):
        if pos_encoding is not None:
            x = x + pos_encoding
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        y, attn = MultiHeadAttention(
            self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            attn_drop=self.attn_dropout, proj_drop=self.dropout,
            dtype=self.dtype, use_pallas=self.use_pallas, name="attn",
        )(y, mask=mask, deterministic=deterministic)
        y = DropPath(self.drop_path_rate)(y, deterministic=deterministic)
        x = x + y

        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        z = Mlp(out_features=self.dim, hidden_features=int(self.dim * self.mlp_ratio),
                activation=self.activation, dropout=self.dropout,
                inner_dropout=self.inner_dropout, dtype=self.dtype, name="mlp",
                )(z, deterministic=deterministic)
        z = DropPath(self.drop_path_rate)(z, deterministic=deterministic)
        return x + z, attn


class StridedMlp(nn.Module):
    """FFN whose second layer is a strided temporal convolution."""

    out_features: int
    hidden_features: Optional[int] = None
    activation: Callable = nn.gelu
    dropout: float = 0.0
    inner_dropout: float = 0.0
    kernel_size: int = 3
    stride: int = 1
    padding: Optional[Tuple[int, int]] = None  # None -> (k//2, k//2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        hidden = self.out_features if self.hidden_features is None else self.hidden_features
        pad = resolve_padding(self.padding, self.kernel_size)

        # Pointwise conv == Dense over channels
        x = nn.Dense(hidden, kernel_init=KERNEL_INIT, dtype=self.dtype, name="fc1")(x)
        x = self.activation(x)
        if self.inner_dropout > 0:
            x = nn.Dropout(self.inner_dropout)(x, deterministic=deterministic)
        x = jnp.pad(x, ((0, 0), (pad[0], pad[1]), (0, 0)))
        x = nn.Conv(self.out_features, kernel_size=(self.kernel_size,),
                    strides=(self.stride,), padding="VALID",
                    kernel_init=KERNEL_INIT, dtype=self.dtype, name="fc2")(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


def resolve_padding(padding, kernel_size: int) -> Tuple[int, int]:
    if padding is None:
        return kernel_size // 2, kernel_size // 2
    if isinstance(padding, int):
        return padding, padding
    return int(padding[0]), int(padding[1])


class StridedTransformerBlock(nn.Module):
    """Transformer block that shrinks sequence length by `stride`.

    The MLP branch is a StridedMlp; the residual path crops one frame at each
    *unpadded* end and then takes every `stride`-th frame.
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    attn_dropout: float = 0.0
    dropout: float = 0.0
    inner_dropout: float = 0.0
    drop_path_rate: float = 0.0
    activation: Callable = nn.gelu
    kernel_size: int = 3
    stride: int = 3
    padding: Optional[Tuple[int, int]] = None
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, pos_encoding=None, mask=None, deterministic: bool = True):
        if pos_encoding is not None:
            x = x + pos_encoding
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        y, attn = MultiHeadAttention(
            self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            attn_drop=self.attn_dropout, proj_drop=self.dropout,
            dtype=self.dtype, use_pallas=self.use_pallas, name="attn",
        )(y, mask=mask, deterministic=deterministic)
        y = DropPath(self.drop_path_rate)(y, deterministic=deterministic)
        x = x + y

        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        z = StridedMlp(out_features=self.dim, hidden_features=int(self.dim * self.mlp_ratio),
                       activation=self.activation, dropout=self.dropout,
                       inner_dropout=self.inner_dropout, kernel_size=self.kernel_size,
                       stride=self.stride, padding=self.padding, dtype=self.dtype,
                       name="mlp")(z, deterministic=deterministic)
        z = DropPath(self.drop_path_rate)(z, deterministic=deterministic)

        if self.stride > 1:
            pad = resolve_padding(self.padding, self.kernel_size)
            identity = x
            if pad[0] == 0:
                identity = identity[:, 1:]
            if pad[1] == 0:
                identity = identity[:, :-1]
            identity = identity[:, ::self.stride]
        else:
            identity = x
        return identity + z, attn
