"""UpliftUpsampleTransformer (flax.linen).

Architecture parity with reference `uplift_upsample_transformer.py:163-421`:

  input (B, N, 17, 2) masked 2D keypoints [+ (B, N) stride mask]
  → spatial transformer over joints, frame-independent (d=spatial_d_model)
  → LayerNorm(eps 1e-6) → Dense to temporal width (d=temporal_d_model)
  → learned-token substitution at masked frames → + temporal PE
  → temporal transformer over frames (first K blocks optionally blocking
    attention *keys* at masked frames)
  → head1: Dense(3*K) on every frame → "upsampling" output (B, N, 17, 3)
  → strided transformer stack shrinking N → 1
  → head2: Dense(3*K) on the final token → central-frame output (B, 17, 3)

All sequence lengths are static under jit; the per-block PE lengths follow the
recurrence seq_len ← ceil((seq_len + p0 + p1 - 2) / stride).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from .primitives import (
    KERNEL_INIT,
    PE_INIT,
    StridedTransformerBlock,
    TransformerBlock,
)


def gelu_exact(x):
    return nn.gelu(x, approximate=False)


def strided_sequence_lengths(num_frames: int, strides, paddings) -> list:
    """Per-strided-block input lengths, ending with the final output length."""
    lengths = [num_frames]
    seq_len = num_frames
    for i, s in enumerate(strides):
        p = (1, 1) if paddings is None else paddings[i]
        seq_len = math.ceil((seq_len + p[0] + p[1] - 2) / s)
        lengths.append(seq_len)
    return lengths


class UpliftUpsampleTransformer(nn.Module):
    full_output: bool = True
    num_frames: int = 9
    num_keypoints: int = 17
    spatial_d_model: int = 16
    temporal_d_model: int = 256
    spatial_depth: int = 3
    temporal_depth: int = 3
    strides: Sequence[int] = (3, 3, 3)
    paddings: Optional[Sequence[Sequence[int]]] = None
    num_heads: int = 8
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    attn_drop_rate: float = 0.1
    drop_rate: float = 0.1
    drop_path_rate: Union[float, Sequence[float]] = 0.0
    output_bn: bool = False
    has_strided_input: bool = False
    first_strided_token_attention_layer: int = 0
    token_mask_rate: float = 0.0
    learnable_masked_token: bool = False
    dtype: jnp.dtype = jnp.float32
    # Compute dtype for the spatial stage only (None → same as dtype). The
    # spatial blocks are bandwidth-bound (tiny trailing dims lane-pad in HBM),
    # so bf16 here nearly halves their cost; softmax stays f32 either way.
    spatial_dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False
    # When True, __call__ takes the spatial-stack output (B, N, P·spatial_d)
    # instead of raw keypoints — used to splice in the fused Pallas spatial
    # kernel (ops/pallas_spatial.py) outside the module.
    spatial_input: bool = False
    # When True, __call__ takes the temporal-stack output (B, N, temporal_d)
    # and runs only head1 + the strided stack + head2 — used to splice in the
    # fused Pallas temporal kernel (ops/pallas_temporal.py). Parameter names
    # are unchanged (flax scoping is per-layer-name), so the same variables
    # dict works for the full and spliced paths.
    temporal_input: bool = False
    # With temporal_input: number of leading strided blocks already applied
    # externally (fused kernel, ops/pallas_strided.py). x is then the input of
    # strided block strided_entry+1 and head1 is skipped (its input, the
    # temporal-stack output, is not available at this splice point).
    strided_entry: int = 0
    # When True, __call__ returns the (B, N, temporal_d) spatial_to_temporal
    # output (before token masking / masked-frame substitution / temporal PE)
    # instead of the heads. This is the per-frame (frame-independent) prefix
    # of the model — reference uplift_upsample_transformer.py:313-333 — used
    # by the shared-spatial eval path to compute features once per unique
    # frame. N may differ from num_frames here.
    s2t_output: bool = False
    # When True, __call__ takes that (B, N, temporal_d) tensor and runs the
    # rest (mask substitution, temporal PE, temporal stack, heads).
    s2t_input: bool = False

    def _dpr(self, stage: int, depth: int):
        rate = self.drop_path_rate
        top = rate[stage] if isinstance(rate, (list, tuple)) else rate
        if depth <= 1:
            return [0.0] * depth
        return [top * i / (depth - 1) for i in range(depth)]

    @nn.compact
    def __call__(self, x, stride_mask=None, training: bool = False):
        """x: (B, N, K, 2) [already masked at non-keyframes when strided input].

        Returns (full_output | None, central_output (B, K, 3)).
        """
        deterministic = not training
        p = self.num_keypoints
        if self.spatial_input or self.temporal_input or self.s2t_input:
            b, n, _ = x.shape
        else:
            b, n = x.shape[:2]
            # The pre-s2t prefix is frame-independent; any N is valid there.
            assert x.shape[2] == p and (n == self.num_frames or self.s2t_output)
        x = x.astype(self.dtype)
        out_dim = 3 * self.num_keypoints
        if self.temporal_input:
            return self._heads_and_strided(x, stride_mask, deterministic, b, n,
                                           p, out_dim)

        # ---- spatial transformer over joints (frame-independent) ----------
        sdtype = self.dtype if self.spatial_dtype is None else self.spatial_dtype
        if self.s2t_input or self.spatial_input:
            pass  # x is already the (B, N, P·C) spatial-stack (or s2t) output
        elif self.spatial_depth == 0:
            x = x.reshape(b, n, p * x.shape[-1])
        else:
            x = x.reshape(b * n, p, x.shape[-1]).astype(sdtype)
            x = nn.Dense(self.spatial_d_model, kernel_init=KERNEL_INIT,
                         dtype=sdtype, name="keypoint_embedding")(x)
            spatial_pe = self.param("spatial_pe", PE_INIT,
                                    (self.num_keypoints, self.spatial_d_model))
            x = x + spatial_pe.astype(sdtype)
            if self.drop_rate > 0:
                x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
            dpr = self._dpr(0, self.spatial_depth)
            for i in range(self.spatial_depth):
                x, _ = TransformerBlock(
                    dim=self.spatial_d_model, num_heads=self.num_heads,
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    attn_dropout=self.attn_drop_rate, dropout=self.drop_rate,
                    drop_path_rate=dpr[i], activation=gelu_exact,
                    dtype=sdtype, use_pallas=self.use_pallas,
                    name=f"spatial_block_{i + 1}",
                )(x, deterministic=deterministic)
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="spatial_norm")(
                x.astype(self.dtype))
            x = x.reshape(b, n, p * self.spatial_d_model)

        if not self.s2t_input:
            x = nn.Dense(self.temporal_d_model, kernel_init=KERNEL_INIT,
                         dtype=self.dtype, name="spatial_to_temporal_fc")(x)
        if self.s2t_output:
            return x

        # ---- temporal transformer over frames -----------------------------
        if training and self.token_mask_rate > 0:
            if self.learnable_masked_token:
                masked_token = self.param("masked_token", PE_INIT,
                                          (self.temporal_d_model,)).astype(self.dtype)
            else:
                masked_token = jnp.zeros((), dtype=self.dtype)
            # Random token masking that never masks the central frame
            mid = self.num_frames // 2
            rng = self.make_rng("token_mask")
            token_mask = jax.random.uniform(rng, (b, n)) < self.token_mask_rate
            token_mask = token_mask & (jnp.arange(n) != mid)[None, :]
            token_mask = token_mask[..., None].astype(self.dtype)
            x = x * (1.0 - token_mask) + masked_token * token_mask

        temporal_pe = self.param("temporal_pe", PE_INIT,
                                 (self.num_frames, self.temporal_d_model)).astype(self.dtype)

        inv_stride_mask = None
        if self.has_strided_input:
            strided_token = self.param("strided_input_token", PE_INIT,
                                       (self.temporal_d_model,)).astype(self.dtype)
            # stride_mask is 1/True on frames carrying real input
            sm = stride_mask.astype(self.dtype)[..., None]
            inv_stride_mask = 1.0 - stride_mask.astype(jnp.float32)
            x = sm * x + (1.0 - sm) * strided_token[None, None, :]

        x = x + temporal_pe

        if self.temporal_depth > 0:
            dpr = self._dpr(1, self.temporal_depth)
            for i in range(self.temporal_depth):
                attn_mask = None
                if self.has_strided_input and i < self.first_strided_token_attention_layer:
                    # Block attention onto masked-frame keys for early layers
                    attn_mask = inv_stride_mask[:, None, None, :]
                x, _ = TransformerBlock(
                    dim=self.temporal_d_model, num_heads=self.num_heads,
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    attn_dropout=self.attn_drop_rate, dropout=self.drop_rate,
                    inner_dropout=self.drop_rate, drop_path_rate=dpr[i],
                    activation=nn.relu, dtype=self.dtype, use_pallas=self.use_pallas,
                    name=f"temporal_block_{i + 1}",
                )(x, mask=attn_mask, deterministic=deterministic)

        return self._heads_and_strided(x, stride_mask, deterministic, b, n, p,
                                       out_dim, inv_stride_mask=inv_stride_mask)

    def _heads_and_strided(self, x, stride_mask, deterministic, b, n, p,
                           out_dim, inv_stride_mask=None):
        """head1 + strided stack + head2 (the post-temporal tail)."""
        if inv_stride_mask is None and self.has_strided_input:
            inv_stride_mask = 1.0 - stride_mask.astype(jnp.float32)

        # ---- head1: full-sequence ("upsampling") output -------------------
        full_output = None
        if self.full_output and self.temporal_depth > 0 and self.strided_entry == 0:
            h = x
            if self.output_bn:
                h = nn.BatchNorm(use_running_average=deterministic, momentum=0.1,
                                 epsilon=1e-5, dtype=self.dtype, name="temporal_norm")(h)
            h = nn.Dense(out_dim, kernel_init=KERNEL_INIT,
                         dtype=self.dtype, name="temporal_fc")(h)
            full_output = h.reshape(b, n, p, 3)

        # ---- strided transformer stack → central frame --------------------
        if len(self.strides) > 0:
            seq_lengths = strided_sequence_lengths(self.num_frames, self.strides, self.paddings)
            dpr = self._dpr(2, len(self.strides))
            for i, s in enumerate(self.strides):
                if i < self.strided_entry:
                    continue  # applied externally (fused strided kernel)
                attn_mask = None
                if (self.temporal_depth == 0 and self.has_strided_input
                        and i < self.first_strided_token_attention_layer):
                    # Deferred upsampling-token attention (no temporal blocks)
                    attn_mask = inv_stride_mask[:, None, None, :]
                pe = self.param(f"strided_temporal_pe_{i + 1}", PE_INIT,
                                (seq_lengths[i], self.temporal_d_model))
                pad = None if self.paddings is None else tuple(self.paddings[i])
                x, _ = StridedTransformerBlock(
                    dim=self.temporal_d_model, num_heads=self.num_heads,
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    attn_dropout=self.attn_drop_rate, dropout=self.drop_rate,
                    inner_dropout=self.drop_rate, drop_path_rate=dpr[i],
                    activation=nn.relu, kernel_size=3, stride=s, padding=pad,
                    dtype=self.dtype, use_pallas=self.use_pallas,
                    name=f"strided_temporal_block_{i + 1}",
                )(x, pos_encoding=pe.astype(self.dtype), mask=attn_mask,
                  deterministic=deterministic)
            central = x
        else:
            central = x[:, self.num_frames // 2][:, None, :]

        if self.output_bn:
            central = nn.BatchNorm(use_running_average=deterministic, momentum=0.1,
                                   epsilon=1e-5, dtype=self.dtype,
                                   name="strided_temporal_norm")(central)
        central = nn.Dense(out_dim, kernel_init=KERNEL_INIT,
                           dtype=self.dtype, name="strided_temporal_fc")(central)
        central_output = central.reshape(b, p, 3)

        return full_output, central_output
