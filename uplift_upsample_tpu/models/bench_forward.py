"""Fused eval forward: Pallas spatial stack + Pallas temporal stack + XLA tail.

The bench/eval fast path. Equivalent to `model.apply(..., training=False)`
modulo dot precision (verified by tests/test_bench_forward.py and quantified
on-chip by tools/check_tpu_parity.py). Two pipelines:

  tiled (default when the geometry allows): masked 2D, window-padded →
    fused spatial kernel writing the temporal kernel's tile layout directly
    (ops/pallas_spatial.fused_spatial_stack_tiled) → fused temporal stack
    with the s2t Dense + masked-token + PE as a kernel prologue, banded
    window attention, strided block 1 + output selection as the epilogue
    (ops/pallas_temporal_v3.fused_temporal_stack_v3_tiled) → strided blocks
    2+ and heads via the model's strided_entry splice. No XLA transpose
    between the two kernels — the (B, N, C) pad/transpose round-trips of the
    non-tiled path measured ~16 ms at B=2048 (the wrapper floor).

  legacy: spatial kernel in (P, C, F) layout → XLA s2t/mask/PE → temporal
    kernel with its own pad/transpose wrapper → XLA tail.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas_spatial import spatial_stack_apply
from ..ops.pallas_temporal import fused_temporal_stack, stack_temporal_params
from .uplift_upsample import UpliftUpsampleTransformer


def _tiled_forward(model, variables, x2d_masked, stride_mask, *,
                   spatial_precision, temporal_precision, stacked_temporal,
                   eff_wpt, temporal_attn_precision):
    """The fully-tiled kernel→kernel pipeline (see module docstring)."""
    from ..ops.pallas_spatial import (fused_spatial_stack_tiled,
                                      stack_spatial_params)
    from ..ops.pallas_strided import (_OP_ORDER,
                                      make_strided_b1_epilogue_banded_sel,
                                      make_strided_sel,
                                      stack_strided_block1_params)
    from ..ops.pallas_temporal_v3 import fused_temporal_stack_v3_tiled

    params = variables["params"]
    b, n = x2d_masked.shape[:2]
    s_pad = -(-n // 8) * 8
    n_tiles = b // eff_wpt
    r = eff_wpt * s_pad
    c = model.temporal_d_model

    # Window-pad frames (71→72) up-front so the spatial output lanes line up
    # with the temporal kernel's windows; the pad frames compute garbage the
    # temporal attention masks and the epilogue selection never reads.
    xp = jnp.pad(x2d_masked, ((0, 0), (0, s_pad - n), (0, 0), (0, 0)))
    x_t4 = xp.reshape(n_tiles, r, xp.shape[2], xp.shape[3]).transpose(0, 2, 3, 1)

    stacked_sp = stack_spatial_params(params, model.spatial_depth)
    sp = fused_spatial_stack_tiled(x_t4, stacked_sp,
                                   num_blocks=model.spatial_depth,
                                   num_heads=model.num_heads,
                                   precision=spatial_precision)

    fc = params["spatial_to_temporal_fc"]
    w_s2t = jnp.asarray(fc["kernel"], jnp.float32).T          # (C, P·C_sp)
    b_s2t = jnp.asarray(fc["bias"], jnp.float32)[:, None]     # (C, 1)
    if model.has_strided_input:
        token = jnp.asarray(params["strided_input_token"], jnp.float32)[:, None]
        tok_mask = stride_mask.astype(jnp.float32)
        inv_mask = 1.0 - tok_mask
    else:
        token = jnp.zeros((c, 1), jnp.float32)
        tok_mask = None
        inv_mask = None
    pe = jnp.asarray(params["temporal_pe"], jnp.float32)      # (N, C)
    pe_pad = jnp.tile(jnp.pad(pe, ((0, s_pad - n), (0, 0))).T,
                      (1, eff_wpt))                           # (C, R) tiled

    sops = stack_strided_block1_params(params, n, weights_dtype=jnp.float32,
                                       num_heads=model.num_heads)
    s0 = model.strides[0]
    n_out = (n - 3) // s0 + 1
    ep_list = [sops[name] for name in _OP_ORDER]
    ep_list[-1] = jnp.tile(ep_list[-1], (1, eff_wpt))  # pe pre-tiled (C, R)
    sels = tuple(make_strided_sel(eff_wpt, s_pad, s0, n_out, shift=j)
                 for j in range(3))
    ep_ops = tuple(ep_list) + sels
    epilogue = make_strided_b1_epilogue_banded_sel(
        model.num_heads, eff_wpt, s_pad, c)

    fmb = (model.first_strided_token_attention_layer
           if model.has_strided_input else 0)
    out = fused_temporal_stack_v3_tiled(
        sp, stacked_temporal, inv_mask, num_blocks=model.temporal_depth,
        num_heads=model.num_heads, s_in=n, first_masked_blocks=fmb,
        windows_per_tile=eff_wpt, activation="relu",
        weights_dtype=jnp.float32, precision=temporal_precision,
        attn_precision=temporal_attn_precision,
        s2t_ops=(w_s2t, b_s2t, token, pe_pad), stride_mask=tok_mask,
        epilogue=epilogue, epilogue_ops=ep_ops,
        out_width=eff_wpt * n_out)                # (n_tiles, C, wpt·n_out)

    y = out.transpose(0, 2, 1).reshape(b, n_out, c)
    tail = model.clone(temporal_input=True, strided_entry=1)
    _, central = tail.apply(variables, y, stride_mask=stride_mask,
                            training=False)
    return central


def _can_fuse_strided(model, temporal_impl: str, temporal_attn: str) -> bool:
    """Whether strided block 1 can run as a temporal-kernel epilogue.

    v3 + k=3 geometries with per-side conv padding ≤ 1 (all released
    configs: h36m_351/amass (0,0), h36m_81 (1,1)). The banded-attention
    epilogues only implement the (0,0) alignment.
    """
    if not (len(model.strides) > 0 and model.temporal_depth > 0
            and model.paddings is not None and temporal_impl == "v3"):
        return False
    p0, p1 = model.paddings[0]
    if temporal_attn == "banded":
        return (p0, p1) == (0, 0)
    return 0 <= p0 <= 1 and 0 <= p1 <= 1


def bench_forward(model: UpliftUpsampleTransformer, variables, x2d_masked,
                  stride_mask, *, spatial_precision, temporal_precision,
                  stacked_temporal=None, temporal_impl: str = "v3",
                  temporal_wpt: int = 4, temporal_attn: str = "full",
                  temporal_attn_precision=None, fuse_s2t: bool = False,
                  max_keyframes: int = None, assume_dense_mask: bool = False,
                  strided_sel: bool = False):
    """Central-frame output of the fused eval path.

    x2d_masked: (B, N, 17, 2) already masked at non-keyframes;
    stride_mask: (B, N) with 1/True on frames carrying real input.
    temporal_impl: "v3" (transposed-layout kernel) or "v2".
    temporal_attn: "banded" (default; block-diagonal band softmax) or
    "full" (full (R, R) softmax with additive window mask).
    fuse_s2t: use the fully-tiled kernel→kernel pipeline when the geometry
    allows (strides[0] with padding (0,0), v3, banded). Off by default
    until the tiled temporal kernel's Mosaic compile hang is resolved
    (PERF_NOTES round 3) — interpret-mode parity is green.
    max_keyframes: keyframe-sparse spatial stage. The model multiplies the
    spatial-stack output of every masked frame by zero and substitutes the
    learned token (reference uplift_upsample_transformer.py:342-350), so
    with MASK_STRIDE=s only ceil(N/s) frames per window ever use their
    spatial computation. When set (and the model has strided input), the
    spatial stack + s2t Dense run on a gathered (B, max_keyframes) frame
    subset instead of all N — exact (the spatial stage is frame-independent)
    as long as every window has at most `max_keyframes` real-input frames.
    None → dense (all N frames).
    assume_dense_mask: static promise that stride_mask is all-ones at
    runtime (true for every computed window when the mask token period
    ms/gcd(stride, ms) == 1, e.g. the flagship s_in=5 at stride 5). Skips
    the first-block key-mask machinery — the (n_tiles, R, s) keyband
    stream and mask adds — which is inert for all-real windows.
    """
    params = variables["params"]
    if stacked_temporal is None:
        stacked_temporal = stack_temporal_params(params, model.temporal_depth)
    fmb = (model.first_strided_token_attention_layer
           if model.has_strided_input else 0)
    # Strided block 1 merges into the temporal kernel as an epilogue when the
    # geometry allows (one grid pass instead of two + no transpose pair);
    # blocks 2+ and head2 stay in XLA.
    fuse_strided = _can_fuse_strided(model, temporal_impl, temporal_attn)
    # fused_temporal_stack_v3 halves windows_per_tile until it divides the
    # batch; the strided epilogue's PE tiling must use the SAME effective
    # value or its (C, wpt·s) operands mismatch the kernel tile at trace time.
    eff_wpt = temporal_wpt
    while x2d_masked.shape[0] % eff_wpt != 0 and eff_wpt > 1:
        eff_wpt //= 2

    if (fuse_s2t and fuse_strided and temporal_attn == "banded"
            and model.spatial_depth > 0):
        return _tiled_forward(
            model, variables, x2d_masked, stride_mask,
            spatial_precision=spatial_precision,
            temporal_precision=temporal_precision,
            stacked_temporal=stacked_temporal, eff_wpt=eff_wpt,
            temporal_attn_precision=temporal_attn_precision)

    fc = params["spatial_to_temporal_fc"]
    kf_sparse = (max_keyframes is not None and model.has_strided_input
                 and 0 < max_keyframes < x2d_masked.shape[1])
    if kf_sparse:
        b, n = x2d_masked.shape[:2]
        smb = stride_mask.astype(bool)
        frame_ids = jnp.arange(n, dtype=jnp.int32)[None, :]
        # Keyframe positions ascending, padded (beyond the window's real
        # count) with non-keyframe positions whose spatial output is garbage
        # that the inverse gather below never selects.
        order = jnp.argsort(jnp.where(smb, frame_ids, n + frame_ids),
                            axis=1)[:, :max_keyframes]          # (B, KF)
        xg = jnp.take_along_axis(x2d_masked, order[:, :, None, None], axis=1)
        sp = spatial_stack_apply(params, xg, num_blocks=model.spatial_depth,
                                 num_heads=model.num_heads,
                                 precision=spatial_precision)   # (B, KF, P·C)
        y = sp @ fc["kernel"] + fc["bias"]                      # (B, KF, C)
        # inverse gather: frame t ← its keyframe rank (masked frames point at
        # an arbitrary real row; the mask gate zeroes them next)
        inv = (jnp.cumsum(stride_mask.astype(jnp.int32), axis=1) - 1).clip(0)
        y = jnp.take_along_axis(y, inv[:, :, None], axis=1)     # (B, N, C)
    else:
        sp = spatial_stack_apply(params, x2d_masked,
                                 num_blocks=model.spatial_depth,
                                 num_heads=model.num_heads,
                                 precision=spatial_precision)  # (B, N, P·C)
        y = sp @ fc["kernel"] + fc["bias"]

    return _post_s2t(model, variables, y, stride_mask,
                     temporal_precision=temporal_precision,
                     stacked_temporal=stacked_temporal, fmb=fmb,
                     temporal_impl=temporal_impl, temporal_attn=temporal_attn,
                     temporal_attn_precision=temporal_attn_precision,
                     eff_wpt=eff_wpt, fuse_strided=fuse_strided,
                     assume_dense_mask=assume_dense_mask,
                     strided_sel=strided_sel)


def _post_s2t(model, variables, y, stride_mask, *, temporal_precision,
              stacked_temporal, fmb, temporal_impl, temporal_attn,
              temporal_attn_precision, eff_wpt, fuse_strided,
              assume_dense_mask, strided_sel=False):
    """Masked-token substitution + temporal PE + fused temporal stack + tail.

    y: (B, N, temporal_d) spatial_to_temporal output (pre-substitution).
    """
    params = variables["params"]
    inv_mask = None
    if model.has_strided_input:
        sm = stride_mask.astype(y.dtype)[..., None]
        y = sm * y + (1.0 - sm) * params["strided_input_token"][None, None, :]
        if not assume_dense_mask:
            inv_mask = 1.0 - stride_mask.astype(jnp.float32)
    y = y + params["temporal_pe"]

    if temporal_impl == "v3":
        from ..ops.pallas_temporal_v3 import fused_temporal_stack_v3
        epilogue, ep_ops, out_width = None, (), 0
        if fuse_strided:
            from ..ops.pallas_strided import (_OP_ORDER,
                                              make_strided_b1_epilogue,
                                              make_strided_b1_epilogue_banded,
                                              make_strided_b1_epilogue_sel,
                                              make_strided_sel,
                                              stack_strided_block1_params)
            sops = stack_strided_block1_params(params, model.num_frames,
                                               weights_dtype=jnp.float32,
                                               num_heads=model.num_heads)
            ep_list = [sops[name] for name in _OP_ORDER]
            s_pad = -(-model.num_frames // 8) * 8
            if temporal_attn == "banded":
                # banded epilogue expects pre-tiled (C, R) PE (in-kernel
                # lane concat next to band arrays crashes Mosaic)
                ep_list[-1] = jnp.tile(ep_list[-1], (1, eff_wpt))
            b1_pads = tuple(int(p) for p in model.paddings[0])
            if b1_pads != (0, 0):
                # padded geometry (h36m_81): the epilogue zeroes h1's pad
                # lanes so its lane shifts reproduce the conv's zero padding
                valid = np.zeros((1, eff_wpt * s_pad), np.float32)
                for w in range(eff_wpt):
                    valid[0, w * s_pad: w * s_pad + model.num_frames] = 1.0
                ep_list.append(jnp.asarray(valid))
            if temporal_attn == "banded":
                ep_ops = tuple(ep_list)
                epilogue = make_strided_b1_epilogue_banded(
                    model.num_heads, eff_wpt, s_pad, model.temporal_d_model)
            elif b1_pads == (0, 0) and strided_sel:
                # Selection epilogue: the stride-s0 lane selection runs as
                # one-hot dots INSIDE the kernel, so the output (and its XLA
                # transpose) shrink R/n_out ≈ 3× (h36m_351: 72 → 23 lanes
                # per window).
                s0 = model.strides[0]
                n_out = (model.num_frames - 3) // s0 + 1
                sels = tuple(
                    make_strided_sel(eff_wpt, s_pad, s0, n_out, shift=j)
                    for j in range(3))
                ep_ops = tuple(ep_list) + sels
                epilogue = make_strided_b1_epilogue_sel(
                    model.num_heads, eff_wpt, s_pad, model.temporal_d_model)
                out_width = eff_wpt * n_out
            else:
                ep_ops = tuple(ep_list)
                epilogue = make_strided_b1_epilogue(
                    model.num_heads, eff_wpt, s_pad, model.temporal_d_model,
                    paddings=b1_pads)
        y = fused_temporal_stack_v3(
            y, stacked_temporal, inv_mask, num_blocks=model.temporal_depth,
            num_heads=model.num_heads, first_masked_blocks=fmb,
            activation="relu", weights_dtype=jnp.float32,
            precision=temporal_precision, windows_per_tile=eff_wpt,
            attn_mode=temporal_attn if temporal_attn == "banded" else "full",
            epilogue=epilogue, epilogue_ops=ep_ops,
            attn_precision=temporal_attn_precision, out_width=out_width)
    else:
        y = fused_temporal_stack(
            y, stacked_temporal, inv_mask, num_blocks=model.temporal_depth,
            num_heads=model.num_heads, first_masked_blocks=fmb,
            precision=temporal_precision, activation="relu",
            attn_mode="batched")

    if fuse_strided:
        s0 = model.strides[0]
        p0, p1 = (int(model.paddings[0][0]), int(model.paddings[0][1]))
        n_out = (model.num_frames + p0 + p1 - 3) // s0 + 1
        if y.shape[1] != n_out:  # selection epilogue already picked lanes
            y = y[:, : (n_out - 1) * s0 + 1: s0]
        tail = model.clone(temporal_input=True, strided_entry=1)
    else:
        tail = model.clone(temporal_input=True)
    _, central = tail.apply(variables, y, stride_mask=stride_mask,
                            training=False)
    return central


def shared_spatial_forward(model: UpliftUpsampleTransformer, variables,
                           unique2d, win_idx, stride_mask, *,
                           spatial_precision, temporal_precision,
                           stacked_temporal=None, temporal_impl: str = "v3",
                           temporal_wpt: int = 4, temporal_attn: str = "full",
                           temporal_attn_precision=None,
                           assume_dense_mask: bool = False,
                           strided_sel: bool = False):
    """Fused eval forward with a cross-window SHARED spatial stage.

    In the window-sparse strided eval protocol, consecutive computed windows
    (centers `stride` frames apart, tokens `stride` frames apart) overlap in
    all but one of their N frames — and the spatial stage plus the
    spatial→temporal Dense are frame-independent (reference
    uplift_upsample_transformer.py:313-333: per-frame joint attention), so a
    frame's features are identical in every window containing it. This path
    computes features ONCE per unique masked frame (U ≈ B + N per contiguous
    sequence run instead of B·N) and gathers them into windows; the temporal
    and strided stages are the exact dense-path code.

    unique2d: (U, 17, 2) deduplicated ALREADY-MASKED frames. The host
      multiplies frames by the stride mask before dedup, so all masked
      frames collapse into the single all-zeros row (whose feature value is
      discarded by the masked-token substitution anyway).
    win_idx: (B, N) int32 — each window token's row in unique2d. Padding
      rows of unique2d (beyond the real unique count) must never be indexed.
    stride_mask: (B, N) — 1/True on real-input frames (still drives the
      masked-token substitution and first-block attention masking).
    """
    params = variables["params"]
    if stacked_temporal is None:
        stacked_temporal = stack_temporal_params(params, model.temporal_depth)
    fmb = (model.first_strided_token_attention_layer
           if model.has_strided_input else 0)
    fuse_strided = _can_fuse_strided(model, temporal_impl, temporal_attn)
    eff_wpt = temporal_wpt
    while win_idx.shape[0] % eff_wpt != 0 and eff_wpt > 1:
        eff_wpt //= 2

    sp = spatial_stack_apply(params, unique2d[:, None],
                             num_blocks=model.spatial_depth,
                             num_heads=model.num_heads,
                             precision=spatial_precision)      # (U, 1, P·C)
    fc = params["spatial_to_temporal_fc"]
    y_u = sp[:, 0] @ fc["kernel"] + fc["bias"]                 # (U, C)
    y = jnp.take(y_u, win_idx, axis=0)                         # (B, N, C)
    return _post_s2t(model, variables, y, stride_mask,
                     temporal_precision=temporal_precision,
                     stacked_temporal=stacked_temporal, fmb=fmb,
                     temporal_impl=temporal_impl, temporal_attn=temporal_attn,
                     temporal_attn_precision=temporal_attn_precision,
                     eff_wpt=eff_wpt, fuse_strided=fuse_strided,
                     assume_dense_mask=assume_dense_mask,
                     strided_sel=strided_sel)
