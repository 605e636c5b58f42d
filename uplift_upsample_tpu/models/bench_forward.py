"""Fused eval forward: Pallas spatial stack + Pallas temporal stack + XLA tail.

The bench/eval fast path. Equivalent to `model.apply(..., training=False)`
modulo dot precision (verified by tests/test_bench_forward.py and quantified
on-chip by tools/check_tpu_parity.py):

  masked 2D → fused spatial kernel (ops/pallas_spatial.py)
            → spatial_to_temporal Dense + strided-token substitution + PE (XLA)
            → fused temporal stack (ops/pallas_temporal.py, batched attention)
            → strided stack + heads via the model's temporal_input splice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.pallas_spatial import spatial_stack_apply
from ..ops.pallas_temporal import fused_temporal_stack, stack_temporal_params
from .uplift_upsample import UpliftUpsampleTransformer


def bench_forward(model: UpliftUpsampleTransformer, variables, x2d_masked,
                  stride_mask, *, spatial_precision, temporal_precision,
                  stacked_temporal=None, temporal_impl: str = "v3",
                  temporal_wpt: int = 4, temporal_attn: str = "banded"):
    """Central-frame output of the fused eval path.

    x2d_masked: (B, N, 17, 2) already masked at non-keyframes;
    stride_mask: (B, N) with 1/True on frames carrying real input.
    temporal_impl: "v3" (transposed-layout kernel; temporal_precision
    selects the weight dtype — DEFAULT→bf16 weights, else f32) or "v2".
    temporal_attn: "banded" (default; block-diagonal band softmax) or
    "full" (full (R, R) softmax with additive window mask).
    """
    params = variables["params"]
    sp = spatial_stack_apply(params, x2d_masked, num_blocks=model.spatial_depth,
                             num_heads=model.num_heads,
                             precision=spatial_precision)  # (B, N, P·C)

    fc = params["spatial_to_temporal_fc"]
    y = sp @ fc["kernel"] + fc["bias"]

    inv_mask = None
    if model.has_strided_input:
        sm = stride_mask.astype(y.dtype)[..., None]
        y = sm * y + (1.0 - sm) * params["strided_input_token"][None, None, :]
        inv_mask = 1.0 - stride_mask.astype(jnp.float32)
    y = y + params["temporal_pe"]

    if stacked_temporal is None:
        stacked_temporal = stack_temporal_params(params, model.temporal_depth)
    fmb = (model.first_strided_token_attention_layer
           if model.has_strided_input else 0)
    # Strided block 1 merges into the temporal kernel as an epilogue when the
    # geometry allows (one grid pass instead of two + no transpose pair);
    # blocks 2+ and head2 stay in XLA.
    fuse_strided = (len(model.strides) > 0 and model.temporal_depth > 0
                    and model.paddings is not None
                    and tuple(model.paddings[0]) == (0, 0)
                    and temporal_impl == "v3")
    # fused_temporal_stack_v3 halves windows_per_tile until it divides the
    # batch; the strided epilogue's PE tiling must use the SAME effective
    # value or its (C, wpt·s) operands mismatch the kernel tile at trace time.
    eff_wpt = temporal_wpt
    while x2d_masked.shape[0] % eff_wpt != 0 and eff_wpt > 1:
        eff_wpt //= 2
    if temporal_impl == "v3":
        from ..ops.pallas_temporal_v3 import fused_temporal_stack_v3
        epilogue, ep_ops = None, ()
        if fuse_strided:
            from ..ops.pallas_strided import (_OP_ORDER,
                                              make_strided_b1_epilogue,
                                              make_strided_b1_epilogue_banded,
                                              stack_strided_block1_params)
            sops = stack_strided_block1_params(params, model.num_frames,
                                               weights_dtype=jnp.float32)
            ep_ops = tuple(sops[name] for name in _OP_ORDER)
            s_pad = -(-model.num_frames // 8) * 8
            make_ep = (make_strided_b1_epilogue_banded
                       if temporal_attn == "banded"
                       else make_strided_b1_epilogue)
            epilogue = make_ep(model.num_heads, eff_wpt, s_pad,
                               model.temporal_d_model)
        y = fused_temporal_stack_v3(
            y, stacked_temporal, inv_mask, num_blocks=model.temporal_depth,
            num_heads=model.num_heads, first_masked_blocks=fmb,
            activation="relu", weights_dtype=jnp.float32,
            precision=temporal_precision, windows_per_tile=eff_wpt,
            attn_mode=temporal_attn if temporal_attn == "banded" else "full",
            epilogue=epilogue, epilogue_ops=ep_ops)
    else:
        y = fused_temporal_stack(
            y, stacked_temporal, inv_mask, num_blocks=model.temporal_depth,
            num_heads=model.num_heads, first_masked_blocks=fmb,
            precision=temporal_precision, activation="relu",
            attn_mode="batched")

    if fuse_strided:
        s0 = model.strides[0]
        n_out = (model.num_frames - 3) // s0 + 1
        y = y[:, : (n_out - 1) * s0 + 1: s0]
        tail = model.clone(temporal_input=True, strided_entry=1)
    else:
        tail = model.clone(temporal_input=True)
    _, central = tail.apply(variables, y, stride_mask=stride_mask,
                            training=False)
    return central
