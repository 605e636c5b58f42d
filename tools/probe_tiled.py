"""Compile-probe the tiled kernels piecewise on the real chip.

Usage: python tools/probe_tiled.py {spatial|temporal|temporal_s2t|temporal_ep|full}

Each stage just compiles + runs once on small-ish shapes and prints a
checksum — for bisecting Mosaic-side crashes that interpret mode cannot see.
"""

import os
import sys

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uplift_upsample_tpu.config import UpliftUpsampleConfig  # noqa: E402
from uplift_upsample_tpu.models import (build_uplift_upsample_transformer,  # noqa: E402
                                        init_model_params)

B, N, WPT = int(os.environ.get("PROBE_B", "64")), 71, 4
WDT = os.environ.get("PROBE_WDT", "f32")
S = 72
R = WPT * S
NT = B // WPT


def build():
    config = UpliftUpsampleConfig()
    config.update_from({
        "SEQUENCE_LENGTH": N, "SEQUENCE_STRIDE": 5, "SPATIAL_EMBED_DIM": 32,
        "TEMPORAL_EMBED_DIM": 384, "SPATIAL_TRANSFORMER_BLOCKS": 4,
        "TEMPORAL_TRANSFORMER_BLOCKS": 4, "STRIDES": [3, 10, 3],
        "PADDINGS": [[0, 0], [0, 0], [0, 0]], "NUM_HEADS": 8,
        "MASK_STRIDE": [5, 10, 20], "FIRST_STRIDED_TOKEN_ATTENTION_LAYER": 1,
    })
    model = build_uplift_upsample_transformer(config)
    return model, init_model_params(model, seed=0)


def main():
    stage = sys.argv[1]
    rng = np.random.default_rng(0)
    model, variables = build()
    params = variables["params"]

    if stage == "spatial":
        from uplift_upsample_tpu.ops.pallas_spatial import (
            fused_spatial_stack_tiled, stack_spatial_params)
        x = jnp.asarray(rng.normal(size=(NT, 17, 2, R)).astype(np.float32) * 0.3)
        st = stack_spatial_params(params, 4)
        out = fused_spatial_stack_tiled(x, st, num_blocks=4, num_heads=8,
                                        precision=jax.lax.Precision.DEFAULT)
        print("spatial ok", out.shape, float(jnp.sum(out * 1e-6)))
        return

    from uplift_upsample_tpu.ops.pallas_temporal import stack_temporal_params
    from uplift_upsample_tpu.ops.pallas_temporal_v3 import (
        fused_temporal_stack_v3_tiled)
    stacked = stack_temporal_params(params, 4)
    sm = jnp.asarray((np.arange(N) % 5 == 0))[None].repeat(B, axis=0)
    inv = 1.0 - sm.astype(jnp.float32)

    fmb = 0 if stage.endswith("0") else 1
    stage = stage.rstrip("0")
    wdt = jnp.bfloat16 if WDT == "bf16" else jnp.float32
    kw = dict(num_blocks=4, num_heads=8, s_in=N, first_masked_blocks=fmb,
              windows_per_tile=WPT, weights_dtype=wdt,
              precision=jax.lax.Precision.DEFAULT)

    if stage == "temporal":
        xt = jnp.asarray(rng.normal(size=(NT, 384, R)).astype(np.float32) * 0.3)
        out = fused_temporal_stack_v3_tiled(xt, stacked, inv, **kw)
        print("temporal ok", out.shape, float(jnp.sum(out * 1e-6)))
        return

    if stage == "temporal_s2t":
        xt = jnp.asarray(rng.normal(size=(NT, 544, R)).astype(np.float32) * 0.3)
        fc = params["spatial_to_temporal_fc"]
        w_s2t = jnp.asarray(fc["kernel"], jnp.float32).T
        b_s2t = jnp.asarray(fc["bias"], jnp.float32)[:, None]
        token = jnp.asarray(params["strided_input_token"], jnp.float32)[:, None]
        pe = jnp.tile(jnp.pad(jnp.asarray(params["temporal_pe"],
                                          jnp.float32),
                              ((0, S - N), (0, 0))).T, (1, WPT))
        mode = os.environ.get("PROBE_S2T_MODE", "full")
        out = fused_temporal_stack_v3_tiled(
            xt, stacked, inv, s2t_ops=(w_s2t, b_s2t, token, pe),
            stride_mask=sm.astype(jnp.float32), s2t_mode=mode, **kw)
        print("temporal_s2t ok", out.shape, float(jnp.sum(out * 1e-6)))
        return

    if stage == "temporal_ep_nosel":
        from uplift_upsample_tpu.ops.pallas_strided import (
            _OP_ORDER, make_strided_b1_epilogue_banded,
            stack_strided_block1_params)
        xt = jnp.asarray(rng.normal(size=(NT, 384, R)).astype(np.float32) * 0.3)
        sops = stack_strided_block1_params(params, N,
                                           weights_dtype=jnp.float32)
        ep_list = [sops[nm] for nm in _OP_ORDER]
        ep_list[-1] = jnp.tile(ep_list[-1], (1, WPT))
        ep = make_strided_b1_epilogue_banded(8, WPT, S, 384)
        out = fused_temporal_stack_v3_tiled(
            xt, stacked, inv, epilogue=ep, epilogue_ops=tuple(ep_list), **kw)
        print("temporal_ep_nosel ok", out.shape, float(jnp.sum(out * 1e-6)))
        return

    if stage == "temporal_ep":
        from uplift_upsample_tpu.ops.pallas_strided import (
            _OP_ORDER, make_strided_b1_epilogue_banded_sel, make_strided_sel,
            stack_strided_block1_params)
        xt = jnp.asarray(rng.normal(size=(NT, 384, R)).astype(np.float32) * 0.3)
        sops = stack_strided_block1_params(params, N,
                                           weights_dtype=jnp.float32)
        n_out = (N - 3) // 3 + 1
        ep_list = [sops[nm] for nm in _OP_ORDER]
        ep_list[-1] = jnp.tile(ep_list[-1], (1, WPT))
        sels = tuple(make_strided_sel(WPT, S, 3, n_out, shift=j)
                     for j in range(3))
        ep_ops = tuple(ep_list) + sels
        ep = make_strided_b1_epilogue_banded_sel(8, WPT, S, 384)
        out = fused_temporal_stack_v3_tiled(
            xt, stacked, inv, epilogue=ep, epilogue_ops=ep_ops,
            out_width=WPT * n_out, **kw)
        print("temporal_ep ok", out.shape, float(jnp.sum(out * 1e-6)))
        return

    if stage == "full":
        from uplift_upsample_tpu.models.bench_forward import bench_forward
        x = jnp.asarray(rng.normal(size=(B, N, 17, 2)).astype(np.float32) * 0.3)
        xm = x * sm[:, :, None, None].astype(x.dtype)
        out = bench_forward(model, variables, xm, sm,
                            spatial_precision=jax.lax.Precision.DEFAULT,
                            temporal_precision=jax.lax.Precision.DEFAULT,
                            fuse_s2t=True)
        print("full ok", out.shape, float(jnp.sum(out * 1e-6)))
        return

    raise SystemExit(f"unknown stage {stage}")


if __name__ == "__main__":
    main()
