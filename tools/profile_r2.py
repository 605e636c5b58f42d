"""Round-2 stage profiling on the real chip (slope-method timing).

Usage: python tools/profile_r2.py VARIANT [--batch 2048]

Variants:
  full_f32        fused-spatial(DEFAULT) + f32 XLA tail   (bench default)
  full_bf16tail   fused-spatial(DEFAULT) + bf16 XLA tail
  spatial_default fused spatial kernel alone, DEFAULT dots
  spatial_high3   fused spatial kernel alone, HIGH3 dots
  tail_f32        tail alone (s2t dense + temporal + heads + strided), f32
  tail_bf16       tail alone, bf16 compute
  temporal4_f32   4 temporal blocks alone on (B, 71, 384), f32
  temporal4_bf16  same, bf16 compute
  strided_f32     strided stack + central head alone, f32
  strided_bf16    same, bf16
  temporal4_pallas existing fused temporal block x4 (calibration)

Prints: variant, ms per invocation, windows/s.
"""

import argparse
import json
import os
import sys

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# CPU backend alongside the accelerator: model init / param stacking are
# hundreds of eager ops — minutes through the relay, seconds on host CPU
# (same fix as bench.py; BENCH_r03 post-mortem in PERF_NOTES round-7).
_platforms = jax.config.jax_platforms
if _platforms and "cpu" not in _platforms.split(","):
    jax.config.update("jax_platforms", _platforms + ",cpu")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uplift_upsample_tpu.config import UpliftUpsampleConfig  # noqa: E402
from uplift_upsample_tpu.models import (build_uplift_upsample_transformer,  # noqa: E402
                                        init_model_params)
from uplift_upsample_tpu.utils.profiling import device_timer  # noqa: E402

if os.environ.get("PR2_DUMP_HLO"):
    # Ground-truth mode: instead of timing, lower (and optionally compile)
    # the EXACT loop device_timer would run at m=4 and dump the text for
    # machine diffing (see PERF_NOTES round-8: the 42 vs 25 ms temporal
    # mystery — StableHLO-identical reconstructions time differently, so
    # the only way forward is dumping from the measured cells themselves).
    from functools import partial as _partial

    def device_timer(fn, *args, m_small: int = 4, m_large: int = 16,
                     reps: int = 3):  # noqa: F811
        tag = os.environ.get("PR2_DUMP_TAG", "cell")

        @_partial(jax.jit, static_argnums=0)
        def loop(m, *a):
            def body(carry, _):
                out = fn(a[0] + carry, *a[1:])
                leaf = jax.tree.leaves(out)[0]
                return (jnp.sum(leaf.ravel()[:1]) * 1e-20).astype(a[0].dtype), None

            carry, _ = jax.lax.scan(body, jnp.zeros([], a[0].dtype), None,
                                    length=m)
            return carry

        lowered = loop.lower(4, *args)
        path = f"/tmp/hlo_meas_{tag}.mlir"
        with open(path, "w") as f:
            f.write(lowered.as_text())
        print(f"[dump] lowered -> {path}", file=sys.stderr)
        devs = [d.platform for d in jax.tree.leaves(args)[0].devices()]
        print(f"[dump] arg0 device platforms: {devs}", file=sys.stderr)
        if os.environ.get("PR2_DUMP_COMPILED"):
            compiled = lowered.compile()
            cpath = f"/tmp/hlo_meas_{tag}.compiled.txt"
            with open(cpath, "w") as f:
                f.write(compiled.as_text())
            print(f"[dump] compiled -> {cpath}", file=sys.stderr)
        # Valid-JSON result marker instead of the timing line: NaN ms would
        # be invalid strict JSON and break downstream parsers (advisor, r4).
        print(json.dumps({"dumped": path, "variant": tag}), flush=True)
        sys.exit(0)


def _host_prep():
    try:
        return jax.default_device(jax.local_devices(backend="cpu")[0])
    except RuntimeError:
        import contextlib
        return contextlib.nullcontext()

BENCH_KEYS = {
    "SEQUENCE_LENGTH": 71, "SEQUENCE_STRIDE": 5, "SPATIAL_EMBED_DIM": 32,
    "TEMPORAL_EMBED_DIM": 384, "SPATIAL_TRANSFORMER_BLOCKS": 4,
    "TEMPORAL_TRANSFORMER_BLOCKS": 4, "STRIDES": [3, 10, 3],
    "PADDINGS": [[0, 0], [0, 0], [0, 0]], "NUM_HEADS": 8,
    "MASK_STRIDE": [5, 10, 20], "FIRST_STRIDED_TOKEN_ATTENTION_LAYER": 1,
    "DROP_PATH_RATE": [0.1, 0.1, 0.0],
}


def build(dtype="float32"):
    config = UpliftUpsampleConfig()
    config.update_from(dict(BENCH_KEYS, COMPUTE_DTYPE=dtype))
    with _host_prep():
        model = build_uplift_upsample_transformer(config)
        variables = init_model_params(model, seed=0)
    # Params transfer to the accelerator when the jitted probe consumes them
    # (closure constants) — keep them host-side here.
    return model, variables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variant")
    ap.add_argument("--batch", type=int, default=2048)
    args = ap.parse_args()
    b = args.batch
    v = args.variant

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, 71, 17, 2)).astype(np.float32) * 0.3)
    sm = jnp.asarray(np.ones((b, 71), dtype=bool))
    sp_out = jnp.asarray(rng.normal(size=(b, 71, 544)).astype(np.float32) * 0.3)
    t_in = jnp.asarray(rng.normal(size=(b, 71, 384)).astype(np.float32) * 0.3)

    if v in ("full_f32", "full_bf16tail"):
        model, variables = build("float32" if v == "full_f32" else "bfloat16")
        tail = model.clone(spatial_input=True)
        from uplift_upsample_tpu.ops.pallas_spatial import spatial_stack_apply

        def fn(x, sm):
            xm = x * sm[:, :, None, None].astype(x.dtype)
            sp = spatial_stack_apply(variables["params"], xm,
                                     num_blocks=4, num_heads=8,
                                     precision=jax.lax.Precision.DEFAULT)
            _, central = tail.apply(variables, sp, stride_mask=sm, training=False)
            return central
        sec = device_timer(fn, x, sm)
    elif v.startswith("spatial_"):
        # spatial_default | spatial_high3, optional _bf<block_f> suffix,
        # optional bisect suffix: _qkvonly|_noattn|_logitsonly|_softmaxonly|_nomlp
        _, variables = build()
        from uplift_upsample_tpu.ops.pallas_spatial import HIGH3, spatial_stack_apply
        prec = HIGH3 if "high3" in v else jax.lax.Precision.DEFAULT
        block_f = 128
        for part in v.split("_"):
            if part.startswith("bf") and part[2:].isdigit():
                block_f = int(part[2:])
        bisect = "full"
        for m in ("qkvonly", "noattn", "logitsonly", "softmaxonly", "nomlp"):
            if v.endswith("_" + m):
                bisect = {"logitsonly": "logits_only",
                          "softmaxonly": "softmax_only"}.get(m, m)
        attn = "hpack" if "_hpack" in v else "fma"

        def fn(x):
            return spatial_stack_apply(variables["params"], x, num_blocks=4,
                                       num_heads=8, precision=prec,
                                       block_f=block_f, bisect=bisect,
                                       attn=attn)
        sec = device_timer(fn, x)
    elif v.startswith("tail_"):
        model, variables = build("float32" if v == "tail_f32" else "bfloat16")
        tail = model.clone(spatial_input=True)

        def fn(sp):
            _, central = tail.apply(variables, sp, stride_mask=sm, training=False)
            return central
        sec = device_timer(fn, sp_out)
    elif (v.startswith("temporal4_") and not v.endswith("pallas")
          and not v.startswith(("temporal4_v2", "temporal4_v3"))):
        # NOTE (round-8 post-mortem): this branch used to be a bare
        # startswith("temporal4_") and SWALLOWED every temporal4_v2*/v3*
        # variant — all historical "temporal4_v3_*" numbers (the entire
        # "42 ms temporal floor" saga) actually measured THIS pure-XLA
        # bf16 flax stack, never the v3 kernel. The real v3 kernel runs
        # ~25 ms at B=2048 (see PERF_NOTES round-8 correction).
        dtype = "float32" if v.endswith("f32") else "bfloat16"
        model, variables = build(dtype)

        from flax import linen as nn
        from uplift_upsample_tpu.models.primitives import TransformerBlock

        class TemporalOnly(nn.Module):
            dtype: jnp.dtype = jnp.float32

            @nn.compact
            def __call__(self, x):
                for i in range(4):
                    x, _ = TransformerBlock(
                        dim=384, num_heads=8, mlp_ratio=2.0, qkv_bias=True,
                        activation=nn.relu, dtype=self.dtype,
                        name=f"temporal_block_{i + 1}")(x, deterministic=True)
                return x

        tm = TemporalOnly(dtype=jnp.dtype(dtype))
        tparams = {k: variables["params"][k] for k in
                   [f"temporal_block_{i + 1}" for i in range(4)]}

        def fn(t):
            return tm.apply({"params": tparams}, t)
        sec = device_timer(fn, t_in)
    elif v == "temporal4_pallas":
        _, variables = build()
        from uplift_upsample_tpu.ops.pallas_temporal import temporal_stack_apply

        def fn(t):
            return temporal_stack_apply(variables["params"], t, None,
                                        num_blocks=4, num_heads=8)
        sec = device_timer(fn, t_in)
    elif v.startswith("temporal4_v2"):
        # temporal4_v2[_high3|_highest][_wpt<N>][_noattn|_onehead]
        _, variables = build()
        from uplift_upsample_tpu.ops.pallas_temporal import (HIGH3,
                                                             fused_temporal_stack,
                                                             stack_temporal_params)
        prec = jax.lax.Precision.DEFAULT
        if "_high3" in v:
            prec = HIGH3
        elif "_highest" in v:
            prec = jax.lax.Precision.HIGHEST
        wpt = 8
        for part in v.split("_"):
            if part.startswith("wpt"):
                wpt = int(part[3:])
        attn_mode = "maskq"
        if "_noattn" in v:
            attn_mode = "none"
        elif "_onehead" in v:
            attn_mode = "onehead"
        elif "_batched" in v:
            attn_mode = "batched"
        stacked = stack_temporal_params(variables["params"], 4)

        def fn(t):
            return fused_temporal_stack(t, stacked, None, num_blocks=4,
                                        num_heads=8, windows_per_tile=wpt,
                                        precision=prec, attn_mode=attn_mode)
        sec = device_timer(fn, t_in)
    elif v.startswith("temporal4_v3"):
        # temporal4_v3[_wpt<N>][_f32w]
        _, variables = build()
        from uplift_upsample_tpu.ops.pallas_temporal import stack_temporal_params
        from uplift_upsample_tpu.ops.pallas_temporal_v3 import fused_temporal_stack_v3
        wpt = 4
        for part in v.split("_"):
            if part.startswith("wpt"):
                wpt = int(part[3:])
        wdtype = jnp.float32 if "_f32w" in v else jnp.bfloat16
        spad = 96 if "_s96" in v else 0
        amode = "full"
        for m in ("noattn", "logitsonly", "softmaxonly", "qkvonly", "nomlp",
                  "banded"):
            if "_" + m in v:
                amode = {"noattn": "none", "logitsonly": "logits_only",
                         "softmaxonly": "softmax_only", "qkvonly": "qkvonly",
                         "nomlp": "nomlp", "banded": "banded"}[m]
        stacked = stack_temporal_params(variables["params"], 4)
        # Sentinel co-located with the kernel that consumes it (advisor, r4)
        from uplift_upsample_tpu.ops.pallas_temporal_v3 import HIGH3 as _HIGH3
        v3_prec = _HIGH3 if "_high3" in v else jax.lax.Precision.DEFAULT
        if "_randvals" in v:
            # Matrix cell: the REAL wrapper with RANDOM operand values (same
            # shapes/dtypes). 25 ms here => trained values cause the 42 ms.
            rng_rv = np.random.default_rng(7)
            stacked = {k: jnp.asarray(
                rng_rv.normal(size=np.shape(a)).astype(np.float32) * 0.05)
                for k, a in stacked.items()}

        if "_nojitprepped" in v:
            # BOTH deltas removed at once: undecorated wrapper + operands
            # prepared outside the timed jit and passed as device args.
            from uplift_upsample_tpu.ops.pallas_temporal_v3 import _transposed_operands
            impl = fused_temporal_stack_v3.__wrapped__
            ops = [jax.device_put(o) for o in _transposed_operands(
                stacked, 4, wdtype, q_scale=1.0 / np.sqrt(384 // 8))]

            def fn(t, *flat):
                return impl(t, stacked, None, num_blocks=4, num_heads=8,
                            first_masked_blocks=0, windows_per_tile=wpt,
                            activation="relu", weights_dtype=wdtype,
                            precision=v3_prec,
                            attn_mode=amode, token_pad_to=spad,
                            prepped_ops=flat)
            sec = device_timer(fn, t_in, *ops)
        elif "_nojit" in v:
            # Call the undecorated implementation (no nested jit/closed_call)
            impl = fused_temporal_stack_v3.__wrapped__

            def fn(t):
                return impl(t, stacked, None, num_blocks=4, num_heads=8,
                            first_masked_blocks=0, windows_per_tile=wpt,
                            activation="relu", weights_dtype=wdtype,
                            precision=v3_prec,
                            attn_mode=amode, token_pad_to=spad)
            sec = device_timer(fn, t_in)
        elif "_prepped" in v:
            # Weight transposes/casts done OUTSIDE the timed jit and passed
            # as device-resident args: tests whether in-jit weight prep is
            # re-executed per scan iteration.
            from uplift_upsample_tpu.ops.pallas_temporal_v3 import _transposed_operands
            ops = [jax.device_put(o) for o in _transposed_operands(
                stacked, 4, wdtype, q_scale=1.0 / np.sqrt(384 // 8))]

            def fn(t, *flat):
                return fused_temporal_stack_v3(t, stacked, None, num_blocks=4,
                                               num_heads=8,
                                               windows_per_tile=wpt,
                                               weights_dtype=wdtype,
                                               precision=v3_prec,
                                               attn_mode=amode,
                                               token_pad_to=spad,
                                               prepped_ops=flat)
            sec = device_timer(fn, t_in, *ops)
        elif "_args" in v:
            # Weights as traced ARGUMENTS (device-resident), not closure
            # constants: through the relay, large jit constants are lifted to
            # parameters backed by host copies and re-shipped every call.
            keys = sorted(stacked.keys())
            vals = [stacked[k] for k in keys]

            def fn(t, *flat):
                st = dict(zip(keys, flat))
                return fused_temporal_stack_v3(t, st, None, num_blocks=4,
                                               num_heads=8,
                                               windows_per_tile=wpt,
                                               weights_dtype=wdtype,
                                               precision=v3_prec,
                                               attn_mode=amode,
                                               token_pad_to=spad)
            sec = device_timer(fn, t_in, *vals)
        else:
            def fn(t):
                return fused_temporal_stack_v3(t, stacked, None, num_blocks=4,
                                               num_heads=8, windows_per_tile=wpt,
                                               weights_dtype=wdtype,
                                               precision=v3_prec,
                                               attn_mode=amode,
                                               token_pad_to=spad)
            sec = device_timer(fn, t_in)
    elif v.startswith("tv3probe_"):
        # Pin the v3 fixed cost: "wrapper" = pad/transpose round-trip with no
        # pallas_call; "copy" = identical blockspecs, trivial copy kernel.
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        c, s, wpt = 384, 72, 4
        # Lane-alignment probe geometries: _s96 pads window tokens 72→96 so
        # R = wpt·s hits an exact 128-lane multiple; _wpt<N> re-tiles.
        if "_s96" in v:
            s = 96
        for part in v.split("_"):
            if part.startswith("wpt") and part[3:].isdigit():
                wpt = int(part[3:])
        r = wpt * s
        # Geometry suffixes (_s96, _wpt<N>) are orthogonal to the probe KIND;
        # strip them before dispatch so e.g. tv3probe_manyops_s96 reaches the
        # manyops probe instead of silently falling through to the copy
        # kernel (advisor finding, round 2).
        kind = "_".join(part for part in v.split("_")
                        if part != "s96"
                        and not (part.startswith("wpt") and part[3:].isdigit()))

        if kind == "tv3probe_manyops":
            # Copy kernel with the REAL kernel's operand census: 4 blocks x
            # (2 LN cols + wqkv + bqkv col + wp + bp col + 2 LN cols + w1 +
            # b1 col + w2 + b2 col) + blkdiag + masks + ones = 53 operands.
            rng2 = np.random.default_rng(2)

            def mk(*shape, dt=jnp.float32):
                a = rng2.normal(size=shape).astype(np.float32) * 0.05
                return jnp.asarray(a).astype(dt)

            blk_ops = []
            for _ in range(4):
                blk_ops += [mk(c, 1), mk(c, 1), mk(3 * c, c, dt=jnp.bfloat16),
                            mk(3 * c, 1), mk(c, c, dt=jnp.bfloat16), mk(c, 1),
                            mk(c, 1), mk(c, 1), mk(768, c, dt=jnp.bfloat16),
                            mk(768, 1), mk(c, 768, dt=jnp.bfloat16), mk(c, 1)]
            blkdiag2 = mk(r, r)
            ones8 = jnp.ones((8, c), jnp.float32)

            def kernel(*refs):
                x_ref, o_ref = refs[0], refs[-1]
                o_ref[0] = x_ref[0] * 1.000001

            def fullspec(a):
                return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                    memory_space=pltpu.VMEM)

            @jax.jit
            def fn(t):
                bb = t.shape[0]
                xp = jnp.pad(t, ((0, 0), (0, s - 71), (0, 0)))
                n_tiles = (bb * s) // r
                x_t = xp.reshape(n_tiles, r, c).transpose(0, 2, 1)
                keyrow2 = jnp.zeros((n_tiles, 1, r), jnp.float32)
                out = pl.pallas_call(
                    kernel,
                    grid=(n_tiles,),
                    in_specs=[pl.BlockSpec((1, c, r), lambda i: (i, 0, 0),
                                           memory_space=pltpu.VMEM),
                              fullspec(blkdiag2),
                              pl.BlockSpec((1, 1, r), lambda i: (i, 0, 0),
                                           memory_space=pltpu.VMEM),
                              pl.BlockSpec((1, 1, r), lambda i: (i, 0, 0),
                                           memory_space=pltpu.VMEM),
                              fullspec(ones8)]
                    + [fullspec(o) for o in blk_ops],
                    out_specs=pl.BlockSpec((1, c, r), lambda i: (i, 0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((n_tiles, c, r),
                                                   jnp.float32),
                )(x_t, blkdiag2, keyrow2, keyrow2, ones8, *blk_ops)
                return out.transpose(0, 2, 1).reshape(bb, s, c)[:, :71]
            sec = device_timer(fn, t_in)
        elif kind in ("tv3probe_mixed", "tv3probe_mixed_vpu"):
            # Interleave LN stats with big dots like the real kernel.
            # "mixed": stats via M=1 MXU ones-dots (shape-thrash theory);
            # "mixed_vpu": stats via cross-sublane VPU reductions.
            rng2 = np.random.default_rng(2)
            wqkv = jnp.asarray(rng2.normal(size=(3 * c, c)).astype(np.float32)
                               * 0.05).astype(jnp.bfloat16)
            ws = [wqkv] * 4
            ones8 = jnp.ones((8, c), jnp.float32)
            use_mxu = kind == "tv3probe_mixed"

            def kernel(x_ref, ones_ref, w0, w1, w2, w3, o_ref):
                acc = x_ref[0]
                ones_row = ones_ref[:1]
                for wr in (w0, w1, w2, w3):
                    if use_mxu:
                        mu = jax.lax.dot_general(
                            ones_row, acc, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) * (1.0 / c)
                        xc = acc - mu
                        var = jax.lax.dot_general(
                            ones_row, xc * xc, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) * (1.0 / c)
                    else:
                        mu = jnp.mean(acc, axis=0, keepdims=True)
                        xc = acc - mu
                        var = jnp.mean(xc * xc, axis=0, keepdims=True)
                    y = xc / jnp.sqrt(var + 1e-5)
                    qkv = jax.lax.dot_general(
                        wr[:].astype(jnp.float32), y,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = acc + qkv[:c] + qkv[c:2 * c] + qkv[2 * c:]
                o_ref[0] = acc

            def fullspec(a):
                return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                    memory_space=pltpu.VMEM)

            @jax.jit
            def fn(t):
                bb = t.shape[0]
                xp = jnp.pad(t, ((0, 0), (0, s - 71), (0, 0)))
                n_tiles = (bb * s) // r
                x_t = xp.reshape(n_tiles, r, c).transpose(0, 2, 1)
                out = pl.pallas_call(
                    kernel,
                    grid=(n_tiles,),
                    in_specs=[pl.BlockSpec((1, c, r), lambda i: (i, 0, 0),
                                           memory_space=pltpu.VMEM),
                              fullspec(ones8)] + [fullspec(w) for w in ws],
                    out_specs=pl.BlockSpec((1, c, r), lambda i: (i, 0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((n_tiles, c, r),
                                                   jnp.float32),
                )(x_t, ones8, *ws)
                return out.transpose(0, 2, 1).reshape(bb, s, c)[:, :71]
            sec = device_timer(fn, t_in)
        elif kind == "tv3probe_biases":
            # qkv4 + per-block (n,1) column bias operands — the padded-lane
            # VMEM theory: (1152,1) pads to (1152,128) = 590 KB each
            rng2 = np.random.default_rng(2)
            wqkv = jnp.asarray(rng2.normal(size=(3 * c, c)).astype(np.float32)
                               * 0.05).astype(jnp.bfloat16)
            bcol = jnp.asarray(rng2.normal(size=(3 * c, 1)).astype(np.float32))
            ws = [wqkv] * 4
            bs_ = [bcol] * 4

            def kernel(x_ref, w0, w1, w2, w3, b0, b1, b2, b3, o_ref):
                acc = x_ref[0]
                for wr, br in ((w0, b0), (w1, b1), (w2, b2), (w3, b3)):
                    qkv = jax.lax.dot_general(
                        wr[:].astype(jnp.float32), acc,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) + br[:]
                    acc = acc + qkv[:c] + qkv[c:2 * c] + qkv[2 * c:]
                o_ref[0] = acc

            def fullspec(a):
                return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                    memory_space=pltpu.VMEM)

            @jax.jit
            def fn(t):
                bb = t.shape[0]
                xp = jnp.pad(t, ((0, 0), (0, s - 71), (0, 0)))
                n_tiles = (bb * s) // r
                x_t = xp.reshape(n_tiles, r, c).transpose(0, 2, 1)
                out = pl.pallas_call(
                    kernel,
                    grid=(n_tiles,),
                    in_specs=[pl.BlockSpec((1, c, r), lambda i: (i, 0, 0),
                                           memory_space=pltpu.VMEM)]
                    + [fullspec(w) for w in ws] + [fullspec(b) for b in bs_],
                    out_specs=pl.BlockSpec((1, c, r), lambda i: (i, 0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((n_tiles, c, r),
                                                   jnp.float32),
                )(x_t, *ws, *bs_)
                return out.transpose(0, 2, 1).reshape(bb, s, c)[:, :71]
            sec = device_timer(fn, t_in)
        elif kind in ("tv3probe_weights", "tv3probe_qkv4", "tv3probe_ln8"):
            rng2 = np.random.default_rng(2)
            wqkv = jnp.asarray(rng2.normal(size=(3 * c, c)).astype(np.float32)
                               * 0.05).astype(jnp.bfloat16)
            ws = [wqkv] * 4  # 4 blocks' worth ≈ 3.5 MB bf16
            ones8 = jnp.ones((8, c), jnp.float32)

            def kernel(x_ref, ones_ref, w0, w1, w2, w3, o_ref):
                x = x_ref[0]
                if kind == "tv3probe_weights":
                    o_ref[0] = x * 1.000001
                    return
                if kind == "tv3probe_qkv4":
                    acc = x
                    for wr in (w0, w1, w2, w3):
                        qkv = jax.lax.dot_general(
                            wr[:].astype(jnp.float32), acc,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        acc = acc + qkv[:c] + qkv[c:2 * c] + qkv[2 * c:]
                    o_ref[0] = acc
                    return
                # ln8: 8 MXU-stat LayerNorms
                ones_row = ones_ref[:1]
                acc = x
                for _ in range(8):
                    mu = jax.lax.dot_general(
                        ones_row, acc, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) * (1.0 / c)
                    xc = acc - mu
                    var = jax.lax.dot_general(
                        ones_row, xc * xc, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) * (1.0 / c)
                    acc = xc / jnp.sqrt(var + 1e-5)
                o_ref[0] = acc

            def fullspec(a):
                return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                    memory_space=pltpu.VMEM)

            @jax.jit
            def fn(t):
                bb = t.shape[0]
                xp = jnp.pad(t, ((0, 0), (0, s - 71), (0, 0)))
                n_tiles = (bb * s) // r
                x_t = xp.reshape(n_tiles, r, c).transpose(0, 2, 1)
                out = pl.pallas_call(
                    kernel,
                    grid=(n_tiles,),
                    in_specs=[pl.BlockSpec((1, c, r), lambda i: (i, 0, 0),
                                           memory_space=pltpu.VMEM),
                              fullspec(ones8)] + [fullspec(w) for w in ws],
                    out_specs=pl.BlockSpec((1, c, r), lambda i: (i, 0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((n_tiles, c, r),
                                                   jnp.float32),
                )(x_t, ones8, *ws)
                return out.transpose(0, 2, 1).reshape(bb, s, c)[:, :71]
        elif kind == "tv3probe_wrapper":
            @jax.jit
            def fn(t):
                bb = t.shape[0]
                xp = jnp.pad(t, ((0, 0), (0, s - 71), (0, 0)))
                n_tiles = (bb * s) // r
                x_t = xp.reshape(n_tiles, r, c).transpose(0, 2, 1)
                out = x_t * 1.000001
                return out.transpose(0, 2, 1).reshape(bb, s, c)[:, :71]
        elif kind in ("tv3probe_copy", "tv3probe_copy4"):
            def kernel(x_ref, o_ref):
                o_ref[0] = x_ref[0] * 1.000001

            @jax.jit
            def fn(t):
                bb = t.shape[0]
                xp = jnp.pad(t, ((0, 0), (0, s - 71), (0, 0)))
                n_tiles = (bb * s) // r
                x_t = xp.reshape(n_tiles, r, c).transpose(0, 2, 1)
                out = x_t
                reps = 4 if kind == "tv3probe_copy4" else 1
                for _ in range(reps):
                    out = pl.pallas_call(
                        kernel,
                        grid=(n_tiles,),
                        in_specs=[pl.BlockSpec((1, c, r), lambda i: (i, 0, 0),
                                               memory_space=pltpu.VMEM)],
                        out_specs=pl.BlockSpec((1, c, r), lambda i: (i, 0, 0),
                                               memory_space=pltpu.VMEM),
                        out_shape=jax.ShapeDtypeStruct((n_tiles, c, r),
                                                       jnp.float32),
                    )(out)
                return out.transpose(0, 2, 1).reshape(bb, s, c)[:, :71]
        else:
            raise ValueError(f"unrecognized tv3probe variant {v!r} (kind {kind!r})")
        sec = device_timer(fn, t_in)
    elif v.startswith("tv3ladder"):
        # tv3ladder<L>: standalone kernel replicating the REAL v3 kernel's
        # per-block content up to level L, with pre-built device-resident
        # operands and NO fused_temporal_stack_v3 wrapper. Finds where the
        # 7 ms probe world becomes the 42 ms real-kernel world:
        #   L1: LN (no affine) + qkv dot, 4 DISTINCT bf16 wqkv operands
        #   L2: + LN affine ((C,1) gamma/beta operands per block)
        #   L3: + qkv bias ((3C,1)) + residual adds (== real qkvonly content)
        #   L4: + proj + LN2 + MLP with their operands (ctx := v; == noattn)
        #   L5: + per-head attention dots + softmax (== the full real block)
        #   L6: L5 + the real call's remaining fixed operands: grid-mapped
        #       (1,1,R) keyrow/padrow streams + (8,C) ones, and the per-block
        #       addmask = blkdiag + padrow[0] — operand-for-operand identical
        #       to fused_temporal_stack_v3(bf16, fmb=0, attn=full).
        #   L7: L6's operand set but addmask = blkdiag only (isolates the
        #       stream cost from the mask-add cost).
        # All levels: vmem_limit 64 MB (like the real call), grid (n_tiles,).
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        c, s, wpt = 384, 72, 4
        r = wpt * s
        level = int(v[len("tv3ladder"):] or "4")
        rows = level >= 6          # stream keyrow/padrow/ones like the real call
        content = min(level, 5)    # block math level
        hidden = 768
        heads, depth = 8, 48
        rng2 = np.random.default_rng(2)

        def mk(*shape, dt=jnp.float32):
            a = rng2.normal(size=shape).astype(np.float32) * 0.05
            return jnp.asarray(a).astype(dt)

        blk_ops = []
        for _ in range(4):
            ops = {"wqkv": mk(3 * c, c, dt=jnp.bfloat16)}
            if level >= 2:
                ops["g1"], ops["b1_"] = mk(c, 1), mk(c, 1)
            if level >= 3:
                ops["bqkv"] = mk(3 * c, 1)
            if level >= 4:
                ops.update(wp=mk(c, c, dt=jnp.bfloat16), bp=mk(c, 1),
                           g2=mk(c, 1), b2_=mk(c, 1),
                           w1=mk(hidden, c, dt=jnp.bfloat16), bm1=mk(hidden, 1),
                           w2=mk(c, hidden, dt=jnp.bfloat16), bm2=mk(c, 1))
            blk_ops.append(ops)
        keys = sorted(blk_ops[0].keys())
        flat_ops = [blk_ops[i][k] for i in range(4) for k in keys]
        npb = len(keys)
        blkdiag_np = np.full((r, r), -1e9, np.float32)
        for w in range(wpt):
            blkdiag_np[w * s:(w + 1) * s, w * s:(w + 1) * s] = 0.0
        blkdiag = jnp.asarray(blkdiag_np)

        def ln(x, gamma, beta):
            mu = jnp.mean(x, axis=0, keepdims=True)
            xc = x - mu
            var = jnp.mean(xc * xc, axis=0, keepdims=True)
            y = xc / jnp.sqrt(var + 1e-5)
            if gamma is not None:
                y = y * gamma + beta
            return y

        dflt = jax.lax.Precision.DEFAULT

        def kernel(*refs):
            x_ref, bd_ref, o_ref = refs[0], refs[1], refs[-1]
            base = 2
            pr_ref = None
            if rows:
                _kr_ref, pr_ref, _ones_ref = refs[2], refs[3], refs[4]
                base = 5
            x = x_ref[0]
            for blk in range(4):
                d = dict(zip(keys, refs[base + npb * blk: base + npb * (blk + 1)]))
                y = ln(x, d["g1"][:] if level >= 2 else None,
                       d["b1_"][:] if level >= 2 else None)
                qkv = jax.lax.dot_general(
                    d["wqkv"][:].astype(jnp.float32), y,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=dflt)
                if level >= 3:
                    qkv = qkv + d["bqkv"][:]
                if level < 4:
                    x = x + qkv[:c] + qkv[c:2 * c] + qkv[2 * c:]
                    continue
                if level >= 5:
                    addmask = (bd_ref[:] + pr_ref[0]) if level == 6 else bd_ref[:]
                    ctx_parts = []
                    for h in range(heads):
                        qh = qkv[h * depth:(h + 1) * depth]
                        kh = qkv[c + h * depth: c + (h + 1) * depth]
                        vh = qkv[2 * c + h * depth: 2 * c + (h + 1) * depth]
                        logits = jax.lax.dot_general(
                            qh, kh, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=dflt) + addmask
                        m = jnp.max(logits, axis=1, keepdims=True)
                        ex = jnp.exp(logits - m)
                        wgt = ex / jnp.sum(ex, axis=1, keepdims=True)
                        ctx_parts.append(jax.lax.dot_general(
                            vh, wgt, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=dflt))
                    ctx = jnp.concatenate(ctx_parts, axis=0)
                else:
                    ctx = qkv[2 * c:]
                proj = jax.lax.dot_general(
                    d["wp"][:].astype(jnp.float32), ctx,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=dflt)
                x = x + proj + d["bp"][:]
                z = ln(x, d["g2"][:], d["b2_"][:])
                z = jax.lax.dot_general(
                    d["w1"][:].astype(jnp.float32), z,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=dflt) + d["bm1"][:]
                z = jnp.maximum(z, 0.0)
                z = jax.lax.dot_general(
                    d["w2"][:].astype(jnp.float32), z,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=dflt) + d["bm2"][:]
                x = x + z
            o_ref[0] = x

        def fullspec(a):
            return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                memory_space=pltpu.VMEM)

        pad_row_np = np.zeros((s,), np.float32)
        pad_row_np[71:] = -1e9
        padrow_tile = jnp.asarray(np.tile(pad_row_np, wpt))[None, :]  # (1, R)
        ones_row = jnp.ones((8, c), jnp.float32)

        @jax.jit
        def fn(t, *flat):
            bb = t.shape[0]
            xp = jnp.pad(t, ((0, 0), (0, s - 71), (0, 0)))
            n_tiles = (bb * s) // r
            x_t = xp.reshape(n_tiles, r, c).transpose(0, 2, 1)
            row_spec = pl.BlockSpec((1, 1, r), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
            if rows:
                keyrow = jnp.broadcast_to(padrow_tile, (n_tiles, 1, r))
                padrow_full = jnp.broadcast_to(padrow_tile, (n_tiles, 1, r))
                fixed_specs = [fullspec(blkdiag), row_spec, row_spec,
                               fullspec(ones_row)]
                fixed_args = (blkdiag, keyrow, padrow_full, ones_row)
            else:
                fixed_specs = [fullspec(blkdiag)]
                fixed_args = (blkdiag,)
            out = pl.pallas_call(
                kernel,
                grid=(n_tiles,),
                in_specs=[pl.BlockSpec((1, c, r), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)]
                + fixed_specs
                + [fullspec(o) for o in flat],
                out_specs=pl.BlockSpec((1, c, r), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n_tiles, c, r), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024),
            )(x_t, *fixed_args, *flat)
            return out.transpose(0, 2, 1).reshape(bb, s, c)[:, :71]
        sec = device_timer(fn, t_in, *flat_ops)
    elif v.startswith("tv3realk") or v == "tv3realw":
        # Split the remaining ladder-vs-real gap (L6=25ms vs real=42ms):
        #   tv3realk: the REAL _make_kernel_v3 kernel + the LADDER wrapper
        #             (random operands in the real ref order). 42 ms here
        #             => the kernel factory's tracing is the difference.
        #   tv3realw: the REAL fused_temporal_stack_v3 wrapper with
        #             _make_kernel_v3 monkeypatched to a ladder-style kernel.
        #             42 ms here => the wrapper assembly is the difference.
        # Follow-ups (tv3realk measured 25.2 ms — kernel exonerated; these
        # bisect the wrapper-side deltas one at a time on top of tv3realk):
        #   tv3realk_nestjit: pallas-call fn is a nested @jax.jit called from
        #             the timed jit (isolates jit nesting).
        #   tv3realk_inprep: operands built INSIDE the jit from closed-over
        #             stacked-layout arrays — slice/transpose/cast per call,
        #             exactly _transposed_operands' work (isolates in-jit
        #             operand prep).
        #   tv3realk_const: blkdiag/padrow/ones built from np INSIDE the jit
        #             (HLO literals, not closed-over device buffers).
        # Round-8 (tools/hlo_diff_temporal.py proved the 42 ms and 25 ms
        # programs are IDENTICAL StableHLO with byte-identical Mosaic
        # payloads — so the gap must live in the ARGUMENT ARRAYS):
        #   tv3realk_realvals: trained values via the real _transposed_
        #             operands EAGER path (device arrays produced by on-TPU
        #             transpose/concat/cast, like nojitprepped feeds them).
        #             42 ms => argument values or eager-array layouts cause it.
        #   tv3realk_realvals_np: same trained values round-tripped through
        #             host numpy (fresh default-layout uploads). 42 ms =>
        #             VALUES; 25 ms (with realvals at 42) => eager-array
        #             LAYOUT is the cause.
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        import uplift_upsample_tpu.ops.pallas_temporal_v3 as ptv3
        c, s, wpt = 384, 72, 4
        r = wpt * s
        hidden, heads, depth = 768, 8, 48
        rng2 = np.random.default_rng(2)

        def mk(*shape, dt=jnp.float32):
            a = rng2.normal(size=shape).astype(np.float32) * 0.05
            return jnp.asarray(a).astype(dt)

        # operands in the REAL per-block ref order
        flat_ops = []
        for _ in range(4):
            flat_ops += [mk(c, 1), mk(c, 1), mk(3 * c, c, dt=jnp.bfloat16),
                         mk(3 * c, 1), mk(c, c, dt=jnp.bfloat16), mk(c, 1),
                         mk(c, 1), mk(c, 1), mk(hidden, c, dt=jnp.bfloat16),
                         mk(hidden, 1), mk(c, hidden, dt=jnp.bfloat16),
                         mk(c, 1)]
        if "_realvals" in v:
            from uplift_upsample_tpu.ops.pallas_temporal import stack_temporal_params
            _, variables = build()
            stacked_real = stack_temporal_params(variables["params"], 4)
            flat_ops = list(ptv3._transposed_operands(
                stacked_real, 4, jnp.bfloat16,
                q_scale=1.0 / np.sqrt(depth)))
            if v.endswith("_np"):
                # host numpy round-trip: fresh default-layout uploads
                flat_ops = [jnp.asarray(np.asarray(o)) for o in flat_ops]
            else:
                # eager-computed device arrays, exactly as nojitprepped feeds
                flat_ops = [jax.device_put(o) for o in flat_ops]
        blkdiag_np = np.full((r, r), -1e9, np.float32)
        for w in range(wpt):
            blkdiag_np[w * s:(w + 1) * s, w * s:(w + 1) * s] = 0.0
        blkdiag = jnp.asarray(blkdiag_np)
        pad_row_np = np.zeros((s,), np.float32)
        pad_row_np[71:] = -1e9
        padrow_tile = jnp.asarray(np.tile(pad_row_np, wpt))[None, :]
        ones_row = jnp.ones((8, c), jnp.float32)

        def fullspec(a):
            return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                memory_space=pltpu.VMEM)

        if v.startswith("tv3realk"):
            kernel = ptv3._make_kernel_v3(
                4, wpt, s, c, hidden, heads, 0, "relu",
                jax.lax.Precision.DEFAULT, "full")

            def body(t, *flat):
                bb = t.shape[0]
                xp = jnp.pad(t, ((0, 0), (0, s - 71), (0, 0)))
                n_tiles = (bb * s) // r
                x_t = xp.reshape(n_tiles, r, c).transpose(0, 2, 1)
                row_spec = pl.BlockSpec((1, 1, r), lambda i: (i, 0, 0),
                                        memory_space=pltpu.VMEM)
                if v == "tv3realk_const":
                    # np-literal constants like the real wrapper builds
                    bd = jnp.asarray(blkdiag_np)
                    prt = jnp.asarray(np.tile(pad_row_np, wpt))[None, :]
                    ones = jnp.ones((8, c), jnp.float32)
                else:
                    bd, prt, ones = blkdiag, padrow_tile, ones_row
                keyrow = jnp.broadcast_to(prt, (n_tiles, 1, r))
                padrow_full = jnp.broadcast_to(prt, (n_tiles, 1, r))
                out = pl.pallas_call(
                    kernel,
                    grid=(n_tiles,),
                    in_specs=[pl.BlockSpec((1, c, r), lambda i: (i, 0, 0),
                                           memory_space=pltpu.VMEM),
                              fullspec(bd), row_spec, row_spec,
                              fullspec(ones)]
                    + [fullspec(o) for o in flat],
                    out_specs=pl.BlockSpec((1, c, r), lambda i: (i, 0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((n_tiles, c, r),
                                                   jnp.float32),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=64 * 1024 * 1024),
                )(x_t, bd, keyrow, padrow_full, ones, *flat)
                return out.transpose(0, 2, 1).reshape(bb, s, c)[:, :71]

            if v == "tv3realk_nestjit":
                inner = jax.jit(body)

                def fn(t, *flat):
                    return inner(t, *flat)
                sec = device_timer(fn, t_in, *flat_ops)
            elif v == "tv3realk_inprep":
                # Closed-over arrays in the STACKED layout; slice/transpose/
                # cast inside the timed jit, exactly like the real wrapper's
                # _transposed_operands path (non-prepped).
                stacked_like = {
                    "ln1_g": mk(4, c), "ln1_b": mk(4, c),
                    "wqkv": mk(4, c, 3 * c), "bqkv": mk(4, 3 * c),
                    "wp": mk(4, c, c), "bp": mk(4, c),
                    "ln2_g": mk(4, c), "ln2_b": mk(4, c),
                    "w1": mk(4, c, hidden), "b1": mk(4, hidden),
                    "w2": mk(4, hidden, c), "b2": mk(4, c),
                }

                def fn(t):
                    ops = ptv3._transposed_operands(
                        stacked_like, 4, jnp.bfloat16,
                        q_scale=1.0 / np.sqrt(depth))
                    return body(t, *ops)
                sec = device_timer(fn, t_in)
            else:
                fn = jax.jit(body)
                sec = device_timer(fn, t_in, *flat_ops)
        else:  # tv3realw
            def ladder_factory(num_blocks, wpt_, s_, c_, hidden_, num_heads,
                               first_masked_blocks, activation,
                               precision=jax.lax.Precision.DEFAULT,
                               attn_mode="full", num_epilogue_refs=0,
                               epilogue=None, attn_precision=None,
                               s2t=False, s2t_mode="full", presplit=False):
                dflt = jax.lax.Precision.DEFAULT
                dep = c_ // num_heads

                def ln(x, gamma, beta):
                    mu = jnp.mean(x, axis=0, keepdims=True)
                    xc = x - mu
                    var = jnp.mean(xc * xc, axis=0, keepdims=True)
                    return xc / jnp.sqrt(var + 1e-5) * gamma + beta

                def kernel(*refs):
                    x_ref, bd_ref, kr_ref, pr_ref, ones_ref = refs[:5]
                    o_ref = refs[-1]
                    x = x_ref[0]
                    for blk in range(num_blocks):
                        (g1, b1_, wqkv, bqkv, wp, bp, g2, b2_, w1, bm1,
                         w2, bm2) = refs[5 + 12 * blk: 5 + 12 * (blk + 1)]
                        y = ln(x, g1[:], b1_[:])
                        qkv = jax.lax.dot_general(
                            wqkv[:].astype(jnp.float32), y,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=dflt) + bqkv[:]
                        addmask = bd_ref[:] + pr_ref[0]
                        ctx_parts = []
                        for h in range(num_heads):
                            qh = qkv[h * dep:(h + 1) * dep]
                            kh = qkv[c_ + h * dep: c_ + (h + 1) * dep]
                            vh = qkv[2 * c_ + h * dep: 2 * c_ + (h + 1) * dep]
                            logits = jax.lax.dot_general(
                                qh, kh, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=dflt) + addmask
                            m = jnp.max(logits, axis=1, keepdims=True)
                            ex = jnp.exp(logits - m)
                            wgt = ex / jnp.sum(ex, axis=1, keepdims=True)
                            ctx_parts.append(jax.lax.dot_general(
                                vh, wgt, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=dflt))
                        ctx = jnp.concatenate(ctx_parts, axis=0)
                        x = x + jax.lax.dot_general(
                            wp[:].astype(jnp.float32), ctx,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=dflt) + bp[:]
                        z = ln(x, g2[:], b2_[:])
                        z = jax.lax.dot_general(
                            w1[:].astype(jnp.float32), z,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=dflt) + bm1[:]
                        z = jnp.maximum(z, 0.0)
                        z = jax.lax.dot_general(
                            w2[:].astype(jnp.float32), z,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=dflt) + bm2[:]
                        x = x + z
                    o_ref[0] = x
                return kernel

            _, variables = build()
            from uplift_upsample_tpu.ops.pallas_temporal import stack_temporal_params
            stacked = stack_temporal_params(variables["params"], 4)
            orig = ptv3._make_kernel_v3
            ptv3._make_kernel_v3 = ladder_factory
            try:
                def fn(t):
                    return ptv3.fused_temporal_stack_v3(
                        t, stacked, None, num_blocks=4, num_heads=8,
                        windows_per_tile=wpt, weights_dtype=jnp.bfloat16,
                        attn_mode="full")
                sec = device_timer(fn, t_in)
            finally:
                ptv3._make_kernel_v3 = orig
    elif v.startswith("bench_fwd"):
        # End-to-end fused bench path:
        #   bench_fwd[_v2][_sphigh3][_high3][_banded][_tiled][_twpt<N>]
        # _tiled   → the fully-tiled kernel→kernel pipeline (fuse_s2t=True,
        #            banded attention; see bench_forward docstring)
        # _banded  → banded window attention on the legacy (non-tiled) path
        # _high3   → HIGH3 dots in BOTH kernels (the parity rung)
        # _sphigh3 → HIGH3 spatial only
        model, variables = build()
        from uplift_upsample_tpu.models.bench_forward import bench_forward
        from uplift_upsample_tpu.ops.pallas_spatial import HIGH3
        impl = "v2" if "_v2" in v else "v3"
        high3_all = "_high3" in v and "_sphigh3" not in v
        sp_prec = (HIGH3 if ("sphigh3" in v or high3_all)
                   else jax.lax.Precision.DEFAULT)
        tm_prec = HIGH3 if high3_all else jax.lax.Precision.DEFAULT
        tiled = "_tiled" in v
        attn = "banded" if ("_banded" in v or tiled) else "full"
        twpt = 4
        for part in v.split("_"):
            if part.startswith("twpt"):
                twpt = int(part[4:])

        def fn(x, sm):
            xm = x * sm[:, :, None, None].astype(x.dtype)
            return bench_forward(model, variables, xm, sm,
                                 spatial_precision=sp_prec,
                                 temporal_precision=tm_prec,
                                 temporal_impl=impl, temporal_wpt=twpt,
                                 temporal_attn=attn, fuse_s2t=tiled)
        sec = device_timer(fn, x, sm)
    elif v.startswith("strided_"):
        dtype = "float32" if v.endswith("f32") else "bfloat16"
        model, variables = build(dtype)
        from flax import linen as nn
        from uplift_upsample_tpu.models.primitives import StridedTransformerBlock
        from uplift_upsample_tpu.models.uplift_upsample import strided_sequence_lengths

        class StridedOnly(nn.Module):
            dtype: jnp.dtype = jnp.float32

            @nn.compact
            def __call__(self, x):
                seq_lengths = strided_sequence_lengths(71, [3, 10, 3],
                                                       [[0, 0], [0, 0], [0, 0]])
                for i, s in enumerate([3, 10, 3]):
                    pe = self.param(f"strided_temporal_pe_{i + 1}",
                                    nn.initializers.zeros,
                                    (seq_lengths[i], 384))
                    x, _ = StridedTransformerBlock(
                        dim=384, num_heads=8, mlp_ratio=2.0, qkv_bias=True,
                        activation=nn.relu, kernel_size=3, stride=s,
                        padding=(0, 0), dtype=self.dtype,
                        name=f"strided_temporal_block_{i + 1}",
                    )(x, pos_encoding=pe.astype(self.dtype), deterministic=True)
                x = nn.Dense(51, dtype=self.dtype, name="strided_temporal_fc")(x)
                return x

        sm_ = StridedOnly(dtype=jnp.dtype(dtype))
        sparams = {k: variables["params"][k] for k in variables["params"]
                   if k.startswith("strided_temporal")}

        def fn(t):
            return sm_.apply({"params": sparams}, t)
        sec = device_timer(fn, t_in)
    elif v.startswith("pk_"):
        # Micro-bisection kernels on the v2 tile layout: (576, 384) per step,
        # grid 256 (B=2048, wpt=8), x4 sequential calls like the 4 blocks.
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        c, hidden, rows = 384, 768, 576
        rng2 = np.random.default_rng(1)
        wqkv = jnp.asarray(rng2.normal(size=(c, 3 * c)).astype(np.float32) * 0.05)
        wp = jnp.asarray(rng2.normal(size=(c, c)).astype(np.float32) * 0.05)
        w1 = jnp.asarray(rng2.normal(size=(c, hidden)).astype(np.float32) * 0.05)
        w2 = jnp.asarray(rng2.normal(size=(hidden, c)).astype(np.float32) * 0.05)
        g = jnp.ones((c,), jnp.float32)

        def ln(x, gamma):
            mu = jnp.mean(x, axis=1, keepdims=True)
            var = jnp.mean((x - mu) ** 2, axis=1, keepdims=True)
            return (x - mu) / jnp.sqrt(var + 1e-5) * gamma[None, :]

        dot = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)

        bqkv = jnp.zeros((3 * c,), jnp.float32)
        bp = jnp.zeros((c,), jnp.float32)
        b1 = jnp.zeros((hidden,), jnp.float32)
        b2 = jnp.zeros((c,), jnp.float32)
        amask = jnp.zeros((b, 72), jnp.float32)
        with_bias = v in ("pk_bias", "pk_mask", "pk_all")
        with_mask = v in ("pk_mask", "pk_all")

        def body(x, refs):
            (wqkv_ref, wp_ref, w1_ref, w2_ref, g_ref) = refs[:5]
            if v == "pk_copy":
                return x * 1.000001
            if v == "pk_ln":
                return ln(ln(x, g_ref[:]), g_ref[:])
            if v == "pk_qkv":
                qkv = dot(ln(x, g_ref[:]), wqkv_ref[:])
                return x + qkv[:, :c] + qkv[:, c:2 * c] + qkv[:, 2 * c:]
            y = ln(x, g_ref[:])
            qkv = dot(y, wqkv_ref[:])
            if with_bias:
                qkv = qkv + refs[5][:][None, :]
            attn = qkv[:, 2 * c:]  # pretend ctx = v
            if with_mask:
                neg = refs[9][:]  # (wpt=8, 72)
                attn = attn + neg.reshape(-1)[:, None] * 0.0
            x = x + dot(attn, wp_ref[:])
            if with_bias:
                x = x + refs[6][:][None, :]
            z = ln(x, g_ref[:])
            z = jnp.maximum(dot(z, w1_ref[:]), 0.0)
            if with_bias:
                z = z + refs[7][:][None, :]
            z = dot(z, w2_ref[:])
            if with_bias:
                z = z + refs[8][:][None, :]
            return x + z

        def kernel(*refs):
            x = refs[0][:]
            refs_rest = refs[1:-1]
            refs[-1][:] = body(x, refs_rest)

        def full(a):
            return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                memory_space=pltpu.VMEM)

        @jax.jit
        def fn(t):
            flat = jnp.pad(t, ((0, 0), (0, 1), (0, 0))).reshape(-1, c)
            out = flat
            for _ in range(4):
                in_specs = [pl.BlockSpec((rows, c), lambda i: (i, 0),
                                         memory_space=pltpu.VMEM),
                            full(wqkv), full(wp), full(w1), full(w2), full(g)]
                args = [out, wqkv, wp, w1, w2, g]
                if with_bias:
                    in_specs += [full(bqkv), full(bp), full(b1), full(b2)]
                    args += [bqkv, bp, b1, b2]
                if with_mask:
                    in_specs.append(pl.BlockSpec((8, 72), lambda i: (i, 0),
                                                 memory_space=pltpu.VMEM))
                    args.append(amask)
                out = pl.pallas_call(
                    kernel,
                    grid=(out.shape[0] // rows,),
                    in_specs=in_specs,
                    out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct(flat.shape, jnp.float32),
                )(*args)
            return out.reshape(b, 72, c)[:, :71]
        sec = device_timer(fn, t_in)
    elif v.startswith("pkt_"):
        # Transposed-layout temporal block skeleton: activations (C, R) with
        # C=384 on sublanes, R = wpt*72 window-tokens on lanes. Heads are
        # 8-aligned sublane slices (48 = 6x8); attention is true per-head MXU
        # dots over all wpt windows at once with a block-diagonal additive
        # mask; LN stats via MXU (ones-row dots). Weights bf16 (DEFAULT dots
        # are 1-pass bf16 anyway). Variants: pkt_dense (no attention),
        # pkt_all[_wpt<N>] (full block).
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        c, hidden, s = 384, 768, 72
        wpt = 4
        for part in v.split("_"):
            if part.startswith("wpt"):
                wpt = int(part[3:])
        r = wpt * s
        with_attn = "dense" not in v
        nheads, depth = 8, 48
        scale_q = np.float32(1.0 / np.sqrt(depth))

        rng2 = np.random.default_rng(1)
        def w16(*shape):
            return jnp.asarray(rng2.normal(size=shape).astype(np.float32)
                               * 0.05).astype(jnp.bfloat16)
        wqkv = w16(3 * c, c)   # row-major out: y = W @ x
        wp = w16(c, c)
        w1 = w16(hidden, c)
        w2 = w16(c, hidden)
        ones_row = jnp.full((8, c), 1.0 / c, jnp.float32)  # row 0 used

        # Block-diagonal additive mask (R, R): 0 within a window, -1e9 across
        blkdiag = np.full((r, r), -1e9, np.float32)
        for w in range(wpt):
            blkdiag[w * s:(w + 1) * s, w * s:(w + 1) * s] = 0.0
        blkdiag = jnp.asarray(blkdiag)

        dot = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dot_tt = lambda a, b: jax.lax.dot_general(  # contract dim0 (sublanes)
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dot_nt = lambda a, b: jax.lax.dot_general(  # contract dim1 of both
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

        def ln_mxu(x, ones_ref):
            mu = dot(ones_ref[:1], x)            # (1, R)
            xc = x - mu                          # broadcast over sublanes
            var = dot(ones_ref[:1], xc * xc)     # (1, R)
            return xc / jnp.sqrt(var + 1e-5)

        def kernel(x_ref, mask_ref, wqkv_ref, wp_ref, w1_ref, w2_ref,
                   ones_ref, o_ref):
            x = x_ref[:]  # (C, R) f32
            y = ln_mxu(x, ones_ref)
            qkv = dot(wqkv_ref[:].astype(jnp.float32), y)  # (3C, R)
            if with_attn:
                ctx_parts = []
                for h in range(nheads):
                    sl = slice(h * depth, (h + 1) * depth)
                    qh = qkv[sl] * scale_q          # (48, R)
                    kh = qkv[c + h * depth: c + (h + 1) * depth]
                    vh = qkv[2 * c + h * depth: 2 * c + (h + 1) * depth]
                    logits = dot_tt(qh, kh) + mask_ref[:]   # (R_q, R_k)
                    m = jnp.max(logits, axis=1, keepdims=True)
                    ex = jnp.exp(logits - m)
                    wgt = ex / jnp.sum(ex, axis=1, keepdims=True)
                    ctx_parts.append(dot_nt(vh, wgt))       # (48, R_q)
                attn = jnp.concatenate(ctx_parts, axis=0)   # (C, R)
            else:
                attn = qkv[2 * c:]
            x = x + dot(wp_ref[:].astype(jnp.float32), attn)
            z = ln_mxu(x, ones_ref)
            z = jnp.maximum(dot(w1_ref[:].astype(jnp.float32), z), 0.0)
            z = dot(w2_ref[:].astype(jnp.float32), z)
            o_ref[:] = x + z

        def full(a):
            return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                memory_space=pltpu.VMEM)

        @jax.jit
        def fn(t):
            # (B, 71, c) -> pad to 72 -> transpose to (c, B*72)
            xt = jnp.pad(t, ((0, 0), (0, 1), (0, 0)))
            xt = xt.reshape(-1, c).T  # (c, B*72)
            out = xt
            for _ in range(4):
                out = pl.pallas_call(
                    kernel,
                    grid=(out.shape[1] // r,),
                    in_specs=[pl.BlockSpec((c, r), lambda i: (0, i),
                                           memory_space=pltpu.VMEM),
                              full(blkdiag), full(wqkv), full(wp),
                              full(w1), full(w2), full(ones_row)],
                    out_specs=pl.BlockSpec((c, r), lambda i: (0, i),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct(xt.shape, jnp.float32),
                )(out, blkdiag, wqkv, wp, w1, w2, ones_row)
            return out.T.reshape(b, 72, c)[:, :71]
        sec = device_timer(fn, t_in)
    else:
        raise SystemExit(f"unknown variant {v}")

    print(json.dumps({"variant": v, "batch": b, "ms": round(sec * 1e3, 3),
                      "windows_per_s": round(b / sec, 1)}))


if __name__ == "__main__":
    main()
