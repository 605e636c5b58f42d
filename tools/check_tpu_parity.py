"""Quantify on-chip numeric drift of the eval/bench configurations.

The parity bar (BASELINE.md) is MPJPE within 0.1 mm of the reference; matmul
precision on TPU is the lever that can silently break it (default f32 dots
run as 1-pass bf16). This tool measures, on the REAL chip, the central-output
drift of each candidate eval configuration against a CPU-f32 (highest) truth
computed in a subprocess — on random weights, which drift *more* than trained
ones, so a configuration that passes here is safe.

Reported per variant: mean and max per-joint distance to truth, in
milli-units ("mm" once outputs are meters, as on real data).

Usage: python tools/check_tpu_parity.py [--batch 64] [--variants a,b,...]
"""

import argparse
import json
import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

TRUTH_PATH = "/tmp/tpu_parity_truth.npz"
BATCH = 64

_TRUTH_SCRIPT = r"""
import sys
sys.path.insert(0, sys.argv[1])
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
from tools.check_tpu_parity import build_model_and_inputs
model, variables, x, sm = build_model_and_inputs(int(sys.argv[3]), sys.argv[4])
full, central = jax.jit(
    lambda v, a, m: model.apply(v, a, stride_mask=m, training=False)
)(variables, x, sm)
np.savez(sys.argv[2], central=np.asarray(central), full=np.asarray(full))
print("truth ok", central.shape)
"""


def build_model_and_inputs(batch, geometry="h36m_351"):
    import jax.numpy as jnp
    from uplift_upsample_tpu.config import UpliftUpsampleConfig
    from uplift_upsample_tpu.models import (build_uplift_upsample_transformer,
                                            init_model_params)

    config = UpliftUpsampleConfig()
    config.update_from({
        "SEQUENCE_LENGTH": 71, "SEQUENCE_STRIDE": 5, "SPATIAL_EMBED_DIM": 32,
        "TEMPORAL_EMBED_DIM": 384, "SPATIAL_TRANSFORMER_BLOCKS": 4,
        "TEMPORAL_TRANSFORMER_BLOCKS": 4, "STRIDES": [3, 10, 3],
        "PADDINGS": [[0, 0], [0, 0], [0, 0]], "NUM_HEADS": 8,
        "MASK_STRIDE": [5, 10, 20], "FIRST_STRIDED_TOKEN_ATTENTION_LAYER": 1,
        "DROP_PATH_RATE": [0.1, 0.1, 0.0],
    })
    # Real-input token period in the window-sparse protocol:
    # s_in / gcd(SEQUENCE_STRIDE, s_in) at the first shipped mask stride.
    token_period = 1
    if geometry == "h36m_81":
        # The second released family: padded first strided block (the padded
        # strided-b1 epilogue) + the wpt=8 lane-exact temporal tiling.
        config.update_from({
            "SEQUENCE_LENGTH": 41, "SEQUENCE_STRIDE": 2,
            "STRIDES": [4, 4, 3], "PADDINGS": [[1, 1], [0, 0], [0, 0]],
            "MASK_STRIDE": [4, 10, 20],
        })
        token_period = 2
    n = config.SEQUENCE_LENGTH
    model = build_uplift_upsample_transformer(config)
    variables = init_model_params(model, seed=0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, n, 17, 2)).astype(np.float32) * 0.3)
    sm = jnp.asarray((np.arange(n) % (5 if geometry == "h36m_351"
                                      else token_period) == 0))
    sm = sm[None].repeat(batch, axis=0)
    x = x * sm[:, :, None, None].astype(x.dtype)
    return model, variables, x, sm


def ensure_truth(batch, geometry="h36m_351"):
    path = (TRUTH_PATH if geometry == "h36m_351"
            else TRUTH_PATH.replace(".npz", f"_{geometry}.npz"))
    if os.path.exists(path):
        d = np.load(path)
        if d["central"].shape[0] == batch:
            return d
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    subprocess.run([sys.executable, "-c", _TRUTH_SCRIPT, REPO, path,
                    str(batch), geometry], env=env, check=True)
    return np.load(path)


def run_variant(name, model, variables, x, sm):
    """Returns the central output under the named TPU configuration."""
    import jax

    if name.startswith("fused_"):
        from uplift_upsample_tpu.ops.pallas_spatial import HIGH3, spatial_stack_apply
        sp_prec = {"fused_default": jax.lax.Precision.DEFAULT,
                   "fused_high3": HIGH3,
                   "fused_highest": jax.lax.Precision.HIGHEST}[name]
        tail = model.clone(spatial_input=True)

        @jax.jit
        def fwd(v, a, m):
            sp = spatial_stack_apply(v["params"], a, num_blocks=4, num_heads=8,
                                     precision=sp_prec)
            return tail.apply(v, sp, stride_mask=m, training=False)[1]
        return np.asarray(jax.device_get(fwd(variables, x, sm)))

    if name.startswith("xla_"):
        prec = name.split("_", 1)[1]  # default | high | highest

        @jax.jit
        def fwd(v, a, m):
            with jax.default_matmul_precision(prec):
                return model.apply(v, a, stride_mask=m, training=False)[1]
        return np.asarray(jax.device_get(fwd(variables, x, sm)))

    if name.startswith("bench_"):
        # fused spatial + fused temporal tail combinations (current bench path
        # candidates); suffix = <spatial prec>-<temporal prec>[-v2|-attnd]
        # ("attnd" = temporal attention dots pinned DEFAULT while the dense
        # dots follow <temporal prec> — the mixed-rung candidate)
        parts = name.split("_", 1)[1].split("-")
        sp_name, tm_name = parts[0], parts[1]
        impl, attn_prec, tiled = "v3", None, False
        for extra in parts[2:]:
            if extra == "attnd":
                attn_prec = jax.lax.Precision.DEFAULT
            elif extra == "tiled":
                tiled = True
            else:
                impl = extra
        to_prec = {"default": jax.lax.Precision.DEFAULT,
                   "high3": "high3",
                   "highest": jax.lax.Precision.HIGHEST}
        from uplift_upsample_tpu.models.bench_forward import bench_forward
        return np.asarray(jax.device_get(bench_forward(
            model, variables, x, sm,
            spatial_precision=to_prec[sp_name],
            temporal_precision=to_prec[tm_name], temporal_impl=impl,
            temporal_attn="banded" if tiled else "full", fuse_s2t=tiled,
            temporal_attn_precision=attn_prec)))

    if name.startswith("rung_"):
        # The actual shared eval/bench path at a precision rung; suffix
        # "_kf" adds the keyframe-sparse spatial gather (max_keyframes=15
        # matches the fixture's %5 mask — the s_in>stride eval path).
        from uplift_upsample_tpu.eval import make_test_step
        from uplift_upsample_tpu.data.keypoint_order import H36MOrder17P
        rung = name.split("_", 1)[1]
        max_kf = None
        if rung.endswith("_kf"):
            rung = rung[:-3]
            max_kf = 15
        step = make_test_step(model, variables, flip_tta=False,
                              flip_lr_indices=H36MOrder17P.flip_lr_indices(),
                              fused="full", precision=rung,
                              max_keyframes=max_kf)
        # make_test_step masks internally; undo the pre-masking double-apply
        _, central = step(x, sm)
        return np.asarray(jax.device_get(central))

    if name.startswith("shared_"):
        # The shared-spatial eval path (EVAL_SHARED_SPATIAL, the window-
        # sparse eval default): host dedup + per-unique-frame spatial
        # features + device gather, at a precision rung.
        import jax.numpy as jnp
        from uplift_upsample_tpu.data.keypoint_order import H36MOrder17P
        from uplift_upsample_tpu.eval import make_test_step
        from uplift_upsample_tpu.utils.dedup import dedup_rows
        rung = name.split("_", 1)[1]
        step = make_test_step(model, variables, flip_tta=False,
                              flip_lr_indices=H36MOrder17P.flip_lr_indices(),
                              fused="full", precision=rung,
                              shared_spatial=True)
        b, n = x.shape[:2]
        xm = np.asarray(x)  # already masked in build_model_and_inputs
        uniq, inv = dedup_rows(xm.reshape(b * n, -1))
        u_max = -(-len(uniq) // 8) * 8
        uq = np.zeros((u_max, 17, 2), np.float32)
        uq[:len(uniq)] = uniq.reshape(-1, 17, 2)
        idx = inv.reshape(b, n).astype(np.int32)
        _, central = step(jnp.asarray(uq), jnp.asarray(idx), sm)
        return np.asarray(jax.device_get(central))

    raise SystemExit(f"unknown variant {name}")


# On-chip regression bounds for the shipped eval rungs (random weights,
# fixture scale ~4.6; see PERF_NOTES.md drift table). A kernel change that
# breaks Mosaic lowering or leaks precision shows up here as a bound failure.
# "h81_"-prefixed variants run the h36m_81 geometry (padded strided-b1
# epilogue + wpt=8 lane-exact temporal tiling) against its own CPU-f32 truth.
ASSERT_BOUNDS = {
    "rung_high": 0.5,      # parity rung; measured 0.172 mean
    "rung_high_kf": 0.5,   # + keyframe-sparse spatial gather (s_in>stride)
    "rung_default": 120.0,  # throughput rung; measured ~55 — sanity only
    "fused_high3": 50.0,    # spatial kernel HIGH3 + XLA tail; measured ~38
    "shared_high": 0.5,    # shared-spatial eval default (parity rung)
    "h81_shared_high": 0.5,  # h36m_81 shared eval default; measured 0.169
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--variants",
                    default="xla_default,xla_highest,fused_default,fused_high3")
    ap.add_argument("--assert-bounds", action="store_true",
                    help="run the shipped eval rungs on the real chip and "
                         "fail (exit 1) if any drift bound regresses — the "
                         "one-command on-hardware kernel regression probe")
    args = ap.parse_args()

    if args.assert_bounds:
        args.variants = ",".join(ASSERT_BOUNDS)

    ctx = {}  # geometry -> (truth, scale, model, variables, x, sm)

    def geometry_ctx(geometry):
        if geometry not in ctx:
            truth = ensure_truth(args.batch, geometry)["central"]
            truth = truth.astype(np.float64)
            ctx[geometry] = (truth, float(np.std(truth)),
                             *build_model_and_inputs(args.batch, geometry))
        return ctx[geometry]

    failures = []
    for name in args.variants.split(","):
        geometry, vname = ("h36m_81", name[4:]) if name.startswith("h81_") \
            else ("h36m_351", name)
        truth, scale, model, variables, x, sm = geometry_ctx(geometry)
        got = run_variant(vname, model, variables, x, sm).astype(np.float64)
        dist = np.linalg.norm(got - truth, axis=-1)  # (B, 17) per-joint
        mean_mm = float(dist.mean() * 1000.0)
        rec = {
            "variant": name,
            "mean_mm": round(mean_mm, 4),
            "max_mm": round(float(dist.max() * 1000.0), 4),
            "out_std": round(scale, 4),
        }
        if args.assert_bounds and name in ASSERT_BOUNDS:
            bound = ASSERT_BOUNDS[name]
            rec["bound_mm"] = bound
            rec["ok"] = mean_mm <= bound
            if not rec["ok"]:
                failures.append(name)
        print(json.dumps(rec), flush=True)
    if args.assert_bounds:
        if failures:
            print(f"REGRESSION: {failures} exceeded drift bounds", flush=True)
            raise SystemExit(1)
        print("kernel drift bounds OK", flush=True)


if __name__ == "__main__":
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    main()
