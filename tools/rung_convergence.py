"""TRAIN_MATMUL_PRECISION rung convergence comparison on learnable synth data.

The fused train kernels run their dots at a configurable precision rung
(config.py TRAIN_MATMUL_PRECISION): "mixed" (spatial HIGHEST / temporal
DEFAULT — the conservative shipped default) vs "default" (1-pass bf16
everywhere — the measured-fastest, bench.py --train default) vs "high"
(bf16x3). Gradient parity per rung is pinned by unit tests, but whether the
bf16 rung *converges equivalently* over thousands of optimizer steps is an
empirical question. This script answers it without the (unavailable) real
H36M data:

  1. builds a LEARNABLE synthetic H36M dataset (smooth 3D world motion,
     2D = true distorted camera projection — utils/testing.py
     make_learnable_h36m_npz), where val MPJPE must fall far below the
     random-pose baseline;
  2. trains the flagship h36m_351 geometry for --steps optimizer steps per
     rung with identical data order (same SHUFFLE_SEED) and identical
     model-init/dropout RNG;
  3. prints per-epoch train loss and val MPJPE for each rung plus the final
     deltas.

Equivalence bar (heuristic): final val MPJPE within 2% between rungs, and
the loss curves tracking within run-to-run noise. Run on the TPU through
tools/tpu_queue.sh (one process at a time):

    nohup sh tools/tpu_queue.sh \
        "python tools/rung_convergence.py --rungs mixed,default" \
        > /tmp/rungconv.log 2>&1 &
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--rungs", default="mixed,default")
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--steps-per-epoch", type=int, default=500)
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--data-dir", default="/tmp/learnable_h36m")
    parser.add_argument("--out-base", default="/tmp/rung_convergence")
    args = parser.parse_args()

    os.makedirs(args.data_dir, exist_ok=True)
    path_3d = os.path.join(args.data_dir, "data_3d_h36m.npz")
    path_2d = os.path.join(args.data_dir, "data_2d_h36m_synth.npz")
    if not (os.path.exists(path_3d) and os.path.exists(path_2d)):
        from uplift_upsample_tpu.utils.testing import make_learnable_h36m_npz
        print("generating learnable synthetic dataset ...", flush=True)
        make_learnable_h36m_npz(path_3d, path_2d)

    from uplift_upsample_tpu.configs import get_config
    from uplift_upsample_tpu.data.keypoint_order import H36MOrder17P
    from uplift_upsample_tpu.train import train_and_validate

    results = {}
    for rung in args.rungs.split(","):
        rung = rung.strip()
        out_dir = os.path.join(args.out_base, rung)
        config = get_config("h36m_351")
        config.update_from({
            "BATCH_SIZE": args.batch, "EPOCHS": args.epochs,
            "STEPS_PER_EPOCH": args.steps_per_epoch,
            "VALIDATION_INTERVAL": 2, "CHECKPOINT_INTERVAL": 10_000,
            "VALIDATION_EXAMPLES": 2048,
            "TRAIN_MATMUL_PRECISION": rung,
            # one loss sync per epoch: each fetch costs seconds through the
            # relay and would dominate the run (device compute is ~32 s/epoch)
            "TRAIN_LOG_EVERY": args.steps_per_epoch,
        })
        config.AUGM_FLIP_KEYPOINT_ORDER = H36MOrder17P.flip_lr_indices()
        print(f"=== rung {rung} → {out_dir}", flush=True)
        hist, best_path, _ = train_and_validate(
            config=config, out_dir=out_dir, dataset_name="h36m",
            h36m_path=path_3d, dataset_2d_path=path_2d,
            train_subset="train", val_subset="val", test_subset=None)
        losses, mpjpes = [], []
        with open(os.path.join(out_dir, "scalars.jsonl")) as f:
            for line in f:
                rec = json.loads(line)
                if rec["tag"] == "train/loss":
                    losses.append((rec["step"], rec["value"]))
                elif rec["tag"] == "val/MPJPE":
                    mpjpes.append((rec["step"], rec["value"]))
        results[rung] = {"loss": losses, "mpjpe": mpjpes}
        print(f"rung {rung}: loss {['%d:%.4f' % p for p in losses]}", flush=True)
        print(f"rung {rung}: val MPJPE {['%d:%.2f' % p for p in mpjpes]}",
              flush=True)

    print("\n=== summary", flush=True)
    for rung, r in results.items():
        final_loss = r["loss"][-1][1] if r["loss"] else float("nan")
        final_mpjpe = r["mpjpe"][-1][1] if r["mpjpe"] else float("nan")
        print(f"{rung:8s} final train loss {final_loss:.4f}  "
              f"final val MPJPE {final_mpjpe:.2f} mm")
    rungs = list(results)
    if len(rungs) >= 2 and all(results[r]["mpjpe"] for r in rungs):
        base = results[rungs[0]]["mpjpe"][-1][1]
        for other in rungs[1:]:
            o = results[other]["mpjpe"][-1][1]
            print(f"MPJPE delta {other} vs {rungs[0]}: "
                  f"{o - base:+.3f} mm ({(o / base - 1) * 100:+.2f}%)")
    print(json.dumps({"results": {r: {"final_mpjpe": v["mpjpe"][-1][1]
                                      if v["mpjpe"] else None}
                                  for r, v in results.items()}}))


if __name__ == "__main__":
    main()
