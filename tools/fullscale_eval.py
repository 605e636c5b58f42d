"""Full-scale dress rehearsal of the real-data eval (VERDICT r3 item 3).

Generates a synthetic Human3.6M at the TRUE dataset volume — all 7 subjects,
the 15 canonical actions x 2 variants each (S11 missing "Directions", the
real corrupted-video quirk), per-sequence frame counts drawn to land S9+S11
at ~545k mocap frames (x4 cameras ~= 2.18M eval samples, the published
protocol's test volume; reference h36m_splits.py:23-53 + eval.py) — then
runs the COMPLETE eval CLI (3-value mask-stride sweep) exactly as the 45.7 mm
reproduction would, recording wall-clock, host RSS, and dedup behavior.

This de-risks everything the real `data_3d_h36m.npz` run will exercise that
small fixtures cannot: batch packing at ~436k computed windows per stride,
the shared-spatial u_max dedup capacity, host RSS through the relay client,
and keyframe interpolation over millions of rows.

Usage (serialize through tools/tpu_queue.sh on the TPU):
    python tools/fullscale_eval.py --make-data     # ~2 GB under /tmp, one-off
    python tools/fullscale_eval.py --run           # exec the eval CLI sweep
"""

import argparse
import json
import os
import resource
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA_DIR = os.environ.get("FULLSCALE_DIR", "/tmp/fullscale_h36m")
PATH_3D = os.path.join(DATA_DIR, "data_3d_h36m_fullscale.npz")
PATH_2D = os.path.join(DATA_DIR, "data_2d_h36m_fullscale.npz")
PATH_H5 = os.path.join(DATA_DIR, "fullscale_weights.h5")

ACTIONS_15 = ["Directions", "Discussion", "Eating", "Greeting", "Phoning",
              "Photo", "Posing", "Purchases", "Sitting", "SittingDown",
              "Smoking", "Waiting", "WalkDog", "Walking", "WalkTogether"]
SUBJECTS = ("S1", "S5", "S6", "S7", "S8", "S9", "S11")


def make_data(seed=20260819):
    os.makedirs(DATA_DIR, exist_ok=True)
    rng = np.random.default_rng(seed)
    positions_3d, positions_2d = {}, {}
    total, test_total = 0, 0
    for subject in SUBJECTS:
        positions_3d[subject] = {}
        positions_2d[subject] = {}
        for action in ACTIONS_15:
            if subject == "S11" and action == "Directions":
                continue  # the real corrupted-video gap
            for variant in (action, f"{action} 1"):
                # Real S9+S11 total ~545k mocap frames over 59 sequences
                # (~9.2k mean); spread 6k-12.5k like the real length mix.
                frames = int(rng.integers(6_000, 12_500))
                pose = (rng.normal(size=(frames, 32, 3)) * 0.2).astype(np.float32)
                pose[..., 2] += 1.0
                positions_3d[subject][variant] = pose
                extra = int(rng.integers(0, 3))
                cams = [rng.uniform(100, 900, size=(frames + extra, 17, 2)
                                    ).astype(np.float32) for _ in range(4)]
                positions_2d[subject][variant] = cams
                total += frames
                if subject in ("S9", "S11"):
                    test_total += frames
    t0 = time.perf_counter()
    np.savez(PATH_3D, positions_3d=positions_3d)
    np.savez(PATH_2D, positions_2d=positions_2d)
    print(f"wrote {PATH_3D} + {PATH_2D} in {time.perf_counter() - t0:.1f}s: "
          f"{total:,} mocap frames total, S9+S11 {test_total:,} "
          f"(x4 cams = {4 * test_total:,} eval samples)")

    # Random-init flagship weights in the released .h5 layout
    from uplift_upsample_tpu.configs import get_config
    from uplift_upsample_tpu.models import (build_uplift_upsample_transformer,
                                            init_model_params)
    from uplift_upsample_tpu.utils.weights_h5 import save_keras_h5
    config = get_config("h36m_351")
    model = build_uplift_upsample_transformer(config)
    variables = init_model_params(model, seed=0)
    save_keras_h5(PATH_H5, variables, model)
    print(f"wrote {PATH_H5}")


def run(extra_args=()):
    """Exec the full eval CLI sweep; record wall-clock + peak RSS."""
    assert os.path.exists(PATH_3D), "run --make-data first"
    cmd = [sys.executable, "-m", "uplift_upsample_tpu.eval",
           "--weights", PATH_H5, "--config", "h36m_351",
           "--dataset", PATH_3D, "--dataset_2d", PATH_2D,
           *extra_args]
    print("exec:", " ".join(cmd), flush=True)
    t0 = time.perf_counter()
    proc = subprocess.run(cmd, cwd=REPO)
    wall = time.perf_counter() - t0
    peak_child_gb = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss / 1e6
    print(json.dumps({
        "fullscale_eval_wall_s": round(wall, 1),
        "peak_child_rss_gb": round(peak_child_gb, 2),
        "rc": proc.returncode,
    }), flush=True)
    return proc.returncode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--make-data", action="store_true")
    ap.add_argument("--run", action="store_true")
    ap.add_argument("rest", nargs="*", help="extra args forwarded to eval CLI")
    args = ap.parse_args()
    if args.make_data:
        make_data()
    if args.run:
        sys.exit(run(args.rest))


if __name__ == "__main__":
    main()
