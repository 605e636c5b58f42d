"""Sustained-training soak harness: flagship geometry for hours, with RSS
tracking, periodic checkpoints, and an optional kill→resume continuity check.

Why this exists: the projected full h36m_351 run is ~12.5 h/chip at the
measured 8.3k windows/s (PERF_NOTES.md), but a long run through this
environment's relay-tunneled PJRT client showed host RSS growth (a 3-rung
convergence sweep OOM'd at 130 GB). The bare train-step loop and the full
train_and_validate loop are both RSS-flat on CPU (rss probes, round 4), so
the growth is suspected to live in the relay client. This harness produces
the on-TPU evidence: RSS trajectory + step-time trajectory over a multi-hour
run of the real training loop (train.py:train_and_validate, untouched), and
exercises Orbax save → kill → --resume → loss continuity at full flagship
shapes.

Usage (serialize through tools/tpu_queue.sh like every TPU job):

  nohup sh tools/tpu_queue.sh \
      "python tools/soak_train.py --epochs 60 --steps-per-epoch 2000" \
      > /tmp/soak.log 2>&1 &
  # later, after a kill or completion:
  nohup sh tools/tpu_queue.sh \
      "python tools/soak_train.py --epochs 70 --steps-per-epoch 2000 --resume" \
      > /tmp/soak_resume.log 2>&1 &

Writes out_dir/soak_rss.jsonl: one {"t", "rss_gb", "epoch_hint"} line every
--rss-interval seconds, from a daemon thread (no training-loop changes).
"""

import argparse
import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def rss_gb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1e6


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=60)
    parser.add_argument("--steps-per-epoch", type=int, default=2000)
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--validation-interval", type=int, default=5)
    parser.add_argument("--checkpoint-interval", type=int, default=5)
    parser.add_argument("--data-dir", default="/tmp/learnable_h36m")
    parser.add_argument("--out-dir", default="/tmp/soak_train")
    parser.add_argument("--rss-interval", type=float, default=30.0)
    parser.add_argument("--resume", action="store_true")
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

    config = get_config("h36m_351")
    config.update_from({
        "BATCH_SIZE": args.batch, "EPOCHS": args.epochs,
        "STEPS_PER_EPOCH": args.steps_per_epoch,
        "VALIDATION_INTERVAL": args.validation_interval,
        "CHECKPOINT_INTERVAL": args.checkpoint_interval,
        "VALIDATION_EXAMPLES": 2048,
        # one loss sync per ~250 steps: loss fetches sync the relay pipeline
        "TRAIN_LOG_EVERY": 250,
    })
    config.AUGM_FLIP_KEYPOINT_ORDER = H36MOrder17P.flip_lr_indices()

    os.makedirs(args.out_dir, exist_ok=True)
    rss_path = os.path.join(args.out_dir, "soak_rss.jsonl")
    t0 = time.time()

    def poll():
        with open(rss_path, "a") as f:
            while True:
                f.write(json.dumps({"t": round(time.time() - t0, 1),
                                    "rss_gb": round(rss_gb(), 3)}) + "\n")
                f.flush()
                time.sleep(args.rss_interval)

    threading.Thread(target=poll, daemon=True).start()

    hist, best_path, last_path = train_and_validate(
        config=config, out_dir=args.out_dir, dataset_name="h36m",
        h36m_path=path_3d, dataset_2d_path=path_2d,
        train_subset="train", val_subset="val", test_subset=None,
        continue_training=args.resume)
    print(f"soak done in {time.time() - t0:.0f}s: best={best_path} "
          f"last={last_path} final rss {rss_gb():.2f} GB", flush=True)


if __name__ == "__main__":
    main()
