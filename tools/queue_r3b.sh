#!/bin/sh
# Serialized TPU measurement queue (ONE process at a time; see CLAUDE.md).
# Usage: nohup sh tools/queue_r3b.sh > /tmp/queue_r3b.log 2>&1 &
cd /root/repo
echo "=== TRAIN (multi-block temporal kernels) $(date +%H:%M:%S)"
timeout 3600 python bench.py --train --batch 512 --iters 16
echo "=== DONE train rc=$? $(date +%H:%M:%S)"
for V in bench_fwd_tiled_twpt16 bench_fwd_banded bench_fwd_tiled_twpt8; do
  echo "=== START $V $(date +%H:%M:%S)"
  timeout 3600 python tools/profile_r2.py "$V" --batch 2048
  echo "=== DONE $V rc=$? $(date +%H:%M:%S)"
done
echo "=== FLIP-TTA high rung (eval-protocol row) $(date +%H:%M:%S)"
timeout 3600 python bench.py --flip-tta --precision high --batch 2048
echo "=== DONE flip rc=$? $(date +%H:%M:%S)"
echo "=== QUEUE COMPLETE"
