#!/bin/sh
# Serialized TPU measurement queue (ONE process at a time; see CLAUDE.md).
# Usage: nohup sh tools/queue_r3a.sh > /tmp/queue_r3a.log 2>&1 &
cd /root/repo
for V in bench_fwd bench_fwd_tiled bench_fwd_tiled_high3 bench_fwd_high3; do
  echo "=== START $V $(date +%H:%M:%S)"
  timeout 3000 python tools/profile_r2.py "$V" --batch 2048
  echo "=== DONE $V rc=$? $(date +%H:%M:%S)"
done
echo "=== QUEUE COMPLETE"
