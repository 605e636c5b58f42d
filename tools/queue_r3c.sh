#!/bin/sh
# Serialized TPU measurement queue (ONE process at a time; see CLAUDE.md).
# Usage: nohup sh tools/queue_r3c.sh > /tmp/queue_r3c.log 2>&1 &
cd /root/repo
for P in mixed high default; do
  echo "=== TRAIN rung=$P $(date +%H:%M:%S)"
  timeout 3600 python bench.py --train --batch 512 --iters 16 --train-precision $P
  echo "=== DONE train-$P rc=$? $(date +%H:%M:%S)"
done
echo "=== BENCH flip-TTA rerun (assume_dense) $(date +%H:%M:%S)"
timeout 3600 python bench.py --flip-tta
echo "=== DONE flip rc=$? $(date +%H:%M:%S)"
echo "=== QUEUE COMPLETE"
