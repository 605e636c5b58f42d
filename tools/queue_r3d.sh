#!/bin/sh
# Serialized TPU measurement queue (ONE process at a time; see CLAUDE.md).
cd /root/repo
echo "=== TRAIN rung=high (vmem fix) $(date +%H:%M:%S)"
timeout 3600 python bench.py --train --batch 512 --iters 16 --train-precision high
echo "=== DONE train-high rc=$? $(date +%H:%M:%S)"
echo "=== TRAIN rung=default B=1024 $(date +%H:%M:%S)"
timeout 3600 python bench.py --train --batch 1024 --iters 12 --train-precision default
echo "=== DONE train-default-1024 rc=$? $(date +%H:%M:%S)"
echo "=== TRAIN rung=default B=2048 $(date +%H:%M:%S)"
timeout 3600 python bench.py --train --batch 2048 --iters 8 --train-precision default
echo "=== DONE train-default-2048 rc=$? $(date +%H:%M:%S)"
echo "=== QUEUE COMPLETE"
