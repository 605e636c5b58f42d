#!/bin/sh
# Serialized TPU measurement queue (ONE process at a time; see CLAUDE.md).
cd /root/repo
echo "=== TRAIN default wpt8 B=512 $(date +%H:%M:%S)"
timeout 3600 python bench.py --train --batch 512 --iters 16 --train-precision default --train-wpt 8
echo "=== DONE t1 rc=$? $(date +%H:%M:%S)"
echo "=== TRAIN default wpt8 B=1024 $(date +%H:%M:%S)"
timeout 3600 python bench.py --train --batch 1024 --iters 12 --train-precision default --train-wpt 8
echo "=== DONE t2 rc=$? $(date +%H:%M:%S)"
echo "=== TRAIN mixed B=1024 $(date +%H:%M:%S)"
timeout 3600 python bench.py --train --batch 1024 --iters 12 --train-precision mixed
echo "=== DONE t3 rc=$? $(date +%H:%M:%S)"
echo "=== QUEUE COMPLETE"
