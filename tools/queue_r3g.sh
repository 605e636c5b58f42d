#!/bin/sh
cd /root/repo
echo "=== TRAIN shipped defaults $(date +%H:%M:%S)"
timeout 3600 python bench.py --train
echo "=== DONE train rc=$? $(date +%H:%M:%S)"
echo "=== BENCH shipped defaults (headline) $(date +%H:%M:%S)"
timeout 3600 python bench.py
echo "=== DONE bench rc=$? $(date +%H:%M:%S)"
echo "=== BENCH B=4096 parity rung $(date +%H:%M:%S)"
timeout 3600 python bench.py --batch 4096 --iters 20
echo "=== DONE b4096 rc=$? $(date +%H:%M:%S)"
echo "=== FLIP B=4096 $(date +%H:%M:%S)"
timeout 3600 python bench.py --flip-tta --batch 4096 --iters 20
echo "=== DONE flip4096 rc=$? $(date +%H:%M:%S)"
echo "=== QUEUE COMPLETE"
