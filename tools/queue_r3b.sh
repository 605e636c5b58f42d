#!/bin/sh
# Serialized TPU measurement queue (ONE process at a time; see CLAUDE.md).
# Usage: nohup sh tools/queue_r3b.sh > /tmp/queue_r3b.log 2>&1 &
cd /root/repo
echo "=== BENCH parity rung + presplit (the bench.py default) $(date +%H:%M:%S)"
timeout 3600 python bench.py
echo "=== DONE bench-high rc=$? $(date +%H:%M:%S)"
echo "=== BENCH flip-TTA (published protocol row) $(date +%H:%M:%S)"
timeout 3600 python bench.py --flip-tta
echo "=== DONE flip rc=$? $(date +%H:%M:%S)"
echo "=== TRAIN (multi-block temporal kernels) $(date +%H:%M:%S)"
timeout 3600 python bench.py --train --batch 512 --iters 16
echo "=== DONE train rc=$? $(date +%H:%M:%S)"
echo "=== KERNEL DRIFT PROBE $(date +%H:%M:%S)"
timeout 3600 python tools/check_tpu_parity.py --assert-bounds
echo "=== DONE probe rc=$? $(date +%H:%M:%S)"
echo "=== BENCH default(throughput) rung $(date +%H:%M:%S)"
timeout 3600 python bench.py --precision default
echo "=== DONE bench-default rc=$? $(date +%H:%M:%S)"
echo "=== START bench_fwd_tiled_twpt16 $(date +%H:%M:%S)"
timeout 3600 python tools/profile_r2.py bench_fwd_tiled_twpt16 --batch 2048
echo "=== DONE bench_fwd_tiled_twpt16 rc=$? $(date +%H:%M:%S)"
echo "=== QUEUE COMPLETE"
