#!/bin/sh
# Serialized TPU measurement queue: run the given commands ONE AT A TIME
# (overlapping TPU processes silently poison numbers — see CLAUDE.md).
#
# Usage:
#   nohup sh tools/tpu_queue.sh "python bench.py" \
#       "python bench.py --train" > /tmp/queue.log 2>&1 &
#
# Each argument is one shell command, run with a 1h timeout and sentinel
# markers so partial logs are attributable.
cd /root/repo
for CMD in "$@"; do
  echo "=== START [$CMD] $(date +%H:%M:%S)"
  timeout 3600 sh -c "$CMD"
  echo "=== DONE [$CMD] rc=$? $(date +%H:%M:%S)"
done
echo "=== QUEUE COMPLETE"
