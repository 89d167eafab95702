#!/bin/bash
set -x
cd /root/repo
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
timeout 1800 python -u tools/trace_family.py raft3d_train --batch 2 --img_height 128 --img_width 416 --top 30 > /tmp/q4_raft3d_train.log 2>&1
timeout 580 python -u bench.py > /tmp/q4_bench.log 2>&1
timeout 1200 python -u tools/trace_family.py flow --batch 32 --top 30 > /tmp/q4_flow.log 2>&1
echo QUEUE4_DONE
