#!/bin/bash
set -x
cd /root/repo
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
timeout 3600 python -u _scratch_uniad_refscale.py train --img 224 416 > /tmp/q6_uniad_train.log 2>&1
timeout 580 python -u bench.py > /tmp/q6_bench.log 2>&1
echo QUEUE6_DONE
