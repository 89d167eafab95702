#!/bin/bash
set -x
cd /root/repo
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
timeout 1500 python -u _scratch_knob_ab.py default wg56 wg456 > /tmp/q7_wgrad_ab.log 2>&1
timeout 3000 python -u _scratch_uniad_refscale.py infer --bf16 > /tmp/q7_uniad_infer.log 2>&1
timeout 3000 python -u _scratch_uniad_refscale.py infer --bf16 --img 640 1152 > /tmp/q7_uniad_infer_small.log 2>&1
echo QUEUE7_DONE
