#!/bin/bash
# TPU A/B + measurement queue 2. One tunnel process at a time.
set -x
cd /root/repo
# Wait for the current tunnel user (uniad refscale, pid passed as $1) to exit.
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
SNDEPTH_PHOTO_POOL=row timeout 580 python -u bench.py > /tmp/q2_pool_row.log 2>&1
SNDEPTH_PHOTO_POOL=mxu timeout 580 python -u bench.py > /tmp/q2_pool_mxu.log 2>&1
SNDEPTH_PHOTO_POOL=row SNDEPTH_PHOTO_PORTRAIT=0 timeout 580 python -u bench.py > /tmp/q2_pool_row_land.log 2>&1
timeout 1500 python -u _scratch_knob_ab.py default up456 up23456 mat_heads > /tmp/q2_knob_ab.log 2>&1
timeout 900 python -u tools/dump_hlo.py flow > /tmp/q2_hlo_flow.log 2>&1
timeout 900 python -u tools/dump_hlo.py nnet > /tmp/q2_hlo_nnet.log 2>&1
timeout 1200 python -u tools/trace_family.py nnet --batch 4 --top 40 > /tmp/q2_nnet_approx.log 2>&1
timeout 1800 python -u tools/trace_family.py raft3d_train --batch 2 --img_height 128 --img_width 416 --top 40 > /tmp/q2_raft3d_train.log 2>&1
echo QUEUE2_DONE
