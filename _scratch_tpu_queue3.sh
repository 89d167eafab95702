#!/bin/bash
set -x
cd /root/repo
timeout 1200 python -u tools/dump_hlo.py raft3d_train > /tmp/q3_hlo_raft3d.log 2>&1
SNDEPTH_WARP_X1ROLL=1 timeout 580 python -u bench.py > /tmp/q3_x1roll.log 2>&1
timeout 580 python -u bench.py > /tmp/q3_base.log 2>&1
timeout 1200 python -u tools/trace_family.py geonet --batch 128 --top 50 > /tmp/q3_geonet_trace.log 2>&1
timeout 1200 python -u tools/dump_hlo.py geonet > /tmp/q3_hlo_geonet.log 2>&1
timeout 1200 python -u tools/trace_family.py flow --batch 32 --top 40 > /tmp/q3_flow_trace.log 2>&1
timeout 1200 python -u tools/dump_hlo.py flow > /tmp/q3_hlo_flow.log 2>&1
timeout 1500 python -u tools/trace_family.py nnet --batch 4 --top 40 > /tmp/q3_nnet_trace.log 2>&1
timeout 1500 python -u tools/dump_hlo.py nnet > /tmp/q3_hlo_nnet.log 2>&1
timeout 3600 python -u _scratch_uniad_refscale.py train --img 224 416 > /tmp/q3_uniad_train.log 2>&1
echo QUEUE3_DONE
