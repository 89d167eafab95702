#!/bin/bash
# Sequential TPU measurement queue (one tunnel process at a time).
# Each item logs to /tmp/q_<name>.log. Bounded per item.
set -x
cd /root/repo
timeout 1200 python -u tools/trace_family.py flow --batch 32 --top 40 > /tmp/q_flow.log 2>&1
timeout 1200 python -u tools/trace_family.py nnet --batch 4 --top 40 > /tmp/q_nnet.log 2>&1
timeout 1800 python -u tools/trace_family.py raft3d_train --batch 2 --img_height 128 --img_width 416 --top 40 > /tmp/q_raft3d_train.log 2>&1
timeout 1500 python -u tools/trace_family.py geonet --batch 128 --top 60 > /tmp/q_geonet.log 2>&1
timeout 1500 python -u _scratch_uniad_refscale.py infer > /tmp/q_uniad_infer.log 2>&1
timeout 1500 python -u _scratch_uniad_refscale.py train --img 224 416 > /tmp/q_uniad_train.log 2>&1
echo QUEUE_DONE
