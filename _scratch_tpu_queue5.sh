#!/bin/bash
set -x
cd /root/repo
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
timeout 1500 python -u tools/trace_family.py nnet --batch 4 --top 30 > /tmp/q5_nnet.log 2>&1
SNDEPTH_PHOTO_BACKEND=xla timeout 580 python -u bench.py > /tmp/q5_bench_xla.log 2>&1
SNDEPTH_BENCH_BATCH=192 timeout 580 python -u bench.py > /tmp/q5_bench_192.log 2>&1
SNDEPTH_BENCH_BATCH=256 timeout 580 python -u bench.py > /tmp/q5_bench_256.log 2>&1
timeout 3600 python -u _scratch_uniad_refscale.py infer > /tmp/q5_uniad_infer.log 2>&1
echo QUEUE5_DONE
