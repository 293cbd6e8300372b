#!/bin/bash
# Post-sweep TPU work chain (round 5): DPVO closed loop -> seed diagnostics
# -> perf-lever points. Each step logs to /tmp and tolerates failures.
set -x
cd /root/repo
timeout 1500 python tools/dpvo_full_run.py --train-iters 400 --frames 60 \
  --out pretrained/dpvo_synth.npz > /tmp/dpvo_r5.log 2>&1
timeout 1500 python tools/diag_seed.py --seeds 5 > /tmp/diag_seed_r5.log 2>&1
timeout 2700 python tools/perf_levers.py > /tmp/perf_levers_r5.log 2>&1
echo CHAIN_DONE
