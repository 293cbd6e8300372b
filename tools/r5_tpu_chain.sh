#!/bin/bash
# Post-sweep TPU work chain (round 5): waits for the accuracy sweep to
# finish, then runs the remaining VERDICT items that need the real chip,
# in verdict priority order. Each step logs to /tmp and tolerates failure.
set -x
cd /root/repo
# wait for the sweep parent to exit (children die with it): PID-file wait
while ps -p "$(cat /tmp/sweep_r5b.pid 2>/dev/null)" >/dev/null 2>&1; do sleep 30; done
sleep 60  # let the TPU worker settle between clients
# 3. perf-lever sweep (VERDICT item 3)
timeout 2700 python tools/perf_levers.py > /tmp/perf_levers_r5.log 2>&1
# 4. seed-outlier diagnosis (VERDICT item 4)
timeout 1800 python tools/diag_seed.py --seeds 5 > /tmp/diag_seed_r5.log 2>&1
# 5. DPVO closed loop on trained weights (VERDICT item 5): longer training
timeout 1800 python tools/dpvo_full_run.py --train-iters 1200 --frames 60 \
  --out pretrained/dpvo_synth.npz > /tmp/dpvo_r5.log 2>&1
echo CHAIN_DONE
