#!/bin/bash
# Post-sweep TPU work chain (round 5): waits for the accuracy sweep to
# finish, then runs the remaining VERDICT items that need the real chip,
# in priority order. Each step logs to /tmp and tolerates failure.
set -x
cd /root/repo
# wait for the sweep parent to exit (children die with it): PID-file wait
while ps -p "$(cat /tmp/sweep_r5d.pid 2>/dev/null)" >/dev/null 2>&1; do sleep 30; done
sleep 60  # let the TPU worker settle between clients
# 4. seed-outlier diagnosis (VERDICT item 4): baseline then decay sweep
timeout 1200 python tools/diag_seed.py --seeds 5 \
  --out /tmp/diag_seed_base.json > /tmp/diag_seed_r5.log 2>&1
timeout 1200 python tools/diag_seed.py --seeds 5 --decay 0.05 \
  --out /tmp/diag_seed_decay.json >> /tmp/diag_seed_r5.log 2>&1
# 5. DPVO closed loop on the CPU-fine-tuned weights (VERDICT item 5)
timeout 1200 python tools/dpvo_full_run.py --skip-train --frames 60 \
  --out pretrained/dpvo_synth.npz > /tmp/dpvo_r5.log 2>&1
# 3. perf-lever sweep (VERDICT item 3) — whatever fits before round end
timeout 2700 python tools/perf_levers.py > /tmp/perf_levers_r5.log 2>&1
echo CHAIN_DONE
