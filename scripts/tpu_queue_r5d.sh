#!/bin/bash
# Round-5 TPU queue, part D: clean re-run of the trained-floor probe (the
# queue-B run found deg-9 flooring at 85.8 dB on the omega0=22000
# checkpoint — the r4 "high-phase 43 dB cliff" looks like an artifact of
# the pre-fix capped exact baseline — then crashed on a VMEM overflow in
# the L0exact+bf16x2 tier at block 4096, now per-tier-blocked).
set -x
cd /root/repo
while [ -f /tmp/queueC.pid ] && kill -0 "$(cat /tmp/queueC.pid)" 2>/dev/null; do
  sleep 60
done
mkdir -p bench_logs_r5
L=bench_logs_r5

timeout 2400 python scripts/probe_trained_floor.py ref_default_20k \
    >$L/15_l0exact_floor.log 2>&1; tail -14 $L/15_l0exact_floor.log

echo "QUEUE R5D DONE $(date)"
