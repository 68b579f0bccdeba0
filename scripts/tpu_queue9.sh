#!/bin/bash
# Round-4 TPU queue, part 9: re-stamp every codec quality number measured
# through the (now fixed) decode — the bf16-default-matmul decode floor
# corrupted all ~58-60 dB codec readings this round (see commit 1224932).
set -x
cd /root/repo
mkdir -p bench_logs_r4
L=bench_logs_r4

timeout 3600 python scripts/probe_patience.py \
    >$L/80_patience_ab_fixed.log 2>&1; tail -12 $L/80_patience_ab_fixed.log

timeout 3600 python scripts/probe_hifi.py \
    >$L/81_hifi_restamp_fixed.log 2>&1; tail -8 $L/81_hifi_restamp_fixed.log

echo "QUEUE9 DONE $(date)"
