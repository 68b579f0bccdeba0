#!/bin/bash
# Round-4 TPU queue, part 10: pin the hi-fi/ultra RD calibrations at
# reproducible default-budget knobs (3000 steps), post decode-fix.
set -x
cd /root/repo
mkdir -p bench_logs_r4
L=bench_logs_r4
timeout 3000 python scripts/probe_patience.py hifi_fit:200 hifi_fp16:75 \
    hifi_int16:75 ultra_fit:75 ultra_int16:75 ultra_fit:200 \
    >$L/82_hifi_ultra_cal.log 2>&1; tail -8 $L/82_hifi_ultra_cal.log
timeout 1800 python scripts/restamp_decode.py \
    >$L/83_restamp_old_payloads.log 2>&1; tail -12 $L/83_restamp_old_payloads.log
echo "QUEUE10 DONE $(date)"
