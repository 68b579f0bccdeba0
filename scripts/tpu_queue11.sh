#!/bin/bash
# Round-4 TPU queue, part 11: can per-row int16 scales / QA refit lift
# the ~79 dB int16 weight cap toward the 100-114 dB fp32 fits?
set -x
cd /root/repo
mkdir -p bench_logs_r4
L=bench_logs_r4
timeout 3000 python scripts/probe_patience.py hifi_int16row:200 \
    hifi_int16row_refit:200 ultra_int16row:75 \
    >$L/84_int16row.log 2>&1; tail -5 $L/84_int16row.log
echo "QUEUE11 DONE $(date)"
