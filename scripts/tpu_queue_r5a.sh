#!/bin/bash
# Round-5 TPU queue, part A: the three unmeasured-capability items from
# VERDICT r4 — perceptual-mask A/B (item 6), BWE quality (item 7),
# minute-scale modulated-vs-per-chunk RD (item 5).
set -x
cd /root/repo
mkdir -p bench_logs_r5
L=bench_logs_r5

timeout 2400 python scripts/bench_perceptual.py 4000 \
    >$L/01_perceptual_ab.log 2>&1; tail -3 $L/01_perceptual_ab.log

timeout 3600 python scripts/bench_bwe.py 6000 2 4 \
    >$L/02_bwe.log 2>&1; tail -5 $L/02_bwe.log

timeout 3600 python scripts/bench_minute_rd.py mod_h64 pc_low \
    >$L/03_minute_low.log 2>&1; tail -3 $L/03_minute_low.log

timeout 7200 python scripts/bench_minute_rd.py mod_seg5_h128 mod_seg5_h96 pc_mid \
    >$L/04_minute_mid.log 2>&1; tail -4 $L/04_minute_mid.log

echo "QUEUE R5A DONE $(date)"
