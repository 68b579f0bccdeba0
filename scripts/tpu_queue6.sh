#!/bin/bash
# Round-4 TPU queue, part 6: reproduce the BASELINE.md recipe-scan rows
# through the bench path itself.  The codec path (and the r2-era code!)
# caps at ~60 dB at 0.1 s / omega 1000 / lr 1e-3 where the scan recorded
# 98.8-103.1, and the patience A/B refuted the annealing hypothesis — so
# test whether bench.py still reproduces its own scan rows today.
# Precisions pinned to the values the scans ran under (bf16x3 everywhere).
set -x
cd /root/repo
mkdir -p bench_logs_r4
L=bench_logs_r4

timeout 1200 env BENCH_CHUNK_S=0.1 BENCH_OMEGA=1000 BENCH_LR=1e-3 \
    BENCH_PATIENCE=50 INRAUDIO_GRAD_PRECISION=bf16x3 python bench.py \
    >$L/60_scanrow_01_1000.log 2>&1; tail -4 $L/60_scanrow_01_1000.log

timeout 1200 env BENCH_CHUNK_S=0.05 BENCH_OMEGA=500 BENCH_LR=1e-3 \
    BENCH_PATIENCE=50 INRAUDIO_GRAD_PRECISION=bf16x3 python bench.py \
    >$L/61_scanrow_005_500.log 2>&1; tail -4 $L/61_scanrow_005_500.log

echo "QUEUE6 DONE $(date)"
