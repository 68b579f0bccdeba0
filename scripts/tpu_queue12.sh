#!/bin/bash
# Round-4 TPU queue, part 12: reconcile the bench-path scan rows with the
# per-recipe patience finding (0.1 s chunks want 200, 0.05 s want 75).
set -x
cd /root/repo
mkdir -p bench_logs_r4
L=bench_logs_r4
timeout 1200 env BENCH_CHUNK_S=0.1 BENCH_OMEGA=1000 BENCH_LR=1e-3 \
    BENCH_PATIENCE=200 python bench.py \
    >$L/92_scanrow_01_p200.log 2>&1; tail -3 $L/92_scanrow_01_p200.log
timeout 1200 env BENCH_CHUNK_S=0.05 BENCH_OMEGA=500 BENCH_LR=1e-3 \
    BENCH_PATIENCE=75 python bench.py \
    >$L/93_scanrow_005_p75.log 2>&1; tail -3 $L/93_scanrow_005_p75.log
echo "QUEUE12 DONE $(date)"
