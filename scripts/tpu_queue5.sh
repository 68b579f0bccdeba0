#!/bin/bash
# Round-4 TPU queue, part 5: the plateau-patience decision (root cause of
# the hi-fi 60 dB floor — the codec trained at the loop default patience
# 200 while every recipe-scan number used 35), then queue4's two deferred
# jobs (trained-checkpoint decode floors; full256 grad-precision A/B).
set -x
cd /root/repo
mkdir -p bench_logs_r4
L=bench_logs_r4

timeout 3000 python scripts/probe_patience.py \
    >$L/50_patience_ab.log 2>&1; tail -12 $L/50_patience_ab.log

timeout 1200 python scripts/probe_trained_floor.py ref_default_20k \
    >$L/40_trained_floor.log 2>&1; tail -8 $L/40_trained_floor.log

timeout 1200 env BENCH_MODE=full BENCH_OMEGA=3000 BENCH_LR=3e-4 \
    BENCH_CLIP=1.0 INRAUDIO_GRAD_PRECISION=bf16x2 python bench.py \
    >$L/41_full256_gradx2.log 2>&1; tail -8 $L/41_full256_gradx2.log

echo "QUEUE5 DONE $(date)"
