#!/bin/bash
# Round-4 TPU queue, part 4: decide the two default flips that queue3's
# results put on the table.
#   1. trained-checkpoint decode floors at h=256 — can the bf16x2 matmul
#      mode (97 Ms/s random-param, 60.5 dB floor) replace bf16x3+mixed
#      (82 Ms/s) as _DECODE_TIERS tier 2?
#   2. grad-precision bf16x2 at the h=256 production shape — the headline
#      (h=128 multi-INR) showed 166->196 steps/s at equal 125.7 dB; verify
#      the win and SNR-neutrality before flipping the training default.
set -x
cd /root/repo
mkdir -p bench_logs_r4
L=bench_logs_r4

timeout 1200 python scripts/probe_trained_floor.py ref_default_20k \
    >$L/40_trained_floor.log 2>&1; tail -8 $L/40_trained_floor.log

timeout 1200 env BENCH_MODE=full BENCH_OMEGA=3000 BENCH_LR=3e-4 \
    BENCH_CLIP=1.0 INRAUDIO_GRAD_PRECISION=bf16x2 python bench.py \
    >$L/41_full256_gradx2.log 2>&1; tail -8 $L/41_full256_gradx2.log

echo "QUEUE4 DONE $(date)"
