#!/bin/bash
# Round-4 TPU queue, part 7: attribute the scan-row shortfall at high
# omega0.  Queue6 measured 78.3 dB at 0.1s/omega1000 (scan row: 98.8-
# 103.1) and 102.4 at 0.05s/omega500 (row: 110.2) through the whole-step
# fused kernel (bf16x3 fwd, approx sin).  Hypothesis: forward PHASE error
# scales with omega0 — same physics as the decode-floor probe, where
# omega 22000 caps every approx tier at ~43 dB.  Factorial at 0.1/1000:
#   A. exact-sin + exact matmuls, XLA path        (no kernel error at all)
#   B. fused two-kernel, forward 'highest'        (kernel, exact matmuls)
#   C. fused whole-step, approx-sin deg default,  (kernel, bf16x3, the
#      queue6 run = control, already logged)       queue6 60_*.log)
set -x
cd /root/repo
mkdir -p bench_logs_r4
L=bench_logs_r4

timeout 1800 env BENCH_CHUNK_S=0.1 BENCH_OMEGA=1000 BENCH_LR=1e-3 \
    BENCH_PATIENCE=50 BENCH_FUSED=0 python bench.py \
    >$L/62_scanrow_xla.log 2>&1; tail -4 $L/62_scanrow_xla.log

timeout 1800 env BENCH_CHUNK_S=0.1 BENCH_OMEGA=1000 BENCH_LR=1e-3 \
    BENCH_PATIENCE=50 INRAUDIO_FUSED_STEP=0 \
    INRAUDIO_F32_PRECISION=highest INRAUDIO_GRAD_PRECISION=inherit \
    python bench.py \
    >$L/63_scanrow_highest.log 2>&1; tail -4 $L/63_scanrow_highest.log

echo "QUEUE7 DONE $(date)"
