#!/bin/bash
# Round-5 TPU queue, part C: perceptual A/B on a pinned step path (the
# first run confounded mask-vs-no-mask with fused-vs-two-kernel routing),
# headline bench confirmation on the r5 tree, and the quality-scheduled
# training precision A/B on both production shapes (VERDICT r4 item 3).
set -x
cd /root/repo
while [ -f /tmp/queueB.pid ] && kill -0 "$(cat /tmp/queueB.pid)" 2>/dev/null; do
  sleep 60
done
mkdir -p bench_logs_r5
L=bench_logs_r5

timeout 3000 python scripts/bench_perceptual.py 4000 \
    >$L/08_perceptual_pinned.log 2>&1; tail -3 $L/08_perceptual_pinned.log

timeout 1200 python bench.py >$L/10_headline.log 2>&1; tail -4 $L/10_headline.log

timeout 1200 env BENCH_SCHEDULE=1 python bench.py \
    >$L/11_headline_sched.log 2>&1; tail -4 $L/11_headline_sched.log

timeout 1200 env BENCH_MODE=full BENCH_OMEGA=3000 BENCH_LR=3e-4 \
    BENCH_CLIP=1.0 python bench.py \
    >$L/12_full256.log 2>&1; tail -4 $L/12_full256.log

timeout 1200 env BENCH_MODE=full BENCH_OMEGA=3000 BENCH_LR=3e-4 \
    BENCH_CLIP=1.0 BENCH_SCHEDULE=1 python bench.py \
    >$L/13_full256_sched.log 2>&1; tail -4 $L/13_full256_sched.log

# budget-vs-capacity check on the minute-scale mid point: does seg5
# close its 10 dB gap with a bigger step budget, or is it capacity-bound?
timeout 5400 env MINUTE_STEPS=8000 python scripts/bench_minute_rd.py \
    mod_seg5_h128 pc_mid >$L/14_minute_8k.log 2>&1; tail -3 $L/14_minute_8k.log

echo "QUEUE R5C DONE $(date)"
