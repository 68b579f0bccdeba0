#!/bin/bash
# Round-5 TPU queue, part B: re-run the two queue-A jobs that died at the
# LSD metric (complex arithmetic had no axon lowering — fixed in
# eval/metrics.py), plus the layer0-exact decode-tier floor probe.
# Waits for queue A (PID in /tmp/queueA.pid) to release the chip first.
set -x
cd /root/repo
while [ -f /tmp/queueA.pid ] && kill -0 "$(cat /tmp/queueA.pid)" 2>/dev/null; do
  sleep 60
done
mkdir -p bench_logs_r5
L=bench_logs_r5

timeout 2400 python scripts/bench_perceptual.py 4000 \
    >$L/05_perceptual_ab.log 2>&1; tail -3 $L/05_perceptual_ab.log

timeout 3600 python scripts/bench_bwe.py 6000 2 4 \
    >$L/06_bwe.log 2>&1; tail -5 $L/06_bwe.log

timeout 1800 python scripts/probe_trained_floor.py ref_default_20k \
    >$L/07_l0exact_floor.log 2>&1; tail -12 $L/07_l0exact_floor.log

echo "QUEUE R5B DONE $(date)"
