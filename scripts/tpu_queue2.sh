#!/bin/bash
# Round-4 TPU queue, part 2 — runs after tpu_queue.sh drains.
# Exact-knob calibration points for codec._MOD_RD_POINTS (the planner
# table: snr_db stamping needs runs at the table's own knobs) plus the
# fp16-vs-int16 segmented A/B the first queue doesn't cover.
set -x
cd /root/repo
mkdir -p bench_logs_r4
L=bench_logs_r4

# low-rate whole-clip-backbone table entries (int8 mods + QA refit)
timeout 2400 python scripts/bench_modulated.py mod_h48_i8 mod_h64_i8 \
    >$L/20_mod_table_lowrate.log 2>&1; tail -6 $L/20_mod_table_lowrate.log

# segmented fp16 hi-fi vs the int16 tier (job 8 ran the i16 halves)
timeout 1800 python scripts/bench_modulated.py seg1_h128 mid_hotmods \
    >$L/21_mod_fp16_seg.log 2>&1; tail -6 $L/21_mod_fp16_seg.log

echo "QUEUE2 DONE $(date)"
