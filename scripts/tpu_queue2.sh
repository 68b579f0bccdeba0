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

# post-INRA re-measures of the two remaining stale _RD_POINTS rows
timeout 1800 python scripts/bench_codec_rd.py int8_h128_025 fp16_h128_01 \
    >$L/22_rd_hirate.log 2>&1; tail -4 $L/22_rd_hirate.log

# pre-echo A/B second point: 12000 steps — at 4000 the INR fit error
# (~19 dB) dominates both arms' pre-attack windows; test whether the
# adaptive win appears once the fit clears the bed level
timeout 2400 python scripts/bench_adaptive_preecho.py 12000 \
    >$L/24_preecho_12k.log 2>&1; tail -4 $L/24_preecho_12k.log

# extended tune256: bf16x2 decode-tier candidates (f32_mode grid)
timeout 2400 python scripts/bench_decode.py tune256 >$L/23_tune256_x2.log 2>&1
grep bf16x2 $L/23_tune256_x2.log | tail -30

echo "QUEUE2 DONE $(date)"
