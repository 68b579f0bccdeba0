#!/bin/bash
# Round-3 TPU work queue — run once the axon tunnel recovers.
# Serializes the chip jobs (ONE real chip) with hard timeouts so a wedged
# tunnel can't queue hours of work (see memory: axon-tpu-gotchas).
set -x
cd /root/repo
# 1. headline bench after the device-closure fix + fused-step refactor
timeout 1200 python bench.py 2>bench_r3_check.log; tail -5 bench_r3_check.log
# 2. modulated-codec calibration sweep (rate-distortion rows for BASELINE)
timeout 2400 python scripts/bench_modulated.py tiny mid wide mid01 wide01 wide025 2>&1 | tail -20
timeout 1800 python scripts/bench_modulated.py mid_film wide01_film 2>&1 | tail -10
# int16 mod tier (probe_mod_quant.py: +20 dB over fp16 at equal bytes)
timeout 1800 python scripts/bench_modulated.py seg1_h96_i16 seg1_h128_i16 2>&1 | tail -10
# 3. decode spot check at the production shape (quality-gated tiers)
timeout 900 python scripts/bench_decode.py tune256 2>&1 | tail -10
# 4. RD-table recalibration after the INRA container + fp16 side leaves
#    (r3 storage layer): on-disk bps shrinks at equal SNR on every point
timeout 3600 python scripts/bench_codec_rd.py int8_h32_refit int8_h36_refit \
    int8_h40_refit int8_h48 fp16_h48 2>&1 | tail -10
# 5. int16 weight tier vs fp16 at the hi-fi points (probe_weight_quant.py)
timeout 2400 python scripts/bench_codec_rd.py int16_h48 int16_h128_025 \
    fp16_h128_025 2>&1 | tail -6
# 6. adaptive-STMDCT pre-echo A/B on a click train (VERDICT r2 item 5)
timeout 1200 python scripts/bench_adaptive_preecho.py 4000 2>&1 | tail -6
