#!/bin/bash
# Round-4 TPU work queue — run once the axon tunnel recovers (tpu_watch.sh).
# Serializes the chip jobs (ONE real chip) with hard timeouts so a wedged
# tunnel can't queue hours of work (see memory: axon-tpu-gotchas).
# Full per-job logs land in bench_logs_r4/ (the tail'd summary goes to the
# caller's log).
set -x
cd /root/repo
mkdir -p bench_logs_r4
L=bench_logs_r4

# 1. headline bench (VERDICT r4 item 1: BENCH_r04 evidence + BASELINE restamp)
timeout 1200 python bench.py >$L/01_headline.log 2>&1; tail -8 $L/01_headline.log

# 2. bf16x2 training-matmul A/B on the headline (VERDICT r4 item 6):
#    2-pass vs the default bf16x3 — steps/s vs final strict-budget SNR
timeout 1200 env INRAUDIO_F32_PRECISION=bf16x2 python bench.py >$L/02_bf16x2.log 2>&1; tail -8 $L/02_bf16x2.log

# 3. h=256 whole-step fused kernel A/B (VERDICT r4 item 4): the reference's
#    own production shape (tuned full-batch recipe) fused-step vs two-kernel
timeout 1200 env BENCH_MODE=full BENCH_OMEGA=3000 BENCH_LR=3e-4 BENCH_CLIP=1.0 python bench.py >$L/03_full256_fusedstep.log 2>&1; tail -8 $L/03_full256_fusedstep.log
timeout 1200 env BENCH_MODE=full BENCH_OMEGA=3000 BENCH_LR=3e-4 BENCH_CLIP=1.0 INRAUDIO_FUSED_STEP=0 python bench.py >$L/04_full256_twokernel.log 2>&1; tail -8 $L/04_full256_twokernel.log

# 4. h=256 decode re-scan with packed_out (VERDICT r4 item 3)
timeout 1500 python scripts/bench_decode.py tune256 >$L/05_tune256.log 2>&1; tail -30 $L/05_tune256.log

# 5. modulated-codec calibration sweep (rate-distortion rows for BASELINE)
timeout 2400 python scripts/bench_modulated.py tiny mid wide mid01 wide01 wide025 >$L/06_modulated.log 2>&1; tail -20 $L/06_modulated.log
timeout 1800 python scripts/bench_modulated.py mid_film wide01_film >$L/07_modulated_film.log 2>&1; tail -10 $L/07_modulated_film.log
# int16 mod tier (probe_mod_quant.py: +20 dB over fp16 at equal bytes)
timeout 1800 python scripts/bench_modulated.py seg1_h96_i16 seg1_h128_i16 >$L/08_modulated_i16.log 2>&1; tail -10 $L/08_modulated_i16.log

# 6. RD-table recalibration after the INRA container + fp16 side leaves
#    (r3 storage layer): on-disk bps shrinks at equal SNR on every point
timeout 3600 python scripts/bench_codec_rd.py int8_h32_refit int8_h36_refit \
    int8_h40_refit int8_h48 fp16_h48 >$L/09_rd.log 2>&1; tail -10 $L/09_rd.log

# 7. int16 weight tier vs fp16 at the hi-fi points (probe_weight_quant.py)
timeout 2400 python scripts/bench_codec_rd.py int16_h48 int16_h128_025 \
    fp16_h128_025 >$L/10_rd_i16.log 2>&1; tail -6 $L/10_rd_i16.log

# 8. adaptive-STMDCT pre-echo A/B on a click train (VERDICT r2 item 5)
timeout 1200 python scripts/bench_adaptive_preecho.py 4000 >$L/11_preecho.log 2>&1; tail -8 $L/11_preecho.log

# 9. minute-scale end-to-end encode (VERDICT r4 item 8): 60 s of audio
#    through the bounded-memory chunk-batch path
python - <<'PY'
import numpy as np
from scipy.io import wavfile
sr, sig = wavfile.read("/root/reference/gt_bach.wav")
reps = int(np.ceil(60 * sr / len(sig)))
long = np.tile(sig.astype(np.float32), reps)[: 60 * sr]
wavfile.write("/tmp/long60.wav", sr, long)
print("wrote /tmp/long60.wav", long.shape, sr)
PY
timeout 3000 python -m inraudio_tpu encode --input /tmp/long60.wav \
    --output /tmp/long60.inra --fused --max-chunks 128 \
    >$L/12_minute_encode.log 2>&1; tail -8 $L/12_minute_encode.log
timeout 1200 python -m inraudio_tpu decode --input /tmp/long60.inra \
    --output /tmp/long60_rec.wav >$L/13_minute_decode.log 2>&1; tail -6 $L/13_minute_decode.log

# 10. refresh results_parity (VERDICT r3 weak 8: the 20k-step parity runs
#     predate the INRA container + fp16 side leaves, so their size-on-disk
#     is stale) — re-runs the reference-default and tuned 20k recipes
timeout 2400 python scripts/parity_longrun.py >$L/14_parity.log 2>&1; tail -8 $L/14_parity.log
echo "QUEUE DONE $(date)"
