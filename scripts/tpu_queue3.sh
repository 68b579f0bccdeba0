#!/bin/bash
# Round-4 TPU queue, part 3: the grad-precision A/B and the hi-fi
# side-quantize diagnostic (fp16_h128_01 re-measured 59.9 dB vs the r2
# row's 80.0 — fp16 side leaves were only calibrated free up to 44 dB
# fits; suspicion: they cap the hi-fi point).
set -x
cd /root/repo
mkdir -p bench_logs_r4
L=bench_logs_r4

# 1. grad-precision split A/B on the headline: bwd matmuls at bf16x2,
#    fwd stays bf16x3 (INRAUDIO_GRAD_PRECISION, ops/pallas_siren.py)
timeout 1200 env INRAUDIO_GRAD_PRECISION=bf16x2 python bench.py \
    >$L/30_gradx2.log 2>&1; tail -6 $L/30_gradx2.log

# 2. hi-fi point with float32 side leaves
timeout 1200 python - >$L/31_hifi_sides.log 2>&1 <<'PY'
import json, time
import numpy as np
from inraudio_tpu.codec import CodecConfig, compression_stats, decode, encode, save_inr
from inraudio_tpu.data import read_wav
from inraudio_tpu.dsp import calculate_snr
fs, sig = read_wav("/root/reference/gt_bach.wav", channel=0)
sig = sig.astype(np.float32)
for quant, side in (("float16", False), ("float16", True),
                    ("int16", True), (None, False)):
    cfg = CodecConfig(chunk_seconds=0.1, hidden_features=128,
                      first_omega_0=1000.0, learning_rate=1e-3,
                      total_steps=3000, fused=True, quantize=quant,
                      side_quantize=side)
    t0 = time.time()
    payload = encode(sig, fs, cfg)
    _, rec = decode(payload)
    snr = float(calculate_snr(sig, rec))
    path = save_inr(f"/tmp/hifi_{quant}_side{int(side)}.inr", payload)
    st = compression_stats(payload, path)
    print(json.dumps({"quantize": quant, "side_quantize": side,
                      "snr_db": round(snr, 2),
                      "disk_bps": round(st["file_bits_per_sample"], 2),
                      "wall_s": round(time.time() - t0, 1)}), flush=True)
PY
tail -4 $L/31_hifi_sides.log
echo "QUEUE3 DONE $(date)"
