"""Plateau-patience A/B across codec operating points.

Round-4 finding under test: every recipe-scan quality number in
BASELINE.md was measured through bench.py with FAST plateau decay
(patience 35), but the codec built its TrainConfig without plateau knobs,
inheriting the loop default (200).  At the hi-fi point (0.1 s / omega
1000 / lr 1e-3 / 3000 steps) the codec fit capped at 60.0 dB on all
three training paths AND on the r2-era code — 40 dB under the scan row —
so the suspect is the annealing schedule, not any kernel.

Runs each (point, patience) combo through the real ``encode``/``decode``
product path (fused) and prints one JSON row per run.  Quantize=None
rows measure pure fit SNR; quantized rows re-measure the shipped
operating point so the _RD_POINTS labels can be restamped if the
default flips.

Usage: python scripts/probe_patience.py [combo ...]
  combo = point:patience, e.g. hifi:35  (default: the decision matrix)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np  # noqa: E402

from inraudio_tpu.codec import CodecConfig, decode, encode, save_inr  # noqa: E402
from inraudio_tpu.data import read_wav  # noqa: E402
from inraudio_tpu.dsp import calculate_snr  # noqa: E402

WAV = "/root/reference/gt_bach.wav"

POINTS = {
    # pure-fit hi-fi question (quantize off isolates the fit ceiling)
    "hifi_fit": dict(chunk_seconds=0.1, hidden_features=128,
                     first_omega_0=1000.0, learning_rate=1e-3,
                     total_steps=3000, quantize=None),
    # the shipped hi-fi operating point (fp16 weights)
    "hifi_fp16": dict(chunk_seconds=0.1, hidden_features=128,
                      first_omega_0=1000.0, learning_rate=1e-3,
                      total_steps=3000, quantize="float16"),
    # int16 weights: fp16 caps near ~76 dB; if the fit clears that,
    # int16 is the hi-fi weight tier (BASELINE.md tier rule)
    "hifi_int16": dict(chunk_seconds=0.1, hidden_features=128,
                       first_omega_0=1000.0, learning_rate=1e-3,
                       total_steps=3000, quantize="int16"),
    # mid + compressive + deep: guard against fast decay HURTING the
    # underfit regime (lr collapse before the descent finishes)
    "mid_fp16": dict(chunk_seconds=0.25, hidden_features=128,
                     first_omega_0=1800.0, learning_rate=7e-4,
                     total_steps=3000, quantize="float16"),
    "comp_int8": dict(chunk_seconds=0.5, hidden_features=48,
                      first_omega_0=1800.0, learning_rate=7e-4,
                      total_steps=3000, quantize="int8"),
    "deep_h40": dict(chunk_seconds=0.5, hidden_features=40,
                     first_omega_0=1800.0, learning_rate=7e-4,
                     total_steps=3000, quantize="int8", refit_steps=400),
    # ultra points (0.05 s chunks, omega 500 — ~99 dB fit headroom at a
    # 6k budget, 81_hifi_restamp_fixed.log) at the default 3k budget
    "ultra_fit": dict(chunk_seconds=0.05, hidden_features=128,
                      first_omega_0=500.0, learning_rate=1e-3,
                      total_steps=3000, quantize=None),
    "ultra_int16": dict(chunk_seconds=0.05, hidden_features=128,
                        first_omega_0=500.0, learning_rate=1e-3,
                        total_steps=3000, quantize="int16"),
    # can per-(chunk,row) int16 scales and/or QA refit lift the ~79 dB
    # int16 weight cap toward the 100-114 dB fp32 fits?
    "hifi_int16row": dict(chunk_seconds=0.1, hidden_features=128,
                          first_omega_0=1000.0, learning_rate=1e-3,
                          total_steps=3000, quantize="int16",
                          per_row_scales=True),
    "hifi_int16row_refit": dict(chunk_seconds=0.1, hidden_features=128,
                                first_omega_0=1000.0, learning_rate=1e-3,
                                total_steps=3000, quantize="int16",
                                per_row_scales=True, refit_steps=400),
    "ultra_int16row": dict(chunk_seconds=0.05, hidden_features=128,
                           first_omega_0=500.0, learning_rate=1e-3,
                           total_steps=3000, quantize="int16",
                           per_row_scales=True),
}

DEFAULT = ["hifi_fit:35", "hifi_fit:75", "hifi_fp16:35", "hifi_int16:35",
           "mid_fp16:35", "mid_fp16:200", "comp_int8:35", "comp_int8:200",
           "deep_h40:35", "deep_h40:200"]


def main() -> None:
    combos = sys.argv[1:] or DEFAULT
    fs, sig = read_wav(WAV, channel=0)
    sig = sig.astype(np.float32)
    for combo in combos:
        point, pat = combo.split(":")
        cfg = CodecConfig(fused=True, plateau_patience=int(pat),
                          **POINTS[point])
        t0 = time.time()
        payload = encode(sig, fs, cfg)
        _, rec = decode(payload)
        snr = float(calculate_snr(sig, rec))
        path = save_inr(f"/tmp/pat_{point}_{pat}.inr", payload)
        bps = os.path.getsize(path) * 8 / sig.shape[0]
        print(json.dumps({"point": point, "patience": int(pat),
                          "snr_db": round(snr, 2),
                          "disk_bps": round(bps, 2),
                          "wall_s": round(time.time() - t0, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
