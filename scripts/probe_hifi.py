"""Re-derive the hi-fi codec operating point from honest r4 runs.

The legacy _RD_POINTS hi-fi row (0.1 s / omega 1000 / lr 1e-3 / 3000
steps -> "80.0 dB") does not reproduce on ANY training path, including
the r2-era code itself (all ~60 dB; bench_logs_r4/3x_hifi_diag*.log), and
the patience A/B refuted annealing as the cause.  What the r4 factorial
did establish (queue6/7): quality at this config is step-budget bound
first (XLA 60.9 dB @ 1400 steps, whole-step 78.3 @ 5400) and forward-
precision bound second (two-kernel 'highest' 83.0 @ 2800 steps beats
whole-step bf16x3 78.3 @ 5400 — sin phase error scales with omega0).

So the honest hi-fi point needs (a) more steps than the legacy 3000 and
(b) possibly exact forward matmuls.  This probe measures the candidates
end-to-end through encode/decode and prints JSON rows to restamp the
BASELINE.md table and codec._RD_POINTS.

Usage: python scripts/probe_hifi.py [combo ...]
  combo = name[:precision], e.g. fit8k:highest
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

HIFI = dict(chunk_seconds=0.1, hidden_features=128, first_omega_0=1000.0,
            learning_rate=1e-3, plateau_patience=50, fused=True)
ULTRA = dict(chunk_seconds=0.05, hidden_features=128, first_omega_0=500.0,
             learning_rate=1e-3, plateau_patience=50, fused=True)

POINTS = {
    # fit ceilings (no quantization)
    "fit8k": dict(HIFI, total_steps=8000, quantize=None),
    # shipped candidates
    "fp16_8k": dict(HIFI, total_steps=8000, quantize="float16"),
    "int16_8k": dict(HIFI, total_steps=8000, quantize="int16"),
    # ultra point: 0.05 s chunks reach ~102 dB fit on the bench path
    "ultra_fit6k": dict(ULTRA, total_steps=6000, quantize=None),
    "ultra_int16_6k": dict(ULTRA, total_steps=6000, quantize="int16"),
}


def main() -> None:
    combos = sys.argv[1:] or ["fit8k", "fit8k:highest", "fp16_8k",
                              "int16_8k", "ultra_fit6k", "ultra_int16_6k"]
    fs, sig = read_wav(WAV, channel=0)
    sig = sig.astype(np.float32)
    for combo in combos:
        name, _, prec = combo.partition(":")
        if prec:
            os.environ["INRAUDIO_F32_PRECISION"] = prec
            os.environ["INRAUDIO_GRAD_PRECISION"] = "inherit"
        else:
            os.environ.pop("INRAUDIO_F32_PRECISION", None)
            os.environ.pop("INRAUDIO_GRAD_PRECISION", None)
        jax.clear_caches()  # precision env is read at trace time
        cfg = CodecConfig(**POINTS[name])
        t0 = time.time()
        payload = encode(sig, fs, cfg)
        _, rec = decode(payload)
        snr = float(calculate_snr(sig, rec))
        path = save_inr(f"/tmp/hifi_{name}_{prec or 'def'}.inr", payload)
        bps = os.path.getsize(path) * 8 / sig.shape[0]
        print(json.dumps({"point": name, "precision": prec or "bf16x3",
                          "snr_db": round(snr, 2),
                          "disk_bps": round(bps, 2),
                          "wall_s": round(time.time() - t0, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
