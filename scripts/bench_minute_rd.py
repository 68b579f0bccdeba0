"""Minute-scale rate-distortion: modulated (shared-backbone) vs per-chunk.

VERDICT r4 item 5 / r5 ask: the modulated codec's raison d'être is
amortising backbone storage over clip length (the reference fits one
model per clip, run.py:30; per-chunk ships one parameter set per 50 ms).
On the 7 s calibration clip segmented-modulated only TIED the per-chunk
frontier (codec.py _MOD_RD_POINTS notes); this script measures both at
60 s, where amortisation should finally separate them.

Arms (matched on-disk bps pairs at 60 s, priced by estimate_modulated_bps):

  low rate  : mod whole-clip h64 int8 + QA refit (~1.4 bps @ 60 s — the
              backbone amortises BELOW the per-chunk frontier's 1.88 bps
              floor) vs per-chunk h32 int8 refit (1.88 bps, 19.2 dB @ 7 s)
  mid rate  : mod seg5 h128 int16 (~10 bps) and seg5 h96 int16 (~6.6) vs
              per-chunk 0.5 s h48 fp16 (6.91 bps, 32.1 dB @ 7 s) — 5 s
              backbones amortise 5x better than r4's 1 s segments while
              capacity-per-content-second stays near the measured ceiling

The 60 s clip tiles gt_bach (same content family as every calibration).

Usage: python scripts/bench_minute_rd.py [arm ...]
       arms: mod_h64 pc_low mod_seg5_h128 mod_seg5_h96 pc_mid  (default all)
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

from inraudio_tpu.codec import (CodecConfig, ModulatedCodecConfig,  # noqa: E402
                                compression_stats, decode, encode,
                                encode_modulated, save_inr)
from inraudio_tpu.data.audio_io import read_wav  # noqa: E402
from inraudio_tpu.dsp import calculate_snr  # noqa: E402

DUR_S = float(os.environ.get("MINUTE_DUR_S", "60"))
STEPS = int(os.environ.get("MINUTE_STEPS", "3000"))
_CAL = dict(chunk_seconds=0.05, first_omega_0=500.0, learning_rate=1e-3,
            mods_lr_mult=5.0, total_steps=STEPS)

MOD_ARMS = {
    "mod_h64": dict(_CAL, hidden_features=64, quantize_mods="int8",
                    refit_backbone_steps=400),
    "mod_seg5_h128": dict(_CAL, hidden_features=128, segment_s=5.0,
                          quantize_mods="int16"),
    "mod_seg5_h96": dict(_CAL, hidden_features=96, segment_s=5.0,
                         quantize_mods="int16"),
}
PC_ARMS = {
    # per-chunk operating points nearest the modulated arms' disk rates
    # (codec._RD_POINTS knobs verbatim: _RD_CAL pins omega 1800 / lr 7e-4)
    "pc_low": dict(chunk_seconds=0.5, hidden_features=32, quantize="int8",
                   refit_steps=400, first_omega_0=1800.0,
                   learning_rate=7e-4, total_steps=STEPS),
    "pc_mid": dict(chunk_seconds=0.5, hidden_features=48, quantize="float16",
                   first_omega_0=1800.0, learning_rate=7e-4,
                   total_steps=STEPS),
}


def long_signal() -> tuple[int, np.ndarray]:
    fs, sig = read_wav("/root/reference/gt_bach.wav", channel=0)
    reps = int(np.ceil(DUR_S * fs / len(sig)))
    return fs, np.tile(sig.astype(np.float32), reps)[: int(DUR_S * fs)]


def main(names: list[str]) -> None:
    fs, sig = long_signal()
    fused = jax.default_backend() not in ("cpu",)
    for name in names:
        t0 = time.time()
        if name in MOD_ARMS:
            cfg = ModulatedCodecConfig(**MOD_ARMS[name])
            payload = encode_modulated(sig, fs, cfg)
        else:
            cfg = CodecConfig(fused=fused, max_chunks_per_batch=256,
                              **PC_ARMS[name])
            payload = encode(sig, fs, cfg)
        wall = time.time() - t0
        _, rec = decode(payload, max_chunks_per_batch=512)
        snr = float(calculate_snr(sig, rec))
        path = save_inr(f"/tmp/minute_{name}.inr", payload)
        st = compression_stats(payload, path)
        print(json.dumps({
            "arm": name, "dur_s": DUR_S, "steps": STEPS,
            "snr_db": round(snr, 2),
            "bps": round(st["bits_per_sample"], 2),
            "disk_bps": round(st["file_bits_per_sample"], 2),
            "encode_s": round(wall, 1)}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or list(MOD_ARMS) + list(PC_ARMS))
