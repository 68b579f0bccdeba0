"""Calibrate the shared-backbone modulated codec on gt_bach.wav (TPU).

Sweeps (chunk_s, hidden, omega0, lr, steps) points of
``codec.encode_modulated`` and prints one line per point: SNR,
bits/sample (in-memory and on-disk), encode wall.  Rows feed the
BASELINE.md rate-distortion table next to the per-chunk codec points —
the question this script answers is where the backbone-amortised frontier
sits vs int8 width steps (22.0 dB @ 2.57 bps etc.).

    python scripts/bench_modulated.py [point ...]   # default: all

Points are named below; add ad-hoc ones via env, e.g.
``MOD_STEPS=4000 python scripts/bench_modulated.py mid``.

CPU probe (r3, 2 s gt_bach decimated to 11.025 kHz, 0.05 s chunks,
omega 125): modulated h=96 @ 1500 steps -> 35.0 dB @ 35.5 bps, and at
4000 steps -> **44.7 dB @ 35.5 bps** — MATCHING the per-chunk h=48 int8
point (44.0 dB @ 176.8 bps, 1500 steps) at 5x fewer bits.  The mode is
step-limited, not capacity-limited (seconds of extra work at TPU step
rates), and the backbone is NOT yet amortised on a 2 s clip (on the full
7 s 44.1 kHz clip the fp16 h=96 backbone costs ~1.6 bps).  Negative
results from the same probe: modulated h=48 collapses to 14.7 dB
(backbone capacity binds before modulation capacity), and film_scale at
h=48/1500 steps HURTS (10.2 vs 14.7 dB) — per-unit frequency gains
destabilise a small backbone at the shared lr; retry on TPU only with
mods_lr_mult < 1 for the scale half or a larger backbone.

Convergence lever (same probe): ``mods_lr_mult=5`` -> 41.4 dB at 1500
steps vs 35.0 at mult=1 — the hotter modulation rate recovers most of
the 4000-step result (44.7) at 1500 steps; sweep it on TPU.

Saturation: 10000 steps -> 44.9 dB (vs 44.7 at 4000) — the 2 s clip
caps near 45 dB at h=96, i.e. BACKBONE CAPACITY PER CONTENT-SECOND sets
the ceiling (the same backbone reaches ~96 dB jointly fit on a 1 s
clip).  Size the backbone to the clip, not to a constant.

Segmentation (same probe): ``segment_s=1`` (2x h=96 backbones,
mods_lr_mult=5, int8 mods, 3000 steps) -> 48.8 dB — past the whole-clip
10k-step ceiling at 1/3 the steps.  On 3 s with THREE 1 s backbones,
fp16 mods and only 2000 steps: **62.9 dB** — segmented fp16 is the hi-fi
recipe (int8 + backbone refit the low-rate one).  Low-rate check:
seg1 h=48 int8+refit on the 2 s probe -> 29.4 dB @ 18.2 bps (~4.5 bps at
44.1 kHz) — TIES the per-chunk compressive point (28.7 dB @ 4.5 bps)
rather than beating it; the modulated mode's advantage concentrates in
the mid/hi-fi rates where per-chunk parameter sets dominate the payload.  It lands well short of the ~96 dB
the same 1 s fits reach with FLOAT mods because int8 modulation
quantization caps reconstruction in the tens of dB (the standalone 96 dB
probes used unquantized mods): use ``quantize_mods='float16'`` for hi-fi
segmented points, int8 for the low-rate frontier.

Backbone-transfer probe (1 s clips, h=96, 3000 steps, clip 1.0): joint
fit reaches ~96 dB on either 1 s clip, but clip A's frozen backbone
carries clip B to only **17.6 dB** through mods alone
(``modulated_fit(frozen_shared=...)``) — a per-clip-overfit backbone
does not span other audio, even the same piece.  The amortised
"backbone ships once, clips cost mods only" codec needs corpus-level
(meta) backbone training; the building block is implemented and tested,
the result recorded as negative at this scale.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

from inraudio_tpu.codec import (ModulatedCodecConfig, compression_stats,  # noqa: E402
                                decode, encode_modulated, save_inr)
from inraudio_tpu.data.audio_io import read_wav  # noqa: E402
from inraudio_tpu.dsp import calculate_snr  # noqa: E402

WAV = os.environ.get("MOD_WAV", "/root/reference/gt_bach.wav")
STEPS = int(os.environ.get("MOD_STEPS", "3000"))

# chunk_s / hidden / omega0 / lr — omega follows the per-chunk recipe
# scans (0.05 s -> ~500, 0.1 s -> ~1000, 0.25 s -> ~1800, BASELINE.md)
POINTS = {
    "tiny": dict(chunk_seconds=0.05, hidden_features=48,
                 first_omega_0=500.0, learning_rate=1e-3),
    "mid": dict(chunk_seconds=0.05, hidden_features=64,
                first_omega_0=500.0, learning_rate=1e-3),
    "wide": dict(chunk_seconds=0.05, hidden_features=128,
                 first_omega_0=500.0, learning_rate=1e-3),
    "mid01": dict(chunk_seconds=0.1, hidden_features=64,
                  first_omega_0=1000.0, learning_rate=1e-3),
    "wide01": dict(chunk_seconds=0.1, hidden_features=128,
                   first_omega_0=1000.0, learning_rate=1e-3),
    "wide025": dict(chunk_seconds=0.25, hidden_features=128,
                    first_omega_0=1800.0, learning_rate=7e-4),
    # FiLM A/B: per-unit gains + shifts (2x mod bytes)
    "mid_film": dict(chunk_seconds=0.05, hidden_features=64,
                     first_omega_0=500.0, learning_rate=1e-3,
                     film_scale=True),
    "wide01_film": dict(chunk_seconds=0.1, hidden_features=128,
                        first_omega_0=1000.0, learning_rate=1e-3,
                        film_scale=True),
    # hotter modulation lr A/B
    "mid_hotmods": dict(chunk_seconds=0.05, hidden_features=64,
                        first_omega_0=500.0, learning_rate=1e-3,
                        mods_lr_mult=5.0),
    # segmented backbones: capacity per content-second (gt_bach is 7 s)
    "seg2_h96": dict(chunk_seconds=0.05, hidden_features=96,
                     first_omega_0=500.0, learning_rate=1e-3,
                     mods_lr_mult=5.0, segment_s=2.0),
    "seg1_h128": dict(chunk_seconds=0.05, hidden_features=128,
                      first_omega_0=500.0, learning_rate=1e-3,
                      mods_lr_mult=5.0, segment_s=1.0),
    # int16 mods: fp16's bytes as 16 uniform bits — probe_mod_quant.py
    # measured +20 dB over fp16 at identical size on a 110 dB fit; these
    # recalibrate the hi-fi segmented points at the new tier
    "seg1_h96_i16": dict(chunk_seconds=0.05, hidden_features=96,
                         first_omega_0=500.0, learning_rate=1e-3,
                         mods_lr_mult=5.0, segment_s=1.0,
                         quantize_mods="int16"),
    "seg1_h128_i16": dict(chunk_seconds=0.05, hidden_features=128,
                          first_omega_0=500.0, learning_rate=1e-3,
                          mods_lr_mult=5.0, segment_s=1.0,
                          quantize_mods="int16"),
    # exact-knob calibration runs for codec._MOD_RD_POINTS (the low-rate
    # whole-clip-backbone entries): int8 mods + QA backbone refit, hot
    # modulation lr — these stamp the table's snr_db fields
    "mod_h48_i8": dict(chunk_seconds=0.05, hidden_features=48,
                       first_omega_0=500.0, learning_rate=1e-3,
                       mods_lr_mult=5.0, quantize_mods="int8",
                       refit_backbone_steps=400),
    "mod_h64_i8": dict(chunk_seconds=0.05, hidden_features=64,
                       first_omega_0=500.0, learning_rate=1e-3,
                       mods_lr_mult=5.0, quantize_mods="int8",
                       refit_backbone_steps=400),
}


def main(names: list[str]) -> None:
    fs, sig = read_wav(WAV, channel=0)
    sig = sig.astype(np.float32)
    for name in names:
        knobs = dict(POINTS[name])
        quant = knobs.pop("quantize_mods",
                          os.environ.get("MOD_QUANT", "int8"))
        cfg = ModulatedCodecConfig(total_steps=STEPS, quantize_mods=quant,
                                   **knobs)
        t0 = time.time()
        payload = encode_modulated(sig, fs, cfg)
        wall = time.time() - t0
        _, rec = decode(payload)
        snr = float(calculate_snr(sig, rec))
        path = save_inr(f"/tmp/mod_{name}.inr", payload)
        st = compression_stats(payload, path)
        print(f"{name}: snr={snr:.2f} dB  bps={st['bits_per_sample']:.2f} "
              f"(disk {st['file_bits_per_sample']:.2f})  "
              f"chunks={payload['meta']['num_chunks']} "
              f"mod_dim={payload['meta']['mod_dim']}  wall={wall:.1f}s",
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or list(POINTS))
