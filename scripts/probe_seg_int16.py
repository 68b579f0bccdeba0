"""CPU probe: segmented hi-fi modulated recipe with int16 vs fp16 mods.

The recorded 3-segment hi-fi probe (bench_modulated.py docstring) reached
62.9 dB with fp16 mods at 2000 steps on 3 s of decimated gt_bach —
mod-tier-capped territory per probe_mod_quant.py (int16-per-col beats
fp16 by +20 dB at identical bytes on a 110 dB fit).  This re-runs that
exact recipe at both tiers through the PRODUCT surface
(``encode_modulated`` -> ``decode``), so the tier win is measured where
users get it, segmentation and container included.

Measured (2000 steps, 3 s @ 11.025 kHz, 3x h=96 segments):

    float16  62.96 dB @ 60.42 bps disk  |  int16  63.11 dB @ 62.87 bps

i.e. a TIE — at this step budget the FIT itself (~63 dB float) sits
below fp16's ~76 dB mod cap, so the tier doesn't bind; int16 also
entropy-codes ~4% worse (uniform grid -> higher-entropy low bytes).
The tier rule that falls out: fp16 mods until the fit clears ~76 dB,
int16 beyond it (hi-fi TPU operating points, where the extra steps are
seconds) — int16 is what REMOVES the mod cap, not a free upgrade at
step-limited budgets.

Run: python scripts/probe_seg_int16.py [steps] [tier ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from inraudio_tpu.codec import (ModulatedCodecConfig, compression_stats,  # noqa: E402
                                decode, encode_modulated, save_inr)
from inraudio_tpu.data.audio_io import decimate, read_wav  # noqa: E402
from inraudio_tpu.dsp.snr import calculate_snr  # noqa: E402


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    tiers = sys.argv[2:] or ["float16", "int16"]
    rate, wav = read_wav("/root/reference/gt_bach.wav", channel=0)
    wav = decimate(wav, 4)
    rate //= 4
    sig = wav[: 3 * rate].astype(np.float32)  # 3 s @ 11025 Hz
    for tier in tiers:
        cfg = ModulatedCodecConfig(
            chunk_seconds=0.05, hidden_features=96, first_omega_0=125.0,
            learning_rate=1e-3, total_steps=steps, mods_lr_mult=5.0,
            segment_s=1.0, quantize_mods=tier)
        t0 = time.time()
        payload = encode_modulated(sig, rate, cfg)
        wall = time.time() - t0
        _, rec = decode(payload)
        snr = float(calculate_snr(sig, rec))
        path = save_inr(f"/tmp/seg_{tier}.inr", payload)
        st = compression_stats(payload, path)
        print(f"{tier:8s} SNR {snr:7.2f} dB  "
              f"disk {st['file_bits_per_sample']:.2f} bps  "
              f"wall {wall:.0f}s", flush=True)


if __name__ == "__main__":
    main()
