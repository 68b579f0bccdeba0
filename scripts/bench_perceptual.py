"""Perceptual-mask A/B: hearing-threshold loss weighting on real audio.

VERDICT r4 item 6: `mdct_fitting(perceptual_mask=True)` wires the
frequency-dependent loss attenuation the reference drafted and shelved
(utils.py:365-376) — this script turns the wired capability into a
measured result.  Both arms fit the SAME STMDCT target for the SAME step
budget; the only difference is the per-coefficient loss weight
(dsp/psycho.hearing_threshold_mask).  Metrics per arm, reconstruction vs
the peak-normalised reference waveform:

  - snr_db  : plain time-domain SNR (the mask deliberately trades this
              away in inaudible bands, so it may drop)
  - lsd_db  : log-spectral distance (eval/metrics.py:53) — the spectral-
              fidelity number the mask should improve or hold
  - si_snr  : scale-invariant SNR
  - lsd_audible_db : LSD restricted to the perceptually-weighted band
              (bins where the mask weight is >= half its max) — the
              quantity the mask explicitly optimises

Usage: python scripts/bench_perceptual.py [steps] [wav]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

# Both arms must train on the SAME step implementation: weighted fits are
# excluded from the whole-step fused kernel (loop.fused_step_plan
# has_weight gate), so with the default routing the unmasked arm would
# ride the fused step (bf16x2 grads) while the masked arm takes the
# two-kernel path (uniform precision) — a precision confound, not a mask
# A/B.  Pin both to the two-kernel path.
os.environ["INRAUDIO_FUSED_STEP"] = "0"

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

from inraudio_tpu.data.audio_io import read_wav  # noqa: E402
from inraudio_tpu.dsp.psycho import hearing_threshold_mask  # noqa: E402
from inraudio_tpu.eval.metrics import (log_spectral_distance,  # noqa: E402
                                       reconstruction_snr, si_snr)
from inraudio_tpu.experiments.runner import train  # noqa: E402

N = 2048


def _banded_lsd(ref: np.ndarray, rec: np.ndarray, sr: int,
                lo_hz: float, hi_hz: float) -> float:
    """LSD over [lo_hz, hi_hz) only — perceptual band of interest."""
    import numpy.fft as fft
    n = min(len(ref), len(rec))
    frame, hop = 2048, 512
    k0 = int(lo_hz * frame / sr)
    k1 = max(k0 + 1, int(hi_hz * frame / sr))
    w = np.hanning(frame)
    vals = []
    for a in range(0, n - frame, hop):
        r = np.abs(fft.rfft(ref[a:a + frame] * w))[k0:k1]
        e = np.abs(fft.rfft(rec[a:a + frame] * w))[k0:k1]
        d = 10 * (np.log10(np.maximum(r, 1e-8) ** 2)
                  - np.log10(np.maximum(e, 1e-8) ** 2))
        vals.append(float(np.sqrt(np.mean(d ** 2))))
    return float(np.mean(vals))


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    wav = sys.argv[2] if len(sys.argv) > 2 else "/root/reference/gt_bach.wav"
    fused = jax.default_backend() not in ("cpu",)
    sr, ref = read_wav(wav, channel=1)
    dur = min(6.99, len(ref) / sr)
    ref = ref[: int(dur * sr)]
    ref = ref / np.max(np.abs(ref))

    # the band the mask emphasises: weights span only [0.98, 1.0]
    # (the reference draft clips the threshold at 10 dB, utils.py:370),
    # so "audible band" = bins within 0.01 of full weight (threshold-in-
    # quiet <= 5 dB, the ATH trough — roughly 300 Hz - 9 kHz)
    mask = np.asarray(hearing_threshold_mask(N, sr, 1)).reshape(-1)
    kk = np.nonzero(mask >= mask.max() - 0.01)[0]
    hz_per_bin = sr / 2.0 / (len(mask) - 1)
    lo_hz = float(kk.min()) * hz_per_bin
    hi_hz = float(kk.max() + 1) * hz_per_bin

    with tempfile.TemporaryDirectory() as d:
        common = dict(filename=wav, duration=dur, method="mdct", n=N,
                      hidden=128, omega=300.0, total_steps=steps,
                      fused=fused, grad_clip_norm=1.0, plateau_patience=50,
                      learning_rate=1.5e-3, make_plots=False)
        for name, masked in (("unmasked", False), ("masked", True)):
            train(d, name, perceptual_mask=masked, **common)
            out = sorted(glob.glob(os.path.join(d, name + "*",
                                                "output.wav")))[-1]
            _, rec = read_wav(out, channel=0)
            n = min(len(ref), len(rec))
            r, e = ref[1024:n - 1024], rec[1024:n - 1024]
            print(json.dumps({
                "arm": name, "steps": steps,
                "snr_db": round(reconstruction_snr(r, e), 2),
                "si_snr_db": round(float(si_snr(r, e)), 2),
                "lsd_db": round(float(log_spectral_distance(r, e)), 3),
                "lsd_audible_db": round(_banded_lsd(r, e, sr, lo_hz, hi_hz),
                                        3),
                "band_hz": [round(lo_hz), round(hi_hz)]}), flush=True)


if __name__ == "__main__":
    main()
