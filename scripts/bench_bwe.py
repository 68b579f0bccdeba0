"""Bandwidth-extension (BWE) decode, productized as a number.

VERDICT r4 item 7: the runner's ``bwe=True`` path (eval/decode.py:64-99,
reference run.py:131,251-253 + the procedural decimation at
run.py:486-495) is e2e-tested but had no measured quality row.  This
script fits gt_bach DECIMATED by q (training rate sr/q), decodes the
continuous INR at the ORIGINAL-rate grid, and scores it against the
full-rate ground truth next to the classical baseline — the same
decimated signal sinc-resampled back up (scipy.resample_poly).

Both arms carry the same information ceiling (the anti-alias filter ran
before fitting), so the comparison isolates what the INR's continuity
buys (or costs) over ideal interpolation: in-band fidelity + behaviour
at the decimated Nyquist edge.  Metrics: SNR / SI-SNR / LSD vs the
full-rate reference, plus in-band LSD below 0.9x the decimated Nyquist.

Usage: python scripts/bench_bwe.py [steps] [q ...]   (default 6000, q=2 4)
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

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

from scipy.signal import resample_poly  # noqa: E402

from inraudio_tpu.data.audio_io import decimate as decimate_signal  # noqa: E402
from inraudio_tpu.data.audio_io import read_wav  # noqa: E402
from inraudio_tpu.eval.metrics import (log_spectral_distance,  # noqa: E402
                                       reconstruction_snr, si_snr)
from inraudio_tpu.experiments.runner import train  # noqa: E402

WAV = "/root/reference/gt_bach.wav"


def _inband_lsd(ref: np.ndarray, rec: np.ndarray, sr: int,
                hi_hz: float) -> float:
    """LSD restricted to [0, hi_hz): the band both arms can represent."""
    import numpy.fft as fft
    n = min(len(ref), len(rec))
    frame, hop = 2048, 512
    k1 = max(2, int(hi_hz * frame / sr))
    w = np.hanning(frame)
    vals = []
    for a in range(0, n - frame, hop):
        r = np.abs(fft.rfft(ref[a:a + frame] * w))[:k1]
        e = np.abs(fft.rfft(rec[a:a + frame] * w))[:k1]
        d = 10 * (np.log10(np.maximum(r, 1e-8) ** 2)
                  - np.log10(np.maximum(e, 1e-8) ** 2))
        vals.append(float(np.sqrt(np.mean(d ** 2))))
    return float(np.mean(vals))


def score(tag: str, ref: np.ndarray, rec: np.ndarray, sr: int, q: int,
          extra: dict | None = None) -> None:
    n = min(len(ref), len(rec))
    r, e = ref[1024:n - 1024], rec[1024:n - 1024]
    hi = 0.9 * (sr / q) / 2.0
    print(json.dumps({
        "arm": tag, "q": q,
        "snr_db": round(reconstruction_snr(r, e), 2),
        "si_snr_db": round(float(si_snr(r, e)), 2),
        "lsd_db": round(float(log_spectral_distance(r, e)), 3),
        "lsd_inband_db": round(_inband_lsd(r, e, sr, hi), 3),
        **(extra or {})}), flush=True)


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    qs = [int(a) for a in sys.argv[2:]] or [2, 4]
    fused = jax.default_backend() not in ("cpu",)
    sr, ref = read_wav(WAV, channel=0)
    dur = min(6.99, len(ref) / sr)
    ref = ref[: int(dur * sr)]

    for q in qs:
        # classical baseline: decimate (anti-alias + downsample), then
        # ideal polyphase sinc interpolation back to the original rate
        dec = decimate_signal(ref, q)
        up = resample_poly(dec, q, 1)[: len(ref)].astype(np.float32)
        score("sinc_resample", ref, up, sr, q)

        # INR arm: fit the decimated clip (the runner decimates and peak-
        # normalises internally), decode the continuous model at the
        # original-rate grid (bwe=True).  Recipe = the BASELINE.md tuned
        # full-batch folded-RFF fit with sigma scaled to the decimated
        # coordinate bandwidth (sigma 1500 was calibrated at 308K rows).
        with tempfile.TemporaryDirectory() as d:
            train(d, f"bwe_q{q}", filename=WAV, duration=dur,
                  decimation=q, bwe=True, method="wave",
                  num_freq=512, sigma=1500.0 / q, omega=30.0,
                  hidden=256, learning_rate=1e-3, grad_clip_norm=1.0,
                  total_steps=steps, fused=fused, make_plots=False)
            folder = sorted(glob.glob(os.path.join(d, f"bwe_q{q}*")))[-1]
            _, rec = read_wav(os.path.join(folder, "output.wav"), channel=0)
            with open(os.path.join(folder, "parameters.json")) as f:
                prec = json.load(f)
            # the wave decode de-normalises by the DECIMATED peak, which
            # differs from the full-rate peak by <0.1% on this clip —
            # si_snr_db is the scale-invariant check on that
            score("inr_bwe", ref, rec, sr, q,
                  extra={"steps": steps,
                         "train_snr_db": round(prec.get("SNR", 0.0), 2)})


if __name__ == "__main__":
    main()
