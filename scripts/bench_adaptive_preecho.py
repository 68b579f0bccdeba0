"""Pre-echo A/B: fixed-N vs adaptive (block-switching) STMDCT fitting.

VERDICT r2 item 5: show the pre-echo win of ``method='mdct',
adaptive=True`` on a transient clip.  Pre-echo is fit error in a LONG
analysis frame smearing across the frame's full window span, audible as
noise *ahead* of each attack (reference draft window.py:67-113 is the
block-switching machinery this implements); short blocks confine the error
to ~n_short samples around the transient.

The clip is a castanet-like click train over a quiet tonal bed.  Both
arms run end to end through ``experiments.runner.train`` (same model,
same steps); the metric is the error level in the pre-attack windows
[click-15 ms, click-2 ms] relative to the bed signal there (pre-echo
noise, dB — lower is better), next to the overall reconstruction SNR.

Usage: python scripts/bench_adaptive_preecho.py [steps]
"""

import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

# sitecustomize imports jax on the axon platform before env vars can take
# effect; honor an explicit JAX_PLATFORMS request (CPU sanity runs).
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

from inraudio_tpu.data.audio_io import read_wav, write_wav  # noqa: E402
from inraudio_tpu.experiments.runner import train  # noqa: E402

FS = 44100
DUR = 2.0
CLICK_T = (0.35, 0.75, 1.15, 1.55)  # attack times, seconds


def make_clip() -> np.ndarray:
    t = np.arange(int(FS * DUR)) / FS
    # quiet tonal bed: two partials at -26 dBFS
    bed = 0.05 * (np.sin(2 * np.pi * 420 * t) + 0.6 * np.sin(2 * np.pi * 933 * t))
    sig = bed.copy()
    rng = np.random.default_rng(0)
    for ct in CLICK_T:
        i = int(ct * FS)
        burst = rng.standard_normal(360) * np.exp(-np.arange(360) / 60.0)
        sig[i:i + 360] += 0.85 * burst  # sharp decaying noise attack
    return sig.astype(np.float32)


def pre_echo_db(ref: np.ndarray, rec: np.ndarray) -> float:
    """Mean error-to-signal level (dB) over the pre-attack windows."""
    n = min(len(ref), len(rec))
    err = ref[:n] - rec[:n]
    levels = []
    for ct in CLICK_T:
        a = int((ct - 0.015) * FS)
        b = int((ct - 0.002) * FS)
        if b <= n:
            e = float(np.mean(err[a:b] ** 2))
            s = float(np.mean(ref[a:b] ** 2))
            levels.append(10 * np.log10(max(e, 1e-12) / max(s, 1e-12)))
    return float(np.mean(levels))


def snr_db(ref: np.ndarray, rec: np.ndarray) -> float:
    n = min(len(ref), len(rec))
    err = ref[:n] - rec[:n]
    return float(10 * np.log10(np.mean(ref[:n] ** 2) / np.mean(err ** 2)))


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    # Pallas kernels need a real TPU; CPU sanity runs use the XLA path.
    fused = jax.default_backend() not in ("cpu",)
    clip = make_clip()
    with tempfile.TemporaryDirectory() as d:
        wav = os.path.join(d, "clicks.wav")
        write_wav(wav, FS, clip)
        common = dict(filename=wav, duration=DUR, method="mdct", n=2048,
                      hidden=128, omega=300.0, total_steps=steps,
                      fused=fused, grad_clip_norm=1.0, plateau_patience=50,
                      learning_rate=1.5e-3, make_plots=False)
        for name, adaptive in (("fixed", False), ("adaptive", True)):
            train(d, name, adaptive=adaptive, **common)
            out = sorted(glob.glob(os.path.join(d, name + "*", "output.wav")))[-1]
            _, rec = read_wav(out, channel=0)
            # the mdct decode contract reconstructs the peak-normalised
            # waveform: compare in normalised units
            ref = clip / np.max(np.abs(clip))
            print(json.dumps({
                "arm": name, "steps": steps,
                "snr_db": round(snr_db(ref, rec), 2),
                "pre_echo_db": round(pre_echo_db(ref, rec), 2)}), flush=True)


if __name__ == "__main__":
    main()
