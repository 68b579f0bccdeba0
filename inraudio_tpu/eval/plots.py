"""Host-side artifact plots (optional — matplotlib only imported on use).

Reference run.py:214-232, 323-354 and utils.py:25-47: spectrogram PNGs for
reference + reconstruction, waveform-comparison PNG, loss/LR history in dB,
and the STMDCT-matrix ``visualizer`` imshow.  Pure presentation; nothing on
the compute path depends on this module.
"""

from __future__ import annotations

import numpy as np


def plotspec(signal: np.ndarray, sample_rate: int, path: str,
             n_fft: int = 2048, noverlap: int = 512) -> None:
    """dB-magnitude specgram PNG (reference utils.py:25-31)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 4))
    ax.specgram(signal, NFFT=n_fft, Fs=sample_rate, noverlap=noverlap,
                scale="dB")
    ax.set_xlabel("time (s)")
    ax.set_ylabel("frequency (Hz)")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def visualizer(matrix: np.ndarray, path: str, title: str = "STMDCT") -> None:
    """imshow of a (freq, frames) coefficient/magnitude matrix
    (reference utils.py:33-47)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 4))
    im = ax.imshow(np.asarray(matrix), aspect="auto", origin="lower",
                   cmap="viridis")
    fig.colorbar(im, ax=ax)
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def plot_loss_history(loss_history: np.ndarray, lr_history: np.ndarray,
                      path: str, title: str = "") -> None:
    """Loss and LR curves in dB (10*log10), reference run.py:180-190,214-232."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 4))
    ax.plot(10.0 * np.log10(np.maximum(np.asarray(loss_history), 1e-30)),
            label="loss (dB)")
    ax.plot(10.0 * np.log10(np.maximum(np.asarray(lr_history), 1e-30)),
            label="lr (dB)")
    ax.set_xlabel("step")
    ax.legend()
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def plot_waveform_comparison(reference: np.ndarray, reconstruction: np.ndarray,
                             sample_rate: int, path: str,
                             window: tuple[float, float] | None = None) -> None:
    """Overlaid reference/reconstruction waveforms (reference run.py:336-354)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = min(len(reference), len(reconstruction))
    t = np.arange(n) / sample_rate
    lo, hi = 0, n
    if window is not None:
        lo = int(window[0] * sample_rate)
        hi = min(int(window[1] * sample_rate), n)
    fig, ax = plt.subplots(figsize=(12, 4))
    ax.plot(t[lo:hi], reference[lo:hi], label="reference", alpha=0.7)
    ax.plot(t[lo:hi], reconstruction[lo:hi], label="reconstruction",
            alpha=0.7)
    ax.set_xlabel("time (s)")
    ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
