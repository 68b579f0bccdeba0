"""Analysis/synthesis window functions.

Windows are *compile-time constants* on TPU: they are computed once on the
host in float64 NumPy and baked into jitted programs as literals, so the hot
path never recomputes them.  Semantics match the reference
(window.py:16-64): each function returns the window itself (length ``n``);
multiply by a signal to window it.

The KBD (Kaiser-Bessel-derived) window is the one on the live MDCT path
(reference mdct.py:65,103) and satisfies the Princen-Bradley / TDAC condition
``w[k]^2 + w[k + n/2]^2 == 1`` required for perfect reconstruction with 50%%
overlap-add.
"""

from __future__ import annotations

import functools

import numpy as np
from scipy.special import i0


@functools.lru_cache(maxsize=None)
def sine_window(n: int) -> np.ndarray:
    """Sine window, reference window.py:16-26."""
    k = np.arange(n)
    return np.sin(np.pi * (k + 0.5) / n)


@functools.lru_cache(maxsize=None)
def hann_window(n: int) -> np.ndarray:
    """Hann window (periodic, half-sample offset), reference window.py:29-39."""
    k = np.arange(n)
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * (k + 0.5) / n))


@functools.lru_cache(maxsize=None)
def hann_window_periodic(n: int) -> np.ndarray:
    """Periodic Hann WITHOUT the half-sample offset — torch.hann_window
    semantics, used by the STFT loss and the FFT-magnitude fitting target
    for parity with the reference's torch.stft calls (utils.py:250-251)."""
    k = np.arange(n)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * k / n))).astype(np.float32)


@functools.lru_cache(maxsize=None)
def kbd_window(n: int, alpha: float = 4.0) -> np.ndarray:
    """Kaiser-Bessel-derived window, reference window.py:42-61.

    Construction: a Kaiser window of length ``n/2 + 1`` is integrated
    (cumulative sum) and normalised by its total mass; the square root of the
    running sum forms the left half, mirrored for the right half.  This
    guarantees power complementarity across the ``n/2`` hop.
    """
    half = n // 2
    m = np.arange(half + 1)
    kaiser = i0(np.pi * alpha * np.sqrt(1.0 - ((2.0 * m + 1.0) / (n / 2 + 1.0) - 1.0) ** 2)) / i0(
        np.pi * alpha
    )
    total = kaiser.sum()
    left = np.sqrt(np.cumsum(kaiser[:half]) / total)
    right = left[::-1]
    return np.concatenate([left, right])


@functools.lru_cache(maxsize=None)
def rect_window(n: int) -> np.ndarray:
    """Rectangular window scaled by 0.2, reference window.py:63-64."""
    return 0.2 * np.ones(n)


# ---------------------------------------------------------------------------
# Block switching (reference window.py:67-113, drafted there but commented
# out).  Long blocks use KBD for faster stop-band dropoff; short blocks use
# sine for better time localisation; asymmetric transition windows splice a
# long half onto a short half so a long->short->long window sequence still
# satisfies the TDAC overlap condition at every hop boundary.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def long_window(n_long: int = 1024, alpha: float = 4.0) -> np.ndarray:
    """Long analysis window: KBD of length ``n_long`` (window.py:72-79)."""
    return kbd_window(n_long, alpha)


@functools.lru_cache(maxsize=None)
def short_window(n_short: int = 256) -> np.ndarray:
    """Short analysis window: sine of length ``n_short`` (window.py:81-87)."""
    return sine_window(n_short)


@functools.lru_cache(maxsize=None)
def transition_start_window(n_long: int = 1024, n_short: int = 256,
                            alpha: float = 4.0) -> np.ndarray:
    """Long-to-short transition (window.py:89-101), asymmetric, length
    ``(n_long + n_short) / 2``: left = first ``n_long/2`` samples of the long
    KBD window, right = last ``n_short/2`` samples of the short sine
    window."""
    left = kbd_window(n_long, alpha)[: n_long // 2]
    right = sine_window(n_short)[n_short // 2:]
    return np.concatenate([left, right])


@functools.lru_cache(maxsize=None)
def transition_stop_window(n_long: int = 1024, n_short: int = 256,
                           alpha: float = 4.0) -> np.ndarray:
    """Short-to-long transition (window.py:103-113): rising sine half of the
    short window then the falling KBD half of the long window; length
    ``(n_short + n_long) / 2``."""
    left = sine_window(n_short)[: n_short // 2]
    right = kbd_window(n_long, alpha)[n_long // 2:]
    return np.concatenate([left, right])
