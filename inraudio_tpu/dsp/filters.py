"""IIR filtering: Butterworth design + zero-phase filtfilt on device.

The reference uses scipy ``butter`` + ``filtfilt`` (utils.py:49-57) for its
high/low-pass data prep.  Filter *design* is a tiny host-side computation
(scipy, float64 — there is no reason to port polynomial root finding to TPU);
the *filtering* runs on device as a ``lax.scan`` over a direct-form-II
transposed recurrence, with scipy-compatible odd-extension padding and
``lfilter_zi`` initial conditions so results match ``scipy.signal.filtfilt``'s
defaults (method='pad', padtype='odd', padlen=3*max(len(a),len(b))).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import butter as _butter
from scipy.signal import lfilter_zi as _lfilter_zi


@functools.lru_cache(maxsize=None)
def butter_coeffs(order: int, cutoff: float, btype: str, fs: float):
    """Butterworth (b, a) coefficients, host-side float64 design."""
    b, a = _butter(order, cutoff, btype=btype, fs=fs)
    return np.asarray(b), np.asarray(a)


def lfilter(b, a, x: jnp.ndarray, zi: jnp.ndarray | None = None):
    """Causal IIR filter (direct form II transposed) via lax.scan.

    x: 1-D signal.  Returns (y, zf) if zi is given, else y.
    """
    b = jnp.asarray(b, dtype=x.dtype)
    a = jnp.asarray(a, dtype=x.dtype)
    b = b / a[0]
    a = a / a[0]
    order = b.shape[0] - 1
    b0, b_rest, a_rest = b[0], b[1:], a[1:]
    z0 = jnp.zeros(order, dtype=x.dtype) if zi is None else zi.astype(x.dtype)

    def step(z, xn):
        yn = b0 * xn + z[0]
        z_new = b_rest * xn - a_rest * yn + jnp.concatenate([z[1:], jnp.zeros(1, dtype=z.dtype)])
        return z_new, yn

    zf, y = jax.lax.scan(step, z0, x)
    return (y, zf) if zi is not None else y


def filtfilt(b, a, x: jnp.ndarray) -> jnp.ndarray:
    """Zero-phase forward-backward filtering, scipy-default-compatible."""
    b = np.asarray(b)
    a = np.asarray(a)
    padlen = 3 * max(len(a), len(b))
    if x.shape[0] <= padlen:
        raise ValueError(f"signal length {x.shape[0]} must exceed padlen {padlen}")
    zi = jnp.asarray(_lfilter_zi(b, a), dtype=x.dtype)
    # Odd extension at both ends (scipy padtype='odd').
    left = 2.0 * x[0] - x[1 : padlen + 1][::-1]
    right = 2.0 * x[-1] - x[-(padlen + 1) : -1][::-1]
    ext = jnp.concatenate([left, x, right])
    y, _ = lfilter(b, a, ext, zi=zi * ext[0])
    y = y[::-1]
    y, _ = lfilter(b, a, y, zi=zi * y[0])
    y = y[::-1]
    return y[padlen:-padlen]


def hpfilter(data: jnp.ndarray, cutoff: float, fs: float) -> jnp.ndarray:
    """Order-5 Butterworth highpass, zero-phase (reference utils.py:49-52)."""
    b, a = butter_coeffs(5, cutoff, "highpass", fs)
    return filtfilt(b, a, jnp.asarray(data))


def lpfilter(data: jnp.ndarray, cutoff: float, fs: float) -> jnp.ndarray:
    """Order-5 Butterworth lowpass, zero-phase (reference utils.py:54-57)."""
    b, a = butter_coeffs(5, cutoff, "lowpass", fs)
    return filtfilt(b, a, jnp.asarray(data))
