"""Psychoacoustic helpers: threshold in quiet, SPL intensity, loss masking.

Reference utils.py:59-75 defines ``Thresh``/``Intensity``; utils.py:365-376
drafts (commented out) a hearing-threshold mask for attenuating the MDCT
fitting loss.  Here the mask is implemented as a first-class, wired-up option
(see data.fittings.mdct_fitting(perceptual_mask=True)).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def thresh_quiet(f):
    """Threshold in quiet (SPL dB) at frequency f in Hz (utils.py:59-65)."""
    f = jnp.clip(jnp.asarray(f, dtype=jnp.float32), 20.0, None)
    khz = f / 1000.0
    return (
        3.64 * khz ** (-0.8)
        - 6.5 * jnp.exp(-0.6 * (khz - 3.3) ** 2)
        + 1e-3 * khz**4
    )


def intensity(spl):
    """SPL -> intensity, /20 variant used for MDCT magnitudes (utils.py:67-75)."""
    return 10.0 ** ((jnp.asarray(spl) - 96.0) / 20.0)


def hearing_threshold_mask(n: int, sample_rate: float, num_frames: int) -> np.ndarray:
    """Per-coefficient loss attenuation mask for an (n//2, num_frames) STMDCT.

    Follows the reference's drafted construction (utils.py:366-373): map MDCT
    bin -> frequency, take the threshold-in-quiet curve, zero its minimum,
    clip at 10 dB, and map to a weight in [0.8, 1.0] (quieter-threshold bins
    get full weight; easily-masked high/low bins get 0.8).
    Returns a float32 (n//2 * num_frames, 1) mask aligned with the flattened
    fitting targets.
    """
    half = n // 2
    freqs = np.arange(half) * sample_rate / 2.0 / (half - 1) + 1.0
    threshold = np.asarray(thresh_quiet(freqs))
    threshold = threshold - threshold.min()
    threshold = np.clip(threshold, None, 10.0)
    reduction = (100.0 - threshold) / 100.0 * 0.2 + 0.8
    mask = np.tile(reduction[:, None], (1, num_frames))
    return mask.reshape(-1, 1).astype(np.float32)
