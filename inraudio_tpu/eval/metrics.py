"""Evaluation metrics + the per-experiment summary record.

The reference's metrics system is a ``parameters.json`` per experiment
carrying every hyperparameter plus ``parameter_size(KB)``,
``total_model_size(KB)``, ``total_trainig_time(min)`` [sic, reproduced for
schema parity] and the final ``SNR`` (run.py:365-398).  ``calculate_snr``
(utils.py:77-97) is re-exported from dsp.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

from ..dsp.snr import calculate_snr  # noqa: F401  (re-export)
from ..models import param_bytes, param_count


def reconstruction_snr(reference: np.ndarray, reconstruction: np.ndarray,
                       trim: int = 0) -> float:
    """SNR(dB) with the signals aligned to the shorter length; ``trim``
    drops edge samples (MDCT frames at the boundary are not fully
    overlapped)."""
    n = min(len(reference), len(reconstruction))
    a, b = reference[:n], reconstruction[:n]
    if trim > 0:
        a, b = a[trim:-trim], b[trim:-trim]
    return float(calculate_snr(a, b))


def si_snr(reference: np.ndarray, estimate: np.ndarray,
           eps: float = 1e-12) -> float:
    """Scale-invariant SNR (dB) — the standard source-separation/codec
    metric (Le Roux et al. 2019): project the estimate onto the reference
    and compare the projection to the residual.  Invariant to any global
    gain on the estimate, unlike ``calculate_snr`` (a decoder that is
    perfect up to a volume knob scores infinity here, ~0 dB there).
    Beyond the reference (its only metric is plain SNR, utils.py:77-97)."""
    import jax.numpy as jnp
    s = jnp.asarray(reference, jnp.float32).reshape(-1)
    x = jnp.asarray(estimate, jnp.float32).reshape(-1)
    s = s - jnp.mean(s)
    x = x - jnp.mean(x)
    target = (jnp.vdot(x, s) / (jnp.vdot(s, s) + eps)) * s
    noise = x - target
    return float(10.0 * jnp.log10(
        (jnp.sum(target ** 2) + eps) / (jnp.sum(noise ** 2) + eps)))


def log_spectral_distance(reference: np.ndarray, estimate: np.ndarray,
                          n_fft: int = 1024, hop: int | None = None,
                          rel_floor: float = 1e-10) -> float:
    """Log-spectral distance (dB, lower is better): RMS over frames of the
    per-frame RMS difference of log power spectra — the classic spectral
    fidelity measure; complements SNR by penalising tonal/timbral error
    that small-waveform-energy terms hide.  Both power spectra are floored
    at ``rel_floor`` (default −100 dB) below the global peak so silent
    bins don't dominate the distance.  Uses the repo's matmul rDFT
    (``dsp.stft``; ``jnp.fft`` has no lowering on this TPU runtime)."""
    import jax.numpy as jnp

    from ..dsp.stft import stft_real_imag
    n = min(len(reference), len(estimate))
    a = jnp.asarray(reference[:n], jnp.float32)
    b = jnp.asarray(estimate[:n], jnp.float32)

    # power from (real, imag) directly: complex arithmetic has no lowering
    # on the axon TPU runtime (same reason dsp.stft is a matmul rDFT)
    def power(x):
        re, im = stft_real_imag(x, n_fft=n_fft, hop=hop)
        return re * re + im * im

    pa_ = power(a)
    pb_ = power(b)
    floor = jnp.maximum(jnp.max(pa_), jnp.max(pb_)) * rel_floor + 1e-30
    pa = jnp.log10(jnp.maximum(pa_, floor))
    pb = jnp.log10(jnp.maximum(pb_, floor))
    per_frame = jnp.sqrt(jnp.mean((10.0 * (pa - pb)) ** 2, axis=0))
    return float(jnp.sqrt(jnp.mean(per_frame ** 2)))


def save_parameters(path: str, params: dict[str, Any]) -> str:
    """Write the experiment summary JSON (reference save_parameters,
    run.py:25-28)."""
    out = os.path.join(path, "parameters.json")
    with open(out, "w") as f:
        json.dump(params, f, indent=4, default=float)
    return out


def experiment_record(hparams: dict[str, Any], model_params,
                      train_time_s: float, snr: float) -> dict[str, Any]:
    """The reference's summary schema (run.py:366-398): hyperparameters +
    sizes + time + SNR.  Keeps the reference's field names, including its
    'total_trainig_time(min)' typo, so downstream tooling matches."""
    rec = dict(hparams)
    rec["parameter_size(KB)"] = param_count(model_params) * 4 / 1024.0
    rec["total_model_size(KB)"] = param_bytes(model_params) / 1024.0
    rec["total_trainig_time(min)"] = train_time_s / 60.0
    rec["SNR"] = snr
    return rec
