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
