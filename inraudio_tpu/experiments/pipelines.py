"""Composite experiment pipelines: procedural curriculum, band-split
residual chaining.

- ``procedural_train`` — the reference's checkpoint-chained decimation
  curriculum (run.py:486-495): fit d8 -> d4 -> d2 -> d1, each phase
  warm-starting model+optimizer from the previous checkpoint.
- ``band_split_train`` — the reference's (commented) band-split residual
  pipeline (run_experimental.py:368-373): lowpass/highpass split at a
  cutoff, fit each band with its own INR, sum the reconstructions.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..dsp.filters import hpfilter, lpfilter
from .runner import train, train_from_signal


def procedural_train(experiment_path: str, tag: str,
                     decimations=(8, 4, 2, 1), **train_kwargs) -> str:
    """Chain ``train`` over a decimation curriculum (run.py:486-495);
    returns the final checkpoint path."""
    prev = train_kwargs.pop("prev_ckpt_path", None)
    for d in decimations:
        prev = train(experiment_path, f"{tag}_d{d}", decimation=d,
                     prev_ckpt_path=prev, **train_kwargs)
    return prev


def band_split_train(experiment_path: str, tag: str,
                     input_signal: np.ndarray, input_fs: int,
                     cutoff: float = 10000.0,
                     lp_kwargs: dict[str, Any] | None = None,
                     hp_kwargs: dict[str, Any] | None = None,
                     **common_kwargs) -> dict[str, Any]:
    """Split at ``cutoff`` Hz, fit each band separately, sum reconstructions
    (run_experimental.py:368-373).  Per-band kwargs override the common ones
    (the reference used different omega per band in its sweeps)."""
    sig = np.asarray(input_signal, dtype=np.float32)
    low = np.asarray(lpfilter(sig, cutoff, input_fs), dtype=np.float32)
    high = np.asarray(hpfilter(sig, cutoff, input_fs), dtype=np.float32)

    out_lp = train_from_signal(experiment_path, f"{tag}_lp", low, input_fs,
                               **{**common_kwargs, **(lp_kwargs or {})})
    out_hp = train_from_signal(experiment_path, f"{tag}_hp", high, input_fs,
                               **{**common_kwargs, **(hp_kwargs or {})})

    n = min(len(out_lp["rec"]), len(out_hp["rec"]))
    combined = out_lp["rec"][:n] + out_hp["rec"][:n]
    from ..eval.metrics import reconstruction_snr
    snr = reconstruction_snr(sig[:n], combined)
    return {"lp": out_lp, "hp": out_hp, "rec": combined, "snr": snr}
