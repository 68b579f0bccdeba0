"""Dense decode of a fitted INR — including bandwidth extension and the
spectral inverse transforms.

Reference run.py:249-296: evaluate the network over a coordinate grid, then
(wave) write the waveform or (mdct) invert the normalisation contract and
overlap-add.  Decode is inference-only — no autodiff residuals — so the
whole grid is evaluated in jitted chunks that stay on device; only the final
waveform crosses back to host.

Bandwidth extension (run.py:131, 251-253): a model trained on decimated
audio is evaluated at the full original-rate grid — INR super-resolution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..data.coords import get_coord
from ..data.fittings import FittingProblem
from ..dsp.mdct import istmdct
from ..models import INRModel


def decode_dense(model: INRModel, params, coords: np.ndarray,
                 chunk: int = 1 << 20,
                 fit_snr_db: float | None = None) -> np.ndarray:
    """Evaluate model over (n, d) coords in device-sized chunks -> (n, 1).

    Chunking keeps peak activation memory bounded for minute-scale grids
    (each chunk is (chunk, hidden) through ~5 layers); one jitted call is
    reused across chunks (static shapes — the tail chunk is padded).

    ``fit_snr_db``: the model's own fit quality.  When given and the model
    carries a quality-gated inference path (fused mlp), decode routes
    through the fastest fused tier whose measured noise floor clears it
    (auto_decode_kwargs — e.g. the reference-default h=256 model fits at
    33.6 dB and decodes via the bf16 + deg-7-sin tier at 102 Msamples/s,
    1.7x the training-apply path, adding < 0.5 dB of error).
    """
    if fit_snr_db is not None and model.decode_apply is not None:
        def apply_c(p, c, _s=float(fit_snr_db)):
            # decode_apply dispatches to the internally-jitted fused kernel
            return model.decode_apply(p, c, _s)
    else:
        apply_c = jax.jit(model.apply)
    n = coords.shape[0]
    if n <= chunk:
        return np.asarray(apply_c(params, jnp.asarray(coords)))
    outs = []
    for start in range(0, n, chunk):
        block = coords[start:start + chunk]
        if block.shape[0] < chunk:  # pad tail to keep the compiled shape
            pad = chunk - block.shape[0]
            block = np.concatenate([block, np.zeros((pad, block.shape[1]),
                                                    dtype=block.dtype)])
            outs.append(np.asarray(apply_c(params, jnp.asarray(block)))[:-pad])
        else:
            outs.append(np.asarray(apply_c(params, jnp.asarray(block))))
    return np.concatenate(outs, axis=0)


def bwe_coords(problem: FittingProblem, coord_scale: float = 1.0) -> np.ndarray:
    """Full original-rate grid for super-resolution decode (run.py:131):
    ``get_coord(original_sample_rate * duration, 1)``."""
    duration = problem.height / problem.sample_rate
    n = int(problem.original_sample_rate * duration)
    return get_coord(n, dim=1, scale=coord_scale)


def decode_problem(model: INRModel, params, problem: FittingProblem,
                   bwe: bool = False, encode=None,
                   fit_snr_db: float | None = None) -> tuple[np.ndarray, int]:
    """Decode a fitted problem -> (waveform_or_matrix, sample_rate).

    - wave/multi: network output de-normalised by the stored peak
      (run_experimental.py:215); with ``bwe`` the model is evaluated at the
      original-rate grid and the output rate is the original rate.
    - mdct: reshape (h, w), invert ``out*scale + mean - shift`` then ``exp``
      when takelog (run.py:282-286), ISTMDCT overlap-add.
    - fft: Griffin-Lim phase recovery over the fitted magnitude (the
      reference never wires an FFT-domain decode, utils.py:233-310; here
      the magnitude target decodes to an audible waveform).
    ``encode`` optionally maps raw coords -> features (RFF/posenc), matching
    how the model was trained (run.py:141-144).  ``fit_snr_db`` routes the
    dense evaluation through the quality-gated fused tier (decode_dense).
    """
    d = problem.decode
    if problem.method in ("wave", "multi"):
        if bwe:
            if problem.in_features != 1:
                raise ValueError(
                    "bwe decode needs 1-D (time) coordinates; the "
                    f"'{problem.method}' problem has in_features="
                    f"{problem.in_features} (the reference's BWE grid is "
                    "get_coord(n, 1) too, run.py:131)")
            scale = float(np.max(np.abs(problem.coords[:, 0])))
            coords = bwe_coords(problem, coord_scale=scale)
            rate = problem.original_sample_rate
        else:
            coords = problem.coords
            rate = problem.sample_rate
        if encode is not None:
            coords = np.asarray(encode(jnp.asarray(coords)))
        out = decode_dense(model, params, coords, fit_snr_db=fit_snr_db)
        wav = out.reshape(-1) * d.get("peak", 1.0)
        return wav.astype(np.float32), rate

    coords = problem.coords
    if encode is not None:
        coords = np.asarray(encode(jnp.asarray(coords)))
    out = decode_dense(model, params, coords,
                       fit_snr_db=fit_snr_db).reshape(problem.height,
                                                      problem.width)
    if problem.method == "mdct" and d["kind"] == "mdct_adaptive":
        from ..dsp.adaptive import AdaptivePlan, istmdct_adaptive
        flat = out.reshape(-1) * d["scale"] + d["mean"] - d["shift"]
        if d["takelog"]:
            flat = np.exp(flat)
        banks = {kind: jnp.asarray(
                     flat[start:start + num * bins].reshape(num, bins),
                     dtype=jnp.float32)
                 for kind, (start, num, bins) in d["bank_slices"].items()}
        plan = AdaptivePlan(n_long=d["n_long"], n_short=d["n_short"],
                            kinds=tuple(d["plan_kinds"]),
                            offsets=tuple(d["plan_offsets"]),
                            num_samples=d["num_samples"])
        wav = np.asarray(istmdct_adaptive(banks, plan))
        return wav.astype(np.float32), problem.sample_rate
    if problem.method == "mdct":
        spec = out * d["scale"] + d["mean"] - d["shift"]
        if d["takelog"]:
            # parity note: the reference applies -shift BEFORE exp
            # (run.py:282-286), not the exact inverse of shift->log;
            # reproduced as-is (SURVEY.md C23).
            spec = np.exp(spec)
        wav = np.asarray(istmdct(jnp.asarray(spec, dtype=jnp.float32),
                                 n=d["n"]))
        return wav.astype(np.float32), problem.sample_rate
    if problem.method == "fft":
        from ..data.fittings import hann_window_torch
        from ..dsp.stft import griffin_lim
        n_fft = d["n_fft"]
        window = jnp.asarray(hann_window_torch(n_fft), dtype=jnp.float32)
        wav = griffin_lim(jnp.asarray(out * d["scale"], dtype=jnp.float32),
                          n_fft=n_fft, hop=n_fft // 4, window=window,
                          length=d.get("length"))
        return np.asarray(wav).astype(np.float32), problem.sample_rate
    raise ValueError(f"unknown method {problem.method!r}")
