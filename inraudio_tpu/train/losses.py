"""Loss zoo: MSE / MAE / SNR / STFT (+ multi-resolution), and the alpha-mix.

TPU-native re-implementation of the reference's loss surface (run.py:122-128,
160-169), which it takes from torch.nn and the ``auraloss`` package:

- ``mse`` / ``mae``                — nn.MSELoss / nn.L1Loss
- ``snr_loss``                     — auraloss.time.SNRLoss: negative
                                     10*log10(target energy / residual energy)
- ``stft_loss``                    — auraloss.freq.STFTLoss with its default
                                     weights: spectral-convergence + log-
                                     magnitude L1 (run.py:128)
- ``multi_resolution_stft_loss``   — auraloss.freq.MultiResolutionSTFTLoss
                                     (commented out in the reference at
                                     run.py:127 but part of the surface)
- ``mix_loss``                     — ``(1-alpha)*base + alpha*stft``
                                     (run.py:161-169)

All spectral terms ride the matmul-DFT in ``dsp.stft`` — on TPU each
resolution is one MXU matmul over all frames, fused with the elementwise
magnitude/log by XLA.  Everything here is pure and jit/grad-safe.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..dsp.stft import stft_magnitude
from ..dsp.windows import hann_window_periodic

EPS = 1e-8


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(pred - target))


def mae(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def weighted_mse(pred, target, weight=None) -> jnp.ndarray:
    """MSE with optional per-sample weights — carries the psychoacoustic
    hearing-threshold mask the reference drafted (utils.py:365-376)."""
    sq = jnp.square(pred - target)
    if weight is None:
        return jnp.mean(sq)
    return jnp.mean(sq * weight)


def snr_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """auraloss.time.SNRLoss semantics: -10*log10(||y||^2 / ||y-x||^2).

    Lower is better; minimising this maximises reconstruction SNR, the
    repo's headline metric (utils.py:77-97).
    """
    res_energy = jnp.sum(jnp.square(target - pred))
    tgt_energy = jnp.sum(jnp.square(target))
    return -10.0 * jnp.log10(tgt_energy / (res_energy + EPS) + EPS)


def _padded_window(n_fft: int, win_length: int) -> jnp.ndarray:
    w = hann_window_periodic(win_length)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        w = np.pad(w, (pad, n_fft - win_length - pad))
    return jnp.asarray(w)


def stft_loss(pred: jnp.ndarray, target: jnp.ndarray, n_fft: int = 1024,
              hop: int = 256, win_length: int = 1024,
              w_sc: float = 1.0, w_log_mag: float = 1.0,
              w_lin_mag: float = 0.0) -> jnp.ndarray:
    """Single-resolution STFT loss, auraloss.freq.STFTLoss defaults
    (run.py:128): spectral convergence ||Y-X||_F/||Y||_F plus L1 of log
    magnitudes, on flattened 1-D signals."""
    x = stft_magnitude(pred.reshape(-1), n_fft=n_fft, hop=hop,
                       window=_padded_window(n_fft, win_length), eps=EPS)
    y = stft_magnitude(target.reshape(-1), n_fft=n_fft, hop=hop,
                       window=_padded_window(n_fft, win_length), eps=EPS)
    sc = jnp.linalg.norm(y - x) / (jnp.linalg.norm(y) + EPS)
    log_mag = jnp.mean(jnp.abs(jnp.log(y + EPS) - jnp.log(x + EPS)))
    loss = w_sc * sc + w_log_mag * log_mag
    if w_lin_mag:
        loss = loss + w_lin_mag * jnp.mean(jnp.abs(y - x))
    return loss


# auraloss MultiResolutionSTFTLoss defaults: fft [1024, 2048, 512],
# hop [120, 240, 50], win [600, 1200, 240].
MRSTFT_RESOLUTIONS = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


def multi_resolution_stft_loss(
    pred: jnp.ndarray, target: jnp.ndarray,
    resolutions=MRSTFT_RESOLUTIONS) -> jnp.ndarray:
    """Mean of stft_loss over several (n_fft, hop, win_length) resolutions
    (the reference's commented-out variant, run.py:127)."""
    total = jnp.float32(0.0)
    for n_fft, hop, win in resolutions:
        total = total + stft_loss(pred, target, n_fft=n_fft, hop=hop,
                                  win_length=win)
    return total / len(resolutions)


BASE_LOSSES = {"mse": mse, "mae": mae, "snr": snr_loss}


def mix_loss(pred: jnp.ndarray, target: jnp.ndarray, loss_mode: str = "mse",
             alpha: float = 0.0, weight: jnp.ndarray | None = None,
             multi_resolution: bool = False) -> jnp.ndarray:
    """``(1-alpha)*{mse|mae|snr} + alpha*stft`` (run.py:161-169).

    Unlike the reference — which evaluates the STFT loss every step even at
    alpha=0 (run.py:160) — the spectral term is gated on alpha here; the
    result is identical and the alpha=0 path saves the whole STFT.

    ``weight`` carries both the psychoacoustic mask (utils.py:365-376) and
    the zero-weight padding mask from ``shard_problem_arrays`` (already
    normalised to mean 1 over real rows) — EVERY loss mode must honor it,
    or padded rows poison the reduction: mse/mae scale per-sample terms,
    snr masks both energies (the mask's mean-1 scale cancels in the ratio),
    and the spectral term zeroes both signals on the mask's dead support.
    """
    if weight is not None:
        w = jnp.reshape(weight, (-1,) + (1,) * (pred.ndim - 1))
        if loss_mode == "mse":
            base = jnp.mean(jnp.square(pred - target) * w)
        elif loss_mode == "mae":
            base = jnp.mean(jnp.abs(pred - target) * w)
        elif loss_mode == "snr":
            res = jnp.sum(jnp.square(target - pred) * w)
            tgt = jnp.sum(jnp.square(target) * w)
            base = -10.0 * jnp.log10(tgt / (res + EPS) + EPS)
        else:
            raise KeyError(loss_mode)
    else:
        base = BASE_LOSSES[loss_mode](pred, target)
    if alpha == 0.0:
        return base
    if weight is not None:
        live = (w > 0).astype(pred.dtype)
        pred = pred * live
        target = target * live
    spec = (multi_resolution_stft_loss(pred, target) if multi_resolution
            else stft_loss(pred, target))
    return (1.0 - alpha) * base + alpha * spec
