"""Framed STFT on device, torch.stft-compatible layout, MXU-first.

Used by the spectral-magnitude fitting target (reference utils.py:250-254) and
by the STFT loss (reference run.py:128,160 via auraloss).  Matches
``torch.stft(x, n_fft, hop, win_length, window, center=True,
pad_mode='reflect', onesided=True)``: reflect-pad by n_fft//2, frame at
``hop``, window, real DFT; output (n_fft//2 + 1, num_frames) with
``num_frames = 1 + len(x)//hop``.

The DFT is evaluated as two real matmuls against precomputed cos/sin bases
(frames @ [cos | -sin]) instead of an FFT: frame lengths here are <= 2048,
so on TPU the whole transform is one (num_frames, n_fft) x (n_fft, n_fft+2)
MXU matmul — this runtime has no FFT lowering, and for these sizes the MXU
matmul is faster than a vector-unit FFT would be anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _rdft_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """(n_fft, n_fft//2+1) cos and -sin bases of the onesided real DFT."""
    bins = n_fft // 2 + 1
    ns = np.arange(n_fft)[:, None]
    ks = np.arange(bins)[None, :]
    angle = 2.0 * np.pi * ns * ks / n_fft
    return np.cos(angle).astype(np.float32), (-np.sin(angle)).astype(np.float32)


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int, center: bool = True) -> jnp.ndarray:
    """Slice a 1-D signal into overlapping frames -> (num_frames, frame_length)."""
    if center:
        pad = frame_length // 2
        if x.shape[0] <= pad:
            raise ValueError(
                f"signal length {x.shape[0]} too short for reflect padding: "
                f"need > frame_length//2 = {pad} samples (torch.stft "
                f"pad_mode='reflect' has the same requirement)")
        x = jnp.concatenate([x[1 : pad + 1][::-1], x, x[-(pad + 1) : -1][::-1]])
    if x.shape[0] < frame_length:
        raise ValueError(
            f"signal length {x.shape[0]} shorter than frame_length "
            f"{frame_length}; pad the signal or reduce n_fft")
    num_frames = 1 + (x.shape[0] - frame_length) // hop
    starts = np.arange(num_frames) * hop
    idx = starts[:, None] + np.arange(frame_length)[None, :]
    return x[idx]


def stft_real_imag(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop: int | None = None,
    window: jnp.ndarray | None = None,
    center: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Onesided STFT -> (real, imag), each (n_fft//2+1, num_frames)."""
    if hop is None:
        hop = n_fft // 4
    frames = frame_signal(x, n_fft, hop, center=center)
    if window is not None:
        frames = frames * window
    cos_b, msin_b = _rdft_basis(n_fft)
    real = jnp.matmul(frames, jnp.asarray(cos_b), preferred_element_type=jnp.float32, precision="highest")
    imag = jnp.matmul(frames, jnp.asarray(msin_b), preferred_element_type=jnp.float32, precision="highest")
    return real.T, imag.T


def stft(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop: int | None = None,
    window: jnp.ndarray | None = None,
    center: bool = True,
) -> jnp.ndarray:
    """Complex STFT, (n_fft//2+1, num_frames) like torch.stft(onesided)."""
    real, imag = stft_real_imag(x, n_fft=n_fft, hop=hop, window=window, center=center)
    return real + 1j * imag


def istft(
    real: jnp.ndarray,
    imag: jnp.ndarray,
    n_fft: int = 1024,
    hop: int | None = None,
    window: jnp.ndarray | None = None,
    center: bool = True,
    length: int | None = None,
) -> jnp.ndarray:
    """Inverse onesided STFT (torch.istft conventions): per-frame inverse
    real DFT as one MXU matmul, synthesis-windowed overlap-add, normalised
    by the overlapped squared-window envelope, center padding trimmed.

    Divergence from torch.istft: a degenerate squared-window OLA envelope
    (e.g. hop > n_fft leaving gaps) decodes the uncovered samples to ~0 via
    the ``maximum(den, 1e-11)`` clamp instead of raising torch's
    window-envelope error — this function runs inside jitted scans
    (Griffin-Lim) where a data-dependent raise is impossible.

    The inverse rDFT uses the same cos/-sin bases as the forward:
    ``x = ((re * w) @ cos^T + (im * w) @ (-sin)^T) / n_fft`` with the
    onesided bin weight w = 1 at DC/Nyquist, 2 elsewhere.
    """
    if hop is None:
        hop = n_fft // 4
    bins = n_fft // 2 + 1
    cos_b, msin_b = _rdft_basis(n_fft)
    wk = np.full((bins,), 2.0, dtype=np.float32)
    wk[0] = 1.0
    wk[-1] = 1.0
    re_f = real.T * wk  # (num_frames, bins)
    im_f = imag.T * wk
    frames = (
        jnp.matmul(re_f, jnp.asarray(cos_b.T), precision="highest")
        + jnp.matmul(im_f, jnp.asarray(msin_b.T), precision="highest")
    ) / n_fft
    if window is None:
        window = jnp.ones((n_fft,), dtype=jnp.float32)
    frames = frames * window
    num_frames = frames.shape[0]
    total = (num_frames - 1) * hop + n_fft
    idx = (np.arange(num_frames)[:, None] * hop
           + np.arange(n_fft)[None, :]).reshape(-1)
    acc = jnp.zeros((total,), jnp.float32).at[idx].add(frames.reshape(-1))
    den = jnp.zeros((total,), jnp.float32).at[idx].add(
        jnp.broadcast_to(window * window, (num_frames, n_fft)).reshape(-1))
    x = acc / jnp.maximum(den, 1e-11)
    if center:
        x = x[n_fft // 2: total - n_fft // 2]
    if length is not None:
        if length > x.shape[0]:
            # the frame grid covers (num_frames-1)*hop centered samples; a
            # longer request zero-pads the uncovered tail (torch.istft)
            x = jnp.concatenate(
                [x, jnp.zeros((length - x.shape[0],), x.dtype)])
        x = x[:length]
    return x


def griffin_lim(
    magnitude: jnp.ndarray,
    n_fft: int = 1024,
    hop: int | None = None,
    window: jnp.ndarray | None = None,
    center: bool = True,
    length: int | None = None,
    n_iters: int = 60,
    momentum: float = 0.99,
) -> jnp.ndarray:
    """Griffin-Lim phase recovery from a magnitude spectrogram -> waveform.

    Completes the reference's unwired FFT-magnitude fitting capability
    (utils.py:233-310: the dataset exists but no decode ever inverts it).
    Fast-GLA momentum (Perraudin et al. 2013) on top of the classic
    alternating projection; every iteration is two basis matmuls (forward
    + inverse rDFT) — an MXU-only loop under ``lax.scan``, no host sync.
    """
    if hop is None:
        hop = n_fft // 4
    mag = jnp.asarray(magnitude, dtype=jnp.float32)
    if length is None:
        length = (mag.shape[1] - 1) * hop

    def project(re, im):
        """Replace magnitude, keep phase; returns the projected (re, im)."""
        norm = jnp.sqrt(jnp.maximum(re * re + im * im, 1e-16))
        return mag * re / norm, mag * im / norm

    def body(carry, _):
        re, im, pre_re, pre_im = carry
        # accelerated iterate: t + momentum * (t - t_prev)
        a_re = re + momentum * (re - pre_re)
        a_im = im + momentum * (im - pre_im)
        p_re, p_im = project(a_re, a_im)
        x = istft(p_re, p_im, n_fft=n_fft, hop=hop, window=window,
                  center=center, length=length)
        new_re, new_im = stft_real_imag(x, n_fft=n_fft, hop=hop,
                                        window=window, center=center)
        new_re = new_re[:, : mag.shape[1]]
        new_im = new_im[:, : mag.shape[1]]
        return (new_re, new_im, re, im), None

    init = (mag, jnp.zeros_like(mag), mag, jnp.zeros_like(mag))
    (re, im, _, _), _ = jax.lax.scan(body, init, None, length=n_iters)
    p_re, p_im = project(re, im)
    return istft(p_re, p_im, n_fft=n_fft, hop=hop, window=window,
                 center=center, length=length)


def stft_magnitude(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop: int | None = None,
    window: jnp.ndarray | None = None,
    center: bool = True,
    eps: float = 0.0,
) -> jnp.ndarray:
    """Magnitude spectrogram; with eps>0 uses sqrt(clamp(re^2+im^2, eps))
    (the auraloss numerical-safety convention)."""
    real, imag = stft_real_imag(x, n_fft=n_fft, hop=hop, window=window, center=center)
    power = real**2 + imag**2
    if eps > 0.0:
        power = jnp.clip(power, min=eps)
    return jnp.sqrt(power)
