"""Fitting-problem builders: (coords, targets, decode contract) for each
representation the framework can fit.

These are the TPU-native re-design of the reference's five Dataset classes
(utils.py:111-414).  A torch ``Dataset`` with ``__len__ == 1`` is just a pair
of arrays, so here each builder is a pure function returning a
``FittingProblem`` — host float32 arrays plus the metadata needed to invert
the normalisation at decode time.  Sharding/device placement is applied by
the training loop, not here.

Builders:
- ``waveform_fitting``            — time-domain target from a wav file
                                     (reference ``WaveformFitting``, utils.py:111-149)
- ``waveform_fitting_from_array`` — time-domain target from an in-memory
                                     signal, coords scaled to [-100, 100] by
                                     default (``WaveformFittingExp``,
                                     utils.py:151-184)
- ``multi_waveform_fitting``      — multichannel 2-D-coordinate target
                                     (``MultiWaveformFitting``, utils.py:186-231)
- ``fft_fitting``                 — STFT-magnitude target
                                     (``FFTFitting``, utils.py:233-310)
- ``mdct_fitting``                — STMDCT-coefficient target with the
                                     shift/log/mean/scale decode contract
                                     (``MDCTFitting``, utils.py:312-414)
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..dsp.filters import hpfilter
from ..dsp.mdct import stmdct
from ..dsp.psycho import hearing_threshold_mask
from ..dsp.stft import stft_magnitude
from ..dsp.windows import hann_window_periodic
from .audio_io import decimate, read_wav
from .coords import get_coord, grid_coords_2d


@dataclasses.dataclass
class FittingProblem:
    """A complete INR fitting target: full-batch coords/targets + decode info."""

    coords: np.ndarray          # (n, d) float32
    targets: np.ndarray         # (n, 1) float32, the normalised fitting target
    sample_rate: int            # rate of the (possibly decimated) target
    original_sample_rate: int   # rate of the source audio
    height: int                 # rows when reshaping the flat target
    width: int                  # cols when reshaping the flat target
    method: str                 # 'wave' | 'multi' | 'fft' | 'mdct'
    decode: dict[str, Any]      # inversion contract (see eval.decode)
    loss_weight: np.ndarray | None = None  # optional (n, 1) per-sample weights

    @property
    def num_samples(self) -> int:
        return self.coords.shape[0]

    @property
    def in_features(self) -> int:
        return self.coords.shape[1]


def waveform_fitting(
    filename: str, duration: float, decimation: int = 1
) -> FittingProblem:
    """Time-domain target: channel 0, truncated to `duration` seconds,
    optionally decimated, peak-normalised to [-1, 1], coords in [-1, 1]."""
    sample_rate, data = read_wav(filename, channel=0)
    data = data[: int(duration * sample_rate)]
    original_sample_rate = sample_rate
    if decimation > 1:
        data = decimate(data, int(decimation))
        sample_rate = sample_rate // int(decimation)
    peak = float(np.max(np.abs(data)))
    targets = (data / peak).astype(np.float32).reshape(-1, 1)
    coords = get_coord(len(data), dim=1)
    return FittingProblem(
        coords=coords,
        targets=targets,
        sample_rate=sample_rate,
        original_sample_rate=original_sample_rate,
        height=len(data),
        width=1,
        method="wave",
        decode={"kind": "wave", "peak": peak},
    )


def waveform_fitting_from_array(
    signal: np.ndarray,
    sample_rate: int,
    decimation: int = 1,
    coord_scale: float = 100.0,
) -> FittingProblem:
    """In-memory time-domain target for band-split / residual experiments.

    Coordinates span [-coord_scale, coord_scale] (the reference hardcodes
    scale=100, utils.py:172 — the wide range trades first-layer omega for
    coordinate extent).  The peak is stored in the decode contract so the
    reconstruction can be de-normalised (run_experimental.py:215).
    """
    data = np.asarray(signal, dtype=np.float32)
    original_sample_rate = sample_rate  # before division: 44100/8 -> 5512
    if decimation > 1:                  # but orig stays 44100, not 44096
        data = decimate(data, int(decimation))
        sample_rate = sample_rate // int(decimation)
    peak = float(np.max(np.abs(data)))
    targets = (data / peak).reshape(-1, 1)
    coords = get_coord(len(data), dim=1, scale=coord_scale)
    return FittingProblem(
        coords=coords,
        targets=targets,
        sample_rate=sample_rate,
        original_sample_rate=original_sample_rate,
        height=len(data),
        width=1,
        method="wave",
        decode={"kind": "wave", "peak": peak},
    )


def multi_waveform_fitting(
    filename: str, duration: float, num_channels: int, lp: bool = False
) -> FittingProblem:
    """Multichannel 2-D-coordinate target: coords = (time in [-1,1],
    channel in [-1,1] or 0), targets = all channels flattened.

    Parity note: like the reference (utils.py:227-230), amplitudes are NOT
    normalised here.
    """
    sample_rate, data = read_wav(filename, channel=None)
    if data.ndim == 1:
        data = data[:, None]
    data = data[: int(duration * sample_rate), :num_channels]
    original_sample_rate = sample_rate
    if lp:
        data = np.column_stack(
            [decimate(data[:, i], 2, ftype="fir") for i in range(num_channels)]
        )
        sample_rate = sample_rate // 2
    height, width = data.shape
    width_range = (0.0, 0.0) if num_channels == 1 else (-1.0, 1.0)
    coords = grid_coords_2d(height, width, width_range=width_range)
    return FittingProblem(
        coords=coords,
        targets=data.reshape(-1, 1).astype(np.float32),
        sample_rate=sample_rate,
        original_sample_rate=original_sample_rate,
        height=height,
        width=width,
        method="multi",
        decode={"kind": "wave", "peak": 1.0},
    )


def fft_fitting(
    filename: str, duration: float, n_fft: int = 1024, highpass: bool = False
) -> FittingProblem:
    """STFT-magnitude target (reference ``FFTFitting``, utils.py:233-310).

    Channel 1 for stereo sources (utils.py:239-240), optional 100 Hz
    highpass, Hann-windowed onesided STFT at hop n_fft//4, magnitudes
    max-normalised; 2-D (freq, time) coords in [-1, 1]^2.
    """
    sample_rate, data = read_wav(filename, channel=1)
    if highpass:
        data = np.asarray(hpfilter(data, 100.0, sample_rate))
    data = data[: int(duration * sample_rate)]
    data = data / np.max(np.abs(data))
    window = jnp.asarray(hann_window_torch(n_fft), dtype=jnp.float32)
    mag = np.asarray(
        stft_magnitude(jnp.asarray(data, dtype=jnp.float32), n_fft=n_fft, hop=n_fft // 4,
                       window=window, center=True)
    )
    scale = float(mag.max())
    mag = mag / scale
    height, width = mag.shape
    coords = grid_coords_2d(height, width)
    return FittingProblem(
        coords=coords,
        targets=mag.reshape(-1, 1).astype(np.float32),
        sample_rate=sample_rate,
        original_sample_rate=sample_rate,
        height=height,
        width=width,
        method="fft",
        decode={"kind": "fft", "scale": scale, "n_fft": n_fft,
                "length": int(len(data))},
    )


def hann_window_torch(n: int) -> np.ndarray:
    """torch.hann_window-compatible window — alias of
    ``dsp.windows.hann_window_periodic`` (one definition of the periodic
    Hann across the repo)."""
    return hann_window_periodic(n)


def mdct_fitting(
    filename: str,
    duration: float,
    n: int = 1024,
    highpass: bool = False,
    takelog: bool = False,
    perceptual_mask: bool = False,
) -> FittingProblem:
    """STMDCT-coefficient target (reference ``MDCTFitting``, utils.py:312-414).

    Channel 1 for stereo, optional 150 Hz highpass, peak-normalise the
    waveform, STMDCT at frame length n; optional shift-then-log compression;
    then mean-subtract and max-abs-normalise.  The decode contract (shift,
    mean, scale, takelog) matches the inversion at reference run.py:282-286:
    ``out * scale + mean - shift`` then ``exp`` when takelog.

    ``perceptual_mask=True`` wires up the hearing-threshold loss attenuation
    the reference drafted but left commented out (utils.py:365-376).
    """
    sample_rate, data = read_wav(filename, channel=1)
    if highpass:
        data = np.asarray(hpfilter(data, 150.0, sample_rate))
    data = data[: int(duration * sample_rate)]
    data = (data / np.max(np.abs(data))).astype(np.float32)
    coeffs = np.asarray(stmdct(jnp.asarray(data), n=n), dtype=np.float32)

    shift = 0.0
    if takelog:
        shift = float(np.abs(coeffs.min())) + 1e-8
        coeffs = np.log(coeffs + shift)
    mean = float(coeffs.mean())
    coeffs = coeffs - mean
    scale = float(np.max(np.abs(coeffs)))
    coeffs = coeffs / scale

    height, width = coeffs.shape
    coords = grid_coords_2d(height, width)
    weight = hearing_threshold_mask(n, sample_rate, width) if perceptual_mask else None
    return FittingProblem(
        coords=coords,
        targets=coeffs.reshape(-1, 1).astype(np.float32),
        sample_rate=sample_rate,
        original_sample_rate=sample_rate,
        height=height,
        width=width,
        method="mdct",
        decode={
            "kind": "mdct",
            "n": n,
            "takelog": takelog,
            "shift": shift,
            "mean": mean,
            "scale": scale,
        },
        loss_weight=weight,
    )
