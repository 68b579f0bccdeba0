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
    # zero-peak guard (silent clip): matches multi_inr's per-chunk floor so
    # the targets stay finite instead of dividing to NaN
    peak = max(float(np.max(np.abs(data))), 1e-9)
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
    peak = max(float(np.max(np.abs(data))), 1e-9)
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
    data = data / max(float(np.max(np.abs(data))), 1e-9)
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
    adaptive: bool = False,
    n_short: int = 256,
    transient_threshold: float = 8.0,
) -> FittingProblem:
    """STMDCT-coefficient target (reference ``MDCTFitting``, utils.py:312-414).

    Channel 1 for stereo, optional 150 Hz highpass, peak-normalise the
    waveform, STMDCT at frame length n; optional shift-then-log compression;
    then mean-subtract and max-abs-normalise.  The decode contract (shift,
    mean, scale, takelog) matches the inversion at reference run.py:282-286:
    ``out * scale + mean - shift`` then ``exp`` when takelog.

    ``perceptual_mask=True`` wires up the hearing-threshold loss attenuation
    the reference drafted but left commented out (utils.py:365-376).

    ``adaptive=True`` switches to the block-switching STMDCT (the window
    quartet the reference drafts at window.py:67-113): transient slots use
    short blocks for pre-echo control.  The ragged per-kind coefficient
    banks become one (n, 2) coordinate problem on a PHYSICAL axis pair —
    frequency = bin center / kind bandwidth, time = frame center / clip
    length, both in [-1, 1] — so long and short frames share one coordinate
    system and a single INR fits both.
    """
    sample_rate, data = read_wav(filename, channel=1)
    if highpass:
        data = np.asarray(hpfilter(data, 150.0, sample_rate))
    data = data[: int(duration * sample_rate)]
    data = (data / max(float(np.max(np.abs(data))), 1e-9)).astype(np.float32)
    if adaptive:
        return _mdct_fitting_adaptive(data, sample_rate, n, n_short,
                                      transient_threshold, takelog)
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


def _mdct_fitting_adaptive(data: np.ndarray, sample_rate: int, n_long: int,
                           n_short: int, threshold: float,
                           takelog: bool) -> FittingProblem:
    """Adaptive (block-switching) STMDCT target: detect transients, plan
    long/start/short/stop frames, transform per-kind banks, flatten to one
    (n, 2) physical-coordinate problem with a bank-slice decode contract."""
    from ..dsp.adaptive import (KINDS, detect_transients, plan_blocks,
                                stmdct_adaptive)
    flags = detect_transients(data, n_long=n_long, n_short=n_short,
                              threshold=threshold)
    plan = plan_blocks(len(data), flags, n_long=n_long, n_short=n_short)
    banks = {k: np.asarray(v, dtype=np.float32)
             for k, v in stmdct_adaptive(jnp.asarray(data), plan).items()}

    coords_blocks, target_blocks = [], []
    bank_slices: dict[str, tuple[int, int, int]] = {}
    pos = 0
    for kind in KINDS:
        if kind not in banks:
            continue
        c = banks[kind]                      # (num_frames, bins)
        num, bins = c.shape
        a, b = plan.halves(kind)
        centers = (np.asarray([o for k, o in zip(plan.kinds, plan.offsets)
                               if k == kind], dtype=np.float64)
                   + (a + b) / 2.0)
        tt = centers / max(plan.num_samples, 1) * 2.0 - 1.0   # time in [-1,1]
        # physical frequency: bin k of an m-bin frame covers the same band
        # regardless of block size, so (k+0.5)/bins is comparable across kinds
        ff = (np.arange(bins, dtype=np.float64) + 0.5) / bins * 2.0 - 1.0
        coords_blocks.append(np.stack(
            [np.tile(ff, num), np.repeat(tt, bins)], axis=1))
        target_blocks.append(c.reshape(-1))
        bank_slices[kind] = (pos, num, bins)
        pos += num * bins

    coords = np.concatenate(coords_blocks).astype(np.float32)
    flat = np.concatenate(target_blocks).astype(np.float32)
    shift = 0.0
    if takelog:
        shift = float(np.abs(flat.min())) + 1e-8
        flat = np.log(flat + shift)
    mean = float(flat.mean())
    flat = flat - mean
    scale = float(np.max(np.abs(flat)))
    flat = flat / scale

    return FittingProblem(
        coords=coords,
        targets=flat.reshape(-1, 1),
        sample_rate=sample_rate,
        original_sample_rate=sample_rate,
        height=len(flat),
        width=1,
        method="mdct",
        decode={
            "kind": "mdct_adaptive",
            "n_long": n_long,
            "n_short": n_short,
            "takelog": takelog,
            "shift": shift,
            "mean": mean,
            "scale": scale,
            "plan_kinds": list(plan.kinds),
            "plan_offsets": list(plan.offsets),
            "num_samples": int(plan.num_samples),
            "bank_slices": {k: list(v) for k, v in bank_slices.items()},
        },
    )
