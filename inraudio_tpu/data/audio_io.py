"""Host-side audio I/O and resampling.

The host's only jobs in this framework are wav read/write and filter design —
everything else runs on device.  ``decimate`` matches
``scipy.signal.decimate``'s defaults (order-8 Chebyshev-I IIR, zero-phase),
which is what the reference uses for its decimation curricula
(utils.py:121-124, run.py:486-495).
"""

from __future__ import annotations

import numpy as np
import scipy.io.wavfile as wavfile
import scipy.signal


def read_wav(path: str, channel: int | None = None) -> tuple[int, np.ndarray]:
    """Read a wav file -> (sample_rate, float32 data).

    channel=None keeps all channels; an int selects one channel of a
    multichannel file (the reference picks channel 0 for waveform fitting,
    utils.py:113-115, and channel 1 for spectral fitting, utils.py:318-319).
    Integer PCM is kept at its raw scale (reference behaviour — normalisation
    happens in the fitting builders, not here).
    """
    sample_rate, data = wavfile.read(path)
    if data.ndim > 1 and channel is not None:
        data = data[:, channel]
    return sample_rate, data.astype(np.float32)


def write_wav(path: str, sample_rate: int, data: np.ndarray) -> None:
    wavfile.write(path, sample_rate, np.asarray(data, dtype=np.float32))


def decimate(data: np.ndarray, q: int, ftype: str = "iir", zero_phase: bool = True) -> np.ndarray:
    """Anti-aliased downsampling by integer factor q (scipy-compatible)."""
    if q <= 1:
        return data
    return scipy.signal.decimate(data, q=int(q), ftype=ftype, zero_phase=zero_phase).astype(
        np.float32
    )
