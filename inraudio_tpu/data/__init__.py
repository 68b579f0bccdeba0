from .coords import get_coord
from .audio_io import read_wav, write_wav, decimate
from .fittings import (
    FittingProblem,
    waveform_fitting,
    waveform_fitting_from_array,
    multi_waveform_fitting,
    fft_fitting,
    mdct_fitting,
)

__all__ = [
    "get_coord", "read_wav", "write_wav", "decimate",
    "FittingProblem", "waveform_fitting", "waveform_fitting_from_array",
    "multi_waveform_fitting", "fft_fitting", "mdct_fitting",
]
