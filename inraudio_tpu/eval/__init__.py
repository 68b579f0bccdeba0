from .decode import bwe_coords, decode_dense, decode_problem
from .metrics import (calculate_snr, experiment_record,
                      log_spectral_distance, reconstruction_snr,
                      save_parameters, si_snr)

__all__ = [
    "decode_dense", "decode_problem", "bwe_coords",
    "calculate_snr", "reconstruction_snr", "experiment_record",
    "save_parameters", "si_snr", "log_spectral_distance",
]
