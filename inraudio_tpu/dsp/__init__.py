from .windows import (sine_window, hann_window, hann_window_periodic,
                      kbd_window, rect_window,
                      long_window, short_window, transition_start_window,
                      transition_stop_window)
from .mdct import mdct, imdct, stmdct, istmdct, num_stmdct_frames
from .adaptive import (AdaptivePlan, detect_transients, plan_blocks,
                       stmdct_adaptive, istmdct_adaptive)
from .snr import calculate_snr
from .filters import butter_coeffs, lfilter, filtfilt, hpfilter, lpfilter
from .stft import (stft_magnitude, frame_signal, stft, stft_real_imag,
                   istft, griffin_lim)
from .psycho import thresh_quiet, intensity, hearing_threshold_mask

__all__ = [
    "sine_window", "hann_window", "hann_window_periodic", "kbd_window",
    "rect_window",
    "long_window", "short_window", "transition_start_window",
    "transition_stop_window",
    "mdct", "imdct", "stmdct", "istmdct", "num_stmdct_frames",
    "AdaptivePlan", "detect_transients", "plan_blocks", "stmdct_adaptive",
    "istmdct_adaptive",
    "calculate_snr",
    "butter_coeffs", "lfilter", "filtfilt", "hpfilter", "lpfilter",
    "stft_magnitude", "frame_signal", "stft", "stft_real_imag", "istft",
    "griffin_lim",
    "thresh_quiet", "intensity", "hearing_threshold_mask",
]
