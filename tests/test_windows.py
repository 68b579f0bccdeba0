import numpy as np

from inraudio_tpu.dsp import hann_window, kbd_window, rect_window, sine_window


def test_sine_window_values():
    n = 8
    w = sine_window(n)
    k = np.arange(n)
    np.testing.assert_allclose(w, np.sin(np.pi * (k + 0.5) / n), rtol=1e-12)


def test_hann_window_values():
    n = 16
    w = hann_window(n)
    k = np.arange(n)
    np.testing.assert_allclose(w, 0.5 * (1 - np.cos(2 * np.pi * (k + 0.5) / n)), rtol=1e-12)


def test_kbd_power_complementarity():
    """TDAC requirement: w[k]^2 + w[k+n/2]^2 == 1 across the 50% hop."""
    for n in (256, 1024, 2048):
        w = kbd_window(n)
        half = n // 2
        np.testing.assert_allclose(w[:half] ** 2 + w[half:] ** 2, np.ones(half), atol=1e-12)


def test_kbd_symmetry():
    w = kbd_window(512)
    np.testing.assert_allclose(w, w[::-1], atol=1e-15)


def test_rect_window_scale():
    np.testing.assert_allclose(rect_window(10), 0.2 * np.ones(10))


def test_sine_window_power_complementarity():
    n = 1024
    w = sine_window(n)
    half = n // 2
    np.testing.assert_allclose(w[:half] ** 2 + w[half:] ** 2, np.ones(half), atol=1e-12)


def test_block_switching_lengths_and_tdac():
    """Transition windows splice long/short halves (reference window.py:67-113):
    a long->transition_start->short sequence keeps the Princen-Bradley
    condition at each overlapped hop boundary."""
    from inraudio_tpu.dsp import (long_window, short_window,
                                  transition_start_window,
                                  transition_stop_window)
    n_long, n_short = 1024, 256
    lw = long_window(n_long)
    sw = short_window(n_short)
    start = transition_start_window(n_long, n_short)
    stop = transition_stop_window(n_long, n_short)
    assert len(start) == len(stop) == (n_long + n_short) // 2
    # left half of the start transition == rising half of the long window
    np.testing.assert_allclose(start[: n_long // 2], lw[: n_long // 2])
    # right tail == falling half of the short window
    np.testing.assert_allclose(start[-(n_short // 2):], sw[n_short // 2:])
    # TDAC across the long->transition boundary: the falling long half
    # overlaps the rising half of the NEXT window; for the spliced start
    # transition the rising part is the long KBD half, so power
    # complementarity holds sample-for-sample.
    np.testing.assert_allclose(
        lw[n_long // 2:] ** 2 + start[: n_long // 2] ** 2,
        np.ones(n_long // 2), atol=1e-12)
    # short->stop boundary likewise via the sine halves
    np.testing.assert_allclose(
        sw[n_short // 2:] ** 2 + stop[: n_short // 2] ** 2,
        np.ones(n_short // 2), atol=1e-12)
