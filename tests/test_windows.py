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
