import jax.numpy as jnp
import numpy as np
import scipy.signal

from inraudio_tpu.dsp import butter_coeffs, filtfilt, hpfilter, lfilter, lpfilter


def _signal(n=4096, sr=44100.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    return (
        np.sin(2 * np.pi * 200 * t) + np.sin(2 * np.pi * 8000 * t) + 0.1 * rng.standard_normal(n)
    ).astype(np.float64)


def test_lfilter_matches_scipy():
    x = _signal()
    b, a = butter_coeffs(5, 1000.0, "lowpass", 44100.0)
    y_ref = scipy.signal.lfilter(b, a, x)
    y = np.asarray(lfilter(b, a, jnp.asarray(x, dtype=jnp.float64)))
    np.testing.assert_allclose(y, y_ref, atol=1e-8)


def test_filtfilt_matches_scipy():
    x = _signal()
    b, a = butter_coeffs(5, 1000.0, "lowpass", 44100.0)
    y_ref = scipy.signal.filtfilt(b, a, x)
    y = np.asarray(filtfilt(b, a, jnp.asarray(x, dtype=jnp.float64)))
    np.testing.assert_allclose(y, y_ref, atol=1e-7)


def test_hpfilter_removes_low_band():
    sr = 44100.0
    t = np.arange(8192) / sr
    low = np.sin(2 * np.pi * 100 * t)
    high = np.sin(2 * np.pi * 10000 * t)
    y = np.asarray(hpfilter(jnp.asarray(low + high, dtype=jnp.float64), 2000.0, sr))
    # High band survives, low band is attenuated.
    corr_high = np.dot(y, high) / np.dot(high, high)
    corr_low = np.dot(y, low) / np.dot(low, low)
    assert corr_high > 0.95
    assert abs(corr_low) < 0.01


def test_lpfilter_removes_high_band():
    sr = 44100.0
    t = np.arange(8192) / sr
    low = np.sin(2 * np.pi * 100 * t)
    high = np.sin(2 * np.pi * 10000 * t)
    y = np.asarray(lpfilter(jnp.asarray(low + high, dtype=jnp.float64), 2000.0, sr))
    corr_low = np.dot(y, low) / np.dot(low, low)
    corr_high = np.dot(y, high) / np.dot(high, high)
    assert corr_low > 0.95
    assert abs(corr_high) < 0.01
