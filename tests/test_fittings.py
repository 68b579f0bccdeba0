import numpy as np
import pytest

from inraudio_tpu.data import (
    fft_fitting,
    mdct_fitting,
    waveform_fitting,
    waveform_fitting_from_array,
)
from tests.conftest import REFERENCE_WAV


def test_waveform_fitting_gt_bach():
    p = waveform_fitting(REFERENCE_WAV, duration=2)
    assert p.sample_rate == 44100
    assert p.num_samples == 2 * 44100
    assert p.coords.shape == (p.num_samples, 1)
    assert p.targets.shape == (p.num_samples, 1)
    assert np.max(np.abs(p.targets)) == pytest.approx(1.0)
    assert p.coords[0, 0] == -1.0 and p.coords[-1, 0] == 1.0


def test_waveform_fitting_decimation():
    p = waveform_fitting(REFERENCE_WAV, duration=2, decimation=4)
    assert p.sample_rate == 44100 // 4
    assert p.original_sample_rate == 44100
    assert p.num_samples == (2 * 44100 + 3) // 4  # scipy.decimate ceil semantics


def test_waveform_fitting_from_array_scale_and_peak():
    sr = 8000
    t = np.arange(sr) / sr
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = waveform_fitting_from_array(sig, sr)
    assert p.coords[0, 0] == -100.0 and p.coords[-1, 0] == 100.0
    assert p.decode["peak"] == pytest.approx(0.5, rel=1e-4)
    assert np.max(np.abs(p.targets)) == pytest.approx(1.0)


def test_mdct_fitting_decode_contract():
    p = mdct_fitting(REFERENCE_WAV, duration=2, n=2048)
    half = 1024
    frames = (2 * 44100) // half
    assert (p.height, p.width) == (half, frames)
    assert p.targets.shape == (half * frames, 1)
    assert np.max(np.abs(p.targets)) == pytest.approx(1.0, rel=1e-5)
    # decode contract inverts the normalisation exactly
    rec = p.targets.reshape(p.height, p.width) * p.decode["scale"] + p.decode["mean"]
    assert rec.shape == (half, frames)


def test_mdct_fitting_log_mode():
    p = mdct_fitting(REFERENCE_WAV, duration=1, n=1024, takelog=True)
    assert p.decode["takelog"] is True
    assert p.decode["shift"] > 0.0
    assert np.isfinite(p.targets).all()


def test_mdct_fitting_perceptual_mask():
    p = mdct_fitting(REFERENCE_WAV, duration=1, n=1024, perceptual_mask=True)
    assert p.loss_weight is not None
    assert p.loss_weight.shape == p.targets.shape
    assert p.loss_weight.min() >= 0.8 and p.loss_weight.max() <= 1.0


def test_fft_fitting_shapes():
    p = fft_fitting(REFERENCE_WAV, duration=1, n_fft=1024)
    assert p.height == 513  # onesided bins
    assert p.width == 1 + 44100 // 256  # center=True frame count at hop n_fft//4
    assert p.targets.max() == pytest.approx(1.0)
    assert p.targets.min() >= 0.0


def test_from_array_original_rate_not_truncated():
    """44100/8 decimation: sample_rate 5512 but original must stay 44100
    (regression: it was reconstructed as 5512*8 = 44096)."""
    from inraudio_tpu.data.fittings import waveform_fitting_from_array
    sig = np.sin(np.linspace(0, 100, 44100, dtype=np.float32))
    p = waveform_fitting_from_array(sig, 44100, decimation=8)
    assert p.sample_rate == 5512
    assert p.original_sample_rate == 44100


def test_silent_input_yields_finite_targets():
    # zero-peak guard: a silent clip must not divide to NaN (VERDICT r2 #8)
    sig = np.zeros(4096, dtype=np.float32)
    p = waveform_fitting_from_array(sig, 8000)
    assert np.all(np.isfinite(p.targets))
    assert np.all(p.targets == 0.0)


def test_mdct_adaptive_decode_contract_roundtrip(tmp_path):
    # click train: the pre-echo case that motivates block switching.
    # Build the adaptive target, invert the decode contract on the TARGETS
    # themselves (perfect-fit model), and require near-perfect reconstruction
    # across the long->short->long switches.
    import jax.numpy as jnp
    from scipy.io import wavfile
    from inraudio_tpu.data.fittings import FittingProblem
    from inraudio_tpu.eval.decode import decode_problem

    sr = 44100
    rng = np.random.default_rng(0)
    sig = 0.01 * rng.standard_normal(sr).astype(np.float32)
    for p0 in (5000, 20000, 35000):
        sig[p0:p0 + 40] += 0.8
    f = tmp_path / "clicks.wav"
    wavfile.write(str(f), sr, sig)

    prob = mdct_fitting(str(f), duration=1.0, n=2048, adaptive=True)
    assert prob.decode["kind"] == "mdct_adaptive"
    kinds = prob.decode["plan_kinds"]
    assert "short" in kinds and "start" in kinds and "stop" in kinds

    class _Perfect:
        def apply(self, params, coords):
            return jnp.asarray(prob.targets)

    wav, rate = decode_problem(_Perfect(), None, prob)
    assert rate == sr
    ref = sig / np.max(np.abs(sig))
    m = min(len(wav), len(ref))
    err = ref[1024:m - 1024] - wav[1024:m - 1024]
    snr = 10 * np.log10(np.sum(ref[1024:m - 1024] ** 2) / np.sum(err ** 2))
    assert snr > 100.0
