import jax.numpy as jnp
import numpy as np

from inraudio_tpu.dsp import istmdct, mdct, imdct, num_stmdct_frames, stmdct


def test_stmdct_shapes():
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal(44100), dtype=jnp.float32)
    for n in (1024, 2048):
        coeffs = stmdct(data, n=n)
        assert coeffs.shape == (n // 2, 44100 // (n // 2))
        assert coeffs.shape[1] == num_stmdct_frames(44100, n)


def test_perfect_reconstruction_interior():
    """KBD analysis + MDCT + IMDCT + KBD synthesis + OLA is TDAC: the interior
    (away from the first/last half-frame boundary effects) reconstructs
    exactly up to float32 roundoff."""
    rng = np.random.default_rng(1)
    n = 1024
    length = 16 * (n // 2)
    data = rng.standard_normal(length).astype(np.float32)
    coeffs = stmdct(jnp.asarray(data), n=n)
    rec = np.asarray(istmdct(coeffs, n=n))
    assert rec.shape == (length,)
    half = n // 2
    interior_err = np.max(np.abs(rec[half:-half] - data[half:-half]))
    assert interior_err < 5e-6, interior_err


def test_perfect_reconstruction_sine():
    n = 2048
    sr = 44100
    t = np.arange(8 * (n // 2)) / sr
    data = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    coeffs = stmdct(jnp.asarray(data), n=n)
    rec = np.asarray(istmdct(coeffs, n=n))
    half = n // 2
    err = rec[half:-half] - data[half:-half]
    snr = 10 * np.log10(np.mean(data[half:-half] ** 2) / np.mean(err**2))
    assert snr > 100.0, snr


def test_tail_dropped_like_reference():
    """The reference drops the tail beyond the last full hop (mdct.py:57):
    44,100 samples @ n=2048 -> (1024, 43) coeffs -> 44,032 samples back."""
    data = jnp.asarray(np.random.default_rng(2).standard_normal(44100), dtype=jnp.float32)
    coeffs = stmdct(data, n=2048)
    assert coeffs.shape == (1024, 43)
    rec = istmdct(coeffs, n=2048)
    assert rec.shape == (44032,)


def test_mdct_imdct_roundtrip_single_frame():
    """One windowed frame: IMDCT(MDCT(x)) equals the time-domain alias of x.
    For a frame from TDAC framing the alias cancels in OLA; here just check
    the transform pair is consistent with itself (apply twice)."""
    rng = np.random.default_rng(3)
    n = 256
    frame = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    coeffs = mdct(frame, n // 2, n // 2)
    assert coeffs.shape == (n // 2,)
    alias = imdct(coeffs, n // 2, n // 2)
    coeffs2 = mdct(alias, n // 2, n // 2)
    # MDCT of the aliased signal reproduces the same coefficients (x2 because
    # IMDCT returns the alias of the *windowed* overlap contribution).
    np.testing.assert_allclose(np.asarray(coeffs2), 2 * np.asarray(coeffs), atol=1e-4)


def test_matmul_path_matches_fft_path():
    """The MXU cosine-basis matmul path must agree with the reference FFT
    twiddle factorisation (valid only on backends with an FFT lowering)."""
    rng = np.random.default_rng(7)
    data = jnp.asarray(rng.standard_normal(8192), dtype=jnp.float32)
    for n in (512, 2048):
        a = np.asarray(stmdct(data, n=n, use_fft=False))
        b = np.asarray(stmdct(data, n=n, use_fft=True))
        np.testing.assert_allclose(a, b, atol=3e-5)
        ra = np.asarray(istmdct(jnp.asarray(a), n=n, use_fft=False))
        rb = np.asarray(istmdct(jnp.asarray(b), n=n, use_fft=True))
        np.testing.assert_allclose(ra, rb, atol=3e-5)


def test_stft_matches_numpy_rfft():
    from inraudio_tpu.dsp.stft import stft

    rng = np.random.default_rng(8)
    x = rng.standard_normal(4096).astype(np.float32)
    n_fft, hop = 512, 128
    got = np.asarray(stft(jnp.asarray(x), n_fft=n_fft, hop=hop, center=False))
    frames = np.stack([x[i * hop : i * hop + n_fft] for i in range(1 + (4096 - n_fft) // hop)])
    want = np.fft.rfft(frames, axis=-1).T
    np.testing.assert_allclose(got.real, want.real, atol=2e-3)
    np.testing.assert_allclose(got.imag, want.imag, atol=2e-3)


def test_batched_mdct_matches_loop():
    rng = np.random.default_rng(4)
    frames = jnp.asarray(rng.standard_normal((5, 512)), dtype=jnp.float32)
    batched = mdct(frames, 256, 256)
    for i in range(5):
        single = mdct(frames[i], 256, 256)
        np.testing.assert_allclose(np.asarray(batched[i]), np.asarray(single), atol=1e-6)
