"""Loss-zoo tests: closed-form oracles + torch parity where torch provides
the primitive (auraloss is not installed; its documented formulas are the
oracle for SNR/STFT losses)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from inraudio_tpu.train import (mae, mix_loss, mse, multi_resolution_stft_loss,
                                snr_loss, stft_loss, weighted_mse)

RNG = np.random.default_rng(0)


def _pair(n=4096):
    x = RNG.standard_normal(n).astype(np.float32)
    y = (x + 0.1 * RNG.standard_normal(n)).astype(np.float32)
    return x, y


class TestBasicLosses:
    def test_mse_mae_match_torch(self):
        x, y = _pair()
        np.testing.assert_allclose(
            float(mse(jnp.asarray(x), jnp.asarray(y))),
            float(torch.nn.MSELoss()(torch.tensor(x), torch.tensor(y))),
            rtol=1e-5)
        np.testing.assert_allclose(
            float(mae(jnp.asarray(x), jnp.asarray(y))),
            float(torch.nn.L1Loss()(torch.tensor(x), torch.tensor(y))),
            rtol=1e-5)

    def test_weighted_mse(self):
        x, y = _pair(16)
        w = np.ones((16,), dtype=np.float32)
        np.testing.assert_allclose(
            float(weighted_mse(jnp.asarray(x), jnp.asarray(y), jnp.asarray(w))),
            float(mse(jnp.asarray(x), jnp.asarray(y))), rtol=1e-6)
        # zero weights kill the loss
        assert float(weighted_mse(jnp.asarray(x), jnp.asarray(y),
                                  jnp.zeros(16))) == 0.0


class TestSNRLoss:
    def test_known_snr(self):
        # signal + noise at exactly -20 dB -> SNR 20 dB -> loss ~ -20
        n = 1 << 16
        sig = np.sin(2 * np.pi * 440 * np.arange(n) / 44100).astype(np.float32)
        noise = RNG.standard_normal(n).astype(np.float32)
        noise *= np.sqrt(np.sum(sig**2) / np.sum(noise**2)) * 0.1
        loss = float(snr_loss(jnp.asarray(sig + noise), jnp.asarray(sig)))
        np.testing.assert_allclose(loss, -20.0, atol=0.1)

    def test_perfect_reconstruction_is_very_negative(self):
        x = jnp.asarray(RNG.standard_normal(1024).astype(np.float32))
        assert float(snr_loss(x, x)) < -100


class TestSTFTLoss:
    def test_zero_for_identical(self):
        x, _ = _pair(8192)
        assert float(stft_loss(jnp.asarray(x), jnp.asarray(x))) < 1e-5

    def test_positive_and_decreasing_with_similarity(self):
        x, _ = _pair(8192)
        y_close = x + 0.01 * RNG.standard_normal(8192).astype(np.float32)
        y_far = x + 1.0 * RNG.standard_normal(8192).astype(np.float32)
        lc = float(stft_loss(jnp.asarray(y_close), jnp.asarray(x)))
        lf = float(stft_loss(jnp.asarray(y_far), jnp.asarray(x)))
        assert 0 < lc < lf

    def test_spectral_convergence_oracle(self):
        # with only the SC term, scaling the prediction by 0 gives SC = 1
        x, _ = _pair(4096)
        loss = float(stft_loss(jnp.zeros(4096), jnp.asarray(x),
                               w_sc=1.0, w_log_mag=0.0))
        np.testing.assert_allclose(loss, 1.0, atol=1e-4)

    @pytest.mark.slow
    def test_multi_resolution_mean(self):
        x, y = _pair(8192)
        mr = float(multi_resolution_stft_loss(jnp.asarray(y), jnp.asarray(x)))
        singles = [float(stft_loss(jnp.asarray(y), jnp.asarray(x), n_fft=n,
                                   hop=h, win_length=w))
                   for n, h, w in ((1024, 120, 600), (2048, 240, 1200),
                                   (512, 50, 240))]
        np.testing.assert_allclose(mr, np.mean(singles), rtol=1e-5)

    def test_gradient_flows(self):
        import jax
        x, y = _pair(4096)
        g = jax.grad(lambda p: stft_loss(p, jnp.asarray(y)))(jnp.asarray(x))
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.linalg.norm(g)) > 0


class TestMixLoss:
    def test_alpha_zero_is_base(self):
        x, y = _pair(4096)
        np.testing.assert_allclose(
            float(mix_loss(jnp.asarray(y), jnp.asarray(x), "mse", alpha=0.0)),
            float(mse(jnp.asarray(y), jnp.asarray(x))), rtol=1e-6)

    def test_alpha_mixes(self):
        # run.py:161-169: loss = (1-a)*base + a*stft
        x, y = _pair(4096)
        a = 0.3
        expected = ((1 - a) * float(mae(jnp.asarray(y), jnp.asarray(x)))
                    + a * float(stft_loss(jnp.asarray(y), jnp.asarray(x))))
        np.testing.assert_allclose(
            float(mix_loss(jnp.asarray(y), jnp.asarray(x), "mae", alpha=a)),
            expected, rtol=1e-5)


class TestWeightInAllModes:
    """Padding-mask regression: every loss mode must ignore zero-weight rows
    (mix_loss used to drop the weight for 'mae' and 'snr')."""

    def _padded(self):
        rng = np.random.default_rng(0)
        pred = rng.standard_normal((20, 1)).astype(np.float32)
        tgt = rng.standard_normal((20, 1)).astype(np.float32)
        # rows 16..19 are padding garbage; mask normalised to mean 1
        pred_p = np.concatenate([pred, np.full((4, 1), 3.0, np.float32)])
        tgt_p = np.concatenate([tgt, np.zeros((4, 1), np.float32)])
        w = np.zeros((24, 1), np.float32)
        w[:20] = 24.0 / 20.0
        return pred, tgt, pred_p, tgt_p, w

    @pytest.mark.parametrize("mode", ["mse", "mae", "snr"])
    def test_mask_recovers_unpadded_loss(self, mode):
        from inraudio_tpu.train.losses import mix_loss
        pred, tgt, pred_p, tgt_p, w = self._padded()
        clean = float(mix_loss(jnp.asarray(pred), jnp.asarray(tgt),
                               loss_mode=mode))
        masked = float(mix_loss(jnp.asarray(pred_p), jnp.asarray(tgt_p),
                                loss_mode=mode, weight=jnp.asarray(w)))
        np.testing.assert_allclose(masked, clean, rtol=2e-5)

    def test_stft_term_masks_padding(self):
        """With alpha > 0 the spectral term must see zeros on pad rows:
        garbage pred values there would otherwise add spectral error."""
        from inraudio_tpu.train.losses import mix_loss
        rng = np.random.default_rng(1)
        n, pad = 4096, 512
        tgt = rng.standard_normal((n, 1)).astype(np.float32)
        pred = tgt + 0.01 * rng.standard_normal((n, 1)).astype(np.float32)
        pred_p = np.concatenate([pred, np.full((pad, 1), 3.0, np.float32)])
        tgt_p = np.concatenate([tgt, np.zeros((pad, 1), np.float32)])
        w = np.zeros((n + pad, 1), np.float32)
        w[:n] = (n + pad) / n
        dirty = float(mix_loss(jnp.asarray(pred_p), jnp.asarray(tgt_p),
                               loss_mode="mse", alpha=0.5))
        masked = float(mix_loss(jnp.asarray(pred_p), jnp.asarray(tgt_p),
                                loss_mode="mse", alpha=0.5,
                                weight=jnp.asarray(w)))
        assert np.isfinite(masked) and masked < dirty
