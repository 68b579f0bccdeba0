"""Aux-subsystem tests: JSONL metrics, step timing, loss landscape."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inraudio_tpu.models import SirenSnakeTanhConfig, build_model
from inraudio_tpu.utils import (MetricsLogger, StepTimer, random_plane,
                                read_metrics)


class TestMetricsLogger:
    def test_roundtrip(self):
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "m.jsonl")
            with MetricsLogger(path) as m:
                m.log({"step": 0, "loss": 0.5})
                m.log({"step": 1, "loss": 0.25})
            recs = read_metrics(path)
            assert [r["step"] for r in recs] == [0, 1]
            assert all("t" in r for r in recs)

    def test_append_across_sessions(self):
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "m.jsonl")
            with MetricsLogger(path) as m:
                m.log({"a": 1})
            with MetricsLogger(path) as m:
                m.log({"a": 2})
            assert len(read_metrics(path)) == 2


class TestStepTimer:
    def test_counters(self):
        t = StepTimer(samples_per_step=1000)
        t.tick(10)
        assert t.steps == 10
        assert t.steps_per_sec > 0
        assert t.msamples_per_sec > 0


class TestLandscape:
    def test_random_plane_shape_and_center(self):
        """The plane passes through params at the grid center: with an odd
        step count the central cell equals the unperturbed loss; corners are
        at least as large (they're perturbations of a local optimum-ish
        point)."""
        cfg = SirenSnakeTanhConfig(first_omega_0=30.0, hidden_features=16,
                                   num_sine=1, num_snake=0)
        model = build_model("mlp", cfg)
        params = model.init(jax.random.PRNGKey(0))
        coords = jnp.linspace(-1, 1, 128).reshape(-1, 1)
        targets = jnp.sin(3 * coords)

        def loss_fn(p):
            return jnp.mean((model.apply(p, coords) - targets) ** 2)

        surface = random_plane(loss_fn, params, jax.random.PRNGKey(1),
                               distance=1.0, steps=7)
        assert surface.shape == (7, 7)
        assert np.all(np.isfinite(surface))
        center = surface[3, 3]
        np.testing.assert_allclose(center, float(loss_fn(params)), rtol=1e-5)


class TestPlots:
    """Smoke tests for the artifact plots (reference run.py:323-354,
    utils.py:25-47) — files exist and are non-empty PNGs."""

    @pytest.mark.slow
    def test_all_plot_functions(self, tmp_path):
        from inraudio_tpu.eval.plots import (plot_loss_history,
                                             plot_waveform_comparison,
                                             plotspec, visualizer)
        rng = np.random.default_rng(0)
        sig = rng.standard_normal(4096).astype(np.float32)
        rec = sig + 0.01 * rng.standard_normal(4096).astype(np.float32)
        paths = {
            "spec": str(tmp_path / "spec.png"),
            "vis": str(tmp_path / "vis.png"),
            "loss": str(tmp_path / "loss.png"),
            "wave": str(tmp_path / "wave.png"),
        }
        plotspec(sig, 8000, paths["spec"])
        visualizer(np.abs(rng.standard_normal((64, 40))), paths["vis"])
        plot_loss_history(np.abs(rng.standard_normal(200)) + 1e-4,
                          np.full(200, 1e-3), paths["loss"],
                          title="smoke")
        plot_waveform_comparison(sig, rec, 8000, paths["wave"])
        import os
        for name, p in paths.items():
            assert os.path.exists(p) and os.path.getsize(p) > 1000, name
        # PNG magic bytes
        with open(paths["spec"], "rb") as f:
            assert f.read(8) == b"\x89PNG\r\n\x1a\n"


class TestQualityMetrics:
    """si_snr / log_spectral_distance (beyond-reference eval metrics)."""

    def test_si_snr_scale_invariant(self):
        from inraudio_tpu.eval import si_snr
        rng = np.random.default_rng(0)
        s = rng.standard_normal(4096).astype(np.float32)
        noisy = s + 0.01 * rng.standard_normal(4096).astype(np.float32)
        base = si_snr(s, noisy)
        assert abs(si_snr(s, 3.7 * noisy) - base) < 1e-3   # gain-invariant
        assert si_snr(s, s) > 80                           # exact -> huge
        assert base > 30                                   # ~40 dB noise

    def test_si_snr_tracks_noise_level(self):
        from inraudio_tpu.eval import si_snr
        rng = np.random.default_rng(1)
        s = rng.standard_normal(4096).astype(np.float32)
        n = rng.standard_normal(4096).astype(np.float32)
        quiet = si_snr(s, s + 0.01 * n)
        loud = si_snr(s, s + 0.1 * n)
        assert quiet - loud == pytest.approx(20.0, abs=1.0)  # 10x noise

    def test_lsd_zero_for_identical_and_orders_distortion(self):
        from inraudio_tpu.eval import log_spectral_distance
        fs = 4000
        t = np.arange(2 * fs) / fs
        s = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        assert log_spectral_distance(s, s) < 1e-3
        mild = (s + 0.01 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)
        harsh = (s + 0.3 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)
        d_mild = log_spectral_distance(s, mild)
        d_harsh = log_spectral_distance(s, harsh)
        assert 0 < d_mild < d_harsh
