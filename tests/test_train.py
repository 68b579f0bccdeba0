"""Training-engine tests: fast sine-fit integration (SURVEY.md section 4
item 3), checkpoint round-trip, best-params semantics, and the 8-fake-device
sharding equivalence golden test (item 5)."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inraudio_tpu.data import get_coord, waveform_fitting_from_array
from inraudio_tpu.dsp import calculate_snr
from inraudio_tpu.eval import decode_problem, reconstruction_snr
from inraudio_tpu.models import SirenSnakeTanhConfig, build_model
from inraudio_tpu.parallel import make_mesh
from inraudio_tpu.train import (TrainConfig, fit, init_train_state,
                                load_checkpoint, save_checkpoint)

KEY = jax.random.PRNGKey(42)
FS = 44100


def _sine_problem(freq=440.0, duration=0.1, coord_scale=1.0):
    n = int(duration * FS)
    t = np.arange(n) / FS
    sig = np.sin(2 * np.pi * freq * t).astype(np.float32)
    coords = get_coord(n, dim=1, scale=coord_scale)
    return coords, sig.reshape(-1, 1), sig


SMALL = SirenSnakeTanhConfig(first_omega_0=300.0, hidden_features=64,
                             num_sine=1, num_snake=1)


def _mesh1():
    return make_mesh(jax.devices()[:1])


class TestFitIntegration:
    def test_sine_fit_reaches_snr(self):
        """The repo's implicit smoke test (run_experimental.py:381-402):
        a 440 Hz sine must fit to high SNR in a few hundred steps."""
        coords, targets, sig = _sine_problem()
        model = build_model("mlp", SMALL)
        res = fit(model, coords, targets,
                  TrainConfig(total_steps=500, learning_rate=1e-3), key=KEY,
                  mesh=_mesh1())
        out = np.asarray(model.apply(res.params, jnp.asarray(coords)))
        snr = float(calculate_snr(sig, out.reshape(-1)))
        assert snr > 25, f"sine fit SNR {snr:.1f} dB"
        # loss history is per-step and decreasing overall
        assert res.loss_history.shape == (500,)
        assert res.loss_history.min() < res.loss_history[:20].mean() / 100

    def test_best_params_at_least_as_good_as_final(self):
        coords, targets, _ = _sine_problem()
        model = build_model("mlp", SMALL)
        res = fit(model, coords, targets, TrainConfig(total_steps=300),
                  key=KEY, mesh=_mesh1())
        c, t = jnp.asarray(coords), jnp.asarray(targets)
        best_mse = float(jnp.mean((model.apply(res.params, c) - t) ** 2))
        assert best_mse <= res.loss_history.min() * 1.05
        assert res.best_iter <= 300
        np.testing.assert_allclose(res.best_loss, res.loss_history.min(),
                                   rtol=1e-6)

    def test_track_best_false_uses_final(self):
        coords, targets, _ = _sine_problem()
        model = build_model("mlp", SMALL)
        res = fit(model, coords, targets,
                  TrainConfig(total_steps=100, track_best=False), key=KEY,
                  mesh=_mesh1())
        for a, b in zip(jax.tree.leaves(res.params),
                        jax.tree.leaves(res.final_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_plateau_lr_decays_on_hard_problem(self):
        # unfittable noise at tiny capacity -> plateau -> lr must drop
        rng = np.random.default_rng(0)
        coords = get_coord(2048, dim=1)
        targets = rng.standard_normal((2048, 1)).astype(np.float32)
        model = build_model("mlp", SirenSnakeTanhConfig(
            first_omega_0=30.0, hidden_features=8, num_sine=0, num_snake=0))
        res = fit(model, coords, targets,
                  TrainConfig(total_steps=600, plateau_patience=50), key=KEY,
                  mesh=_mesh1())
        assert res.lr_history[-1] < 1e-3


class TestCheckpoint:
    def test_roundtrip_exact(self):
        coords, targets, _ = _sine_problem()
        model = build_model("mlp", SMALL)
        cfg = TrainConfig(total_steps=50)
        res = fit(model, coords, targets, cfg, key=KEY, mesh=_mesh1())
        with tempfile.TemporaryDirectory() as d:
            path = save_checkpoint(os.path.join(d, "ckpt"), res.state,
                                   extra={"arch": "mlp"})
            template = init_train_state(model, KEY, cfg)
            restored = load_checkpoint(path, template)
        for a, b in zip(jax.tree.leaves(jax.device_get(res.state)),
                        jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_warm_start_continues_improving(self):
        """Procedural-curriculum resume (run.py:486-495): phase 2 starts from
        phase 1's state and keeps improving."""
        coords, targets, _ = _sine_problem()
        model = build_model("mlp", SMALL)
        cfg = TrainConfig(total_steps=200)
        res1 = fit(model, coords, targets, cfg, key=KEY, mesh=_mesh1())
        with tempfile.TemporaryDirectory() as d:
            path = save_checkpoint(os.path.join(d, "c"), res1.state)
            template = init_train_state(model, KEY, cfg)
            state = load_checkpoint(path, template)
        res2 = fit(model, coords, targets, cfg, key=KEY, state=state,
                   mesh=_mesh1())
        assert res2.loss_history[-1] < res1.loss_history[-1] * 1.1
        assert res2.best_loss <= res1.best_loss * 1.001

    def test_arch_mismatch_rejected(self):
        coords, targets, _ = _sine_problem()
        model = build_model("mlp", SMALL)
        cfg = TrainConfig(total_steps=5)
        res = fit(model, coords, targets, cfg, key=KEY, mesh=_mesh1())
        other = build_model("mlp", SirenSnakeTanhConfig(hidden_features=32))
        with tempfile.TemporaryDirectory() as d:
            path = save_checkpoint(os.path.join(d, "c"), res.state)
            template = init_train_state(other, KEY, cfg)
            import pytest
            with pytest.raises(ValueError):
                load_checkpoint(path, template)


def test_fit_accepts_1d_weight():
    """The public fit(weight=...) surface takes (n,) as well as (n, 1)."""
    coords, targets, _ = _sine_problem(duration=0.02)
    model = build_model("mlp", SMALL)
    cfg = TrainConfig(total_steps=10, scan_chunk=5)
    w1 = np.ones(len(coords), dtype=np.float32)
    res1 = fit(model, coords, targets, cfg, key=KEY, weight=w1,
               mesh=_mesh1())
    res2 = fit(model, coords, targets, cfg, key=KEY,
               weight=w1.reshape(-1, 1), mesh=_mesh1())
    assert np.isfinite(res1.loss_history).all()
    np.testing.assert_allclose(res1.loss_history, res2.loss_history)


class TestShardingEquivalence:
    def test_8_device_fit_matches_1_device(self):
        """Coordinate-sharded DP over 8 fake CPU devices must reproduce the
        single-device fit (same init, same data) to float32 reduction
        tolerance (SURVEY.md section 4, item 5)."""
        assert jax.device_count() >= 8, "conftest should provide 8 cpu devices"
        coords, targets, _ = _sine_problem(duration=0.05)
        model = build_model("mlp", SMALL)
        cfg = TrainConfig(total_steps=120, scan_chunk=30)
        res1 = fit(model, coords, targets, cfg, key=KEY,
                   mesh=make_mesh(jax.devices()[:1]))
        res8 = fit(model, coords, targets, cfg, key=KEY,
                   mesh=make_mesh(jax.devices()[:8]))
        # step 1 has zero accumulated divergence: a missing psum or wrong
        # weighting shows up as a large relative error, so the bound is
        # tight (reduction-order noise alone is ~1e-7)
        np.testing.assert_allclose(res8.loss_history[0],
                                   res1.loss_history[0], rtol=1e-5)
        # early steps are wiring-sensitive; later steps only to within the
        # chaos amplification of float reduction-order noise
        np.testing.assert_allclose(res8.loss_history[:10],
                                   res1.loss_history[:10], rtol=1e-2)
        np.testing.assert_allclose(np.log10(res8.loss_history),
                                   np.log10(res1.loss_history), atol=0.7)
        assert res1.loss_history[-1] < 1e-3
        assert res8.loss_history[-1] < 1e-3

    def test_non_divisible_batch_is_padded_correctly(self):
        """4411 rows on 8 devices: padding must not change the loss (weights
        zero the pad rows and renormalise)."""
        coords, targets, _ = _sine_problem(duration=0.1)
        coords, targets = coords[:4411], targets[:4411]
        model = build_model("mlp", SMALL)
        cfg = TrainConfig(total_steps=60, scan_chunk=30)
        res1 = fit(model, coords, targets, cfg, key=KEY,
                   mesh=make_mesh(jax.devices()[:1]))
        res8 = fit(model, coords, targets, cfg, key=KEY,
                   mesh=make_mesh(jax.devices()[:8]))
        np.testing.assert_allclose(res8.loss_history[0],
                                   res1.loss_history[0], rtol=1e-5)
        np.testing.assert_allclose(res8.loss_history[:10],
                                   res1.loss_history[:10], rtol=1e-2)
        np.testing.assert_allclose(np.log10(res8.loss_history),
                                   np.log10(res1.loss_history), atol=0.7)


class TestDecode:
    def test_wave_decode_roundtrip(self):
        _, _, sig = _sine_problem(duration=0.05)
        problem = waveform_fitting_from_array(0.5 * sig, FS, coord_scale=1.0)
        model = build_model("mlp", SMALL)
        res = fit(model, problem.coords, problem.targets,
                  TrainConfig(total_steps=300), key=KEY, mesh=_mesh1())
        wav, rate = decode_problem(model, res.params, problem)
        assert rate == FS
        assert wav.shape == (len(sig),)
        # de-normalisation restores the 0.5 peak scale
        snr = reconstruction_snr(0.5 * sig, wav)
        assert snr > 25, snr

    def test_bwe_decode_grid(self):
        _, _, sig = _sine_problem(duration=0.05)
        problem = waveform_fitting_from_array(sig, FS, decimation=2,
                                              coord_scale=1.0)
        model = build_model("mlp", SMALL)
        res = fit(model, problem.coords, problem.targets,
                  TrainConfig(total_steps=50), key=KEY, mesh=_mesh1())
        wav, rate = decode_problem(model, res.params, problem, bwe=True)
        assert rate == FS
        # BWE decodes at the full original-rate grid length
        duration = problem.height / problem.sample_rate
        assert wav.shape == (int(FS * duration),)


def test_bwe_rejects_2d_problems():
    """BWE needs a 1-D time grid (reference run.py:131); 2-D 'multi'
    problems must fail loudly, not crash in the matmul."""
    from inraudio_tpu.data.fittings import FittingProblem
    from inraudio_tpu.eval.decode import decode_problem
    from inraudio_tpu.models import SirenSnakeTanhConfig, build_model
    prob = FittingProblem(
        coords=np.zeros((16, 2), np.float32),
        targets=np.zeros((16, 1), np.float32), sample_rate=100,
        original_sample_rate=200, height=4, width=4, method="multi",
        decode={"kind": "wave", "peak": 1.0})
    model = build_model("mlp", SirenSnakeTanhConfig(
        in_features=2, hidden_features=8, num_sine=0, num_snake=0,
        first_omega_0=30.0))
    params = model.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="1-D"):
        decode_problem(model, params, prob, bwe=True)


def test_periodic_checkpointing(tmp_path):
    """fit(checkpoint_every=...) writes a resumable mid-run TrainState."""
    from inraudio_tpu.train.checkpoint import checkpoint_extra, load_checkpoint
    from inraudio_tpu.train.loop import TrainConfig, fit, init_train_state
    from inraudio_tpu.models import SirenSnakeTanhConfig, build_model
    from inraudio_tpu.parallel import make_mesh
    model = build_model("mlp", SirenSnakeTanhConfig(
        first_omega_0=100.0, hidden_features=16, num_sine=1, num_snake=0))
    coords = get_coord(256, dim=1)
    targets = np.sin(5.0 * coords).astype(np.float32)
    path = str(tmp_path / "mid.npz")
    cfg = TrainConfig(total_steps=120, scan_chunk=40)
    fit(model, coords, targets, cfg, key=jax.random.PRNGKey(0),
        mesh=make_mesh(jax.devices()[:1]),
        checkpoint_every=40, checkpoint_path=path)
    assert os.path.exists(path)
    extra = checkpoint_extra(path)
    assert 0 < extra["steps_done"] < 120
    template = init_train_state(model, jax.random.PRNGKey(0), cfg)
    st = load_checkpoint(path, template)
    assert int(st.opt.step) == extra["steps_done"]


def test_modulated_fit_shards_over_8_devices():
    """Chunk-axis sharding of the modulated fit (backbone replicated, mods
    and targets sharded; XLA inserts the backbone-grad all-reduce): the
    loss trajectory matches the single-device fit."""
    import numpy as np

    from inraudio_tpu.data.coords import get_coord
    from inraudio_tpu.models.siren import SirenSnakeTanhConfig
    from inraudio_tpu.parallel import make_mesh
    from inraudio_tpu.train import TrainConfig
    from inraudio_tpu.train.modulated import modulated_fit

    k, n = 8, 64
    rng = np.random.default_rng(0)
    targets = rng.standard_normal((k, n, 1)).astype(np.float32) * 0.5
    coords = np.asarray(get_coord(n, dim=1))
    cfg = SirenSnakeTanhConfig(hidden_features=16, num_sine=1, num_snake=1,
                               first_omega_0=30.0)
    tc = TrainConfig(total_steps=40, learning_rate=1e-3, scan_chunk=20)
    r1 = modulated_fit(cfg, targets, coords, tc)
    r8 = modulated_fit(cfg, targets, coords, tc, mesh=make_mesh())
    np.testing.assert_allclose(r1.loss_history, r8.loss_history,
                               rtol=2e-4, atol=1e-7)

    import pytest
    with pytest.raises(ValueError, match="shard"):
        modulated_fit(cfg, targets[:7], coords, tc, mesh=make_mesh())


def test_modulated_best_snapshot_matches_best_loss():
    """The returned (shared, mods) must be the params that ACHIEVED the
    minimum recorded loss (pre-update snapshot), not the post-update ones
    — with an oscillating lr the two differ materially."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from inraudio_tpu.data.coords import get_coord
    from inraudio_tpu.models.modulated import modulated_apply
    from inraudio_tpu.models.siren import SirenSnakeTanhConfig
    from inraudio_tpu.train import TrainConfig
    from inraudio_tpu.train.modulated import modulated_fit

    k, n = 4, 64
    rng = np.random.default_rng(3)
    targets = rng.standard_normal((k, n, 1)).astype(np.float32) * 0.5
    coords = np.asarray(get_coord(n, dim=1))
    cfg = SirenSnakeTanhConfig(hidden_features=16, num_sine=1, num_snake=1,
                               first_omega_0=30.0)
    res = modulated_fit(cfg, targets, coords,
                        TrainConfig(total_steps=120, learning_rate=5e-2,
                                    scan_chunk=60))
    out = jax.vmap(lambda m: modulated_apply(res.shared, cfg,
                                             coords, m))(jnp.asarray(res.mods))
    loss_of_best = float(jnp.mean(jnp.square(out - targets)))
    assert loss_of_best <= float(res.loss_history.min()) * (1 + 1e-5), (
        loss_of_best, float(res.loss_history.min()))


def test_modulated_mods_lr_mult():
    """A hotter modulation lr is a distinct optimizer path (split Adam
    states, plateau preserves the ratio) — it must run, differ from
    mult=1, and not diverge on an easy target."""
    import numpy as np

    from inraudio_tpu.data.coords import get_coord
    from inraudio_tpu.models.siren import SirenSnakeTanhConfig
    from inraudio_tpu.train import TrainConfig
    from inraudio_tpu.train.modulated import modulated_fit

    k, n = 4, 64
    t = np.arange(k * n) / 1000.0
    targets = (0.5 * np.sin(2 * np.pi * 30 * t)).reshape(
        k, n).astype(np.float32)[..., None]
    coords = np.asarray(get_coord(n, dim=1))
    cfg = SirenSnakeTanhConfig(hidden_features=16, num_sine=1, num_snake=1,
                               first_omega_0=30.0)
    tc = TrainConfig(total_steps=150, learning_rate=1e-3, scan_chunk=50)
    r1 = modulated_fit(cfg, targets, coords, tc)
    r5 = modulated_fit(cfg, targets, coords, tc, mods_lr_mult=5.0)
    assert not np.allclose(r1.loss_history, r5.loss_history)
    assert np.isfinite(r5.loss_history).all()
    assert r5.loss_history.min() < r5.loss_history[0]


def test_modulated_frozen_shared_trains_mods_only():
    """frozen_shared: the backbone is a host constant — only modulations
    move, the returned shared equals the input bit-for-bit, and the loss
    still falls (the amortised-codec mode)."""
    import numpy as np

    from inraudio_tpu.data.coords import get_coord
    from inraudio_tpu.models.siren import SirenSnakeTanhConfig
    from inraudio_tpu.train import TrainConfig
    from inraudio_tpu.train.modulated import modulated_fit

    k, n = 4, 64
    t = np.arange(k * n) / 1000.0
    targets = (0.5 * np.sin(2 * np.pi * 25 * t)).reshape(
        k, n).astype(np.float32)[..., None]
    coords = np.asarray(get_coord(n, dim=1))
    cfg = SirenSnakeTanhConfig(hidden_features=16, num_sine=1, num_snake=1,
                               first_omega_0=30.0)
    base = modulated_fit(cfg, targets, coords,
                         TrainConfig(total_steps=100, scan_chunk=50))
    res = modulated_fit(cfg, targets, coords,
                        TrainConfig(total_steps=100, learning_rate=5e-3,
                                    scan_chunk=50),
                        frozen_shared=base.shared)
    for a, b in zip(jax.tree_util.tree_leaves(res.shared),
                    jax.tree_util.tree_leaves(base.shared)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert res.loss_history[-1] < res.loss_history[0]

    import pytest
    with pytest.raises(ValueError, match="mods_lr_mult"):
        modulated_fit(cfg, targets, coords, TrainConfig(total_steps=5),
                      frozen_shared=base.shared, mods_lr_mult=2.0)
