"""Whole-step fused kernel (ops/pallas_siren_step): fwd+bwd+clip+Adam in
one Pallas call must reproduce the two-kernel autodiff step exactly.

All tests run the kernels in interpret mode on CPU (conftest forces the
platform); on-chip throughput is measured by bench.py / BASELINE.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inraudio_tpu.models import SirenSnakeTanhConfig, build_model
from inraudio_tpu.ops.pallas_siren import _flatten_params
from inraudio_tpu.ops.pallas_siren_step import (
    FlatTrainState, flat_param_shapes, flat_state_from_train_state,
    make_fused_mse_train_step, pad_step_inputs, step_block_rows,
    step_supported, train_state_from_flat, unflatten_params)
from inraudio_tpu.train.loop import (TrainConfig, fused_step_plan,
                                     init_train_state, make_train_step)

CFG = SirenSnakeTanhConfig(in_features=1, hidden_features=64,
                           first_omega_0=300.0, num_sine=1, num_snake=1)


@pytest.fixture(autouse=True)
def _uniform_grad_precision(monkeypatch):
    """These are EXACTNESS A/Bs against f32 autodiff: pin the backward
    matmuls to the forward precision (the r4 production default is the
    looser bf16x2 — test_pallas_train covers that mode's contract)."""
    monkeypatch.setenv("INRAUDIO_GRAD_PRECISION", "inherit")
    jax.clear_caches()
    yield
    jax.clear_caches()


def _problem(n=700):
    coords = np.linspace(-1, 1, n, dtype=np.float32).reshape(-1, 1)
    targets = np.sin(2 * np.pi * 4 * coords).astype(np.float32)
    return coords, targets


def _run_both(cfg_model, tc, n=700, steps=5, block=256, rff_b=None):
    model = build_model("mlp", cfg_model, fused=True, interpret=True,
                        rff_b=rff_b)
    coords, targets = _problem(n)
    state = init_train_state(model, jax.random.PRNGKey(0), tc)

    ref_step = make_train_step(model, tc)
    s_ref = state
    ref_hist = []
    for _ in range(steps):
        s_ref, (l, lr) = ref_step(s_ref, jnp.asarray(coords),
                                  jnp.asarray(targets))
        ref_hist.append((float(l), float(lr)))

    coords_p, tgt_p, nv = pad_step_inputs(coords, targets, block)
    fstep = make_fused_mse_train_step(cfg_model, tc, nv, block, rff_b=rff_b,
                                      interpret=True)
    fs = flat_state_from_train_state(state, cfg_model,
                                     rff=rff_b is not None)
    f_hist = []
    for _ in range(steps):
        fs, (l, lr) = fstep(fs, coords_p, tgt_p)
        f_hist.append((float(l), float(lr)))
    s_f = train_state_from_flat(fs, cfg_model)
    return s_ref, s_f, ref_hist, f_hist


def _assert_state_close(s_ref, s_f, rtol=3e-5, atol=3e-6):
    for a, b in zip(jax.tree.leaves(s_ref.params), jax.tree.leaves(s_f.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=rtol, atol=atol)
    for a, b in zip(jax.tree.leaves(s_ref.opt.mu), jax.tree.leaves(s_f.opt.mu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s_ref.best_params),
                    jax.tree.leaves(s_f.best_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=rtol, atol=atol)
    assert int(s_ref.opt.step) == int(s_f.opt.step)
    assert int(s_ref.best_iter) == int(s_f.best_iter)


@pytest.mark.slow
def test_step_matches_autodiff_with_clip():
    tc = TrainConfig(total_steps=5, grad_clip_norm=1.0, plateau_patience=2,
                     plateau_factor=0.5)
    s_ref, s_f, ref_hist, f_hist = _run_both(CFG, tc)
    for (lr_, lrl), (lf_, lfl) in zip(ref_hist, f_hist):
        assert abs(lr_ - lf_) < 1e-6 * max(1.0, abs(lr_))
        assert lrl == lfl  # plateau decisions identical
    _assert_state_close(s_ref, s_f)


@pytest.mark.slow
def test_step_matches_autodiff_weighted():
    """r5 (VERDICT r4 item 9): per-row loss weights ride the fused step —
    the psychoacoustic-mask path no longer falls to the two-kernel route.
    Weighted mse + clip + Adam must match XLA autodiff exactly."""
    tc = TrainConfig(total_steps=4, grad_clip_norm=1.0, plateau_patience=2)
    model = build_model("mlp", CFG, fused=True, interpret=True)
    n, block = 700, 256
    coords, targets = _problem(n)
    rng = np.random.default_rng(3)
    w = (0.8 + 0.2 * rng.random(n)).astype(np.float32)
    w_n = w * (n / w.sum())                      # mean-1 over real rows
    state = init_train_state(model, jax.random.PRNGKey(0), tc)

    ref_step = make_train_step(model, tc)
    s_ref = state
    ref_hist = []
    for _ in range(4):
        s_ref, (l, lr) = ref_step(s_ref, jnp.asarray(coords),
                                  jnp.asarray(targets),
                                  jnp.asarray(w_n[:, None]))
        ref_hist.append(float(l))

    coords_p, tgt_p, nv = pad_step_inputs(coords, targets, block)
    wp = np.zeros((coords_p.shape[0], 1), np.float32)
    wp[:n, 0] = w_n
    fstep = make_fused_mse_train_step(CFG, tc, nv, block, interpret=True)
    fs = flat_state_from_train_state(state, CFG)
    for i in range(4):
        fs, (l, lr) = fstep(fs, coords_p, tgt_p, jnp.asarray(wp))
        assert abs(ref_hist[i] - float(l)) < 1e-6 * max(1.0, ref_hist[i])
    _assert_state_close(s_ref, train_state_from_flat(fs, CFG))


@pytest.mark.slow
def test_fit_routes_weighted_through_fused_step():
    """fit() with a loss weight now plans a fused block (the has_weight
    exclusion is gone) and converges on the kernel path."""
    from inraudio_tpu.train.loop import fit
    model = build_model("mlp", CFG, fused=True, interpret=True)
    tc = TrainConfig(total_steps=60, scan_chunk=30, learning_rate=1e-3,
                     grad_clip_norm=1.0)
    assert fused_step_plan(model, tc, 700, has_weight=True) is not None
    coords, targets = _problem(700)
    w = np.ones(700, np.float32)
    r = fit(model, coords, targets, tc, weight=w)
    assert r.loss_history[-1] < r.loss_history[0]


@pytest.mark.slow
def test_precision_schedule_converges_and_escalates():
    """r5 (VERDICT r4 item 3): fit(precision_schedule=True) starts on the
    cheap tier (bf16x2/bf16/deg-7) and escalates when the round loss
    crosses the schedule_db floor; the scheduled fit must converge to the
    same quality class as the unscheduled one (measured on TPU: +6.1 dB
    at the strict 30 s budget on the h=256 full-batch shape,
    bench_logs_r5/13_full256_sched.log — on CPU interpret we assert
    convergence, not speed)."""
    from inraudio_tpu.train.loop import fit
    model = build_model("mlp", SirenSnakeTanhConfig(
        hidden_features=32, first_omega_0=30.0, num_sine=1, num_snake=1),
        fused=True, approx_sin=True, interpret=True)
    n = 1500
    coords = np.linspace(-1, 1, n, dtype=np.float32)[:, None]
    targets = np.sin(2 * np.pi * 3 * coords).astype(np.float32)
    tc = TrainConfig(total_steps=150, learning_rate=2e-3, grad_clip_norm=1.0,
                     scan_chunk=50, precision_schedule=True,
                     schedule_db=20.0)
    r = fit(model, coords, targets, tc)
    assert r.loss_history[-1] < 1e-4, r.loss_history[-1]


@pytest.mark.slow
def test_step_matches_autodiff_no_clip_single_tile():
    tc = TrainConfig(total_steps=3, grad_clip_norm=0.0)
    s_ref, s_f, _, _ = _run_both(CFG, tc, n=512, block=512, steps=3)
    _assert_state_close(s_ref, s_f)


@pytest.mark.slow
def test_step_matches_autodiff_rff():
    f = 16
    rff_b = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (f, 1)),
                       np.float32) * 3.0
    cfg = SirenSnakeTanhConfig(in_features=2 * f, hidden_features=64,
                               first_omega_0=300.0, num_sine=1, num_snake=1)
    tc = TrainConfig(total_steps=4, grad_clip_norm=1.0)
    s_ref, s_f, ref_hist, f_hist = _run_both(cfg, tc, rff_b=jnp.asarray(rff_b))
    for (lr_, _), (lf_, _) in zip(ref_hist, f_hist):
        assert abs(lr_ - lf_) < 2e-6 * max(1.0, abs(lr_))
    _assert_state_close(s_ref, s_f, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_step_matches_autodiff_h256_production_shape():
    """The reference's own h=256 default stack (run.py:30) must route
    through the whole-step kernel (VERDICT r3 item 4): the VMEM gate
    admits it at 256-row tiles and the fused trajectory matches
    autodiff."""
    cfg = SirenSnakeTanhConfig(in_features=1, hidden_features=256,
                               first_omega_0=300.0, num_sine=2, num_snake=2)
    assert step_supported(cfg, 308207)
    assert step_block_rows(cfg, 308207) == 256
    tc = TrainConfig(total_steps=2, grad_clip_norm=1.0)
    s_ref, s_f, ref_hist, f_hist = _run_both(cfg, tc, n=600, block=256,
                                             steps=2)
    for (lr_, _), (lf_, _) in zip(ref_hist, f_hist):
        assert abs(lr_ - lf_) < 1e-6 * max(1.0, abs(lr_))
    # h=256 contractions carry slightly more reduction-order noise than the
    # h=64 cases above; the per-step losses already matched to 1e-6 rel
    _assert_state_close(s_ref, s_f, rtol=5e-4, atol=5e-5)


@pytest.mark.slow
def test_track_best_false_keeps_initial_best():
    tc = TrainConfig(total_steps=3, track_best=False)
    _, s_f, _, _ = _run_both(CFG, tc, steps=3)
    # reference alias semantics: best_params untouched (still the init)
    model = build_model("mlp", CFG, fused=True, interpret=True)
    init = init_train_state(model, jax.random.PRNGKey(0), tc)
    for a, b in zip(jax.tree.leaves(init.best_params),
                    jax.tree.leaves(s_f.best_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flat_shapes_and_unflatten_roundtrip():
    model = build_model("mlp", CFG, fused=True, interpret=True)
    params = model.init(jax.random.PRNGKey(1))
    flat = _flatten_params(params, CFG)
    assert ([tuple(x.shape) for x in flat]
            == [tuple(s) for s in flat_param_shapes(CFG)])
    back = unflatten_params(flat, CFG)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vmem_gate():
    # the headline h=128 stack fits; a 512-wide stack must be rejected
    small = SirenSnakeTanhConfig(in_features=1, hidden_features=128,
                                 first_omega_0=115.0, num_sine=2, num_snake=2)
    assert step_supported(small, 512)
    assert step_block_rows(small, 512) == 512
    big = SirenSnakeTanhConfig(in_features=1, hidden_features=512,
                               first_omega_0=115.0, num_sine=2, num_snake=2)
    assert not step_supported(big, 512)
    # vector outputs have no compact mse kernel
    vec = SirenSnakeTanhConfig(in_features=1, out_features=2,
                               hidden_features=64, first_omega_0=30.0)
    assert not step_supported(vec, 512)


def test_fused_step_plan_gating():
    model = build_model("mlp", CFG, fused=True, interpret=True)
    assert fused_step_plan(model, TrainConfig(), 512) is not None
    assert fused_step_plan(model, TrainConfig(loss_mode="mae"), 512) is None
    assert fused_step_plan(model, TrainConfig(alpha=0.1), 512) is None
    # r5: per-row weights ride the fused step (VERDICT r4 item 9)
    assert fused_step_plan(model, TrainConfig(), 512, has_weight=True) \
        is not None
    xla_model = build_model("mlp", CFG)
    assert fused_step_plan(xla_model, TrainConfig(), 512) is None
    import os
    os.environ["INRAUDIO_FUSED_STEP"] = "0"
    try:
        assert fused_step_plan(model, TrainConfig(), 512) is None
    finally:
        del os.environ["INRAUDIO_FUSED_STEP"]


@pytest.mark.slow
def test_fit_routes_through_fused_step_and_converges():
    from inraudio_tpu.dsp import calculate_snr
    from inraudio_tpu.train.loop import fit
    model = build_model("mlp", SirenSnakeTanhConfig(
        in_features=1, hidden_features=64, first_omega_0=30.0,
        num_sine=1, num_snake=1), fused=True, interpret=True)
    n = 1000
    coords = np.linspace(-1, 1, n, dtype=np.float32).reshape(-1, 1)
    targets = np.sin(2 * np.pi * 5 * coords).astype(np.float32)
    res = fit(model, coords, targets,
              TrainConfig(total_steps=300, grad_clip_norm=1.0,
                          scan_chunk=100))
    out = np.asarray(jax.jit(model.apply)(res.params, jnp.asarray(coords)))
    snr = float(calculate_snr(targets.reshape(-1), out.reshape(-1)))
    assert snr > 40.0, snr
    # result is a standard TrainState (checkpoint/decode compatible)
    assert res.state.opt.step.shape == ()


@pytest.mark.slow
def test_multi_inr_fused_step_matches_autodiff():
    import os
    from inraudio_tpu.dsp import calculate_snr
    from inraudio_tpu.train.multi_inr import (MultiINRConfig,
                                              multi_inr_decode,
                                              multi_inr_fit)
    fs = 4000
    t = np.arange(fs) / fs
    sig = (0.7 * np.sin(2 * np.pi * 8 * t)).astype(np.float32)
    model = build_model("mlp", SirenSnakeTanhConfig(
        in_features=1, hidden_features=64, first_omega_0=30.0,
        num_sine=1, num_snake=1), fused=True, interpret=True)
    mc = MultiINRConfig(chunk_seconds=0.25, overlap_fraction=0.25)
    tc = TrainConfig(total_steps=150, grad_clip_norm=1.0, scan_chunk=75)
    res = multi_inr_fit(model, sig, fs, mc, tc)
    rec = multi_inr_decode(model, res)
    os.environ["INRAUDIO_FUSED_STEP"] = "0"
    try:
        res2 = multi_inr_fit(model, sig, fs, mc, tc)
        rec2 = multi_inr_decode(model, res2)
    finally:
        del os.environ["INRAUDIO_FUSED_STEP"]
    s1 = float(calculate_snr(sig, rec))
    s2 = float(calculate_snr(sig, rec2))
    assert abs(s1 - s2) < 0.5, (s1, s2)
    np.testing.assert_allclose(rec, rec2, atol=5e-4)
