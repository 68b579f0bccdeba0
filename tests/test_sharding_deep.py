"""Deep sharding-equivalence tests: multi-hundred-step convergence on a
REAL clip, 8 virtual CPU devices vs 1 (SURVEY.md section 4 item 5, taken
past the step-1 wiring checks in test_train.py).

The step-1 bounds in test_train catch a missing psum or wrong pad
weighting; these runs catch anything that only accumulates — a sharded
optimizer leaf updated with a stale gradient, a per-device plateau
scheduler drifting from the global one, a crossfade stitch that assumes
chunk locality.  Over hundreds of f32 steps the trajectories separate by
reduction-order chaos, so the contract asserted here is CONVERGED QUALITY
(final reconstruction SNR and best loss), not the per-step path.

All three production sharding layouts are covered:
  - full-batch coordinate sharding (train/loop.fit; params replicated,
    sample axis sharded — the rebuild's "sequence parallelism"),
  - chunk-sharded fused multi-INR (train/multi_inr; the whole-step Pallas
    kernel under shard_map, interpret-mode on the CPU mesh),
  - modulated shared-backbone (train/modulated; backbone replicated with
    an XLA-inserted gradient all-reduce, mods/targets chunk-sharded).

The reference has no distributed surface to cite (SURVEY.md section 5:
single `.cuda()` device, run.py:102,115,136) — this is new-surface QA.
"""

import jax
import numpy as np
import pytest

from inraudio_tpu.data import waveform_fitting
from inraudio_tpu.dsp import calculate_snr
from inraudio_tpu.models import SirenSnakeTanhConfig, build_model
from inraudio_tpu.parallel import make_mesh
from inraudio_tpu.train import TrainConfig, fit
from tests.conftest import REFERENCE_WAV

KEY = jax.random.PRNGKey(7)

pytestmark = pytest.mark.slow


def _snr(ref: np.ndarray, rec: np.ndarray) -> float:
    n = min(len(ref), len(rec))
    return float(calculate_snr(ref[:n], rec[:n]))


def test_full_batch_sharded_400_steps_real_clip():
    """400 full-batch steps on 0.5 s of gt_bach (decimated 8x): the
    8-device coordinate-sharded fit must converge to the same quality as
    the single-device fit."""
    problem = waveform_fitting(REFERENCE_WAV, duration=0.5, decimation=8)
    coords, targets = np.asarray(problem.coords), np.asarray(problem.targets)
    model = build_model("mlp", SirenSnakeTanhConfig(
        first_omega_0=500.0, hidden_features=64, num_sine=1, num_snake=1))
    cfg = TrainConfig(total_steps=400, scan_chunk=50, learning_rate=1e-3,
                      grad_clip_norm=1.0, plateau_patience=100)
    r1 = fit(model, coords, targets, cfg, key=KEY,
             mesh=make_mesh(jax.devices()[:1]))
    r8 = fit(model, coords, targets, cfg, key=KEY,
             mesh=make_mesh(jax.devices()[:8]))
    ref = targets[:, 0]
    snr1 = _snr(ref, np.asarray(model.apply(r1.params, coords))[:, 0])
    snr8 = _snr(ref, np.asarray(model.apply(r8.params, coords))[:, 0])
    # both must actually fit...
    assert snr1 > 15.0 and snr8 > 15.0, (snr1, snr8)
    # ...and to equivalent quality
    assert abs(snr1 - snr8) < 1.5, (snr1, snr8)
    assert abs(np.log10(r1.best_loss) - np.log10(r8.best_loss)) < 0.3
    # step 1 stays a tight wiring check even on the long run
    np.testing.assert_allclose(r8.loss_history[0], r1.loss_history[0],
                               rtol=1e-5)


def test_full_batch_FUSED_sharded_300_steps_real_clip():
    """r5 (VERDICT r4 item 2): the whole-step fused kernel on the SHARDED
    full-batch path — per-shard grad-accumulation kernel + psum + the
    clip/Adam/best epilogue kernel (make_sharded_fused_mse_train_step,
    interpret-mode on the CPU mesh) must converge to the same quality as
    the single-device whole-step kernel, and step 1 must match to psum
    reassociation noise."""
    problem = waveform_fitting(REFERENCE_WAV, duration=0.5, decimation=8)
    coords, targets = np.asarray(problem.coords), np.asarray(problem.targets)
    model = build_model("mlp", SirenSnakeTanhConfig(
        first_omega_0=500.0, hidden_features=64, num_sine=1, num_snake=1),
        fused=True, approx_sin=True, interpret=True)
    cfg = TrainConfig(total_steps=300, scan_chunk=50, learning_rate=1e-3,
                      grad_clip_norm=1.0, plateau_patience=100)
    r1 = fit(model, coords, targets, cfg, key=KEY,
             mesh=make_mesh(jax.devices()[:1]))
    r8 = fit(model, coords, targets, cfg, key=KEY,
             mesh=make_mesh(jax.devices()[:8]))
    ref = targets[:, 0]
    snr1 = _snr(ref, np.asarray(model.apply(r1.params, coords))[:, 0])
    snr8 = _snr(ref, np.asarray(model.apply(r8.params, coords))[:, 0])
    assert snr1 > 15.0 and snr8 > 15.0, (snr1, snr8)
    assert abs(snr1 - snr8) < 1.5, (snr1, snr8)
    assert abs(np.log10(r1.best_loss) - np.log10(r8.best_loss)) < 0.3
    # step-1 wiring check: identical up to the gradient psum's float
    # reassociation (measured 5e-8 on this shape)
    np.testing.assert_allclose(r8.loss_history[0], r1.loss_history[0],
                               rtol=1e-5)


def test_multi_inr_fused_chunk_sharded_300_steps_real_clip():
    """300 fused whole-step-kernel steps over an 8-chunk population of real
    audio, chunk axis sharded over 8 devices (shard_map around the Pallas
    call, interpret-mode on CPU) vs a 1-device mesh."""
    from inraudio_tpu.train.multi_inr import (MultiINRConfig, chunk_signal,
                                              multi_inr_decode,
                                              multi_inr_fit)

    problem = waveform_fitting(REFERENCE_WAV, duration=0.5, decimation=8)
    sig = np.asarray(problem.targets)[:, 0]
    fs = problem.sample_rate
    mc = MultiINRConfig(chunk_seconds=len(sig) / fs / 7.2,
                        overlap_fraction=0.1)
    chunks, _, _ = chunk_signal(sig, fs, mc)
    assert chunks.shape[0] == 8, chunks.shape  # mesh-divisible population
    model = build_model("mlp", SirenSnakeTanhConfig(
        first_omega_0=300.0, hidden_features=64, num_sine=1, num_snake=1),
        fused=True, interpret=True)
    tc = TrainConfig(total_steps=300, scan_chunk=50, learning_rate=1e-3,
                     grad_clip_norm=1.0, plateau_patience=75)
    r1 = multi_inr_fit(model, sig, fs, mc, tc, key=KEY,
                       mesh=make_mesh(jax.devices()[:1]))
    r8 = multi_inr_fit(model, sig, fs, mc, tc, key=KEY,
                       mesh=make_mesh(jax.devices()[:8]))
    snr1 = _snr(sig, multi_inr_decode(model, r1))
    snr8 = _snr(sig, multi_inr_decode(model, r8))
    # chunks are independent fits, so the sharded run computes the SAME
    # per-chunk problems — but shard_map compiles a different program than
    # the 1-device vmap, and at the 60-70 dB noise floor this recipe
    # reaches, rounding-order chaos scatters final SNR by several dB
    # (measured 61.6 vs 58.2 with uniform grads; 71.5 vs 63.3 with the r4
    # bf16x2 grad default, which converges deeper and scatters wider).  A
    # wiring bug (wrong chunk routing, lost state) shows up as a
    # catastrophic gap, not a ~10 dB one.
    assert snr1 > 40.0 and snr8 > 40.0, (snr1, snr8)
    assert abs(snr1 - snr8) < 15.0, (snr1, snr8)
    # chunk-sharded step 1: each chunk's loss is computed entirely on its
    # own device, so even the per-chunk values match tightly
    np.testing.assert_allclose(r8.loss_history[0], r1.loss_history[0],
                               rtol=1e-4)


def test_modulated_sharded_300_steps_real_clip():
    """300 joint backbone+modulation steps on an 8-chunk stack of real
    audio: the chunk-sharded fit (backbone-grad all-reduce over the mesh)
    must converge to the quality of the unsharded one."""
    from inraudio_tpu.data.coords import get_coord
    from inraudio_tpu.models.modulated import modulated_apply
    from inraudio_tpu.train.modulated import modulated_fit

    problem = waveform_fitting(REFERENCE_WAV, duration=0.5, decimation=8)
    sig = np.asarray(problem.targets)[:, 0]
    k, n = 8, len(sig) // 8
    targets = sig[:k * n].reshape(k, n, 1).astype(np.float32)
    coords = np.asarray(get_coord(n, dim=1), np.float32)
    cfg = SirenSnakeTanhConfig(first_omega_0=300.0, hidden_features=48,
                               num_sine=1, num_snake=1)
    tc = TrainConfig(total_steps=300, scan_chunk=50, learning_rate=2e-3,
                     grad_clip_norm=1.0, plateau_patience=75)
    r1 = modulated_fit(cfg, targets, coords, tc, key=KEY)
    r8 = modulated_fit(cfg, targets, coords, tc, key=KEY,
                       mesh=make_mesh(jax.devices()[:8]))

    def rec_snr(res):
        out = np.asarray(jax.vmap(lambda m: modulated_apply(
            res.shared, cfg, coords, m))(res.mods))[:, :, 0]
        return _snr(targets.reshape(-1), out.reshape(-1))

    snr1, snr8 = rec_snr(r1), rec_snr(r8)
    assert snr1 > 10.0 and snr8 > 10.0, (snr1, snr8)
    assert abs(snr1 - snr8) < 1.5, (snr1, snr8)
    assert abs(np.log10(r1.loss_history[-1])
               - np.log10(r8.loss_history[-1])) < 0.3
    np.testing.assert_allclose(r8.loss_history[0], r1.loss_history[0],
                               rtol=1e-4)
