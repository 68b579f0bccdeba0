"""Adaptive STMDCT (block switching) tests: the reference drafts the window
quartet (window.py:67-113) but never wires it; here a transient detector +
frame plan + per-kind batched MDCT reconstructs perfectly across a
long->short->long switch (VERDICT r1 item 10)."""

import jax.numpy as jnp
import numpy as np

from inraudio_tpu.dsp.adaptive import (detect_transients, istmdct_adaptive,
                                       plan_blocks, stmdct_adaptive)


def _click_train(n=2048 * 12, seed=0):
    rng = np.random.default_rng(seed)
    x = 0.05 * rng.standard_normal(n).astype(np.float32)
    for c in (2048 * 5 + 300, 2048 * 5 + 800, 2048 * 6 + 100):
        x[c:c + 40] += np.hanning(40).astype(np.float32)
    return x


def test_detector_flags_click_slots():
    x = _click_train()
    tr = detect_transients(x)
    flagged = set(np.where(tr)[0])
    assert flagged, "clicks must be detected"
    # clicks live at samples ~10540-12430 -> long-hop slots 10-12
    assert flagged <= {9, 10, 11, 12, 13}, flagged
    assert not detect_transients(
        0.05 * np.random.default_rng(1).standard_normal(2048 * 8)).any()


def test_plan_is_critically_sampled_and_consistent():
    x = _click_train()
    plan = plan_blocks(len(x), detect_transients(x))
    assert "start" in plan.kinds and "short" in plan.kinds \
        and "stop" in plan.kinds
    # coefficient count == sample count (critical sampling preserved)
    assert plan.total_coeffs == len(x)
    # frame chaining invariant: a_{i+1} == b_i and offsets advance by a_i
    for i in range(len(plan.kinds) - 1):
        a_i, b_i = plan.halves(plan.kinds[i])
        a_n, _ = plan.halves(plan.kinds[i + 1])
        assert a_n == b_i, (i, plan.kinds[i], plan.kinds[i + 1])
        assert plan.offsets[i + 1] - plan.offsets[i] == a_i


def test_perfect_reconstruction_across_switch():
    """TDAC holds through long->start->7xshort->stop->long on a click
    train: interior reconstruction error at f32 resolution."""
    x = _click_train()
    plan = plan_blocks(len(x), detect_transients(x))
    coeffs = stmdct_adaptive(jnp.asarray(x), plan)
    rec = np.asarray(istmdct_adaptive(coeffs, plan))
    assert len(rec) == len(x)
    interior = slice(2048, len(x) - 2048)
    err = np.max(np.abs(rec[interior] - x[interior]))
    assert err < 5e-6, err


def test_pure_long_plan_matches_stmdct_domain():
    """Without transients the plan is all long frames and still PR."""
    x = _click_train(seed=3)
    plan = plan_blocks(len(x), np.zeros(len(x) // 1024, bool))
    assert set(plan.kinds) == {"long"}
    coeffs = stmdct_adaptive(jnp.asarray(x), plan)
    rec = np.asarray(istmdct_adaptive(coeffs, plan))
    interior = slice(2048, len(x) - 2048)
    assert np.max(np.abs(rec[interior] - x[interior])) < 5e-6


def test_invalid_size_pairs_rejected():
    """n_short must divide n_long (critical sampling across a switch) —
    a silent mismatch would leave uncancelled aliasing, so it must raise."""
    import pytest
    from inraudio_tpu.dsp.adaptive import detect_transients, plan_blocks
    x = np.zeros(4096, dtype=np.float32)
    with pytest.raises(ValueError):
        detect_transients(x, n_long=2048, n_short=300)
    with pytest.raises(ValueError):
        plan_blocks(4096, np.zeros(2, bool), n_long=2048, n_short=300)
    with pytest.raises(ValueError):
        plan_blocks(4096, np.zeros(2, bool), n_long=2047, n_short=256)


def test_detector_flags_click_at_clip_start():
    # ADVICE r2: slot 0 seeded its own mean as prev_mean, so an attack in
    # the first long slot could never trip the threshold. Seeding with the
    # global median slot energy makes the clip-start click detectable.
    from inraudio_tpu.dsp.adaptive import detect_transients
    rng = np.random.default_rng(0)
    sig = 1e-3 * rng.standard_normal(2048 * 8).astype(np.float32)
    sig[100:130] += 0.9  # click inside slot 0
    flags = detect_transients(sig, n_long=2048, n_short=256)
    assert flags[0]
