"""Fused training-kernel tests: custom-VJP gradients vs jax.grad of the jnp
reference path (interpret mode on the CPU test mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inraudio_tpu.models import SirenSnakeTanhConfig, build_model
from inraudio_tpu.ops.pallas_siren_train import fused_siren_train_apply

KEY = jax.random.PRNGKey(11)

CONFIGS = [
    SirenSnakeTanhConfig(first_omega_0=30.0, hidden_features=128,
                         num_sine=1, num_snake=1),
    SirenSnakeTanhConfig(first_omega_0=30.0, hidden_features=128,
                         num_sine=0, num_snake=0, num_tanh=1),
    SirenSnakeTanhConfig(in_features=2, first_omega_0=30.0,
                         hidden_features=128, num_sine=2, num_snake=1),
    SirenSnakeTanhConfig(first_omega_0=30.0, hidden_features=128,
                         first_linear=True, num_sine=1, num_snake=1),
]


@pytest.mark.parametrize("cfg", CONFIGS,
                         ids=lambda c: "-".join(k[:4] for k in c.layer_kinds))
def test_gradients_match_reference(cfg):
    model = build_model("mlp", cfg)
    params = model.init(KEY)
    coords = jax.random.uniform(KEY, (300, cfg.in_features), jnp.float32,
                                -1.0, 1.0)
    targets = jax.random.uniform(jax.random.PRNGKey(5), (300, 1), jnp.float32,
                                 -1.0, 1.0)

    def loss_ref(p):
        return jnp.mean((model.apply(p, coords) - targets) ** 2)

    def loss_fused(p):
        out = fused_siren_train_apply(p, cfg, coords, block_rows=128,
                                      interpret=True)
        return jnp.mean((out - targets) ** 2)

    l_ref, g_ref = jax.value_and_grad(loss_ref)(params)
    l_f, g_f = jax.value_and_grad(loss_fused)(params)
    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-5)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_f)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-3,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pa)}")


def test_rff_gradients_match_reference():
    """Folded-RFF fused backward vs jax.grad of rff_apply + reference
    model: same loss, same parameter gradients, zero grad leakage to B."""
    from inraudio_tpu.models import rff_apply, rff_init
    num_freq = 64
    cfg = SirenSnakeTanhConfig(in_features=2 * num_freq, first_omega_0=30.0,
                               hidden_features=128, num_sine=1, num_snake=1)
    model = build_model("mlp", cfg)
    params = model.init(KEY)
    rff_b = rff_init(jax.random.PRNGKey(2), 1, num_freq, sigma=10.0)
    coords = jax.random.uniform(KEY, (300, 1), jnp.float32, -1.0, 1.0)
    targets = jax.random.uniform(jax.random.PRNGKey(5), (300, 1), jnp.float32,
                                 -1.0, 1.0)

    def loss_ref(p):
        return jnp.mean((model.apply(p, rff_apply(rff_b, coords))
                         - targets) ** 2)

    def loss_fused(p):
        out = fused_siren_train_apply(p, cfg, coords, block_rows=128,
                                      interpret=True, rff_b=rff_b)
        return jnp.mean((out - targets) ** 2)

    l_ref, g_ref = jax.value_and_grad(loss_ref)(params)
    l_f, g_f = jax.value_and_grad(loss_fused)(params)
    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-5)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_f)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-3,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pa)}")


def test_one_training_step_equivalence(monkeypatch):
    """A full Adam step with the fused apply matches the reference apply.
    Exactness A/B: pin the backward matmuls to the forward precision (the
    r4 production default is the looser bf16x2, covered by
    test_grad_precision_env_loosens_grads_only)."""
    monkeypatch.setenv("INRAUDIO_GRAD_PRECISION", "inherit")
    jax.clear_caches()
    from inraudio_tpu.train import AdamConfig, adam_init, adam_update
    cfg = SirenSnakeTanhConfig(first_omega_0=100.0, hidden_features=128,
                               num_sine=1, num_snake=1)
    model = build_model("mlp", cfg)
    params = model.init(KEY)
    coords = jnp.linspace(-1, 1, 500).reshape(-1, 1)
    targets = jnp.sin(20 * coords)
    acfg = AdamConfig()

    def step(apply_fn, p):
        st = adam_init(p, acfg)
        loss, g = jax.value_and_grad(
            lambda pp: jnp.mean((apply_fn(pp) - targets) ** 2))(p)
        new_p, _ = adam_update(st, g, p, acfg)
        return new_p

    p_ref = step(lambda pp: model.apply(pp, coords), params)
    p_fused = step(lambda pp: fused_siren_train_apply(pp, cfg, coords,
                                                      block_rows=128,
                                                      interpret=True), params)
    # Adam divides by sqrt(v): float-noise in tiny grads is amplified to
    # ~1e-2 relative on the update — structural equivalence is what matters
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_fused)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4,
                                   rtol=1e-2)


def test_multi_tile_gradient_accumulation():
    """The backward kernel zero-inits grads on the FIRST tile and '+='-
    accumulates across the sequential grid (constant-index-map outputs) —
    force a multi-tile grid (block 1024 < n) and check against jax.grad."""
    cfg = SirenSnakeTanhConfig(first_omega_0=30.0, hidden_features=128,
                               num_sine=1, num_snake=1)
    model = build_model("mlp", cfg)
    params = model.init(KEY)
    n = 2500  # block 1024 -> padded 3072 -> 3 grid steps
    coords = jnp.linspace(-1, 1, n).reshape(-1, 1)
    targets = jnp.sin(15 * coords)

    def loss_ref(p):
        return jnp.mean((model.apply(p, coords) - targets) ** 2)

    def loss_fused(p):
        out = fused_siren_train_apply(p, cfg, coords, block_rows=1024,
                                      interpret=True)
        return jnp.mean((out - targets) ** 2)

    l_r, g_r = jax.value_and_grad(loss_ref)(params)
    l_f, g_f = jax.value_and_grad(loss_fused)(params)
    np.testing.assert_allclose(float(l_f), float(l_r), rtol=1e-5)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_r),
            jax.tree_util.tree_leaves_with_path(g_f)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-3,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pa)}")


def test_grad_precision_env_loosens_grads_only(monkeypatch):
    """INRAUDIO_GRAD_PRECISION=bf16x2 must change ONLY the backward matmuls:
    the forward loss stays bit-identical to the default, gradients move by
    a small bf16x2-scale amount but stay directionally equal to the exact
    reference gradients."""
    cfg = SirenSnakeTanhConfig(first_omega_0=30.0, hidden_features=128,
                               num_sine=1, num_snake=1)
    model = build_model("mlp", cfg)
    params = model.init(KEY)
    coords = jax.random.uniform(KEY, (256, 1), jnp.float32, -1.0, 1.0)
    targets = jax.random.uniform(jax.random.PRNGKey(5), (256, 1),
                                 jnp.float32, -1.0, 1.0)

    def loss_fused(p):
        out = fused_siren_train_apply(p, cfg, coords, block_rows=128,
                                      interpret=True)
        return jnp.mean((out - targets) ** 2)

    # 'inherit' restores the pre-r4 uniform precision (the default is now
    # bf16x2 after it won both production-shape A/Bs)
    monkeypatch.setenv("INRAUDIO_GRAD_PRECISION", "inherit")
    jax.clear_caches()  # the mode is read at trace time
    l_hi, g_hi = jax.value_and_grad(loss_fused)(params)
    monkeypatch.setenv("INRAUDIO_GRAD_PRECISION", "bf16x2")
    jax.clear_caches()
    l_lo, g_lo = jax.value_and_grad(loss_fused)(params)
    monkeypatch.delenv("INRAUDIO_GRAD_PRECISION")
    jax.clear_caches()

    assert float(l_hi) == float(l_lo)  # forward untouched
    hi = jax.tree_util.tree_leaves(g_hi)
    lo = jax.tree_util.tree_leaves(g_lo)
    moved = 0.0
    for a, b in zip(hi, lo):
        scale = float(jnp.max(jnp.abs(a))) + 1e-12
        rel = float(jnp.max(jnp.abs(a - b))) / scale
        assert rel < 3e-2, rel          # bf16x2-scale perturbation only
        moved = max(moved, rel)
        # directionally equal: cosine similarity of the grad leaves
        num = float(jnp.sum(a * b))
        den = float(jnp.linalg.norm(a) * jnp.linalg.norm(b)) + 1e-30
        assert num / den > 0.999
    assert moved > 1e-7  # the env actually took effect
