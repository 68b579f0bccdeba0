"""Fused KAN kernel A/B tests vs the jnp reference path (interpret mode on
the CPU mesh; bench.py/BASELINE.md carry the compiled-path numbers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inraudio_tpu.models import KANConfig, build_model, kan_apply
from inraudio_tpu.ops import fused_kan_apply

KEY = jax.random.PRNGKey(17)

CONFIGS = [
    KANConfig(layers_hidden=(1, 128, 128, 1)),       # runner shape, run.py:92
    KANConfig(layers_hidden=(2, 64, 1)),             # 2-D coords
    KANConfig(layers_hidden=(1, 64, 64, 64, 1)),     # deeper
    KANConfig(layers_hidden=(1, 64, 3)),             # vector output
    KANConfig(layers_hidden=(1, 64, 1), grid_size=8, spline_order=2),
]


@pytest.mark.parametrize("cfg", CONFIGS,
                         ids=lambda c: "x".join(map(str, c.layers_hidden)) +
                         f"-g{c.grid_size}o{c.spline_order}")
def test_fused_kan_matches_reference(cfg):
    model = build_model("kan", cfg)
    params = model.init(KEY)
    coords = jax.random.uniform(KEY, (777, cfg.layers_hidden[0]),
                                jnp.float32, -1.0, 1.0)
    ref = kan_apply(params, cfg, coords)
    out = fused_kan_apply(params, cfg, coords, block_rows=256,
                          interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_kan_non_tile_rows():
    cfg = KANConfig(layers_hidden=(1, 64, 1))
    model = build_model("kan", cfg)
    params = model.init(KEY)
    for n in (1, 7, 255, 1000):
        coords = jnp.linspace(-0.9, 0.9, n).reshape(-1, 1)
        ref = kan_apply(params, cfg, coords)
        out = fused_kan_apply(params, cfg, coords, block_rows=256,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)


def test_fused_kan_gradients_match_reference():
    """The custom-VJP backward is the XLA autodiff of kan_apply: the fused
    loss gradient must equal the reference loss gradient exactly-ish."""
    cfg = KANConfig(layers_hidden=(1, 64, 1))
    model = build_model("kan", cfg)
    params = model.init(KEY)
    coords = jnp.linspace(-0.9, 0.9, 300).reshape(-1, 1)
    targets = jnp.sin(3.0 * coords)

    def loss_ref(p):
        return jnp.mean((kan_apply(p, cfg, coords) - targets) ** 2)

    def loss_fused(p):
        out = fused_kan_apply(p, cfg, coords, block_rows=256, interpret=True)
        return jnp.mean((out - targets) ** 2)

    l_ref, g_ref = jax.value_and_grad(loss_ref)(params)
    l_f, g_f = jax.value_and_grad(loss_fused)(params)
    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-5)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_f)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pa)}")


def test_fused_kan_via_build_model_trains():
    """build_model('kan', fused=True) fits a sine through the normal loop."""
    from inraudio_tpu.train import TrainConfig, fit
    cfg = KANConfig(layers_hidden=(1, 64, 64, 1))
    model = build_model("kan", cfg, fused=True, interpret=True)
    n = 512
    coords = np.linspace(-1, 1, n).reshape(-1, 1).astype(np.float32)
    targets = np.sin(2 * np.pi * 4 * coords).astype(np.float32)
    res = fit(model, coords, targets,
              TrainConfig(total_steps=200, scan_chunk=50, learning_rate=1e-2))
    assert res.loss_history[-1] < 0.5 * res.loss_history[0]


def test_fused_kan_gradients_vector_io():
    """Pallas backward with 2-D coords, vector output, and a non-default
    spline order (exercises the derivative recursion at k=2)."""
    cfg = KANConfig(layers_hidden=(2, 32, 3), grid_size=6, spline_order=2)
    model = build_model("kan", cfg)
    params = model.init(KEY)
    coords = jax.random.uniform(KEY, (300, 2), jnp.float32, -0.9, 0.9)
    targets = jnp.sin(3.0 * coords[:, :1]) * jnp.ones((1, 3))

    def loss_ref(p):
        return jnp.mean((kan_apply(p, cfg, coords) - targets) ** 2)

    def loss_fused(p):
        out = fused_kan_apply(p, cfg, coords, block_rows=128, interpret=True)
        return jnp.mean((out - targets) ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g_f = jax.grad(loss_fused)(params)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_f)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pa)}")


def test_fused_kan_backward_vmem_gate():
    """Stacks whose params + grad accumulators exceed the VMEM budget must
    route through the XLA-autodiff fallback (and stay differentiable)."""
    from inraudio_tpu.ops.pallas_kan import (_BWD_RESIDENT_BUDGET,
                                             _bwd_resident_bytes)
    assert _bwd_resident_bytes(
        KANConfig(layers_hidden=(1, 256, 256, 1))) <= _BWD_RESIDENT_BUDGET
    big = KANConfig(layers_hidden=(1, 512, 512, 1))
    assert _bwd_resident_bytes(big) > _BWD_RESIDENT_BUDGET
    # the fallback path still produces gradients
    params = build_model("kan", big).init(KEY)
    coords = jnp.linspace(-0.9, 0.9, 64).reshape(-1, 1)

    def loss(p):
        out = fused_kan_apply(p, big, coords, block_rows=128, interpret=True)
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(leaf)).all()
               for leaf in jax.tree_util.tree_leaves(g))
