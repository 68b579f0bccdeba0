"""Optimizer/scheduler parity tests against torch.optim oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from inraudio_tpu.train import (AdamConfig, PlateauConfig, adam_init,
                                adam_update, plateau_init, plateau_update)


class TestAdamParity:
    def test_matches_torch_adam_quadratic(self):
        """Run 50 steps of Adam on the same quadratic from the same start;
        trajectories must match torch.optim.Adam to float32 tolerance."""
        w0 = np.asarray([1.5, -2.0, 0.7], dtype=np.float32)
        target = np.asarray([0.2, 0.4, -0.1], dtype=np.float32)

        tw = torch.tensor(w0.copy(), requires_grad=True)
        topt = torch.optim.Adam([tw], lr=1e-2)
        for _ in range(50):
            topt.zero_grad()
            loss = ((tw - torch.tensor(target)) ** 2).sum()
            loss.backward()
            topt.step()

        cfg = AdamConfig(lr=1e-2)
        params = {"w": jnp.asarray(w0)}
        state = adam_init(params, cfg)
        grad_fn = jax.grad(lambda p: jnp.sum((p["w"] - jnp.asarray(target)) ** 2))
        for _ in range(50):
            params, state = adam_update(state, grad_fn(params), params, cfg)

        np.testing.assert_allclose(np.asarray(params["w"]),
                                   tw.detach().numpy(), atol=1e-5)


class TestPlateauParity:
    def _run_torch(self, losses, factor=0.8, patience=200, min_lr=1e-6,
                   lr0=1e-3):
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.Adam([p], lr=lr0)
        sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, mode="min", factor=factor, patience=patience, min_lr=min_lr)
        lrs = []
        for l in losses:
            sched.step(l)
            lrs.append(opt.param_groups[0]["lr"])
        return np.asarray(lrs)

    def _run_ours(self, losses, factor=0.8, patience=200, min_lr=1e-6,
                  lr0=1e-3):
        cfg = PlateauConfig(factor=factor, patience=patience, min_lr=min_lr)
        state = plateau_init()
        lr = jnp.float32(lr0)
        lrs = []
        for l in losses:
            state, lr = plateau_update(state, jnp.float32(l), lr, cfg)
            lrs.append(float(lr))
        return np.asarray(lrs)

    def test_monotone_decreasing_losses_keep_lr(self):
        losses = np.linspace(1.0, 0.1, 300)
        np.testing.assert_allclose(self._run_ours(losses, patience=20),
                                   self._run_torch(losses, patience=20),
                                   rtol=1e-6)

    def test_plateau_reduces_lr_like_torch(self):
        # improve for 50 steps then plateau hard for 600
        losses = np.concatenate([np.linspace(1.0, 0.5, 50),
                                 np.full(600, 0.5)])
        ours = self._run_ours(losses, patience=100)
        ref = self._run_torch(losses, patience=100)
        np.testing.assert_allclose(ours, ref, rtol=1e-6)
        assert ours[-1] < 1e-3  # it did reduce

    def test_min_lr_floor(self):
        losses = np.full(5000, 1.0)
        ours = self._run_ours(losses, patience=10, factor=0.1, min_lr=1e-6)
        ref = self._run_torch(losses, patience=10, factor=0.1, min_lr=1e-6)
        np.testing.assert_allclose(ours, ref, rtol=1e-6)
        np.testing.assert_allclose(ours[-1], 1e-6, rtol=1e-6)

    def test_noisy_losses_parity(self):
        rng = np.random.default_rng(3)
        losses = 0.5 + 0.1 * rng.standard_normal(800).astype(np.float64)
        np.testing.assert_allclose(self._run_ours(losses, patience=30),
                                   self._run_torch(losses, patience=30),
                                   rtol=1e-6)


def test_clip_by_global_norm():
    from inraudio_tpu.train.optim import clip_by_global_norm
    g = {"a": jnp.asarray([3.0, 4.0]), "b": jnp.asarray([0.0])}  # norm 5
    c = clip_by_global_norm(g, 1.0)
    norm = float(jnp.sqrt(sum(jnp.sum(x ** 2) for x in jax.tree.leaves(c))))
    np.testing.assert_allclose(norm, 1.0, rtol=1e-6)
    # below the cap -> unchanged
    c2 = clip_by_global_norm(g, 10.0)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(c2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_grad_clip_in_train_step():
    from inraudio_tpu.models import SirenSnakeTanhConfig, build_model
    from inraudio_tpu.train import TrainConfig
    from inraudio_tpu.train.loop import init_train_state, make_train_step
    cfg = TrainConfig(total_steps=1, grad_clip_norm=1e-6)  # crush updates
    model = build_model("mlp", SirenSnakeTanhConfig(
        first_omega_0=30.0, hidden_features=16, num_sine=1, num_snake=0))
    st = init_train_state(model, jax.random.PRNGKey(0), cfg)
    coords = jnp.linspace(-1, 1, 64).reshape(-1, 1)
    targets = jnp.sin(3 * coords)
    new_st, _ = make_train_step(model, cfg)(st, coords, targets)
    # with the clip at 1e-6 the params barely move
    for a, b in zip(jax.tree.leaves(st.params), jax.tree.leaves(new_st.params)):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-2
