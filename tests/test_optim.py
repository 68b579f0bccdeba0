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
