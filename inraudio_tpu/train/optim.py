"""Adam + ReduceLROnPlateau as explicit jax-carried state.

The reference drives full-batch Adam (lr=1e-3) with
``ReduceLROnPlateau(mode='min', factor=0.8, patience=200, min_lr=1e-6)``
stepped every iteration on the current loss (run.py:104-117, 187).  torch's
scheduler is host-side, data-dependent control flow; here both optimizer and
scheduler are pure pytree states updated with ``jnp.where`` so the whole
train step stays inside one jit with zero host sync (the reference pays a
``loss.item()`` device round-trip every step, run.py:171,180).

Adam matches torch.optim.Adam exactly: bias-corrected first/second moments,
eps added after the sqrt, no weight decay.  The plateau scheduler matches
torch.optim.lr_scheduler.ReduceLROnPlateau defaults: threshold=1e-4 in
'rel' mode (new < best*(1-1e-4) counts as improvement), cooldown=0.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AdamConfig:
    lr: float = 1e-3
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8


@dataclasses.dataclass(frozen=True)
class PlateauConfig:
    """torch ReduceLROnPlateau knobs the reference sets (run.py:106,117)."""

    factor: float = 0.8
    patience: int = 200
    min_lr: float = 1e-6
    threshold: float = 1e-4  # torch default, 'rel' mode, mode='min'


class AdamState(NamedTuple):
    step: jax.Array   # int32 scalar
    mu: Any           # first-moment pytree
    nu: Any           # second-moment pytree
    lr: jax.Array     # float32 scalar — current LR (scheduler-owned)


class PlateauState(NamedTuple):
    best: jax.Array       # best loss seen
    num_bad: jax.Array    # int32 steps since improvement


def adam_init(params: Any, cfg: AdamConfig) -> AdamState:
    zeros = lambda: jax.tree.map(jnp.zeros_like, params)
    return AdamState(step=jnp.int32(0), mu=zeros(), nu=zeros(),
                     lr=jnp.float32(cfg.lr))


def clip_by_global_norm(grads: Any, max_norm: float) -> Any:
    """Scale the gradient pytree so its global L2 norm is <= max_norm.

    Tames the occasional diverging chunk in multi-INR fits (a few chunks
    blow up at learning rates every other chunk likes) without changing
    well-behaved updates."""
    sq = sum(jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads))
    norm = jnp.sqrt(sq)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-20))
    return jax.tree.map(lambda g: g * scale, grads)


def adam_update(state: AdamState, grads: Any, params: Any,
                cfg: AdamConfig) -> tuple[Any, AdamState]:
    step = state.step + 1
    mu = jax.tree.map(lambda m, g: cfg.b1 * m + (1 - cfg.b1) * g,
                      state.mu, grads)
    nu = jax.tree.map(lambda v, g: cfg.b2 * v + (1 - cfg.b2) * g * g,
                      state.nu, grads)
    c1 = 1 - cfg.b1 ** step.astype(jnp.float32)
    c2 = 1 - cfg.b2 ** step.astype(jnp.float32)
    new_params = jax.tree.map(
        lambda p, m, v: p - state.lr * (m / c1) / (jnp.sqrt(v / c2) + cfg.eps),
        params, mu, nu)
    return new_params, AdamState(step=step, mu=mu, nu=nu, lr=state.lr)


def plateau_init() -> PlateauState:
    return PlateauState(best=jnp.float32(jnp.inf), num_bad=jnp.int32(0))


def plateau_update(state: PlateauState, loss: jax.Array, lr: jax.Array,
                   cfg: PlateauConfig) -> tuple[PlateauState, jax.Array]:
    """One scheduler.step(loss): returns (new state, new lr).

    Branch-free: improvement resets the bad-step counter; ``patience``
    consecutive non-improving steps multiply lr by ``factor`` (floored at
    min_lr) and reset the counter.
    """
    improved = loss < state.best * (1.0 - cfg.threshold)
    best = jnp.where(improved, loss, state.best)
    num_bad = jnp.where(improved, 0, state.num_bad + 1)
    reduce_now = num_bad > cfg.patience
    new_lr = jnp.where(reduce_now, jnp.maximum(lr * cfg.factor, cfg.min_lr), lr)
    num_bad = jnp.where(reduce_now, 0, num_bad)
    return PlateauState(best=best, num_bad=num_bad), new_lr
