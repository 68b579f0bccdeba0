"""Loss-landscape visualization: random-plane scan with filter
normalization.

Reference C25 (run.py:192-208) uses the ``loss_landscapes`` pip package:
``random_plane(model, metric, distance=2, steps=30, normalization='filter',
deepcopy_model=True)`` on CPU.  The rebuild owns the op and keeps it on
device: sample two random pytree directions, filter-normalise each leaf
(per-output-row scaling to the parameter's norm — Li et al. 2018), then
evaluate the loss over the (steps x steps) grid of parameter perturbations
with a vmapped forward.  The reference's CPU round-trip becomes one batched
device computation.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


def _filter_normalize(direction: Any, params: Any) -> Any:
    """Scale each leaf of ``direction`` so its norm matches the matching
    params leaf (per-row for matrices — 'filter' normalization)."""
    def norm_leaf(d, p):
        if d.ndim >= 2:
            d_norm = jnp.linalg.norm(d, axis=-1, keepdims=True)
            p_norm = jnp.linalg.norm(p, axis=-1, keepdims=True)
            return d * (p_norm / (d_norm + 1e-12))
        d_norm = jnp.linalg.norm(d)
        p_norm = jnp.linalg.norm(p)
        return d * (p_norm / (d_norm + 1e-12))
    return jax.tree.map(norm_leaf, direction, params)


def random_plane(loss_fn: Callable[[Any], jax.Array], params: Any,
                 key: jax.Array, distance: float = 2.0, steps: int = 30,
                 points_per_batch: int = 4) -> np.ndarray:
    """(steps, steps) loss surface over a filter-normalised random plane
    through ``params`` (reference run.py:194-201 semantics).

    ``points_per_batch`` bounds how many plane points are evaluated
    concurrently: each point is a FULL-batch loss (potentially (n, h)
    activations for a whole clip), so vmapping a complete 30-point row at
    once would multiply peak activation memory 30x and OOM exactly on the
    long clips the visualization targets.
    """
    k1, k2 = jax.random.split(key)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys1 = jax.random.split(k1, len(leaves))
    keys2 = jax.random.split(k2, len(leaves))
    d1 = treedef.unflatten([jax.random.normal(k, l.shape, l.dtype)
                            for k, l in zip(keys1, leaves)])
    d2 = treedef.unflatten([jax.random.normal(k, l.shape, l.dtype)
                            for k, l in zip(keys2, leaves)])
    d1 = _filter_normalize(d1, params)
    d2 = _filter_normalize(d2, params)

    # offsets in [-distance/2, +distance/2] like loss_landscapes' centered plane
    alphas = jnp.linspace(-0.5, 0.5, steps) * distance
    betas = jnp.linspace(-0.5, 0.5, steps) * distance

    # params/d1/d2 enter as jit ARGUMENTS, not closure captures: a closed-over
    # device array is embedded as an MLIR constant whose value is fetched
    # device->host at lowering time (slow and serialized behind pending work
    # on the axon tunnel), and would also bloat the lowered module by the
    # full parameter size per plane batch.
    def at(params, d1, d2, alpha, beta):
        p = jax.tree.map(lambda p0, a, b: p0 + alpha * a + beta * b,
                         params, d1, d2)
        return loss_fn(p)

    m = max(1, min(points_per_batch, steps))
    batch = jax.jit(jax.vmap(at, in_axes=(None, None, None, 0, 0)))
    aa, bb = np.meshgrid(np.asarray(alphas), np.asarray(betas),
                         indexing="ij")
    flat_a = jnp.asarray(aa.reshape(-1))
    flat_b = jnp.asarray(bb.reshape(-1))
    total = flat_a.shape[0]
    pad = (-total) % m
    if pad:  # keep one compiled shape for every batch
        flat_a = jnp.concatenate([flat_a, jnp.zeros(pad, flat_a.dtype)])
        flat_b = jnp.concatenate([flat_b, jnp.zeros(pad, flat_b.dtype)])
    vals = [np.asarray(batch(params, d1, d2, flat_a[s:s + m], flat_b[s:s + m]))
            for s in range(0, total + pad, m)]
    return np.concatenate(vals)[:total].reshape(steps, steps)


def plot_landscape(surface: np.ndarray, path: str) -> None:
    """Surface plot PNG (reference run.py:202-208)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(projection="3d")
    s = np.asarray(surface)
    x, y = np.meshgrid(np.arange(s.shape[0]), np.arange(s.shape[1]),
                       indexing="ij")
    ax.plot_surface(x, y, s, cmap="viridis", linewidth=0)
    ax.set_title("loss landscape (random plane, filter-normalised)")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
