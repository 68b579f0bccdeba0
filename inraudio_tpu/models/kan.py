"""Kolmogorov-Arnold network (efficient-KAN style) as functional JAX.

TPU-native re-design of reference kan.py:6-285 (the vendored efficient-kan
``KANLinear``/``KAN``).  Per layer the output is

    silu(x) @ base_w.T  +  b_splines(x).reshape(batch, -1) @ scaled_spline_w

(kan.py:153-166).  The B-spline bases are degree-``spline_order`` Cox-de-Boor
recursions over a per-input-feature knot grid (kan.py:78-111); on TPU the
recursion unrolls into ``spline_order`` elementwise VPU passes over a
(batch, in, n_knots) tensor, and the spline contraction becomes one MXU
matmul of shape (batch, in*n_coef) @ (in*n_coef, out).

Also provided, matching the reference's full surface:
- ``curve2coeff`` least-squares init/refit (kan.py:113-143) via
  ``jnp.linalg.lstsq`` under vmap,
- ``update_grid`` data-adaptive knot re-gridding (kan.py:168-215) — host-rare,
  deliberately unjitted,
- ``regularization_loss`` L1+entropy proxy (kan.py:217-237).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class KANConfig:
    """Reference defaults (kan.py:242-257; runner uses KAN([1, h, h, 1]),
    run.py:92-93)."""

    layers_hidden: tuple[int, ...] = (1, 256, 256, 1)
    grid_size: int = 5
    spline_order: int = 3
    scale_noise: float = 0.1
    scale_base: float = 1.0
    scale_spline: float = 1.0
    grid_eps: float = 0.02
    grid_range: tuple[float, float] = (-1.0, 1.0)
    standalone_spline_scaler: bool = True


def _make_grid(cfg: KANConfig, in_features: int) -> jax.Array:
    """Uniform knot grid extended by spline_order on both sides
    (kan.py:27-36): shape (in_features, grid_size + 2*order + 1)."""
    h = (cfg.grid_range[1] - cfg.grid_range[0]) / cfg.grid_size
    k = np.arange(-cfg.spline_order, cfg.grid_size + cfg.spline_order + 1)
    grid = k * h + cfg.grid_range[0]
    return jnp.asarray(np.tile(grid, (in_features, 1)), dtype=jnp.float32)


def b_splines(x: jax.Array, grid: jax.Array, spline_order: int) -> jax.Array:
    """Cox-de-Boor bases: (batch, in) -> (batch, in, grid_size + order).

    Degree-0 indicator functions refined ``spline_order`` times
    (kan.py:78-111).  Partition of unity holds on the interior grid range.
    """
    x = x[..., None]  # (batch, in, 1)
    g = grid[None]    # (1, in, n_knots)
    bases = ((x >= g[..., :-1]) & (x < g[..., 1:])).astype(x.dtype)
    for k in range(1, spline_order + 1):
        left = (x - g[..., : -(k + 1)]) / (g[..., k:-1] - g[..., : -(k + 1)])
        right = (g[..., k + 1:] - x) / (g[..., k + 1:] - g[..., 1:-k])
        bases = left * bases[..., :-1] + right * bases[..., 1:]
    return bases


def curve2coeff(x: jax.Array, y: jax.Array, grid: jax.Array,
                spline_order: int) -> jax.Array:
    """Least-squares spline coefficients interpolating (x, y) samples
    (kan.py:113-143): x (batch, in), y (batch, in, out) ->
    coeffs (out, in, n_coef)."""
    a = jnp.transpose(b_splines(x, grid, spline_order), (1, 0, 2))  # (in, batch, n_coef)
    b = jnp.transpose(y, (1, 0, 2))                                 # (in, batch, out)
    sol = jax.vmap(lambda ai, bi: jnp.linalg.lstsq(ai, bi)[0])(a, b)
    return jnp.transpose(sol, (2, 0, 1))                            # (out, in, n_coef)


def _kaiming_uniform(key, shape, fan_in, a):
    gain = float(np.sqrt(2.0 / (1.0 + a * a)))
    bound = gain * float(np.sqrt(3.0 / fan_in))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def kan_linear_init(key: jax.Array, cfg: KANConfig, in_features: int,
                    out_features: int) -> Params:
    """KANLinear.reset_parameters (kan.py:56-76): kaiming-uniform base weight
    (a = sqrt(5)*scale_base), noise-interpolating spline weight via
    curve2coeff, kaiming-uniform standalone spline scaler."""
    kb, kn, ks = jax.random.split(key, 3)
    grid = _make_grid(cfg, in_features)
    n_coef = cfg.grid_size + cfg.spline_order
    base_w = _kaiming_uniform(kb, (out_features, in_features), in_features,
                              float(np.sqrt(5.0)) * cfg.scale_base)
    # Noise targets at the interior grid points (kan.py:61-66).
    noise = (jax.random.uniform(kn, (cfg.grid_size + 1, in_features,
                                     out_features), jnp.float32) - 0.5)
    noise = noise * cfg.scale_noise / cfg.grid_size
    interior = grid.T[cfg.spline_order:-cfg.spline_order]  # (grid_size+1, in)
    spline_w = curve2coeff(interior, noise, grid, cfg.spline_order)
    if not cfg.standalone_spline_scaler:
        spline_w = spline_w * cfg.scale_spline
    p: Params = {"base_w": base_w, "spline_w": spline_w, "grid": grid}
    if cfg.standalone_spline_scaler:
        p["spline_scaler"] = _kaiming_uniform(
            ks, (out_features, in_features), in_features,
            float(np.sqrt(5.0)) * cfg.scale_spline)
    assert spline_w.shape == (out_features, in_features, n_coef)
    return p


def _scaled_spline_weight(p: Params) -> jax.Array:
    """spline_w times the per-(out, in) scaler when standalone
    (kan.py:145-151)."""
    if "spline_scaler" in p:
        return p["spline_w"] * p["spline_scaler"][..., None]
    return p["spline_w"]


def kan_linear_apply(p: Params, cfg: KANConfig, x: jax.Array) -> jax.Array:
    """silu(x) @ base_w.T + flat_bases @ flat_spline_w.T (kan.py:153-166)."""
    x = x.astype(jnp.float32)
    grid = jax.lax.stop_gradient(p["grid"])  # knots are a buffer, not a param
    base = jax.nn.silu(x) @ p["base_w"].T
    bases = b_splines(x, grid, cfg.spline_order)
    sw = _scaled_spline_weight(p)
    out_features = sw.shape[0]
    spline = bases.reshape(x.shape[0], -1) @ sw.reshape(out_features, -1).T
    return base + spline


def kan_init(key: jax.Array, cfg: KANConfig) -> Params:
    keys = jax.random.split(key, len(cfg.layers_hidden) - 1)
    layers = [
        kan_linear_init(k, cfg, i, o)
        for k, i, o in zip(keys, cfg.layers_hidden[:-1], cfg.layers_hidden[1:])
    ]
    return {"layers": layers}


def kan_apply(params: Params, cfg: KANConfig, x: jax.Array) -> jax.Array:
    for p in params["layers"]:
        x = kan_linear_apply(p, cfg, x)
    return x


# ---------------------------------------------------------------------------
# Grid update + regularisation (reference surface the runner leaves unused)
# ---------------------------------------------------------------------------

def kan_linear_update_grid(p: Params, cfg: KANConfig, x: jax.Array,
                           margin: float = 0.01) -> Params:
    """Data-adaptive re-gridding (kan.py:168-215): blend the sorted-activation
    adaptive grid with a uniform grid by ``grid_eps``, then refit the spline
    coefficients against the layer's current spline outputs.  Host-rare; not
    intended to run inside jit."""
    x = x.astype(jnp.float32)
    batch = x.shape[0]
    bases = b_splines(x, p["grid"], cfg.spline_order)          # (b, in, c)
    sw = _scaled_spline_weight(p)                              # (out, in, c)
    # Current spline output per (sample, in, out) — unreduced (kan.py:177-181).
    y = jnp.einsum("bic,oic->bio", bases, sw)

    x_sorted = jnp.sort(x, axis=0)
    idx = (jnp.arange(cfg.grid_size + 1) * (batch - 1) / cfg.grid_size).astype(jnp.int32)
    grid_adaptive = x_sorted[idx].T                            # (in, g+1)
    uniform_step = (x_sorted[-1] - x_sorted[0] + 2 * margin) / cfg.grid_size
    grid_uniform = (jnp.arange(cfg.grid_size + 1)[None, :] * uniform_step[:, None]
                    + x_sorted[0][:, None] - margin)           # (in, g+1)
    grid = cfg.grid_eps * grid_uniform + (1 - cfg.grid_eps) * grid_adaptive
    # Extend spline_order knots below and above (kan.py:196-204).
    below = grid[:, :1] - uniform_step[:, None] * jnp.arange(
        cfg.spline_order, 0, -1, dtype=jnp.float32)[None, :]
    above = grid[:, -1:] + uniform_step[:, None] * jnp.arange(
        1, cfg.spline_order + 1, dtype=jnp.float32)[None, :]
    grid = jnp.concatenate([below, grid, above], axis=1)
    new_p = dict(p)
    new_p["grid"] = grid
    new_p["spline_w"] = curve2coeff(x, y, grid, cfg.spline_order)
    return new_p


def kan_update_grid(params: Params, cfg: KANConfig, x: jax.Array) -> Params:
    """Whole-network data-adaptive re-gridding — the reference's
    ``KAN.forward(x, update_grid=True)`` chaining (kan.py:274-279): layer i's
    grid is updated from the activations that actually reach it, then ``x``
    is propagated through the UPDATED layer to feed layer i+1's update.

    Host-rare (between fit scan rounds via ``TrainConfig.update_grid_every``);
    deliberately unjitted — the sort+lstsq refit is not hot-loop code."""
    x = jnp.asarray(x, dtype=jnp.float32)
    new_layers = []
    for p in params["layers"]:
        p2 = kan_linear_update_grid(p, cfg, x)
        new_layers.append(p2)
        x = kan_linear_apply(p2, cfg, x)
    return {"layers": new_layers}


def kan_regularization_loss(params: Params,
                            regularize_activation: float = 1.0,
                            regularize_entropy: float = 1.0) -> jax.Array:
    """Mean-|spline weight| L1 proxy + entropy over the per-edge L1 mass
    (kan.py:217-237)."""
    total = jnp.float32(0.0)
    for p in params["layers"]:
        l1 = jnp.mean(jnp.abs(p["spline_w"]), axis=-1)  # (out, in)
        act = jnp.sum(l1)
        prob = l1 / (act + 1e-12)
        entropy = -jnp.sum(prob * jnp.log(prob + 1e-12))
        total = total + regularize_activation * act + regularize_entropy * entropy
    return total
