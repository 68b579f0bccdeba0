"""Baseline leaky-ReLU MLP.

Reference models.py:61-78 declares a "ReLU" MLP but passes the
``nn.LeakyReLU(0.01)`` module as ``nn.Linear``'s third positional argument
(the bias flag), so no nonlinearity is ever applied and the network is deep
linear (verified by execution — SURVEY.md C12).  The rebuild fixes this: the
leaky-ReLU IS applied between layers.  Set ``negative_slope=1.0`` to
reproduce the reference's accidental deep-linear behavior exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .siren import linear_apply, linear_init

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ReluMLPConfig:
    in_features: int = 1
    hidden_features: int = 256
    hidden_layers: int = 3
    out_features: int = 1
    negative_slope: float = 0.01


def relu_mlp_init(key: jax.Array, cfg: ReluMLPConfig) -> Params:
    dims = ([cfg.in_features] + [cfg.hidden_features] * (cfg.hidden_layers + 1)
            + [cfg.out_features])
    keys = jax.random.split(key, len(dims) - 1)
    layers = []
    for k, i, o in zip(keys, dims[:-1], dims[1:]):
        bound = 1.0 / float(np.sqrt(i))  # torch nn.Linear default init
        layers.append(linear_init(k, i, o, bound))
    return {"layers": layers}


def relu_mlp_apply(params: Params, cfg: ReluMLPConfig,
                   coords: jax.Array) -> jax.Array:
    x = coords.astype(jnp.float32)
    for p in params["layers"][:-1]:
        x = jax.nn.leaky_relu(linear_apply(p, x), cfg.negative_slope)
    return linear_apply(params["layers"][-1], x)
