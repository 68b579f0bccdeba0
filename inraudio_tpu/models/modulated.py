"""Shared-backbone modulated SIREN: one network, per-chunk shift vectors.

The multi-INR codec stores a FULL parameter set per chunk (~50 KB at
h=128); here one backbone ``theta`` is shared by every chunk and each
chunk stores only a modulation vector ``m`` — one additive pre-activation
shift per hidden unit of every non-final layer (FiLM-shift style, the
mechanism behind COIN++-class INR codecs, Dupont et al. 2022).  Per-chunk
storage collapses to ``mod_dim = hidden * (num_layers - 1)`` floats
(~0.25-2 KB), so the backbone cost amortises across the clip and the
rate-distortion frontier moves wherever neighbouring chunks share
structure.  Trained jointly (auto-decoder style): the backbone gradient is
the mean over chunks, each modulation's gradient is its own chunk's —
both from ONE vmapped forward, which on TPU is the same chunk-axis batch
the multi-INR path already feeds the MXU.

The reference has nothing comparable — one monolithic INR per clip
(run.py:30-400).  Layer recipe and init are the production
SirenSnakeTanh's (models.py:306-386 via siren.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .siren import (Params, SirenSnakeTanhConfig, linear_apply, snake_apply,
                    siren_snake_tanh_init)


def mod_dim(cfg: SirenSnakeTanhConfig, film_scale: bool = False) -> int:
    """Modulation vector length: one shift — plus one scale when
    ``film_scale`` — per hidden unit of every layer except the output
    head."""
    return (cfg.hidden_features * (len(cfg.layer_kinds) - 1)
            * (2 if film_scale else 1))


def modulated_init(key: jax.Array, cfg: SirenSnakeTanhConfig,
                   num_chunks: int, film_scale: bool = False) -> Params:
    """-> {'shared': backbone params, 'mods': (num_chunks, mod_dim) zeros}.

    Zero modulations leave the backbone's function unchanged at init
    (``sin(w·x + 0)``; FiLM scales enter as ``1 + s`` so zero is
    identity), so early training is plain multi-chunk SIREN fitting and
    the modulations differentiate the chunks as the shared features
    stabilise."""
    if cfg.scaled_first:
        raise ValueError("modulated backbone does not support scaled_first")
    shared = siren_snake_tanh_init(key, cfg)
    mods = jnp.zeros((num_chunks, mod_dim(cfg, film_scale)), jnp.float32)
    return {"shared": shared, "mods": mods}


def modulated_apply(shared: Params, cfg: SirenSnakeTanhConfig,
                    coords: jax.Array, mod: jax.Array,
                    film_scale: bool = False) -> jax.Array:
    """Forward one chunk: the SirenSnakeTanh stack with ``mod``'s per-layer
    slice added to each non-final pre-activation (a phase shift for sine
    layers); with ``film_scale`` each layer also gets a per-unit gain
    ``(1 + s)`` on the pre-activation (per-unit FREQUENCY modulation for
    sine layers — full FiLM).  vmap over ``mod`` (and targets) for the
    population."""
    kinds = cfg.layer_kinds
    h = cfg.hidden_features
    per = 2 * h if film_scale else h
    x = coords.astype(jnp.float32)
    for i, (kind, p) in enumerate(zip(kinds, shared["layers"])):
        last = i == len(kinds) - 1
        if last:
            m, s = None, None
        else:
            m = mod[i * per:i * per + h]
            s = (1.0 + mod[i * per + h:i * per + 2 * h]) if film_scale \
                else None

        def filmed(pre):
            return pre + m if s is None else s * pre + m

        if kind == "sine_first":
            # fp32 + exact matmul: omega0 * coord reaches ~2e4 (DESIGN.md)
            pre = cfg.first_omega_0 * linear_apply(p, x, jnp.float32,
                                                   precision="highest")
            x = jnp.sin(filmed(pre))
        elif kind == "sine":
            # 'high' = bf16x3 on TPU, no-op elsewhere: the one-pass bf16
            # default under sin's omega amplification caps trained
            # reconstructions ~25 dB short (r4 bisect, siren.py)
            pre = cfg.hidden_omega_0 * linear_apply(p, x, precision="high")
            x = jnp.sin(pre if last else filmed(pre))
        elif kind == "linear_snake":
            x = snake_apply(p["snake_a"],
                            filmed(linear_apply(p, x, precision="high")))
        elif kind == "linear_tanh":
            x = jnp.tanh(filmed(linear_apply(p, x, precision="high")))
        elif kind == "linear_last":
            x = linear_apply(p, x, precision="high")
        else:  # pragma: no cover
            raise ValueError(kind)
    return x
