"""Joint fit of a shared modulated-SIREN backbone + per-chunk modulations.

Auto-decoder training (no inner loop): one vmapped forward over the chunk
population computes every chunk's MSE; ``jax.grad`` of the mean then
yields the backbone gradient (mean over chunks) AND each modulation row's
own gradient in a single backward pass — the same chunk-axis batch the
multi-INR path feeds the MXU, so the step cost matches a multi-INR step
at equal shapes.  Adam + torch-parity ReduceLROnPlateau + optional
global-norm clipping as carried state inside a jitted ``lax.scan``
(``train/optim.py``), best-state snapshot on the mean loss.

This is the training half of the shared-backbone codec mode
(``codec.encode_modulated``); the reference trains one monolithic INR per
clip and shares nothing across time (run.py:30-400).
"""

from __future__ import annotations

import functools
import time
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.modulated import modulated_apply, modulated_init
from ..models.siren import SirenSnakeTanhConfig
from .loop import TrainConfig
from .optim import (AdamConfig, PlateauConfig, adam_init, adam_update,
                    clip_by_global_norm, plateau_init, plateau_update)


class ModulatedFitResult(NamedTuple):
    shared: Any            # backbone params (best snapshot)
    mods: jnp.ndarray      # (k, mod_dim) modulations (best snapshot)
    loss_history: np.ndarray   # (steps,) mean chunk loss
    train_time_s: float


def modulated_fit(model_cfg: SirenSnakeTanhConfig,
                  targets: np.ndarray,
                  coords: np.ndarray,
                  cfg: TrainConfig | None = None,
                  key: jax.Array | None = None,
                  mesh=None,
                  film_scale: bool = False,
                  mods_lr_mult: float = 1.0,
                  frozen_shared: Any = None,
                  frozen_mods: np.ndarray | None = None,
                  init_shared: Any = None) -> ModulatedFitResult:
    """Fit backbone + modulations to a (k, n, 1) chunk-target stack.

    ``coords`` is the shared per-chunk grid (n, d), kept as a HOST
    constant in the jitted closure (device arrays embed as MLIR constants
    whose values are fetched during lowering — the round-2 "218 s
    compile"; see tests/test_lowering.py).

    ``mesh``: chunk-axis data parallelism — modulations, Adam moments and
    targets shard on the chunk axis, the backbone replicates, and XLA SPMD
    inserts the backbone-gradient all-reduce (the mean over chunks rides
    ICI; no hand-written collectives).  Chunks must pad to a multiple of
    the mesh size upstream (the codec's chunk counts are arbitrary, so
    pass a 1-device mesh — or None — unless the caller padded).

    ``mods_lr_mult``: the modulations' learning rate as a multiple of the
    backbone's (they are per-chunk and low-dimensional, so they often
    tolerate — and benefit from — a hotter rate).  The plateau scheduler
    scales both rates together, preserving the ratio.

    ``frozen_shared``: a previously trained backbone (host pytree) —
    ONLY the modulations train against it (the amortised-codec mode:
    per-clip storage is modulations alone, the backbone ships once).
    The backbone stays a host-numpy closure constant.

    ``frozen_mods``: the dual — modulations stay fixed (host constant,
    e.g. at their dequantized int8 values) and ONLY the backbone trains,
    absorbing part of the modulation-quantization error (the modulated
    analogue of the per-chunk codec's quantization-aware refit).
    ``init_shared`` warm-starts the backbone (used with frozen_mods)."""
    cfg = cfg or TrainConfig()
    key = key if key is not None else jax.random.PRNGKey(0)
    if cfg.loss_mode != "mse" or cfg.alpha != 0.0:
        raise ValueError("modulated_fit supports loss_mode='mse', alpha=0")
    if frozen_shared is not None and mods_lr_mult != 1.0:
        raise ValueError("mods_lr_mult is meaningless with frozen_shared — "
                         "cfg.learning_rate IS the modulation rate")
    if frozen_mods is not None and frozen_shared is not None:
        raise ValueError("frozen_mods and frozen_shared together leave "
                         "nothing to train")
    if init_shared is not None and frozen_shared is not None:
        raise ValueError("init_shared is discarded under frozen_shared — "
                         "pass one or the other")
    if frozen_mods is not None and mods_lr_mult != 1.0:
        raise ValueError("mods_lr_mult is meaningless with frozen_mods")
    k = targets.shape[0]
    coords = np.asarray(coords, np.float32)
    params = modulated_init(key, model_cfg, k, film_scale)
    if init_shared is not None:
        params = dict(params, shared=jax.tree.map(
            lambda x: jnp.asarray(np.asarray(x, np.float32)), init_shared))
    if frozen_shared is not None:
        host_shared = jax.tree.map(
            lambda x: np.asarray(x, np.float32), frozen_shared)
        params = {"mods": params["mods"]}
    if frozen_mods is not None:
        host_mods = np.asarray(frozen_mods, np.float32)
        params = {"shared": params["shared"]}
    adam_cfg = AdamConfig(lr=cfg.learning_rate)
    plat_cfg = PlateauConfig(factor=cfg.plateau_factor,
                             patience=cfg.plateau_patience,
                             min_lr=cfg.min_learning_rate)

    def loss_fn(p, t):
        shared = host_shared if frozen_shared is not None else p["shared"]
        mods = host_mods if frozen_mods is not None else p["mods"]
        out = jax.vmap(lambda m: modulated_apply(
            shared, model_cfg, coords, m, film_scale=film_scale))(mods)
        return jnp.mean(jnp.square(out - t))

    def step(carry, t):
        p, opt, plat, best_loss, best_p = carry
        loss, grads = jax.value_and_grad(loss_fn)(p, t)
        # snapshot the PRE-update params — they are the ones that achieved
        # ``loss`` (same semantics as loop.make_train_step)
        if cfg.track_best:
            improved = loss < best_loss
            best_loss = jnp.where(improved, loss, best_loss)
            best_p = jax.tree.map(
                lambda b, cur: jnp.where(improved, cur, b), best_p, p)
        if cfg.grad_clip_norm > 0:
            grads = clip_by_global_norm(grads, cfg.grad_clip_norm)
        if mods_lr_mult == 1.0:
            p, opt = adam_update(opt, grads, p, adam_cfg)
            plat, lr = plateau_update(plat, loss, opt.lr, plat_cfg)
            opt = opt._replace(lr=lr)
        else:
            sh, opt_sh = adam_update(opt["shared"], grads["shared"],
                                     p["shared"], adam_cfg)
            mo, opt_mo = adam_update(opt["mods"], grads["mods"],
                                     p["mods"], adam_cfg)
            p = {"shared": sh, "mods": mo}
            plat, lr = plateau_update(plat, loss, opt_sh.lr, plat_cfg)
            opt = {"shared": opt_sh._replace(lr=lr),
                   "mods": opt_mo._replace(lr=lr * mods_lr_mult)}
        return (p, opt, plat, best_loss, best_p), loss

    @functools.partial(jax.jit, donate_argnums=(0,),
                       static_argnames=("length",))
    def run(carry, t, length):
        return jax.lax.scan(lambda c, _: step(c, t), carry, None,
                            length=length)

    targets_d = jnp.asarray(targets, jnp.float32)
    if mesh is not None and mesh.devices.size > 1:
        if k % mesh.devices.size:
            raise ValueError(
                f"{k} chunks do not shard over {mesh.devices.size} devices "
                "— pad the population to a mesh-size multiple")
        from jax.sharding import NamedSharding, PartitionSpec as P
        chunk_sh = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        params = dict(params)
        if "shared" in params:
            params["shared"] = jax.device_put(params["shared"], rep)
        if "mods" in params:
            params["mods"] = jax.device_put(params["mods"], chunk_sh)
        targets_d = jax.device_put(targets_d, chunk_sh)
    # the best snapshot must be a distinct buffer: the carry is donated,
    # and donating the same array twice is an error.  With
    # track_best=False no snapshot is carried at all (no duplicate params,
    # no per-step select).
    best0 = jax.tree.map(jnp.copy, params) if cfg.track_best else ()
    if mods_lr_mult == 1.0:
        opt0 = adam_init(params, adam_cfg)
    else:
        opt0 = {"shared": adam_init(params["shared"], adam_cfg),
                "mods": adam_init(
                    params["mods"],
                    AdamConfig(lr=cfg.learning_rate * mods_lr_mult))}
    carry = (params, opt0, plateau_init(), jnp.float32(jnp.inf), best0)
    t0 = time.time()
    hists = []
    done = 0
    chunk = max(1, min(cfg.scan_chunk, cfg.total_steps))
    while done < cfg.total_steps:
        m = min(chunk, cfg.total_steps - done)
        carry, h = run(carry, targets_d, length=m)
        hists.append(h)
        done += m
    best_p = carry[4] if cfg.track_best else carry[0]
    # real device->host fetch before the clock (axon block_until_ready
    # can return early; see train/loop.py)
    np.asarray(jax.tree_util.tree_leaves(best_p)[0])
    train_time = time.time() - t0
    hist = np.concatenate([np.asarray(h) for h in hists])
    shared = (host_shared if frozen_shared is not None
              else best_p["shared"])
    mods = host_mods if frozen_mods is not None else best_p["mods"]
    return ModulatedFitResult(shared=shared, mods=mods,
                              loss_history=hist, train_time_s=train_time)
