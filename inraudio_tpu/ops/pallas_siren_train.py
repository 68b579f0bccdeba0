"""Differentiable fused SIREN stack: Pallas forward + custom-VJP backward.

Training-path companion to ``pallas_siren.fused_siren_apply`` (see that
module for the fusion rationale).  Under plain XLA autodiff, every layer of
the backward pass reloads the saved (n, h) activations from HBM; here the
backward kernel RECOMPUTES the forward per coordinate tile inside VMEM
(rematerialisation — FLOPs are cheap on the MXU, HBM bytes are not) and
accumulates the weight gradients across the sequential grid in VMEM-resident
output blocks.  HBM traffic per step collapses to:

    read coords + cotangent once, write dW/db/da once  (vs. ~2 x L x (n, h))

Gradients returned match ``jax.grad`` of the jnp reference path to float32
tolerance (tests/test_pallas_train.py).  Layer recipe support mirrors the
inference kernel: sine_first / sine / linear_snake / linear_tanh /
linear_last with in_features <= 8.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.siren import SirenSnakeTanhConfig
from .pallas_siren import (_MAX_SMALL_IN, _fast_cos, _fast_sin,
                           _flatten_params, _fused_apply_jit,
                           _grad_dot_mode, _kernel_dot,
                           _pick_block_rows, _prep_rff_bt,
                           _rff_features_in_kernel, _round_up)

Params = dict[str, Any]


def _layer_param_slots(kinds):
    """Number of flat-param entries per layer: w, b, (+a for snake)."""
    return [3 if k == "linear_snake" else 2 for k in kinds]


def _fwd_pres(x, refs, kinds, omegas, in_features, compute_dtype,
              approx_sin=False, rff_features=0, bt_ref=None,
              f32_mode=None, sin_degree=11):
    """Recompute forward, returning per-layer (input, pre) pairs.

    With ``rff_features``, layer 0's saved input is the (cos_v, sin_v)
    feature pair (the encoding is recomputed in VMEM, never stored in HBM).

    ``f32_mode`` / ``sin_degree`` override the env-default matmul split /
    polynomial degree for this trace — the training-side precision-tier
    levers (quality-scheduled training re-dispatches between tiers).
    """
    if approx_sin:
        sin_fn = functools.partial(_fast_sin, degree=sin_degree)
        cos_fn = functools.partial(_fast_cos, degree=sin_degree)
    else:
        sin_fn, cos_fn = jnp.sin, jnp.cos
    saved = []
    ri = 0
    for li, kind in enumerate(kinds):
        w = refs[ri][:]
        b = refs[ri + 1][:]
        ri += 2
        if li == 0 and rff_features:
            cv, sv = _rff_features_in_kernel(x, bt_ref[:], in_features,
                                             sin_fn, cos_fn)
            dims = (((1,), (0,)), ((), ()))
            pre = (_kernel_dot(cv, w[:rff_features], dims, compute_dtype,
                               mode=f32_mode)
                   + _kernel_dot(sv, w[rff_features:], dims, compute_dtype,
                                 mode=f32_mode)
                   + b.astype(jnp.float32))
            x = (cv, sv)
        elif li == 0:
            pre = b.astype(jnp.float32)
            for d in range(in_features):
                pre = pre + x[:, d:d + 1] * w[d:d + 1, :].astype(jnp.float32)
        else:
            pre = _kernel_dot(x, w, (((1,), (0,)), ((), ())),
                              compute_dtype, mode=f32_mode) \
                + b.astype(jnp.float32)
        a = None
        if kind in ("sine_first", "sine"):
            out = sin_fn(omegas[li] * pre)
        elif kind == "linear_snake":
            a = refs[ri][:].astype(jnp.float32)
            ri += 1
            out = pre + (0.5 / a) * (1.0 - cos_fn(2.0 * a * pre))
        elif kind == "linear_tanh":
            out = jnp.tanh(pre)
        else:
            out = pre
        saved.append((x, pre, a))
        x = out
    return x, saved


def _bwd_sweep(g, saved, kinds, omegas, param_refs, grad_refs,
               compute_dtype, sin_fn, cos_fn, rff_features=0,
               grad_mode="env"):
    """Reverse walk over the layer stack: backprop ``g`` through the saved
    (input, pre-activation) pairs, ACCUMULATING dW/db/da into ``grad_refs``
    with ``+=`` (callers zero the refs on the first grid step; constant
    index maps make the same VMEM block persist across the sequential
    grid).  Shared by the custom-VJP backward kernel and the fused
    train-step kernel (pallas_siren_step).

    ``grad_mode="env"`` reads INRAUDIO_GRAD_PRECISION (the process-wide
    default); an explicit mode string/None pins this trace's backward
    matmul split — the scheduled-training tier lever."""
    # walk layers in reverse, tracking ref index per layer
    slots = _layer_param_slots(kinds)
    starts = np.cumsum([0] + slots[:-1]).tolist()
    # optional cheaper precision for grad matmuls
    gmode = _grad_dot_mode() if grad_mode == "env" else grad_mode
    for li in range(len(kinds) - 1, -1, -1):
        kind = kinds[li]
        x_in, pre, a = saved[li]
        base = starts[li]
        w_ref = param_refs[base]
        gw_ref = grad_refs[base]
        gb_ref = grad_refs[base + 1]
        if kind in ("sine_first", "sine"):
            gpre = g * (omegas[li] * cos_fn(omegas[li] * pre))
        elif kind == "linear_snake":
            s2 = sin_fn(2.0 * a * pre)
            c2 = cos_fn(2.0 * a * pre)
            gpre = g * (1.0 + s2)
            # d/da [x + (0.5/a)(1 - cos(2ax))]:
            #   -(0.5/a^2)(1 - cos(2 a pre)) + (pre/a) sin(2 a pre)
            ga = (-(0.5 / (a * a)) * (1.0 - c2) + (pre / a) * s2) * g
            grad_refs[base + 2][...] += jnp.sum(ga, axis=0, keepdims=True)
        elif kind == "linear_tanh":
            t = jnp.tanh(pre)
            gpre = g * (1.0 - t * t)
        else:  # linear_last
            gpre = g
        # dW = x_in^T gpre ; db = sum gpre
        dims_t = (((0,), (0,)), ((), ()))
        if li == 0 and rff_features:
            cv, sv = x_in  # recomputed in-VMEM encoding (B is fixed: no dB)
            gw_ref[...] += jnp.concatenate(
                [_kernel_dot(cv, gpre, dims_t, compute_dtype, mode=gmode),
                 _kernel_dot(sv, gpre, dims_t, compute_dtype, mode=gmode)],
                axis=0)
        else:
            gw_ref[...] += _kernel_dot(x_in, gpre, dims_t, compute_dtype,
                                       mode=gmode)
        gb_ref[...] += jnp.sum(gpre, axis=0, keepdims=True)
        if li > 0:
            g = _kernel_dot(gpre, w_ref[:], (((1,), (1,)), ((), ())),
                            compute_dtype, mode=gmode)


def _bwd_kernel(coords_ref, g_ref, *refs, kinds, omegas, in_features,
                compute_dtype, num_param_refs, approx_sin=False,
                rff_features=0):
    """Backward per tile: recompute forward, backprop, accumulate grads.

    refs = param refs (inputs) followed by grad output refs (same order).
    Grad outputs use constant index maps — the same VMEM block is revisited
    every grid step, so ``+=`` accumulates across the sequential grid.

    The cotangent stays in the 128-lane-padded (rows, 128) layout: unlike
    the forward output (where the padded write dominated traffic), the
    backward is compute-bound on the in-VMEM recompute + grad matmuls, so
    the padded read is fully overlapped and a compact repack (a
    lane-to-sublane relayout Mosaic has no cheap op for) buys nothing.
    """
    bt_ref = None
    if rff_features:
        bt_ref, refs = refs[0], refs[1:]
    param_refs = refs[:num_param_refs]
    grad_refs = refs[num_param_refs:]

    is_first_tile = pl.program_id(0) == 0

    @pl.when(is_first_tile)
    def _():
        for gr in grad_refs:
            gr[...] = jnp.zeros(gr.shape, gr.dtype)

    sin_fn = _fast_sin if approx_sin else jnp.sin
    cos_fn = _fast_cos if approx_sin else jnp.cos
    x0 = coords_ref[:].astype(jnp.float32)
    _, saved = _fwd_pres(x0, param_refs, kinds, omegas, in_features,
                         compute_dtype, approx_sin,
                         rff_features=rff_features, bt_ref=bt_ref)

    g = g_ref[:].astype(jnp.float32)  # (rows, out_pad)
    _bwd_sweep(g, saved, kinds, omegas, param_refs, grad_refs,
               compute_dtype, sin_fn, cos_fn, rff_features)


def _pad_inputs(coords, block_rows):
    n, d = coords.shape
    n_pad = _round_up(max(n, block_rows), block_rows)
    out = jnp.zeros((n_pad, _MAX_SMALL_IN), dtype=jnp.float32)
    return out.at[:n, :d].set(coords.astype(jnp.float32)), n_pad




@functools.partial(jax.jit, static_argnames=("cfg", "block_rows",
                                             "compute_dtype_name",
                                             "interpret", "approx_sin"))
def _backward(flat_params, coords, g, cfg, block_rows, compute_dtype_name,
              interpret, approx_sin=False, bt=None):
    compute_dtype = (jnp.bfloat16 if compute_dtype_name == "bfloat16"
                     else jnp.float32)
    kinds = cfg.layer_kinds
    omegas = tuple(cfg.first_omega_0 if k == "sine_first"
                   else (cfg.hidden_omega_0 if k == "sine" else 0.0)
                   for k in kinds)
    n, d = coords.shape
    coords_p, n_pad = _pad_inputs(coords, block_rows)
    out_f = 128
    g_p = jnp.zeros((n_pad, out_f), dtype=jnp.float32)
    g_p = g_p.at[:n, : cfg.out_features].set(g.astype(jnp.float32))

    in_specs = [
        pl.BlockSpec((block_rows, _MAX_SMALL_IN), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, out_f), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = []
    rff_features = 0
    if bt is not None:
        rff_features = bt.shape[1]
        in_specs.append(pl.BlockSpec(bt.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(bt)
    out_shapes, out_specs = [], []
    for p in flat_params:
        in_specs.append(pl.BlockSpec(p.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct(p.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(p.shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))

    kernel = functools.partial(_bwd_kernel, kinds=kinds, omegas=omegas,
                               in_features=d, compute_dtype=compute_dtype,
                               num_param_refs=len(flat_params),
                               approx_sin=approx_sin,
                               rff_features=rff_features)
    grads = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid=(n_pad // block_rows,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(coords_p, g_p, *operands, *flat_params)
    return list(grads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _fused_stack(flat_params, coords, bt, cfg, block_rows,
                 compute_dtype_name, interpret, approx_sin):
    # forward is the INFERENCE kernel builder, shared with fused_siren_apply
    # (one copy of the padding/compact-layout/pallas_call construction)
    return _fused_apply_jit(flat_params, coords, cfg, block_rows,
                            compute_dtype_name, interpret, approx_sin,
                            bt=bt)


def _fused_stack_fwd(flat_params, coords, bt, cfg, block_rows,
                     compute_dtype_name, interpret, approx_sin):
    out = _fused_apply_jit(flat_params, coords, cfg, block_rows,
                           compute_dtype_name, interpret, approx_sin, bt=bt)
    return out, (flat_params, coords, bt)


def _bwd_block_rows(cfg: SirenSnakeTanhConfig, block_rows: int,
                    rff_features: int = 0, n_rows: int | None = None) -> int:
    """VMEM-aware backward tile size.

    The backward keeps the recomputed per-layer (input, pre-activation)
    pairs live across the reverse sweep — 2*L*(block, h) f32, plus the
    (cos, sin) RFF feature pair (2*F) when the encoding is folded in —
    inside the ~16 MB scoped VMEM budget (plus params, grads, cotangent
    blocks and pipelining buffers).  Cap the live set at ~4 MB (measured:
    6 MB still overflows at h=160 under vmap) and keep the tile a multiple
    of 128.

    With ``n_rows``, pick the tile UNDER the cap that minimises total row
    padding: e.g. h=128 caps the tile at 640, and a 1024-row chunk would
    pad to 1280 (25% wasted backward compute) — a 512-row tile covers it
    exactly.  Ties prefer the larger tile (fewer grid steps).
    """
    n_layers = len(cfg.layer_kinds)
    budget = 4 * 1024 * 1024
    floats_per_row = 2 * n_layers * cfg.hidden_features + 2 * rff_features
    cap = budget // (floats_per_row * 4)
    cap = max(128, (cap // 128) * 128)
    hi = max(128, min(block_rows, cap))
    if n_rows is None:
        return hi
    cands = range(128, hi + 1, 128)
    return min(cands, key=lambda b: (_round_up(max(n_rows, b), b), -b))


def _fused_stack_bwd(cfg, block_rows, compute_dtype_name, interpret,
                     approx_sin, residuals, g):
    flat_params, coords, bt = residuals
    rff_features = 0 if bt is None else bt.shape[1]
    grads = _backward(flat_params, coords, g, cfg,
                      _bwd_block_rows(cfg, block_rows, rff_features,
                                      n_rows=coords.shape[0]),
                      compute_dtype_name, interpret, approx_sin, bt=bt)
    # flat-params grads (list pytree); no dcoords; B is a fixed projection
    bt_grad = None if bt is None else jnp.zeros_like(bt)
    return list(grads), None, bt_grad


_fused_stack.defvjp(_fused_stack_fwd, _fused_stack_bwd)


def _unflatten_grads(flat_grads, params: Params,
                     cfg: SirenSnakeTanhConfig) -> Params:
    """Flat grad list -> the layer-dict pytree (inverse of _flatten_params),
    trimming first-layer input padding and final-layer lane padding."""
    kinds = cfg.layer_kinds
    gi = 0
    layers = []
    for li, (kind, p) in enumerate(zip(kinds, params["layers"])):
        gw = flat_grads[gi]
        gb = flat_grads[gi + 1].reshape(-1)
        gi += 2
        in_f, out_f = p["w"].shape
        gw = gw[:in_f, :out_f]
        gb = gb[:out_f]
        layer = {"w": gw, "b": gb}
        if kind == "linear_snake":
            layer["snake_a"] = flat_grads[gi].reshape(-1)[:out_f]
            gi += 1
        layers.append(layer)
    return {"layers": layers}


def fused_siren_train_apply(params: Params, cfg: SirenSnakeTanhConfig,
                            coords: jax.Array, block_rows: int = 1024,
                            compute_dtype=jnp.float32,
                            interpret: bool = False,
                            approx_sin: bool = False,
                            rff_b: jax.Array | None = None) -> jax.Array:
    """Differentiable fused forward — drop-in for
    ``siren_snake_tanh_apply`` inside jax.grad/value_and_grad.

    The VJP maps cotangents onto the flat parameter list; use
    ``grads_to_pytree`` only if calling the flat API directly — under
    jax.grad of a loss over ``params`` the pytree plumbing is automatic.

    ``rff_b`` (F, d) folds the Gaussian Fourier encoding into both kernels
    (coords are then raw; cfg.in_features == 2F); B is fixed, so its
    cotangent is zero — matching ``rff_apply``'s stop_gradient semantics.
    """
    if rff_b is None and cfg.in_features > _MAX_SMALL_IN:
        raise ValueError("fused train kernel supports raw coordinates only "
                         f"(in_features <= {_MAX_SMALL_IN}) — pass rff_b to "
                         "fold an RFF encoding in")
    bt = None if rff_b is None else _prep_rff_bt(rff_b)
    name = "bfloat16" if compute_dtype == jnp.bfloat16 else "float32"
    block_rows = _pick_block_rows(coords.shape[0], block_rows)
    flat = _flatten_params(params, cfg, rff=rff_b is not None)
    return _fused_stack(flat, coords, bt, cfg, block_rows, name, interpret,
                        approx_sin)
