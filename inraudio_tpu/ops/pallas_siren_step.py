"""Fused MSE train step: forward + backward + clip + Adam in ONE kernel.

The r3 on-chip trace (BASELINE.md "train round device-time breakdown")
showed the fused fwd+bwd kernels are only ~54% of a training round — the
rest is XLA's per-step optimizer phase: elementwise Adam/plateau fusions
(~36%) re-reading grads/params/moments from HBM, plus the cotangent pad.
For the multi-INR headline (669 tiny models, ~134 MB of stacked params)
that optimizer HBM traffic co-dominates with the compute.

This kernel collapses the WHOLE step:

    read  coords, targets, params, mu, nu          (once per step)
    VMEM  recompute forward -> loss -> backward -> grads (never hit HBM)
          -> global-norm clip -> Adam moment/param update
    write new params, mu, nu, per-step loss

vs. the unfused chain fwd kernel -> pad -> bwd kernel -> grad write ->
XLA clip (grad read) -> XLA Adam (g/p/m/v read, p/m/v write).  The grads,
cotangent and activations never touch HBM; params/moments are read and
written exactly once.

Semantics match ``train.loop.make_train_step`` with loss_mode='mse',
alpha=0 exactly (same bf16x3 matmuls via the shared ``_fwd_pres`` /
``_bwd_sweep`` helpers, same f32 Adam formula, torch-parity bias
correction) — A/B-tested against it in tests/test_pallas_step.py.  The
plateau scheduler and best-params snapshot stay in XLA (scalar math plus
one select over the OLD params, which must outlive the update anyway
because the best snapshot is of the params that PRODUCED the loss).

VMEM holds 7 param-set copies (p/mu/nu in, p/mu/nu out, grads scratch;
9 with the in-kernel best snapshot), so the fused step is gated to models
whose stacked parameters fit (``step_supported``): the h=128 headline
shape runs at 512-row tiles, the h=256 production stack (reference
run.py:30 default) at 256-row tiles, and h>=512 falls back to the
two-kernel path.  ``bench.py BENCH_MODE=full`` A/Bs the h=256 route
(INRAUDIO_FUSED_STEP=0 for the two-kernel baseline).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.siren import SirenSnakeTanhConfig
from .pallas_siren import (_MAX_SMALL_IN, _fast_cos, _fast_sin,
                           _flatten_params, _prep_rff_bt, _round_up)
from .pallas_siren_train import _bwd_sweep, _fwd_pres, _layer_param_slots

Params = dict[str, Any]

# Adam constants (torch.optim.Adam defaults, matching train.optim.AdamConfig)
_B1, _B2, _EPS = 0.9, 0.999, 1e-8


def flat_param_shapes(cfg: SirenSnakeTanhConfig,
                      rff: bool = False) -> list[tuple[int, int]]:
    """Shapes of the ``_flatten_params`` output, derivable from the config
    alone (used for the VMEM gate and for building zero moment buffers)."""
    shapes: list[tuple[int, int]] = []
    kinds = cfg.layer_kinds
    h = cfg.hidden_features
    for li, kind in enumerate(kinds):
        in_f = ((cfg.in_features if rff else _MAX_SMALL_IN)
                if li == 0 else h)
        # final layer lane-padded to 128 (see _flatten_params)
        out_f = 128 if li == len(kinds) - 1 else h
        shapes.append((in_f, out_f))
        shapes.append((1, out_f))
        if kind == "linear_snake":
            shapes.append((1, out_f))
    return shapes


def _params_bytes(cfg: SirenSnakeTanhConfig, rff: bool) -> int:
    return 4 * sum(a * b for a, b in flat_param_shapes(cfg, rff))


def step_block_rows(cfg: SirenSnakeTanhConfig, n_rows: int,
                    rff_features: int = 0,
                    track_best: bool = True) -> int | None:
    """VMEM-aware row-tile size for the fused step, or None if the model
    does not fit.  The kernel holds ``param_copies`` param-set-sized VMEM
    blocks (p/mu/nu in+out, grads scratch = 7; +2 for the in-kernel best
    snapshot) plus the per-row activation live set, inside a ~14.5 MB
    budget (measured: 512-row tiles at 12.6 MB run; the v5e VMEM is 16 MB
    with pipeline buffers on top).

    Like ``_bwd_block_rows``, prefers the tile minimising row padding for
    the given ``n_rows`` (the multi-INR chunks are one exact tile)."""
    pb = _params_bytes(cfg, rff_features > 0)
    copies = 9 if track_best else 7
    budget = int(14.5 * 1024 * 1024) - copies * pb
    n_layers = len(cfg.layer_kinds)
    floats_per_row = (2 * n_layers * cfg.hidden_features
                      + 2 * rff_features + 128 + _MAX_SMALL_IN + 1)
    cap = budget // (floats_per_row * 4)
    if cap < 128:
        return None
    cap = max(128, (cap // 128) * 128)
    hi = min(1024, cap)
    cands = range(128, hi + 1, 128)
    return min(cands, key=lambda b: (_round_up(max(n_rows, b), b), -b))


def step_supported(cfg: SirenSnakeTanhConfig, n_rows: int,
                   rff_features: int = 0, track_best: bool = True) -> bool:
    if cfg.out_features != 1:
        return False
    if rff_features == 0 and cfg.in_features > _MAX_SMALL_IN:
        return False
    return step_block_rows(cfg, n_rows, rff_features, track_best) is not None


def _step_kernel(coords_ref, tgt_ref, scal_ref, *refs, kinds, omegas,
                 in_features, compute_dtype, num_slots, n_valid,
                 clip_norm, approx_sin, rff_features, track_best,
                 f32_mode=None, grad_mode="env", sin_degree=11,
                 has_weight=False):
    """One grid step = one coordinate tile of the fused train step.

    refs layout: [w?] [bt?] p[ns] mu[ns] nu[ns] best[ns]? | loss newp[ns]
    newmu[ns] newnu[ns] newbest[ns]? | grads-scratch[ns].  Loss and grads
    accumulate across the sequential grid (constant index maps); the
    clip+Adam+best epilogue runs on the LAST tile, when the gradients are
    complete.  The best snapshot lives IN the kernel so the old params die
    at the call boundary — every state group aliases in-place, and the
    scan carry needs zero XLA copies.

    ``has_weight``: a per-row (rows, 1) loss weight streams in like the
    targets (the psychoacoustic mask, reference draft utils.py:365-376) —
    loss = sum(w * err^2)/n, g = 2*w*err/n, matching train.losses.mix_loss
    for mse with a mean-1-normalised weight.
    """
    w_ref = None
    if has_weight:
        w_ref, refs = refs[0], refs[1:]
    bt_ref = None
    if rff_features:
        bt_ref, refs = refs[0], refs[1:]
    ns = num_slots
    groups = 4 if track_best else 3
    p_refs = refs[:ns]
    mu_refs = refs[ns:2 * ns]
    nu_refs = refs[2 * ns:3 * ns]
    best_refs = refs[3 * ns:4 * ns] if track_best else ()
    o = groups * ns
    loss_ref = refs[o]
    newp_refs = refs[o + 1:o + 1 + ns]
    newmu_refs = refs[o + 1 + ns:o + 1 + 2 * ns]
    newnu_refs = refs[o + 1 + 2 * ns:o + 1 + 3 * ns]
    newbest_refs = (refs[o + 1 + 3 * ns:o + 1 + 4 * ns]
                    if track_best else ())
    g_refs = refs[o + 1 + groups * ns:]

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        loss_ref[...] = jnp.zeros(loss_ref.shape, loss_ref.dtype)
        for gr in g_refs:
            gr[...] = jnp.zeros(gr.shape, gr.dtype)

    if approx_sin:
        sin_fn = functools.partial(_fast_sin, degree=sin_degree)
        cos_fn = functools.partial(_fast_cos, degree=sin_degree)
    else:
        sin_fn, cos_fn = jnp.sin, jnp.cos
    x0 = coords_ref[:].astype(jnp.float32)
    out, saved = _fwd_pres(x0, p_refs, kinds, omegas, in_features,
                           compute_dtype, approx_sin,
                           rff_features=rff_features, bt_ref=bt_ref,
                           f32_mode=f32_mode, sin_degree=sin_degree)

    rows, lanes = out.shape
    tgt = tgt_ref[:].astype(jnp.float32)                      # (rows, 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0) + i * rows
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    # scalar-output mask: real rows, lane 0 only (out lanes > 0 are exact
    # zeros from the padded final layer, but tgt broadcasts to all lanes)
    mask = ((row_ids < n_valid) & (lane_ids < 1)).astype(jnp.float32)
    err = (out - tgt) * mask
    inv_n = 1.0 / float(n_valid)
    if has_weight:
        wv = w_ref[:].astype(jnp.float32)                     # (rows, 1)
        loss_ref[...] += jnp.sum(err * err * wv, axis=0,
                                 keepdims=True) * inv_n
        g = err * (wv * (2.0 * inv_n))
    else:
        loss_ref[...] += jnp.sum(err * err, axis=0, keepdims=True) * inv_n
        g = err * (2.0 * inv_n)
    _bwd_sweep(g, saved, kinds, omegas, p_refs, g_refs,
               compute_dtype, sin_fn, cos_fn, rff_features,
               grad_mode=grad_mode)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        s = scal_ref[:]                                       # (1, 128)
        lr = s[0:1, 0:1]
        c1 = s[0:1, 1:2]
        c2 = s[0:1, 2:3]
        if clip_norm > 0:
            sq = None
            for gr in g_refs:
                gk = gr[...]
                part = jnp.sum(gk * gk).reshape(1, 1)
                sq = part if sq is None else sq + part
            norm = jnp.sqrt(sq)
            scale = jnp.minimum(1.0, clip_norm / jnp.maximum(norm, 1e-20))
        else:
            scale = None
        if track_best:
            # total loss: the row sums accumulated into lane 0 across all
            # tiles (this tile's += already ran above); same f32 value the
            # host-side plateau/best scalars see
            total = loss_ref[...][0:1, 0:1]
            improved = total < s[0:1, 3:4]                    # best_loss
        for k in range(num_slots):
            gk = g_refs[k][...]
            if scale is not None:
                gk = gk * scale
            p_old = p_refs[k][...]
            if track_best:
                newbest_refs[k][...] = jnp.where(improved, p_old,
                                                 best_refs[k][...])
            m = _B1 * mu_refs[k][...] + (1.0 - _B1) * gk
            v = _B2 * nu_refs[k][...] + (1.0 - _B2) * gk * gk
            newmu_refs[k][...] = m
            newnu_refs[k][...] = v
            newp_refs[k][...] = (p_old
                                 - lr * (m / c1) / (jnp.sqrt(v / c2) + _EPS))


def fused_mse_step_call(flat_params, flat_mu, flat_nu, coords_p, tgt_p,
                        scal, cfg: SirenSnakeTanhConfig, block_rows: int,
                        n_valid: int, clip_norm: float, raw_in_features: int,
                        flat_best=None,
                        compute_dtype_name: str = "float32",
                        interpret: bool = False, approx_sin: bool = False,
                        bt=None, f32_mode: str | None = None,
                        grad_mode: str | None = "env",
                        sin_degree: int = 11, wgt_p=None):
    """Invoke the fused step kernel.

    ``f32_mode`` / ``grad_mode`` / ``sin_degree`` pin this trace's forward
    matmul split, backward matmul split and sin-polynomial degree (defaults:
    the INRAUDIO_F32_PRECISION / INRAUDIO_GRAD_PRECISION env ladder and
    degree 11) — the levers quality-scheduled training re-dispatches
    between (train.loop.schedule_tiers).

    ``coords_p`` (n_pad, 8) and ``tgt_p`` (n_pad, 1) are PRE-PADDED by the
    caller (once per fit, not per step — killing the per-step pad op).
    ``scal`` is the (1, 128) scalar block [lr, c1, c2, best_loss, 0...]
    with the bias-correction factors for THIS step.  With ``flat_best``
    the best-params snapshot updates inside the kernel (select against the
    OLD params, which then die at the call boundary).  Returns
    (loss, new_params, new_mu, new_nu[, new_best]).

    Every state group is aliased in-place (p/mu/nu/best in -> out): inside
    the scan the carry lives at a fixed buffer, so a non-aliased kernel
    output pays an XLA copy back into the carry slot — measured 0.133
    ms/step per (669, 128, 128) leaf, ~2.7 ms/step total on the headline.
    """
    compute_dtype = (jnp.bfloat16 if compute_dtype_name == "bfloat16"
                     else jnp.float32)
    kinds = cfg.layer_kinds
    omegas = tuple(cfg.first_omega_0 if k == "sine_first"
                   else (cfg.hidden_omega_0 if k == "sine" else 0.0)
                   for k in kinds)
    n_pad = coords_p.shape[0]
    ns = len(flat_params)
    track_best = flat_best is not None
    grid = (n_pad // block_rows,)

    in_specs = [
        pl.BlockSpec((block_rows, _MAX_SMALL_IN), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [coords_p, tgt_p, scal]
    if wgt_p is not None:
        in_specs.append(pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(wgt_p)
    rff_features = 0
    if bt is not None:
        rff_features = bt.shape[1]
        in_specs.append(pl.BlockSpec(bt.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(bt)
    groups = (flat_params, flat_mu, flat_nu) + (
        (flat_best,) if track_best else ())
    for group in groups:
        for p in group:
            in_specs.append(pl.BlockSpec(p.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
            operands.append(p)

    out_shapes = [jax.ShapeDtypeStruct((1, 128), jnp.float32)]
    out_specs = [pl.BlockSpec((1, 128), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)]
    for _ in range(len(groups)):
        for p in flat_params:
            out_shapes.append(jax.ShapeDtypeStruct(p.shape, jnp.float32))
            out_specs.append(pl.BlockSpec(p.shape, lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _step_kernel, kinds=kinds, omegas=omegas,
        in_features=raw_in_features,
        compute_dtype=compute_dtype, num_slots=ns, n_valid=n_valid,
        clip_norm=clip_norm, approx_sin=approx_sin,
        rff_features=rff_features, track_best=track_best,
        f32_mode=f32_mode, grad_mode=grad_mode, sin_degree=sin_degree,
        has_weight=wgt_p is not None)
    base = 3 + (1 if wgt_p is not None else 0) + (1 if bt is not None else 0)
    aliases = {}
    for gi in range(len(groups)):
        for j in range(ns):
            aliases[base + gi * ns + j] = 1 + gi * ns + j
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.VMEM(p.shape, jnp.float32)
                        for p in flat_params],
        input_output_aliases=aliases,
        interpret=interpret,
    )(*operands)
    loss = jnp.sum(outs[0])  # lanes > 0 accumulate exact zeros
    new_p = list(outs[1:1 + ns])
    new_mu = list(outs[1 + ns:1 + 2 * ns])
    new_nu = list(outs[1 + 2 * ns:1 + 3 * ns])
    if track_best:
        return loss, new_p, new_mu, new_nu, list(outs[1 + 3 * ns:1 + 4 * ns])
    return loss, new_p, new_mu, new_nu


def _grad_kernel(coords_ref, tgt_ref, scal_ref, *refs, kinds, omegas,
                 in_features, compute_dtype, num_slots, inv_n,
                 approx_sin, rff_features, has_weight=False,
                 f32_mode=None, grad_mode="env", sin_degree=11):
    """Grad-accumulation half of the fused step, for the row-sharded
    multi-device path (the whole-step ``_step_kernel`` cannot shard over
    rows: its in-kernel Adam epilogue would update each device from its
    LOCAL partial gradient).  Same forward recompute + backward sweep,
    but loss/grads are kernel OUTPUTS; the clip+Adam+best epilogue runs
    in ``_adam_kernel`` after the cross-device gradient psum.

    refs layout: [bt?] p[ns] | loss g[ns].  The row-validity limit is
    DYNAMIC (scal slot 0): under shard_map every device runs this same
    program, but only the shard holding the global pad tail masks rows.
    ``inv_n`` is the GLOBAL 1/n_valid — the loss/grad normalizer must
    not depend on the shard, so the psum of partials equals the
    single-device value.  refs layout: [w?] [bt?] p[ns] | loss g[ns].
    """
    w_ref = None
    if has_weight:
        w_ref, refs = refs[0], refs[1:]
    bt_ref = None
    if rff_features:
        bt_ref, refs = refs[0], refs[1:]
    ns = num_slots
    p_refs = refs[:ns]
    loss_ref = refs[ns]
    g_refs = refs[ns + 1:]

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        loss_ref[...] = jnp.zeros(loss_ref.shape, loss_ref.dtype)
        for gr in g_refs:
            gr[...] = jnp.zeros(gr.shape, gr.dtype)

    if approx_sin:
        sin_fn = functools.partial(_fast_sin, degree=sin_degree)
        cos_fn = functools.partial(_fast_cos, degree=sin_degree)
    else:
        sin_fn, cos_fn = jnp.sin, jnp.cos
    x0 = coords_ref[:].astype(jnp.float32)
    out, saved = _fwd_pres(x0, p_refs, kinds, omegas, in_features,
                           compute_dtype, approx_sin,
                           rff_features=rff_features, bt_ref=bt_ref,
                           f32_mode=f32_mode, sin_degree=sin_degree)

    rows, lanes = out.shape
    tgt = tgt_ref[:].astype(jnp.float32)                      # (rows, 1)
    row_f = (jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
             + i * rows).astype(jnp.float32)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    limit = scal_ref[0:1, 0:1]                    # local valid rows, f32
    mask = ((row_f < limit) & (lane_ids < 1)).astype(jnp.float32)
    err = (out - tgt) * mask
    if has_weight:
        wv = w_ref[:].astype(jnp.float32)                     # (rows, 1)
        loss_ref[...] += jnp.sum(err * err * wv, axis=0,
                                 keepdims=True) * inv_n
        g = err * (wv * (2.0 * inv_n))
    else:
        loss_ref[...] += jnp.sum(err * err, axis=0, keepdims=True) * inv_n
        g = err * (2.0 * inv_n)
    _bwd_sweep(g, saved, kinds, omegas, p_refs, g_refs,
               compute_dtype, sin_fn, cos_fn, rff_features,
               grad_mode=grad_mode)


def fused_mse_grad_call(flat_params, coords_p, tgt_p, gscal,
                        cfg: SirenSnakeTanhConfig, block_rows: int,
                        n_valid: int, raw_in_features: int,
                        compute_dtype_name: str = "float32",
                        interpret: bool = False, approx_sin: bool = False,
                        bt=None, wgt_p=None, f32_mode: str | None = None,
                        grad_mode: str | None = "env",
                        sin_degree: int = 11):
    """Invoke the grad-accumulation kernel on ONE row shard.

    ``gscal`` is a (1, 128) f32 block whose slot 0 holds the LOCAL number
    of valid rows (dynamic — shards differ); ``n_valid`` is the GLOBAL
    count that normalizes the mse.  Returns (partial_loss_scalar,
    [partial_grads...]) — psum both across the data axis before the
    optimizer epilogue (``fused_adam_call``).
    """
    compute_dtype = (jnp.bfloat16 if compute_dtype_name == "bfloat16"
                     else jnp.float32)
    kinds = cfg.layer_kinds
    omegas = tuple(cfg.first_omega_0 if k == "sine_first"
                   else (cfg.hidden_omega_0 if k == "sine" else 0.0)
                   for k in kinds)
    n_pad = coords_p.shape[0]
    ns = len(flat_params)
    grid = (n_pad // block_rows,)

    in_specs = [
        pl.BlockSpec((block_rows, _MAX_SMALL_IN), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [coords_p, tgt_p, gscal]
    if wgt_p is not None:
        in_specs.append(pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(wgt_p)
    rff_features = 0
    if bt is not None:
        rff_features = bt.shape[1]
        in_specs.append(pl.BlockSpec(bt.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(bt)
    for p in flat_params:
        in_specs.append(pl.BlockSpec(p.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(p)

    out_shapes = [jax.ShapeDtypeStruct((1, 128), jnp.float32)]
    out_specs = [pl.BlockSpec((1, 128), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)]
    for p in flat_params:
        out_shapes.append(jax.ShapeDtypeStruct(p.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(p.shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _grad_kernel, kinds=kinds, omegas=omegas,
        in_features=raw_in_features, compute_dtype=compute_dtype,
        num_slots=ns, inv_n=1.0 / float(n_valid), approx_sin=approx_sin,
        rff_features=rff_features, has_weight=wgt_p is not None,
        f32_mode=f32_mode, grad_mode=grad_mode, sin_degree=sin_degree)
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(*operands)
    return jnp.sum(outs[0]), list(outs[1:])


def _adam_kernel(scal_ref, *refs, num_slots, clip_norm, track_best):
    """Clip + Adam + best-snapshot epilogue as its own grid=(1,) kernel,
    fed the psum'd GLOBAL grads — the multi-device counterpart of
    ``_step_kernel``'s last-tile epilogue (same formulas; state groups
    alias in-place so the scan carry needs zero XLA copies).

    refs layout: g[ns] p[ns] mu[ns] nu[ns] best[ns]? | newp[ns]
    newmu[ns] newnu[ns] newbest[ns]?.  scal slots: [lr, c1, c2,
    best_loss, loss].
    """
    ns = num_slots
    g_refs = refs[:ns]
    p_refs = refs[ns:2 * ns]
    mu_refs = refs[2 * ns:3 * ns]
    nu_refs = refs[3 * ns:4 * ns]
    best_refs = refs[4 * ns:5 * ns] if track_best else ()
    o = (5 if track_best else 4) * ns
    newp_refs = refs[o:o + ns]
    newmu_refs = refs[o + ns:o + 2 * ns]
    newnu_refs = refs[o + 2 * ns:o + 3 * ns]
    newbest_refs = refs[o + 3 * ns:o + 4 * ns] if track_best else ()

    s = scal_ref[:]
    lr = s[0:1, 0:1]
    c1 = s[0:1, 1:2]
    c2 = s[0:1, 2:3]
    if clip_norm > 0:
        sq = None
        for gr in g_refs:
            gk = gr[...]
            part = jnp.sum(gk * gk).reshape(1, 1)
            sq = part if sq is None else sq + part
        norm = jnp.sqrt(sq)
        scale = jnp.minimum(1.0, clip_norm / jnp.maximum(norm, 1e-20))
    else:
        scale = None
    if track_best:
        improved = s[0:1, 4:5] < s[0:1, 3:4]          # loss < best_loss
    for k in range(num_slots):
        gk = g_refs[k][...]
        if scale is not None:
            gk = gk * scale
        p_old = p_refs[k][...]
        if track_best:
            newbest_refs[k][...] = jnp.where(improved, p_old,
                                             best_refs[k][...])
        m = _B1 * mu_refs[k][...] + (1.0 - _B1) * gk
        v = _B2 * nu_refs[k][...] + (1.0 - _B2) * gk * gk
        newmu_refs[k][...] = m
        newnu_refs[k][...] = v
        newp_refs[k][...] = (p_old
                             - lr * (m / c1) / (jnp.sqrt(v / c2) + _EPS))


def fused_adam_call(flat_params, flat_mu, flat_nu, grads, scal,
                    clip_norm: float, flat_best=None,
                    interpret: bool = False):
    """Invoke the epilogue kernel: (p, mu, nu[, best], grads, scal) ->
    (new_p, new_mu, new_nu[, new_best]) with every state group aliased
    in-place.  Run on REPLICATED operands (identical on every device
    after the grad psum), so the states stay replicated with no
    cross-device traffic."""
    ns = len(flat_params)
    track_best = flat_best is not None

    in_specs = [pl.BlockSpec((1, 128), lambda: (0, 0),
                             memory_space=pltpu.VMEM)]
    operands = [scal]
    groups = (list(grads), list(flat_params), list(flat_mu),
              list(flat_nu)) + ((list(flat_best),) if track_best else ())
    for group in groups:
        for p in group:
            in_specs.append(pl.BlockSpec(p.shape, lambda: (0, 0),
                                         memory_space=pltpu.VMEM))
            operands.append(p)

    out_shapes, out_specs = [], []
    for _ in range(len(groups) - 1):          # grads have no output slot
        for p in flat_params:
            out_shapes.append(jax.ShapeDtypeStruct(p.shape, jnp.float32))
            out_specs.append(pl.BlockSpec(p.shape, lambda: (0, 0),
                                          memory_space=pltpu.VMEM))

    # alias p/mu/nu/best in-place: operand index 1 + ns (grads) + gi*ns + j
    # -> output index gi*ns + j
    aliases = {}
    for gi in range(len(groups) - 1):
        for j in range(ns):
            aliases[1 + ns + gi * ns + j] = gi * ns + j
    kernel = functools.partial(_adam_kernel, num_slots=ns,
                               clip_norm=clip_norm, track_best=track_best)
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        input_output_aliases=aliases,
        interpret=interpret,
    )(*operands)
    new_p = list(outs[:ns])
    new_mu = list(outs[ns:2 * ns])
    new_nu = list(outs[2 * ns:3 * ns])
    if track_best:
        return new_p, new_mu, new_nu, list(outs[3 * ns:4 * ns])
    return new_p, new_mu, new_nu


def make_sharded_fused_mse_train_step(cfg: SirenSnakeTanhConfig, train_cfg,
                                      n_valid: int, block_rows: int,
                                      shard_rows: int,
                                      axis_name: str = "data",
                                      rff_b=None, approx_sin: bool = False,
                                      interpret: bool = False,
                                      tier: dict | None = None):
    """Row-sharded whole-step fused training step, for use INSIDE a
    ``jax.shard_map`` over ``axis_name`` (VERDICT r4 item 2: the
    reference's own full-batch workload shape, run.py:135-137, previously
    fell back to the autodiff path on a multi-chip mesh).

    Per device: grad-accumulation kernel on the local ``shard_rows`` rows
    -> psum(loss, grads) over the data axis -> the clip+Adam+best
    epilogue kernel on the (now replicated) global grads.  Semantics
    match ``make_fused_mse_train_step`` up to the psum's float
    reassociation; states stay replicated (in_spec P()), rows sharded
    (P('data')).
    """
    from ..train.optim import PlateauConfig, PlateauState, plateau_update

    plateau_cfg = PlateauConfig(factor=train_cfg.plateau_factor,
                                patience=train_cfg.plateau_patience,
                                min_lr=train_cfg.min_learning_rate)
    bt = None if rff_b is None else _prep_rff_bt(rff_b)
    raw_d = cfg.in_features if rff_b is None else rff_b.shape[1]
    clip = float(train_cfg.grad_clip_norm)
    track_best = train_cfg.track_best
    tier = tier or {}
    tier_kw = dict(f32_mode=tier.get("f32_mode"),
                   grad_mode=tier.get("grad_mode", "env"),
                   sin_degree=tier.get("sin_degree", 11))

    def step(state: FlatTrainState, coords_p, tgt_p, wgt_p=None):
        idx = jax.lax.axis_index(axis_name)
        start = (idx * shard_rows).astype(jnp.float32)
        local_valid = jnp.clip(jnp.float32(n_valid) - start, 0.0,
                               float(shard_rows))
        gscal = jnp.concatenate([local_valid.reshape(1, 1),
                                 jnp.zeros((1, 127), jnp.float32)], axis=1)
        loss_p, grads_p = fused_mse_grad_call(
            list(state.params), coords_p, tgt_p, gscal, cfg, block_rows,
            n_valid, raw_d, interpret=interpret, approx_sin=approx_sin,
            bt=bt, wgt_p=wgt_p, **tier_kw)
        loss = jax.lax.psum(loss_p, axis_name)
        grads = jax.lax.psum(grads_p, axis_name)

        t = state.step + 1
        tf = t.astype(jnp.float32)
        c1 = 1.0 - _B1 ** tf
        c2 = 1.0 - _B2 ** tf
        one = lambda x: jnp.asarray(x, jnp.float32).reshape(1, 1)
        scal = jnp.concatenate(
            [one(state.lr), one(c1), one(c2), one(state.best_loss),
             one(loss), jnp.zeros((1, 123), jnp.float32)], axis=1)
        if track_best:
            new_p, new_mu, new_nu, best = fused_adam_call(
                list(state.params), list(state.mu), list(state.nu),
                grads, scal, clip, flat_best=list(state.best_params),
                interpret=interpret)
            best = tuple(best)
        else:
            new_p, new_mu, new_nu = fused_adam_call(
                list(state.params), list(state.mu), list(state.nu),
                grads, scal, clip, interpret=interpret)
            best = state.best_params  # reference alias semantics
        pl_state, new_lr = plateau_update(
            PlateauState(best=state.plateau_best, num_bad=state.plateau_bad),
            loss, state.lr, plateau_cfg)
        improved = loss < state.best_loss
        new_state = FlatTrainState(
            params=tuple(new_p), mu=tuple(new_mu), nu=tuple(new_nu),
            best_params=best, step=t, lr=new_lr,
            plateau_best=pl_state.best, plateau_bad=pl_state.num_bad,
            best_loss=jnp.where(improved, loss, state.best_loss),
            best_iter=jnp.where(improved, t - 1, state.best_iter))
        return new_state, (loss, new_lr)

    return step


class FlatTrainState(NamedTuple):
    """TrainState with params/moments/best kept in the kernel's flat padded
    layout across the whole scan (flatten once per fit, not per step)."""
    params: tuple
    mu: tuple
    nu: tuple
    best_params: tuple
    step: jax.Array        # int32 — Adam t
    lr: jax.Array          # float32
    plateau_best: jax.Array
    plateau_bad: jax.Array
    best_loss: jax.Array
    best_iter: jax.Array


def unflatten_params(flat, cfg: SirenSnakeTanhConfig) -> Params:
    """Flat padded list -> layer-dict pytree with pads trimmed (inverse of
    ``_flatten_params``; real shapes derive from the config alone)."""
    kinds = cfg.layer_kinds
    h = cfg.hidden_features
    gi = 0
    layers = []
    for li, kind in enumerate(kinds):
        w = flat[gi]
        b = flat[gi + 1].reshape(-1)
        gi += 2
        in_f = cfg.in_features if li == 0 else h
        out_f = cfg.out_features if li == len(kinds) - 1 else h
        layer = {"w": w[:in_f, :out_f], "b": b[:out_f]}
        if kind == "linear_snake":
            layer["snake_a"] = flat[gi].reshape(-1)[:out_f]
            gi += 1
        layers.append(layer)
    return {"layers": layers}


def pad_step_inputs(coords: np.ndarray, targets: np.ndarray,
                    block_rows: int) -> tuple[np.ndarray, np.ndarray, int]:
    """(n, d) coords + (n, 1) targets -> kernel-padded HOST arrays.

    Done ONCE per fit; padded target rows are zero and masked in-kernel.
    Returns numpy on purpose: callers close the shared coordinate grid over
    jitted steps, and a closed-over DEVICE array becomes an MLIR constant
    whose value is fetched device->host at lowering time — on the axon
    tunnel that fetch serializes behind pending device work (the r2 "218 s
    compile"; tests/test_lowering.py pins the rule)."""
    n, d = coords.shape
    n_pad = _round_up(max(n, block_rows), block_rows)
    cp = np.zeros((n_pad, _MAX_SMALL_IN), dtype=np.float32)
    cp[:n, :d] = np.asarray(coords, dtype=np.float32)
    tp = np.zeros((n_pad, 1), dtype=np.float32)
    tp[:n] = np.asarray(targets, dtype=np.float32).reshape(n, 1)
    return cp, tp, n


def make_fused_mse_train_step(cfg: SirenSnakeTanhConfig, train_cfg,
                              n_valid: int, block_rows: int,
                              rff_b=None, approx_sin: bool = False,
                              interpret: bool = False,
                              tier: dict | None = None):
    """Build step(state: FlatTrainState, coords_p, tgt_p) -> (state,
    (loss, lr)) — semantics of ``train.loop.make_train_step`` for
    loss_mode='mse', alpha=0, with the compute in one Pallas call.

    Plateau scheduler and best tracking run in XLA on the step's outputs:
    the best snapshot selects the OLD params (the ones that produced the
    loss), exactly like the reference path (loop.py make_train_step).

    ``tier``: optional {f32_mode, grad_mode, sin_degree} overrides — a
    cheaper numerically-bounded step variant for the quality-scheduled
    training ladder (see train.loop.schedule_tiers).
    """
    from ..train.optim import PlateauConfig, plateau_update
    from ..train.optim import PlateauState

    plateau_cfg = PlateauConfig(factor=train_cfg.plateau_factor,
                                patience=train_cfg.plateau_patience,
                                min_lr=train_cfg.min_learning_rate)
    bt = None if rff_b is None else _prep_rff_bt(rff_b)
    raw_d = cfg.in_features if rff_b is None else rff_b.shape[1]
    clip = float(train_cfg.grad_clip_norm)
    track_best = train_cfg.track_best
    tier = tier or {}
    tier_kw = dict(f32_mode=tier.get("f32_mode"),
                   grad_mode=tier.get("grad_mode", "env"),
                   sin_degree=tier.get("sin_degree", 11))

    def step(state: FlatTrainState, coords_p, tgt_p, wgt_p=None):
        t = state.step + 1
        tf = t.astype(jnp.float32)
        c1 = 1.0 - _B1 ** tf
        c2 = 1.0 - _B2 ** tf
        one = lambda x: jnp.asarray(x, jnp.float32).reshape(1, 1)
        scal = jnp.concatenate(
            [one(state.lr), one(c1), one(c2), one(state.best_loss),
             jnp.zeros((1, 124), jnp.float32)], axis=1)
        if track_best:
            loss, new_p, new_mu, new_nu, best = fused_mse_step_call(
                list(state.params), list(state.mu), list(state.nu),
                coords_p, tgt_p, scal, cfg, block_rows, n_valid, clip,
                raw_d, flat_best=list(state.best_params),
                interpret=interpret, approx_sin=approx_sin, bt=bt,
                wgt_p=wgt_p, **tier_kw)
            best = tuple(best)
        else:
            loss, new_p, new_mu, new_nu = fused_mse_step_call(
                list(state.params), list(state.mu), list(state.nu),
                coords_p, tgt_p, scal, cfg, block_rows, n_valid, clip,
                raw_d, interpret=interpret, approx_sin=approx_sin, bt=bt,
                wgt_p=wgt_p, **tier_kw)
            best = state.best_params  # reference alias semantics
        pl_state, new_lr = plateau_update(
            PlateauState(best=state.plateau_best, num_bad=state.plateau_bad),
            loss, state.lr, plateau_cfg)
        improved = loss < state.best_loss
        new_state = FlatTrainState(
            params=tuple(new_p), mu=tuple(new_mu), nu=tuple(new_nu),
            best_params=best, step=t, lr=new_lr,
            plateau_best=pl_state.best, plateau_bad=pl_state.num_bad,
            best_loss=jnp.where(improved, loss, state.best_loss),
            best_iter=jnp.where(improved, t - 1, state.best_iter))
        return new_state, (loss, new_lr)

    return step


def flat_state_from_train_state(state, cfg: SirenSnakeTanhConfig,
                                rff: bool = False) -> FlatTrainState:
    """train.loop.TrainState -> FlatTrainState (pads params/moments once).
    Padded regions carry zero gradients, so zero-padded moments stay zero —
    the flat Adam trajectory equals the pytree one on the real entries."""
    flatten = functools.partial(_flatten_params, cfg=cfg, rff=rff)
    return FlatTrainState(
        params=tuple(flatten(state.params)),
        mu=tuple(flatten(state.opt.mu)),
        nu=tuple(flatten(state.opt.nu)),
        best_params=tuple(flatten(state.best_params)),
        step=state.opt.step,
        lr=state.opt.lr,
        plateau_best=state.plateau.best,
        plateau_bad=state.plateau.num_bad,
        best_loss=state.best_loss,
        best_iter=state.best_iter)


def train_state_from_flat(fstate: FlatTrainState,
                          cfg: SirenSnakeTanhConfig):
    """FlatTrainState -> train.loop.TrainState (trims pads; checkpoint /
    decode compatible)."""
    from ..train.loop import TrainState
    from ..train.optim import AdamState, PlateauState
    unf = lambda flat: unflatten_params(list(flat), cfg)
    return TrainState(
        params=unf(fstate.params),
        opt=AdamState(step=fstate.step, mu=unf(fstate.mu),
                      nu=unf(fstate.nu), lr=fstate.lr),
        plateau=PlateauState(best=fstate.plateau_best,
                             num_bad=fstate.plateau_bad),
        best_params=unf(fstate.best_params),
        best_loss=fstate.best_loss,
        best_iter=fstate.best_iter)
