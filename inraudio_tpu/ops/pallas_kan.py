"""Fused Pallas TPU kernel for the KAN stack (efficient-KAN semantics).

Reference semantics: kan.py:78-111 (Cox-de-Boor B-spline bases) and
kan.py:153-166 (silu base matmul + flattened spline matmul), re-laid-out for
the TPU:

- the whole layer stack runs per coordinate tile inside VMEM (same fusion
  rationale as ops/pallas_siren.py: activations never round-trip HBM);
- the Cox-de-Boor recursion is held as a LIST of (block, in) 2-D arrays —
  one per basis index — instead of a (block, in, n_coef) 3-D tensor: every
  op is then a perfectly-tiled (sublane, lane) VPU elementwise, and Mosaic
  never has to relayout a tiny trailing dim (n_coef = 8);
- the spline contraction ``bases.reshape(b, in*n_coef) @ flat_w`` becomes
  ``sum_c bases_c @ sw[c]`` — n_coef MXU matmuls of (block, in) @ (in, out),
  mathematically identical (the flat matmul is that sum), with no reshape;
- the first layer's tiny input (the runner uses KAN([1, h, h, 1]),
  run.py:92-93) is lane-padded to 8 with a VALID copy of the knot grid for
  the pad features and ZERO weights, so the recursion stays finite and the
  padding contributes nothing.

``fused_kan_apply`` is differentiable via a custom VJP.  When the layer
stack's parameters + gradient accumulators fit VMEM (they do for the
runner's KAN([1, h, h, 1]) up to h=256), the backward is a fused Pallas
kernel that — like ops/pallas_siren_train.py — RECOMPUTES the forward per
coordinate tile in VMEM (including the Cox-de-Boor bases, which XLA
autodiff would otherwise materialise as (n, in, n_coef) HBM tensors) and
accumulates dW across the sequential grid in VMEM-resident output blocks;
dx uses the exact B-spline derivative recursion
``B'_{j,k} = k (B_{j,k-1}/(t_{j+k}-t_j) - B_{j+1,k-1}/(t_{j+k+1}-t_{j+1}))``.
Oversized stacks fall back to the XLA autodiff of the jnp reference path
(``kan_apply``).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.kan import KANConfig, _scaled_spline_weight, kan_apply
from .pallas_siren import _kernel_dot, _pick_block_rows, _round_up

Params = dict[str, Any]

_IN_PAD = 8      # first-layer lane padding (same constant as the SIREN kernel)
_OUT_PAD = 128   # final-layer lane padding


def _cox_de_boor_lists(xin, g, spline_order):
    """Cox-de-Boor bases as a LIST of (block, in) arrays (kan.py:78-111).

    Returns (order-k list, order-(k-1) list); the latter feeds the exact
    B-spline derivative in the backward kernel.
    """
    n_b0 = g.shape[0] - 1
    bases = [((xin >= g[j:j + 1]) & (xin < g[j + 1:j + 2])
              ).astype(jnp.float32) for j in range(n_b0)]
    prev = bases
    for k in range(1, spline_order + 1):
        nxt = []
        for j in range(len(bases) - 1):
            left = (xin - g[j:j + 1]) / (g[j + k:j + k + 1] - g[j:j + 1])
            right = (g[j + k + 1:j + k + 2] - xin) / (
                g[j + k + 1:j + k + 2] - g[j + 1:j + 2])
            nxt.append(left * bases[j] + right * bases[j + 1])
        prev = bases
        bases = nxt
    return bases, prev


def _kan_kernel(x_ref, *refs, layer_dims, spline_order, n_coef,
                compute_dtype, compact_out):
    """refs = [grid_t0, base_w0, sw0, grid_t1, ..., out_ref].

    grid_t: (n_knots, in) knot grid, transposed so features ride the lanes.
    base_w: (in, out) — the reference's base_weight.T.
    sw:     (n_coef, in, out) — scaled spline weight, coefficient-major.
    """
    out_ref = refs[-1]
    refs = refs[:-1]
    dims = (((1,), (0,)), ((), ()))

    x = x_ref[:].astype(jnp.float32)
    ri = 0
    for li, (din, dout) in enumerate(layer_dims):
        g = refs[ri][:].astype(jnp.float32)        # (n_knots, din)
        base_w = refs[ri + 1]
        sw_ref = refs[ri + 2]
        ri += 3
        xin = x[:, :din] if x.shape[1] != din else x
        # base path: silu on the VPU, one MXU matmul
        silu = xin * (1.0 / (1.0 + jnp.exp(-xin)))
        acc = _kernel_dot(silu, base_w[:], dims, compute_dtype)
        # Cox-de-Boor: degree-0 indicators refined spline_order times,
        # one (block, din) array per basis index (kan.py:78-111)
        bases, _ = _cox_de_boor_lists(xin, g, spline_order)
        # spline path: sum of n_coef MXU matmuls == the flat contraction
        for c in range(n_coef):
            acc = acc + _kernel_dot(bases[c], sw_ref[c], dims, compute_dtype)
        x = acc
    if compact_out:
        rows = x.shape[0]
        out_ref[:] = x[:, 0:1].reshape(rows // 128, 128).astype(out_ref.dtype)
    else:
        out_ref[:] = x.astype(out_ref.dtype)


def _flatten_kan_params(params: Params, cfg: KANConfig):
    """Per layer: (grid_t (n_knots, in_pad), base_w.T (in_pad, out_pad),
    sw (n_coef, in_pad, out_pad)) with first-layer input and final-layer
    output lane padding.  Pad features replicate feature 0's knot grid
    (keeps the recursion's divisions finite) and carry zero weights."""
    flat = []
    dims = []
    n_layers = len(params["layers"])
    for li, p in enumerate(params["layers"]):
        base_w = p["base_w"]                   # (out, in)
        sw = _scaled_spline_weight(p)          # (out, in, n_coef)
        grid = jax.lax.stop_gradient(p["grid"])  # (in, n_knots)
        out_f, in_f = base_w.shape
        in_p = max(in_f, _IN_PAD) if li == 0 else in_f
        out_p = max(out_f, _OUT_PAD) if li == n_layers - 1 else out_f
        g_t = jnp.tile(grid[:1], (in_p, 1)).at[:in_f].set(grid).T
        bw = jnp.zeros((in_p, out_p), base_w.dtype)
        bw = bw.at[:in_f, :out_f].set(base_w.T)
        sw_c = jnp.zeros((sw.shape[2], in_p, out_p), sw.dtype)
        sw_c = sw_c.at[:, :in_f, :out_f].set(jnp.transpose(sw, (2, 1, 0)))
        flat.extend([g_t, bw, sw_c])
        dims.append((in_p, out_p))
    return flat, tuple(dims)


@functools.partial(jax.jit, static_argnames=("cfg", "layer_dims",
                                             "block_rows", "interpret"))
def _fused_kan_jit(flat, coords, cfg: KANConfig, layer_dims,
                   block_rows: int, interpret: bool):
    n, d = coords.shape
    n_pad = _round_up(max(n, block_rows), block_rows)
    d_pad = layer_dims[0][0]
    coords_p = jnp.zeros((n_pad, d_pad), dtype=jnp.float32)
    coords_p = coords_p.at[:n, :d].set(coords.astype(jnp.float32))
    out_features = cfg.layers_hidden[-1]
    compact = out_features == 1 and block_rows % 1024 == 0

    in_specs = [pl.BlockSpec((block_rows, d_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for p in flat:
        zeros = (0,) * p.ndim
        in_specs.append(pl.BlockSpec(p.shape, lambda i, z=zeros: z,
                                     memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _kan_kernel, layer_dims=layer_dims, spline_order=cfg.spline_order,
        n_coef=cfg.grid_size + cfg.spline_order,
        compute_dtype=jnp.float32, compact_out=compact)
    grid = (n_pad // block_rows,)
    if compact:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.float32),
            grid=grid, in_specs=in_specs,
            out_specs=pl.BlockSpec((block_rows // 128, 128),
                                   lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(coords_p, *flat)
        return out.reshape(n_pad, 1)[:n]
    out_p = layer_dims[-1][1]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, out_p), jnp.float32),
        grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((block_rows, out_p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(coords_p, *flat)
    return out[:n, :out_features]


def _kan_block_rows(cfg: KANConfig, requested: int) -> int:
    """VMEM-aware tile: the degree-0 basis list holds ~(n_knots-1) live
    (block, h) f32 arrays; budget them at ~4 MB like the SIREN backward."""
    h = max(cfg.layers_hidden[1:-1] or cfg.layers_hidden)
    n_live = cfg.grid_size + 2 * cfg.spline_order
    cap = (4 * 1024 * 1024) // (n_live * h * 4)
    cap = max(128, (cap // 128) * 128)
    return min(_pick_block_rows(10 ** 9, requested), cap)


def _kan_bwd_kernel(x_ref, g_ref, *refs, layer_dims, spline_order, n_coef,
                    compute_dtype):
    """Backward per tile: recompute forward, backprop, accumulate grads.

    refs = param refs (3/layer: grid_t, base_w, sw) then grad output refs
    (2/layer: d base_w, d sw — the knot grid is a stop-gradient buffer,
    kan_apply's semantics).  Grad outputs use constant index maps so the
    same VMEM block accumulates across the sequential grid (the
    pallas_siren_train.py pattern).  dx uses the exact B-spline derivative
    recursion over the order-(k-1) bases.
    """
    n_layers = len(layer_dims)
    param_refs = refs[:3 * n_layers]
    grad_refs = refs[3 * n_layers:]

    @pl.when(pl.program_id(0) == 0)
    def _():
        for gr in grad_refs:
            gr[...] = jnp.zeros(gr.shape, gr.dtype)

    dims = (((1,), (0,)), ((), ()))      # x @ w
    dims_t = (((0,), (0,)), ((), ()))    # x^T @ g
    dims_gt = (((1,), (1,)), ((), ()))   # g @ w^T

    # forward recompute: only each layer's input tile is kept live
    x = x_ref[:].astype(jnp.float32)
    saved = []
    for li, (din, dout) in enumerate(layer_dims):
        xin = x[:, :din] if x.shape[1] != din else x
        saved.append(xin)
        if li == n_layers - 1:
            break
        g_kn = param_refs[3 * li][:].astype(jnp.float32)
        base_w = param_refs[3 * li + 1]
        sw_ref = param_refs[3 * li + 2]
        sig = 1.0 / (1.0 + jnp.exp(-xin))
        acc = _kernel_dot(xin * sig, base_w[:], dims, compute_dtype)
        bases, _ = _cox_de_boor_lists(xin, g_kn, spline_order)
        for c in range(n_coef):
            acc = acc + _kernel_dot(bases[c], sw_ref[c], dims, compute_dtype)
        x = acc

    g = g_ref[:].astype(jnp.float32)
    k = spline_order
    for li in range(n_layers - 1, -1, -1):
        g_kn = param_refs[3 * li][:].astype(jnp.float32)
        base_w = param_refs[3 * li + 1]
        sw_ref = param_refs[3 * li + 2]
        xin = saved[li]
        sig = 1.0 / (1.0 + jnp.exp(-xin))
        bases, bm1 = _cox_de_boor_lists(xin, g_kn, spline_order)
        grad_refs[2 * li][...] += _kernel_dot(xin * sig, g, dims_t,
                                              compute_dtype)
        gsw = grad_refs[2 * li + 1]
        for c in range(n_coef):
            gsw[c] = gsw[c] + _kernel_dot(bases[c], g, dims_t, compute_dtype)
        if li > 0:
            silu_d = sig * (1.0 + xin * (1.0 - sig))
            gx = _kernel_dot(g, base_w[:], dims_gt, compute_dtype) * silu_d
            if k > 0:
                for c in range(n_coef):
                    db = k * (bm1[c] / (g_kn[c + k:c + k + 1]
                                        - g_kn[c:c + 1])
                              - bm1[c + 1] / (g_kn[c + k + 1:c + k + 2]
                                              - g_kn[c + 1:c + 2]))
                    gx = gx + _kernel_dot(g, sw_ref[c], dims_gt,
                                          compute_dtype) * db
            g = gx


def _kan_bwd_block_rows(cfg: KANConfig, layer_dims,
                        n_rows: int | None = None) -> int:
    """VMEM-aware backward tile: live floats/row = the saved layer inputs
    + two Cox-de-Boor lists (order k and k-1) and derivative temps on the
    widest layer + the cotangent; budget the live set at ~3 MB.  With
    ``n_rows``, pick the under-cap tile minimising total row padding
    (ties prefer the larger tile)."""
    max_din = max(d for d, _ in layer_dims)
    n_coef = cfg.grid_size + cfg.spline_order
    per_row = (sum(d for d, _ in layer_dims)
               + (2 * n_coef + 5) * max_din + layer_dims[-1][1])
    cap = (3 * 1024 * 1024) // (per_row * 4)
    cap = max(128, (cap // 128) * 128)
    if n_rows is None:
        return cap
    cands = range(128, cap + 1, 128)
    return min(cands, key=lambda b: (_round_up(max(n_rows, b), b), -b))


@functools.partial(jax.jit, static_argnames=("cfg", "layer_dims",
                                             "block_rows", "interpret"))
def _kan_backward(flat, coords, g, cfg: KANConfig, layer_dims,
                  block_rows: int, interpret: bool):
    n, d = coords.shape
    n_pad = _round_up(max(n, block_rows), block_rows)
    d_pad = layer_dims[0][0]
    coords_p = jnp.zeros((n_pad, d_pad), jnp.float32)
    coords_p = coords_p.at[:n, :d].set(coords.astype(jnp.float32))
    out_p = layer_dims[-1][1]
    out_features = cfg.layers_hidden[-1]
    # pad rows carry a zero cotangent, so they contribute nothing to dW
    g_p = jnp.zeros((n_pad, out_p), jnp.float32)
    g_p = g_p.at[:n, :out_features].set(g.astype(jnp.float32))

    in_specs = [
        pl.BlockSpec((block_rows, d_pad), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, out_p), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    for p in flat:
        zeros = (0,) * p.ndim
        in_specs.append(pl.BlockSpec(p.shape, lambda i, z=zeros: z,
                                     memory_space=pltpu.VMEM))
    out_shapes, out_specs = [], []
    for li in range(len(layer_dims)):
        for p in (flat[3 * li + 1], flat[3 * li + 2]):
            zeros = (0,) * p.ndim
            out_shapes.append(jax.ShapeDtypeStruct(p.shape, jnp.float32))
            out_specs.append(pl.BlockSpec(p.shape, lambda i, z=zeros: z,
                                          memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _kan_bwd_kernel, layer_dims=layer_dims,
        spline_order=cfg.spline_order,
        n_coef=cfg.grid_size + cfg.spline_order,
        compute_dtype=jnp.float32)
    grads = pl.pallas_call(
        kernel, out_shape=tuple(out_shapes),
        grid=(n_pad // block_rows,),
        in_specs=in_specs, out_specs=tuple(out_specs),
        interpret=interpret,
    )(coords_p, g_p, *flat)
    # re-interleave (zero grid cotangent, d base_w, d sw) into flat order
    out = []
    for li in range(len(layer_dims)):
        out.extend([jnp.zeros_like(flat[3 * li]),
                    grads[2 * li], grads[2 * li + 1]])
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _fused_kan_flat(flat, coords, cfg, layer_dims, block_rows, interpret):
    return _fused_kan_jit(flat, coords, cfg, layer_dims, block_rows,
                          interpret)


def _fused_kan_flat_fwd(flat, coords, cfg, layer_dims, block_rows, interpret):
    out = _fused_kan_jit(flat, coords, cfg, layer_dims, block_rows,
                         interpret)
    return out, (flat, coords)


def _fused_kan_flat_bwd(cfg, layer_dims, block_rows, interpret, residuals,
                        gout):
    flat, coords = residuals
    grads = _kan_backward(flat, coords, gout, cfg, layer_dims,
                          _kan_bwd_block_rows(cfg, layer_dims,
                                              n_rows=coords.shape[0]),
                          interpret)
    return grads, None


_fused_kan_flat.defvjp(_fused_kan_flat_fwd, _fused_kan_flat_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 3, 4))
def _fused_kan_xla_bwd(params, cfg, coords, block_rows, interpret):
    flat, layer_dims = _flatten_kan_params(params, cfg)
    return _fused_kan_jit(flat, coords, cfg, layer_dims, block_rows,
                          interpret)


def _fused_kan_xla_fwd(params, cfg, coords, block_rows, interpret):
    return _fused_kan_xla_bwd(params, cfg, coords, block_rows, interpret), \
        (params, coords)


def _fused_kan_xla_bwd_rule(cfg, block_rows, interpret, residuals, g):
    # fallback for stacks too wide for the fused backward's VMEM-resident
    # grad accumulators: XLA autodiff of the tested jnp reference path
    params, coords = residuals
    _, vjp = jax.vjp(lambda p: kan_apply(p, cfg, coords), params)
    (gp,) = vjp(g)
    return gp, None


_fused_kan_xla_bwd.defvjp(_fused_kan_xla_fwd, _fused_kan_xla_bwd_rule)

# params + grad accumulators must sit in VMEM simultaneously (constant
# index maps); leave room for the tile transients and pipeline buffers
_BWD_RESIDENT_BUDGET = 11 * 1024 * 1024


def _bwd_resident_bytes(cfg: KANConfig) -> int:
    n_coef = cfg.grid_size + cfg.spline_order
    tot = 0
    dims = list(zip(cfg.layers_hidden[:-1], cfg.layers_hidden[1:]))
    n_layers = len(dims)
    for li, (din, dout) in enumerate(dims):
        in_p = max(din, _IN_PAD) if li == 0 else din
        out_p = max(dout, _OUT_PAD) if li == n_layers - 1 else dout
        tot += 2 * (in_p * out_p + n_coef * in_p * out_p) * 4
    return tot


def fused_kan_apply(params: Params, cfg: KANConfig, coords: jax.Array,
                    block_rows: int = 1024,
                    interpret: bool = False) -> jax.Array:
    """Fused full-stack KAN forward — drop-in for ``kan_apply``.

    Differentiable: stacks whose params + grad accumulators fit VMEM get
    the fused Pallas backward (per-tile recompute, no HBM basis tensors);
    wider stacks fall back to XLA autodiff of ``kan_apply``.  A/B-tested
    against the jnp path in tests/test_pallas_kan.py.
    """
    if _bwd_resident_bytes(cfg) <= _BWD_RESIDENT_BUDGET:
        flat, layer_dims = _flatten_kan_params(params, cfg)
        return _fused_kan_flat(flat, coords, cfg, layer_dims,
                               _kan_block_rows(cfg, block_rows), interpret)
    return _fused_kan_xla_bwd(params, cfg, coords,
                              _kan_block_rows(cfg, block_rows), interpret)
