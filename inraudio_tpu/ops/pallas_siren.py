"""Fused Pallas TPU kernel for the SIREN / SirenWithSnakeTanh stack.

The hot path of this framework is a chain of ``(n, h) @ (h, h)`` matmuls with
sin/snake/tanh nonlinearities over coordinate batches of 10^5-10^7 rows
(SURVEY.md section 7).  Under plain XLA every layer boundary round-trips the
(n, h) activation through HBM (~315 MB per layer for the 10 s clip at
h=256); this kernel runs the ENTIRE stack per coordinate tile inside VMEM —
HBM traffic collapses to "read coords once, write output once, weights
resident" and the op becomes MXU/compute-bound.

Layout per grid step (tile of ``block_rows`` coordinates):
- weights/biases/activation params of all layers live in VMEM via constant
  index maps (loaded once, reused across the whole grid);
- the first layer's tiny-in matmul ((rows, d) @ (d, h), d = 1..8) is
  computed as explicit broadcast multiply-adds on the VPU — exact f32, which
  keeps the numerically delicate ``omega0 * coord`` path at full precision
  (bf16 matmul passes would be fatal at omega0 ~ 2e4, SURVEY.md section 7);
- hidden matmuls hit the MXU with f32 accumulation; ``compute_dtype``
  selects f32 (default) or bf16 inputs;
- sin / snake (via the cos double-angle identity) / tanh run on the VPU,
  fused between matmuls.

``fused_siren_apply`` is a drop-in for ``models.siren.siren_snake_tanh_apply``
and is A/B-tested against it (tests/test_pallas.py).
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

Params = dict[str, Any]

# static per-layer recipe entry: (kind, omega_or_None)
_MAX_SMALL_IN = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _stack_kernel(coords_ref, *refs, kinds, omegas, in_features,
                  compute_dtype):
    """refs = [w0, b0, (a0?), w1, b1, (a1?), ..., out_ref]."""
    out_ref = refs[-1]
    refs = refs[:-1]

    x = coords_ref[:].astype(jnp.float32)  # (rows, in_pad)
    ri = 0
    for li, kind in enumerate(kinds):
        w = refs[ri][:]
        b = refs[ri + 1][:]          # (1, out_f)
        ri += 2
        if li == 0:
            # tiny-in first layer: exact f32 VPU multiply-adds
            pre = b.astype(jnp.float32)
            for d in range(in_features):
                pre = pre + x[:, d:d + 1] * w[d:d + 1, :].astype(jnp.float32)
        else:
            xin = x.astype(compute_dtype)
            pre = jax.lax.dot_general(
                xin, w.astype(compute_dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + b.astype(jnp.float32)
        if kind in ("sine_first", "sine"):
            x = jnp.sin(omegas[li] * pre)
        elif kind == "linear_snake":
            a = refs[ri][:].astype(jnp.float32)  # (1, out_f)
            ri += 1
            x = pre + (0.5 / a) * (1.0 - jnp.cos(2.0 * a * pre))
        elif kind == "linear_tanh":
            x = jnp.tanh(pre)
        else:  # linear_last
            x = pre
    out_ref[:] = x.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "block_rows",
                                             "compute_dtype_name",
                                             "interpret"))
def _fused_apply_jit(flat_params, coords, cfg: SirenSnakeTanhConfig,
                     block_rows: int, compute_dtype_name: str,
                     interpret: bool):
    compute_dtype = (jnp.bfloat16 if compute_dtype_name == "bfloat16"
                     else jnp.float32)
    kinds = cfg.layer_kinds
    omegas = tuple(
        cfg.first_omega_0 if k == "sine_first"
        else (cfg.hidden_omega_0 if k == "sine" else 0.0)
        for k in kinds)

    n, d = coords.shape
    n_pad = _round_up(max(n, block_rows), block_rows)
    d_pad = _MAX_SMALL_IN
    coords_p = jnp.zeros((n_pad, d_pad), dtype=jnp.float32)
    coords_p = coords_p.at[:n, :d].set(coords.astype(jnp.float32))

    # pad the scalar output lane to 128 for clean VMEM tiling
    out_f = 128
    grid = (n_pad // block_rows,)

    in_specs = [pl.BlockSpec((block_rows, d_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    operands = []
    for p in flat_params:
        in_specs.append(pl.BlockSpec(p.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(p)

    kernel = functools.partial(_stack_kernel, kinds=kinds, omegas=omegas,
                               in_features=d, compute_dtype=compute_dtype)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, out_f), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_rows, out_f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(coords_p, *operands)
    return out[:n, : cfg.out_features]


def _flatten_params(params: Params, cfg: SirenSnakeTanhConfig,
                    out_lane_pad: int = 128) -> list[jax.Array]:
    """Layer dicts -> flat [w, b(1,f), (a(1,f))?...] list with the final
    layer's output lane padded to ``out_lane_pad``."""
    flat: list[jax.Array] = []
    kinds = cfg.layer_kinds
    for li, (kind, p) in enumerate(zip(kinds, params["layers"])):
        w, b = p["w"], p["b"]
        if li == 0:
            w_p = jnp.zeros((_MAX_SMALL_IN, w.shape[1]), w.dtype)
            w_p = w_p.at[: w.shape[0]].set(w)
            w = w_p
        if li == len(kinds) - 1 and w.shape[1] < out_lane_pad:
            w = jnp.pad(w, ((0, 0), (0, out_lane_pad - w.shape[1])))
            b = jnp.pad(b, (0, out_lane_pad - b.shape[0]))
        flat.append(w)
        flat.append(b.reshape(1, -1))
        if kind == "linear_snake":
            flat.append(p["snake_a"].reshape(1, -1))
    return flat


def fused_siren_apply(params: Params, cfg: SirenSnakeTanhConfig,
                      coords: jax.Array, block_rows: int = 1024,
                      compute_dtype=jnp.float32,
                      interpret: bool = False) -> jax.Array:
    """Fused full-stack forward: drop-in for siren_snake_tanh_apply."""
    if cfg.in_features > _MAX_SMALL_IN:
        raise ValueError(
            f"fused kernel supports in_features <= {_MAX_SMALL_IN} "
            f"(raw coordinates); encoded inputs (RFF) use the XLA path")
    flat = _flatten_params(params, cfg)
    name = "bfloat16" if compute_dtype == jnp.bfloat16 else "float32"
    return _fused_apply_jit(flat, coords, cfg, block_rows, name, interpret)
