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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.siren import SirenSnakeTanhConfig

Params = dict[str, Any]

# static per-layer recipe entry: (kind, omega_or_None)
_MAX_SMALL_IN = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_block_rows(n: int, requested: int) -> int:
    """Tile size minimising estimated cost = padded rows x write penalty.

    1024-multiples enable the compact scalar-output layout (the (8,128)
    output tile constraint); smaller multiples of 128 avoid row-padding
    waste for short inputs (a 512-row chunk at block 1024 computes 2x the
    useful rows) at the price of the lane-padded (rows, 128) output write
    — measured ~10% of the step at h=128, modelled as a 1.1x factor.  Ties
    prefer the larger tile (fewer grid steps).  Requests below 1024 are
    honored verbatim (tests exercise multi-tile grids with small blocks;
    the compact-layout check downstream disables itself for
    non-1024-multiples)."""
    if requested < 1024:
        return requested

    def cost(b):
        padded = _round_up(max(n, b), b)
        rows = padded if b % 1024 == 0 else padded * 1.1
        # ~64 rows-equivalent of fixed dispatch/pipeline cost per tile:
        # keeps the model from shattering medium inputs into tiny tiles
        return (rows + 64 * (padded // b), -b)

    candidates = [b for b in (128, 256, 384, 512, 640, 768, 896,
                              1024, 2048, 4096) if b <= requested]
    return min(candidates, key=cost)


def _f32_dot_mode() -> str:
    """f32 kernel matmuls must NOT be Mosaic's default (a single bf16 pass,
    ~1e-3 relative error — measurably degrades both gradients and fit SNR).
    Default 'bf16x3': a hand-rolled 3-pass split (see ``_kernel_dot``),
    ~21-bit effective mantissa at ~2x the throughput of the exact 6-pass
    matmul — measured on the headline bench it trains to the SAME final
    SNR as 'highest' with ~1.4x the steps (BASELINE.md).
    INRAUDIO_F32_PRECISION=highest selects the exact 6-pass matmul;
    'bf16x2' the 2-pass midpoint (x rounded to bf16, w kept split —
    hi*hi + hi*lo), ~bf16-accurate in x only; 'bf16' a single pass."""
    import os
    return os.environ.get("INRAUDIO_F32_PRECISION", "bf16x3")


def _grad_dot_mode() -> str | None:
    """Separate f32 precision for the BACKWARD (dgrad/wgrad) matmuls in
    the fused training kernels (INRAUDIO_GRAD_PRECISION; 'inherit' =
    use INRAUDIO_F32_PRECISION).  Rationale: forward rounding BIASES the
    converged solution (bf16x2 everywhere caps the headline at 67.7 dB,
    BASELINE.md r4 A/B), while gradient rounding is zero-mean noise
    Adam's moment averaging absorbs — so 'bf16x2' drops 2 of the 9 MXU
    passes per hidden layer per step.  Default flipped to bf16x2 in r4
    after it won BOTH production shapes at equal quality: h=128
    multi-INR headline 166 -> 196 steps/s at an identical 125.70 dB
    (bench_logs_r4/30_gradx2.log), h=256 full-batch 75.3 -> 90.4 steps/s
    and 11.5 -> 15.8 dB at the same strict 30 s budget
    (41_full256_gradx2.log).  Kernel-path lever only; the XLA fallback
    keeps uniform precision."""
    import os
    mode = os.environ.get("INRAUDIO_GRAD_PRECISION", "bf16x2")
    return None if mode in ("", "inherit") else mode


def _kernel_dot(x, w, dims, compute_dtype, mode: str | None = None):
    """dot_general for the kernels with explicit f32 precision handling.

    bf16 inputs: single MXU pass (that IS the requested precision).
    f32 inputs: 'highest' -> exact 6-pass matmul; 'bf16x3' -> split each
    operand into bf16 high + low halves and take the three significant
    cross products (hi*hi + hi*lo + lo*hi) with f32 accumulation — Mosaic
    has no Precision.HIGH lowering, so the classic bf16x3 decomposition is
    done by hand.

    ``mode`` overrides the process-wide INRAUDIO_F32_PRECISION choice for
    this call — the decode path uses it as a per-model quality-gated tier
    (bf16x2's one-forward-pass error is benign at decode, while in
    TRAINING it compounds through Adam: measured -58 dB on the headline,
    BASELINE.md r4 A/B).
    """
    if compute_dtype != jnp.float32:
        return jax.lax.dot_general(
            x.astype(compute_dtype), w.astype(compute_dtype), dims,
            preferred_element_type=jnp.float32)
    mode = mode or _f32_dot_mode()
    if mode in ("bf16x3", "bf16x2"):
        xh = x.astype(jnp.bfloat16)
        wh = w.astype(jnp.bfloat16)
        wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
        dot = functools.partial(jax.lax.dot_general, dimension_numbers=dims,
                                preferred_element_type=jnp.float32)
        if mode == "bf16x2":
            # 2-pass midpoint of the ladder: keep the WEIGHT split (its
            # rounding error is omega-amplified through sine layers) but
            # round the activations to bf16 — drops the lo*hi pass
            return dot(xh, wh) + dot(xh, wl)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        return dot(xh, wh) + (dot(xh, wl) + dot(xl, wh))
    if mode == "bf16":
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), dims,
            preferred_element_type=jnp.float32)
    return jax.lax.dot_general(x, w, dims,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


# Odd least-squares polynomials for sin on [-pi, pi] (fitted offline, see
# module tests).  Degree 11: max abs error 3.05e-07 (~ -130 dB) — the
# default, safe under the 124.9 dB headline.  Degree 9: 1.7e-05 (~ -95 dB)
# and degree 7: 6.6e-04 (~ -63 dB) — cheaper VPU chains for decoding models
# whose fit SNR sits well below the polynomial floor (quality-gate the
# choice per model; scripts/bench_decode.py measures the trade).
_SIN_C = (0.99999970695822715, -0.16666577198087604, 0.0083325579983740631,
          -0.00019812572237557381, 2.7040473313016951e-06,
          -2.0534080047784251e-08)
_SIN_C9 = (0.9999845934510802, -0.16663259376823747, 0.008312388279692877,
           -0.00019316269888602924, 2.1732569600486186e-06)
_SIN_C7 = (0.999450173058242, -0.1658384294768091, 0.007998575320167381,
           -0.0001477404380785241)
_SIN_COEFFS = {11: _SIN_C, 9: _SIN_C9, 7: _SIN_C7}
_INV_TWO_PI = 0.15915494309189535
_HALF_PI = 1.5707963267948966
# Cody-Waite split of 2*pi: HI is exactly representable with a 5-bit
# mantissa, so k*HI is exact in f32 for |k| < 2^18; the residual LO carries
# the rest.  Reduction error stays ~1e-6 rad even at first-layer arguments
# |x| ~ omega0 ~ 2e4 (naive single-constant reduction would be ~1e-3 there).
_TWO_PI_HI = 6.28125
_TWO_PI_LO = 1.9353071795864769e-03


def _fast_sin(x, degree: int = 11):
    """sin via Cody-Waite range reduction + odd polynomial (default deg 11).

    ~12 VPU ops per element vs the ~3x costlier precise lowering; the
    decode path of a SIREN stack is transcendental-bound (measured: fp32
    and bf16 matmuls give identical Msamples/s), so this is the single
    biggest decode-throughput lever.  |error| <= ~1e-6 absolute across the
    framework's argument range — far below fp32 model noise at audio SNR
    scales.
    """
    k = jnp.round(x * _INV_TWO_PI)
    r = (x - k * _TWO_PI_HI) - k * _TWO_PI_LO
    return _sin_poly(r, degree)


def _fast_cos(x, degree: int = 11):
    """cos(x) = sin(x + pi/2), with the pi/2 shift folded into the
    reduction so it is applied to the SMALL residual (adding pi/2 to a
    large x before reducing would itself lose ~|x|*2^-24 rad)."""
    k = jnp.round(x * _INV_TWO_PI + 0.25)
    r = (x - k * _TWO_PI_HI) - k * _TWO_PI_LO + _HALF_PI
    return _sin_poly(r, degree)


def _sin_poly(r, degree: int = 11):
    cs = _SIN_COEFFS[degree]
    r2 = r * r
    p = cs[-1]
    for c in cs[-2::-1]:
        p = p * r2 + c
    return r * p


def _rff_features_in_kernel(x, bt, in_features, sin_fn, cos_fn):
    """In-VMEM RFF encoding: v = x @ (2*pi*B^T) via exact f32 VPU
    multiply-adds over the tiny raw-coordinate dim, then (cos v, sin v).

    Folding the encoding into the kernel means the per-step HBM input is the
    raw (n, d) coordinates — 4*d bytes/row — instead of the precomputed
    (n, 2F) feature matrix (8*F bytes/row; 512x more at F=256, d=1), which
    is what starves the XLA path (reference RFF configs, run.py:141-144).
    """
    v = None
    for d in range(in_features):
        term = x[:, d:d + 1] * bt[d:d + 1, :].astype(jnp.float32)
        v = term if v is None else v + term
    return cos_fn(v), sin_fn(v)


def _run_layers(x, flat, kinds, omegas, in_features, compute_dtype,
                *, approx_sin=False, sin_poly_degree=11, mixed_matmul=False,
                f32_mode=None, exact_first_sin=False, bt=None,
                rff_features=0):
    """The in-VMEM layer stack shared by every apply kernel.

    ``flat`` is the in-register parameter sequence [w0, b0, (a0?), w1, ...]
    (already loaded from refs — the single-chunk kernel reads whole blocks,
    the multi-chunk kernel row-slices one chunk's parameters per call).
    Returns the final (rows, out_lanes) activation in f32."""
    if approx_sin:
        sin_fn = functools.partial(_fast_sin, degree=sin_poly_degree)
        cos_fn = functools.partial(_fast_cos, degree=sin_poly_degree)
    else:
        sin_fn, cos_fn = jnp.sin, jnp.cos
    sin0_fn = jnp.sin if exact_first_sin else sin_fn
    cos0_fn = jnp.cos if exact_first_sin else cos_fn

    ri = 0
    for li, kind in enumerate(kinds):
        w = flat[ri]
        b = flat[ri + 1]             # (1, out_f)
        ri += 2
        if li == 0 and rff_features:
            cv, sv = _rff_features_in_kernel(x, bt, in_features,
                                             sin0_fn, cos0_fn)
            dims = (((1,), (0,)), ((), ()))
            pre = (_kernel_dot(cv, w[:rff_features], dims, compute_dtype,
                               mode=f32_mode)
                   + _kernel_dot(sv, w[rff_features:], dims, compute_dtype,
                                 mode=f32_mode)
                   + b.astype(jnp.float32))
        elif li == 0:
            # tiny-in first layer: exact f32 VPU multiply-adds
            pre = b.astype(jnp.float32)
            for d in range(in_features):
                pre = pre + x[:, d:d + 1] * w[d:d + 1, :].astype(jnp.float32)
        else:
            # mixed_matmul: non-sine layers take a single bf16 MXU pass —
            # their error is NOT omega-amplified (sine layers' is), so the
            # output floor stays near the uniform-precision one while the
            # matmul passes drop from 3 to 1 on half the stack (decode-only
            # lever; quality-gated per model in eval.decode)
            dt = (jnp.bfloat16 if mixed_matmul
                  and kind in ("linear_snake", "linear_tanh", "linear_last")
                  else compute_dtype)
            pre = _kernel_dot(x, w, (((1,), (0,)), ((), ())),
                              dt, mode=f32_mode) + b.astype(jnp.float32)
        if kind == "sine_first":
            x = sin0_fn(omegas[li] * pre)
        elif kind == "sine":
            x = sin_fn(omegas[li] * pre)
        elif kind == "linear_snake":
            a = flat[ri].astype(jnp.float32)  # (1, out_f)
            ri += 1
            x = pre + (0.5 / a) * (1.0 - cos_fn(2.0 * a * pre))
        elif kind == "linear_tanh":
            x = jnp.tanh(pre)
        else:  # linear_last
            x = pre
    return x


def _stack_kernel(coords_ref, *refs, kinds, omegas, in_features,
                  compute_dtype, compact_out=False, approx_sin=False,
                  rff_features=0, sin_poly_degree=11, mixed_matmul=False,
                  f32_mode=None, exact_first_sin=False):
    """refs = [(bt?), w0, b0, (a0?), w1, b1, (a1?), ..., out_ref].

    ``compact_out``: the model output is scalar (out_features == 1), so
    instead of writing the lane-padded (rows, 128) activation — 128x the
    useful HBM bytes — write the scalar column reshaped to
    (rows // 128, 128); the host reshapes back to (n,).  This turns decode
    from write-bandwidth-bound into compute-bound.

    ``rff_features`` > 0: refs[0] is the fixed 2*pi-scaled RFF projection
    B^T (in_pad, F); layer 0 consumes the in-VMEM (cos, sin) features with
    its (2F, h) weight split into cos/sin row halves — two MXU matmuls.

    ``exact_first_sin``: evaluate LAYER 0's trig with the precise lowering
    even when ``approx_sin`` — the high-omega mixed tier (r4 trained-floor
    probe, bench_logs_r4/40_trained_floor.log): at omega0 ~ 2e4 the first
    layer's polynomial phase error scales with the argument and floors
    every approx tier at 43-49 dB, while the HIDDEN layers run omega=30
    where the polynomial is ~-130 dB.  Exact sin on the one delicate
    layer, polynomial on the rest.
    """
    out_ref = refs[-1]
    refs = refs[:-1]
    bt_ref = None
    if rff_features:
        bt_ref, refs = refs[0], refs[1:]

    x = _run_layers(coords_ref[:].astype(jnp.float32),
                    [r[:] for r in refs], kinds, omegas, in_features,
                    compute_dtype, approx_sin=approx_sin,
                    sin_poly_degree=sin_poly_degree,
                    mixed_matmul=mixed_matmul, f32_mode=f32_mode,
                    exact_first_sin=exact_first_sin,
                    bt=None if bt_ref is None else bt_ref[:],
                    rff_features=rff_features)
    if compact_out:
        rows = x.shape[0]
        out_ref[:] = x[:, 0:1].reshape(rows // 128, 128).astype(out_ref.dtype)
    else:
        out_ref[:] = x.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "block_rows",
                                             "compute_dtype_name",
                                             "interpret", "approx_sin",
                                             "sin_poly_degree",
                                             "mixed_matmul", "packed_out",
                                             "f32_mode", "exact_first_sin"))
def _fused_apply_jit(flat_params, coords, cfg: SirenSnakeTanhConfig,
                     block_rows: int, compute_dtype_name: str,
                     interpret: bool, approx_sin: bool = False,
                     bt=None, sin_poly_degree: int = 11,
                     mixed_matmul: bool = False, packed_out: bool = False,
                     f32_mode: str | None = None,
                     exact_first_sin: bool = False):
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

    grid = (n_pad // block_rows,)
    # compact blocks are (block_rows//128, 128); Mosaic requires the
    # sublane dim divisible by 8 -> block_rows must be a multiple of 1024
    compact = cfg.out_features == 1 and block_rows % 1024 == 0

    in_specs = [pl.BlockSpec((block_rows, d_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    operands = []
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

    kernel = functools.partial(_stack_kernel, kinds=kinds, omegas=omegas,
                               in_features=d, compute_dtype=compute_dtype,
                               compact_out=compact, approx_sin=approx_sin,
                               rff_features=rff_features,
                               sin_poly_degree=sin_poly_degree,
                               mixed_matmul=mixed_matmul,
                               f32_mode=f32_mode,
                               exact_first_sin=exact_first_sin)
    if compact:
        # scalar output packed (n_pad // 128, 128): exactly n_pad floats of
        # HBM write instead of a 128-lane-padded (n_pad, 128) activation
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.float32),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((block_rows // 128, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(coords_p, *operands)
        if packed_out:
            # raw (n_pad // 128, 128) kernel output: the device-side
            # reshape-to-(n, 1) forces XLA to materialise a relayout copy
            # (measured 2.3 ms vs a 1.55 ms kernel on the vmapped headline
            # decode) — packed consumers reshape on the HOST instead
            return out
        return out.reshape(n_pad, 1)[:n]
    out_f = 128  # lane-padded fallback (vector outputs)
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


def _layer_w_rows(cfg: SirenSnakeTanhConfig) -> tuple[int, ...]:
    """Per-layer weight ROW counts as laid out by the stacked flattener
    (layer 0 padded to the small-input width)."""
    kinds = cfg.layer_kinds
    h = cfg.hidden_features
    return tuple(_MAX_SMALL_IN if li == 0 else h
                 for li in range(len(kinds)))


def _stack_kernel_multi(coords_ref, *refs, kinds, omegas, in_features,
                        compute_dtype, chunks, rows_pad, w_rows,
                        approx_sin=False, sin_poly_degree=11,
                        mixed_matmul=False, f32_mode=None,
                        exact_first_sin=False):
    """Multi-chunk decode: one grid step evaluates ``chunks`` chunk-INRs on
    the SHARED per-chunk coordinate grid.

    Why it exists: the multi-INR stitched decode (train/multi_inr.py) vmaps
    the single-model kernel over ~670 chunks of 512 rows each — each
    instance either pads its rows to the >=1024-row compact tile (2-4x
    wasted MXU work) or takes the lane-padded (rows, 128) output write plus
    a device relayout copy that costs more than the kernel (BASELINE.md r3
    trace rows).  Every chunk shares ONE coordinate grid (get_coord(n)), so
    this kernel keeps the grid resident in VMEM and walks ``chunks`` chunks'
    parameters per grid step: zero row padding, compact packed output, and
    1/``chunks`` the grid steps.

    refs = per-layer [w_stacked (chunks*w_rows[li], h),
    b (chunks*8, h, row 0 of each 8-band live), (snake_a, same layout)?,
    ...] blocks + out_ref ((chunks*rows_pad)//128, 128) packed scalar
    columns, one chunk after another.  Everything is 2D row-stacked —
    per-chunk vectors ride an 8-row band because Mosaic block shapes must
    keep the sublane dim a multiple of 8.
    """
    out_ref = refs[-1]
    refs = refs[:-1]
    x0 = coords_ref[:].astype(jnp.float32)  # (rows_pad, in_pad)
    pieces = []
    for g in range(chunks):
        flat = []
        ri = 0
        for li, kind in enumerate(kinds):
            a = w_rows[li]
            flat.append(refs[ri][g * a:(g + 1) * a, :])
            flat.append(refs[ri + 1][g * 8:g * 8 + 1, :])
            ri += 2
            if kind == "linear_snake":
                flat.append(refs[ri][g * 8:g * 8 + 1, :])
                ri += 1
        x = _run_layers(x0, flat, kinds, omegas, in_features, compute_dtype,
                        approx_sin=approx_sin,
                        sin_poly_degree=sin_poly_degree,
                        mixed_matmul=mixed_matmul, f32_mode=f32_mode,
                        exact_first_sin=exact_first_sin)
        pieces.append(x[:, 0:1].reshape(rows_pad // 128, 128))
    out_ref[:] = jnp.concatenate(pieces, axis=0).astype(out_ref.dtype)


def _pick_chunks_per_step(cfg: SirenSnakeTanhConfig, rows_pad: int,
                          requested: int | None = None) -> int | None:
    """Chunks evaluated per grid step: the largest count whose packed
    output block satisfies the (8, 128) tile constraint
    ((chunks * rows_pad) % 1024 == 0) and whose weights + live activations
    fit a conservative VMEM budget.  None = no feasible count (caller
    falls back to the vmapped single-chunk kernel)."""
    if requested is not None:
        return requested
    h = cfg.hidden_features
    w_bytes = 4 * sum(r * h for r in _layer_w_rows(cfg))  # per chunk
    # live activations: x + pre in f32 plus the bf16x3 split temporaries
    act_bytes = 12 * rows_pad * h
    budget = 10 * 2 ** 20
    for g in (16, 12, 8, 6, 4, 2):
        if (g * rows_pad) % 1024:
            continue
        if g * (w_bytes + rows_pad * 4) + act_bytes <= budget:
            return g
    return None


def _flatten_params_stacked(params: Params, cfg: SirenSnakeTanhConfig
                            ) -> list[jax.Array]:
    """Chunk-stacked layer dicts (leading k axis on every leaf) -> flat 2D
    arrays for the multi-chunk kernel: weights row-stacked to
    (k * w_rows, h) — 2D blocks reuse the proven (sublane, lane) tiling —
    and per-chunk vectors (bias, snake a) broadcast onto an 8-row band,
    (k * 8, h), because Mosaic block sublane dims must be multiples of 8.
    Final layer lane-padded to 128."""
    flat: list[jax.Array] = []
    kinds = cfg.layer_kinds

    def band(v):  # (k, h) -> (k*8, h), row 0 of each band is the vector
        k, h = v.shape
        return jnp.broadcast_to(v[:, None, :], (k, 8, h)).reshape(k * 8, h)

    for li, (kind, p) in enumerate(zip(kinds, params["layers"])):
        w, b = p["w"], p["b"]
        k = w.shape[0]
        if li == 0:
            w_p = jnp.zeros((k, _MAX_SMALL_IN, w.shape[2]), w.dtype)
            w = w_p.at[:, : w.shape[1]].set(w)
        if li == len(kinds) - 1 and w.shape[2] < 128:
            w = jnp.pad(w, ((0, 0), (0, 0), (0, 128 - w.shape[2])))
            b = jnp.pad(b, ((0, 0), (0, 128 - b.shape[1])))
        flat.append(w.reshape(k * w.shape[1], w.shape[2]))
        flat.append(band(b))
        if kind == "linear_snake":
            flat.append(band(p["snake_a"]))
    return flat


@functools.partial(jax.jit, static_argnames=("cfg", "chunks", "rows_pad",
                                             "n", "compute_dtype_name",
                                             "interpret", "approx_sin",
                                             "sin_poly_degree",
                                             "mixed_matmul", "f32_mode",
                                             "exact_first_sin"))
def _stacked_apply_jit(params, coords, cfg: SirenSnakeTanhConfig,
                       chunks: int, rows_pad: int, n: int,
                       compute_dtype_name: str, interpret: bool,
                       approx_sin: bool = False, sin_poly_degree: int = 11,
                       mixed_matmul: bool = False, f32_mode: str | None = None,
                       exact_first_sin: bool = False):
    compute_dtype = (jnp.bfloat16 if compute_dtype_name == "bfloat16"
                     else jnp.float32)
    kinds = cfg.layer_kinds
    omegas = tuple(
        cfg.first_omega_0 if k == "sine_first"
        else (cfg.hidden_omega_0 if k == "sine" else 0.0)
        for k in kinds)
    w_rows = _layer_w_rows(cfg)

    k = params["layers"][0]["w"].shape[0]
    k_pad = _round_up(k, chunks)
    if k_pad != k:  # repeat chunk 0 (never NaN/inf, sliced off after)
        params = jax.tree.map(
            lambda x: jnp.concatenate(
                [x, jnp.broadcast_to(x[:1], (k_pad - k,) + x.shape[1:])]),
            params)
    flat = _flatten_params_stacked(params, cfg)

    d = coords.shape[1]
    coords_p = jnp.zeros((rows_pad, _MAX_SMALL_IN), dtype=jnp.float32)
    coords_p = coords_p.at[: coords.shape[0], :d].set(
        coords.astype(jnp.float32))

    in_specs = [pl.BlockSpec((rows_pad, _MAX_SMALL_IN), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)]
    ri = 0
    for li, kind in enumerate(kinds):
        a = w_rows[li]
        in_specs.append(pl.BlockSpec((chunks * a, flat[ri].shape[1]),
                                     lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((chunks * 8, flat[ri + 1].shape[1]),
                                     lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        ri += 2
        if kind == "linear_snake":
            in_specs.append(pl.BlockSpec((chunks * 8, flat[ri].shape[1]),
                                         lambda i: (i, 0),
                                         memory_space=pltpu.VMEM))
            ri += 1

    kernel = functools.partial(
        _stack_kernel_multi, kinds=kinds, omegas=omegas,
        in_features=cfg.in_features, compute_dtype=compute_dtype,
        chunks=chunks, rows_pad=rows_pad, w_rows=w_rows,
        approx_sin=approx_sin, sin_poly_degree=sin_poly_degree,
        mixed_matmul=mixed_matmul, f32_mode=f32_mode,
        exact_first_sin=exact_first_sin)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((k_pad * rows_pad // 128, 128),
                                       jnp.float32),
        grid=(k_pad // chunks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((chunks * rows_pad // 128, 128),
                               lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(coords_p, *flat)
    # packed (k_pad*rows_pad//128, 128) -> (k, n, 1): a dense same-bytes
    # reshape + slice (k*n floats), NOT the (rows, 128)-activation relayout
    # the vmapped path pays
    return out.reshape(k_pad, rows_pad)[:k, :n, None]


def stacked_supported(cfg: Any, n: int) -> bool:
    """True when ``fused_siren_apply_stacked`` can serve (cfg, n)-shaped
    chunk populations — scalar output, raw small-input coords (no RFF),
    and a VMEM-feasible chunks-per-step.  Static-only check: lets callers
    pick the eval path once at fn-construction time."""
    return (getattr(cfg, "out_features", None) == 1
            and getattr(cfg, "in_features", 99) <= _MAX_SMALL_IN
            and _pick_chunks_per_step(cfg, _round_up(n, 128)) is not None)


def fused_siren_apply_stacked(params: Params, cfg: SirenSnakeTanhConfig,
                              coords: jax.Array,
                              chunks_per_step: int | None = None,
                              compute_dtype=jnp.float32,
                              interpret: bool = False,
                              approx_sin: bool = False,
                              sin_poly_degree: int = 11,
                              mixed_matmul: bool = False,
                              f32_mode: str | None = None,
                              exact_first_sin: bool = False
                              ) -> jax.Array | None:
    """Evaluate a STACKED chunk population (leading k axis on every param
    leaf) on one shared (n, d) coordinate grid -> (k, n, 1).

    Drop-in for ``jax.vmap(lambda p: fused_siren_apply(p, cfg, coords))``
    over the multi-INR decode shape (train/multi_inr.py:403), but with zero
    row padding and a compact packed output — see ``_stack_kernel_multi``.
    Quality-tier kwargs match ``fused_siren_apply``.

    Returns None when the shape is unsupported (RFF models, vector outputs,
    or no VMEM-feasible chunks-per-step) — callers fall back to the vmapped
    single-chunk kernel.
    """
    if cfg.out_features != 1 or cfg.in_features > _MAX_SMALL_IN:
        return None
    rows_pad = _round_up(coords.shape[0], 128)
    chunks = _pick_chunks_per_step(cfg, rows_pad, chunks_per_step)
    if chunks is None:
        return None
    name = "bfloat16" if compute_dtype == jnp.bfloat16 else "float32"
    return _stacked_apply_jit(params, coords, cfg, chunks, rows_pad,
                              coords.shape[0], name, interpret,
                              approx_sin=approx_sin,
                              sin_poly_degree=sin_poly_degree,
                              mixed_matmul=mixed_matmul, f32_mode=f32_mode,
                              exact_first_sin=exact_first_sin)


def _flatten_params(params: Params, cfg: SirenSnakeTanhConfig,
                    out_lane_pad: int = 128,
                    rff: bool = False) -> list[jax.Array]:
    """Layer dicts -> flat [w, b(1,f), (a(1,f))?...] list with the final
    layer's output lane padded to ``out_lane_pad``.  With ``rff`` the first
    layer's (2F, h) weight is left whole (the kernel splits its cos/sin row
    halves); otherwise it is padded to the small-input width."""
    flat: list[jax.Array] = []
    kinds = cfg.layer_kinds
    for li, (kind, p) in enumerate(zip(kinds, params["layers"])):
        w, b = p["w"], p["b"]
        if li == 0 and not rff:
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


def _prep_rff_bt(rff_b: jax.Array) -> jax.Array:
    """(F, d) Gaussian projection -> 2*pi-scaled B^T padded to the kernel's
    small-input width: (in_pad, F).  Folding 2*pi here keeps the in-kernel
    encoding a bare multiply-add chain."""
    f, d = rff_b.shape
    if d > _MAX_SMALL_IN:
        raise ValueError(f"RFF raw-input dim must be <= {_MAX_SMALL_IN}")
    bt = jnp.zeros((_MAX_SMALL_IN, f), dtype=jnp.float32)
    return bt.at[:d].set(2.0 * jnp.pi * rff_b.T.astype(jnp.float32))


def fused_siren_apply(params: Params, cfg: SirenSnakeTanhConfig,
                      coords: jax.Array, block_rows: int = 1024,
                      compute_dtype=jnp.float32,
                      interpret: bool = False,
                      approx_sin: bool = False,
                      rff_b: jax.Array | None = None,
                      sin_poly_degree: int = 11,
                      mixed_matmul: bool = False,
                      packed_out: bool = False,
                      f32_mode: str | None = None,
                      exact_first_sin: bool = False) -> jax.Array:
    """Fused full-stack forward: drop-in for siren_snake_tanh_apply.

    ``exact_first_sin=True`` (with ``approx_sin``) keeps LAYER 0's trig on
    the precise lowering while hidden layers use the polynomial — the
    high-omega mixed tier: at omega0 >= ~2000 the first layer's polynomial
    phase error floors every uniform approx tier at 43-49 dB while the
    hidden layers (omega=30) sit at the polynomial's own -63..-130 dB.

    ``approx_sin=True`` swaps jnp.sin/cos for the Cody-Waite + degree-11
    polynomial pair (error ~1e-6 abs): decode is transcendental-bound, so
    this trades ~-120 dB of activation noise for a large throughput gain.
    ``sin_poly_degree`` in {11, 9, 7} picks the polynomial (floors ~-130 /
    -95 / -63 dB) — decode-only lever for models fit well below the floor.
    ``mixed_matmul=True`` single-passes the NON-sine layers' matmuls in
    bf16 (their error is not omega-amplified); quality-gate per model.
    ``f32_mode`` overrides INRAUDIO_F32_PRECISION for this call's f32
    matmuls ('bf16x2' = 2-pass split: a decode-only midpoint tier — its
    activation-rounding error is benign in a single forward but compounds
    catastrophically in training, BASELINE.md r4 A/B).

    ``rff_b`` (F, d): fold the Gaussian Fourier encoding into the kernel —
    ``coords`` are then the RAW coordinates and ``cfg.in_features`` must be
    2F (drop-in for ``model.apply(params, rff_apply(rff_b, coords))``).

    ``packed_out=True`` (scalar-output models, block_rows % 1024 == 0):
    return the kernel's raw lane-packed ``(ceil(n/128)... , 128)`` block and
    let the caller reshape on the HOST — skips a device relayout copy that
    costs more than the kernel itself on the vmapped multi-INR decode.
    Reshape with ``out.reshape(-1)[:n]``.
    """
    if rff_b is None and cfg.in_features > _MAX_SMALL_IN:
        raise ValueError(
            f"fused kernel supports in_features <= {_MAX_SMALL_IN} "
            "(raw coordinates) — pass rff_b to fold an RFF encoding in")
    bt = None
    if rff_b is not None:
        if cfg.in_features != 2 * rff_b.shape[0]:
            raise ValueError(
                f"cfg.in_features ({cfg.in_features}) != 2*F "
                f"({2 * rff_b.shape[0]})")
        bt = _prep_rff_bt(rff_b)
    block_rows = _pick_block_rows(coords.shape[0], block_rows)
    if packed_out and block_rows % 1024:
        # packed output needs the compact (8, 128)-tile layout: round the
        # cost-model pick up to the nearest 1024-multiple
        block_rows = _round_up(max(block_rows, 1024), 1024)
    flat = _flatten_params(params, cfg, rff=rff_b is not None)
    name = "bfloat16" if compute_dtype == jnp.bfloat16 else "float32"
    if packed_out and cfg.out_features != 1:
        raise ValueError("packed_out requires a scalar-output model "
                         "(the compact kernel path)")
    return _fused_apply_jit(flat, coords, cfg, block_rows, name, interpret,
                            approx_sin, bt=bt,
                            sin_poly_degree=sin_poly_degree,
                            mixed_matmul=mixed_matmul, packed_out=packed_out,
                            f32_mode=f32_mode,
                            exact_first_sin=exact_first_sin)


# Decode-noise floors of each fused-decode configuration, measured against
# the exact-sin f32 apply on TRAINED production models (results_parity
# checkpoints, h=256; scripts/bench_decode.py tune256 for the random-param
# floors).  Trained-model floors are LOWER than random-param ones (trained
# activations are larger), so these are the binding numbers:
#   bf16 matmuls + deg-7 sin  : ~43 dB   (102 Msamples/s at h=256, 1M rows)
#   f32 bf16x2 + deg-7 + mixed: ~50 dB   ( 97 Msamples/s; r4 swap — equal
#       60.5 dB random floor and a no-worse TRAINED floor (43.8 vs
#       bf16x3's 42.9, bench_logs_r4/40_trained_floor.log) at 1.16x the
#       throughput of bf16x3+mixed (23_tune256_x2.log))
#   f32 + deg-9 polynomial    : ~90 dB
#   f32 + deg-11 polynomial   : ~120 dB  (the 124.9 dB headline decodes here)
#
# HIGH-PHASE REGIME (restamped r5, bench_logs_r5/20_l0exact_floor_full.log
# on the regenerated omega0=22000 h=256 checkpoint): the r4 "every approx
# tier floors at 43-49 dB" finding was largely an artifact of measuring
# against the then-buggy one-pass-bf16 exact baseline (DESIGN.md round-5
# rule 2).  Re-measured on the FIXED tree, what binds at omega0=22000 is
# the MATMUL precision, not sin range reduction: bf16 tiers still floor at
# ~43 (hidden-layer rounding is omega-amplified through the sine layers),
# but the bf16x3 deg-9/deg-11 tiers floor at 85.8/87.3 — and the fused
# EXACT-sin path also floors at 87.3 (two bf16x3 matmul orderings agreeing
# to ~-87 dB is the shared ceiling; exact sin buys nothing above deg-11).
# The exact_first_sin mixed tier (VERDICT r4 item 4's hypothesis) is
# measured UNNECESSARY: +0.6 dB over uniform deg-9, nothing over deg-11.
# Per-tier (moderate_floor, high_phase_floor, kwargs):
_DECODE_TIERS = (
    (43.0, 43.0, dict(approx_sin=True, sin_poly_degree=7,
                      compute_dtype="bfloat16")),
    (50.0, 46.0, dict(approx_sin=True, sin_poly_degree=7, mixed_matmul=True,
                      f32_mode="bf16x2")),
    (90.0, 85.0, dict(approx_sin=True, sin_poly_degree=9)),
    # the 124.5 dB headline decodes through deg-11 with NO measurable drop
    # (BENCH_r03: decode SNR == fit SNR to 0.01 dB), so its trained floor
    # is >= ~134 dB at moderate phases
    (134.0, 87.0, dict(approx_sin=True, sin_poly_degree=11)),
)

# Above this first-layer omega0 the high-phase floor column applies.
# Anchors: omega0=115 (headline) shows full table floors; omega0=500/1000
# hi-fi fits are now MEASURED (r5, bench_logs_r5/28+29_hifi_floor_*.log,
# the codec's 110 dB-class recipes trained to ~98 dB-exact): decoding
# through deg-11 reconstructs at 112.3 dB (omega500) / 123.3 dB
# (omega1000) — i.e. ABOVE the exact-apply score, because the params
# were trained under the fused forward and deg-11 matches those
# semantics — so the deg-11 floor is >=112/>=123 there (recon-bounded),
# deg-9 holds >=105 at omega500, and tier2 floors at ~60 (phase error).
# omega0=22000 measured per-tier above.  The crossover to the high-phase
# column lies between 1000 (deg-11 >=123) and 22000 (deg-11 87.3), so
# gate from 2000 up.
_HIGH_PHASE_OMEGA = 2000.0


def auto_decode_kwargs(fit_snr_db: float,
                       margin_db: float = 9.0,
                       first_omega_0: float | None = None) -> dict[str, Any]:
    """Quality-gated decode configuration for ``fused_siren_apply``.

    Picks the FASTEST fused-decode tier whose measured noise floor sits at
    least ``margin_db`` above the model's own fit SNR, so the decode adds
    <~0.5 dB of reconstruction loss.  The reference's production h=256
    default fits at 33.6 dB (BASELINE.md parity row) and lands on the bf16
    tier: 102 Msamples/s at h=256 — decode noise 10 dB under the model's
    own error.  High-fidelity multi-INR fits (fit SNR + margin above the
    deg-11 tier's 134 dB floor, i.e. >125 dB at the default margin) fall
    through to the
    exact-sin path.  ``compute_dtype`` is returned as a string for easy
    jit-static use; resolve with ``jnp.dtype`` if needed.

    ``first_omega_0``: when known, models in the high-phase regime
    (omega0 >= ``_HIGH_PHASE_OMEGA`` = 2000) use the measured high-phase
    floor column — at omega0=22000 the bf16 tiers floor near ~43 dB
    (omega-amplified matmul rounding) while the bf16x3 deg-9/11 tiers hold
    85.8/87.3 dB (r5 restamp, 20_l0exact_floor_full.log), so mid-fidelity
    high-omega fits ride the polynomial tiers instead of falling to
    exact-sin (which shares the same ~87 dB bf16x3-matmul ceiling there).
    The deg-11 table floor of 134 dB was measured at omega0~115; at
    omega0=500/1000 hi-fi fits measure >=112.3/>=123.3 dB recon-bounded
    (r5, bench_logs_r5/28+29_hifi_floor_*.log — the probe's ~98 dB-exact
    fits decode ABOVE their exact-apply score through deg-11 because
    training ran the fused forward), so the gate's crossover to the
    high-phase column sits between 1000 and 22000; it starts at 2000.
    """
    need = fit_snr_db + margin_db
    high_phase = (first_omega_0 is not None
                  and first_omega_0 >= _HIGH_PHASE_OMEGA)
    for floor, high_floor, kw in _DECODE_TIERS:
        if high_phase:
            floor = high_floor
        if need <= floor:
            kw = dict(kw)
            if kw.get("compute_dtype") == "bfloat16":
                kw["compute_dtype"] = jnp.bfloat16
            return kw
    return dict(approx_sin=False)
