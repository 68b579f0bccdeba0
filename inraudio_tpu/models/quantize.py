"""Post-fit model quantization — the INR *is* the codec's bitstream, so
halving parameter bytes halves the compressed size.

The reference drafts exactly this (``model_fp16 = model.half()`` commented
out at run.py:236-239) but never ships it.  Here it is a first-class
capability with three codecs:

- ``float16`` / ``bfloat16``: straight dtype cast (2 bytes/param).  On TPU
  bf16 is also the natural MXU input type, so a bf16-quantized model decodes
  at full fused-kernel speed with no dequantize pass.
- ``int8``: symmetric per-tensor affine quantization (1 byte/param + one
  float32 scale per leaf), dequantized leaf-wise at load.
- ``int4``: symmetric 15-level quantization packed two nibbles per byte
  (0.5 bytes/param) — the codec's deepest rate-distortion point.

``quantize_params`` returns a params pytree of the SAME structure (leaves
stored quantized), ``dequantize_params`` restores float32 for ``apply``;
size accounting uses ``models.param_bytes`` (run.py:241-247 semantics).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = Any


def _peak_scale(l, per_leading_axis: bool, levels: float,
                per_row: bool = False, per_last_axis: bool = False):
    if per_last_axis and l.ndim >= 2:
        # one scale per trailing-axis column: the grain for MODULATION
        # matrices (chunks, mod_dim), where each mod FEATURE has coherent
        # statistics across chunks (probe: +3 dB over per-chunk rows on
        # the same int8 fit, scripts/probe_mod_quant.py)
        axes = tuple(range(l.ndim - 1))
        peak = jnp.max(jnp.abs(l), axis=axes, keepdims=True)
    elif per_row and l.ndim >= 3:
        # one scale per (leading slice, output unit): reduce the middle
        # (input) axes only — the weight column feeding one unit is the
        # natural coherence group of an MLP, and its peak is far tighter
        # than the whole matrix's (the int4 rate-distortion lever)
        axes = tuple(range(1, l.ndim - 1))
        peak = jnp.max(jnp.abs(l), axis=axes, keepdims=True)
    elif per_leading_axis and l.ndim >= 2:
        axes = tuple(range(1, l.ndim))
        peak = jnp.max(jnp.abs(l), axis=axes, keepdims=True)
    else:
        peak = jnp.max(jnp.abs(l))
    return jnp.maximum(peak, 1e-12) / levels


def quantize_params(params: Params, mode: str = "float16",
                    per_leading_axis: bool = False,
                    per_row: bool = False,
                    per_last_axis: bool = False) -> Params:
    """Quantize every leaf. mode in {'float16','bfloat16','int8','int16',
    'int4'}.

    int8/int16 leaves become dicts ``{'q': int array, 'scale': float32}``
    (symmetric, zero-point-free — INR weights are zero-centred by SIREN
    init, models.py:105-112, so an asymmetric zero point buys nothing).
    int16 spends fp16's 2 bytes/value as 16 UNIFORM bits instead of a
    10-bit mantissa — on modulation matrices it reconstructs well above
    the fp16 tier at identical size (scripts/probe_mod_quant.py).
    int4 leaves become ``{'q4': packed uint8 nibbles, 'scale', 'shape'}``
    (15 symmetric levels, two params per byte).

    ``per_leading_axis=True`` gives each slice along axis 0 its own
    int8/int4 scale — REQUIRED for chunk-stacked multi-INR parameters,
    where per-chunk weight magnitudes differ enough that one tensor-wide
    scale destroys the reconstruction (measured: -1 dB vs >20 dB on the
    same fit).

    ``per_row=True`` (int modes, rank >= 3 leaves) refines that to one
    scale per (chunk, output unit) — k*h extra float32 scales against a
    much tighter quantization grid; the deep-compression (int4) points
    need it to stay audible.  ``per_last_axis=True`` instead gives each
    trailing-axis column its own scale (the modulation-matrix grain).
    Dequantize is shape-driven, so payloads mix granularities freely.
    """
    if mode in ("float16", "bfloat16"):
        dt = jnp.float16 if mode == "float16" else jnp.bfloat16
        return jax.tree.map(lambda l: jnp.asarray(l, dt), params)
    if mode in ("int8", "int16"):
        levels = 127.0 if mode == "int8" else 32767.0
        dt = jnp.int8 if mode == "int8" else jnp.int16

        def q(l):
            l = jnp.asarray(l, jnp.float32)
            scale = _peak_scale(l, per_leading_axis, levels, per_row,
                                per_last_axis)
            return {"q": jnp.clip(jnp.round(l / scale), -levels, levels)
                    .astype(dt),
                    "scale": jnp.asarray(scale, jnp.float32)}
        return jax.tree.map(q, params)
    if mode == "int4":
        def q4(l):
            l = jnp.asarray(l, jnp.float32)
            scale = _peak_scale(l, per_leading_axis, 7.0, per_row)
            qv = jnp.clip(jnp.round(l / scale), -7.0, 7.0) + 8.0
            flat = qv.astype(jnp.uint8).reshape(-1)
            if flat.shape[0] % 2:
                # pad nibble encodes 0 (offset 8)
                flat = jnp.concatenate(
                    [flat, jnp.full((1,), 8, jnp.uint8)])
            packed = ((flat[0::2] << 4) | flat[1::2]).astype(jnp.uint8)
            return {"q4": packed,
                    "scale": jnp.asarray(scale, jnp.float32),
                    "shape": np.asarray(l.shape, np.int32)}
        return jax.tree.map(q4, params)
    raise ValueError(f"unknown quantization mode {mode!r}")


def _is_quantized_leaf(x):
    return isinstance(x, dict) and set(x) in ({"q", "scale"},
                                              {"q4", "scale", "shape"})


def dequantize_params(qparams: Params) -> Params:
    """Inverse of ``quantize_params`` -> float32 leaves for ``apply``."""
    def dq(x):
        if _is_quantized_leaf(x) and "q4" in x:
            shape = tuple(int(s) for s in np.asarray(x["shape"]))
            n = int(np.prod(shape))
            packed = jnp.asarray(x["q4"], jnp.uint8)
            hi = (packed >> 4).astype(jnp.int32)
            lo = (packed & 0xF).astype(jnp.int32)
            flat = jnp.stack([hi, lo], axis=1).reshape(-1)[:n]
            vals = (flat - 8).astype(jnp.float32).reshape(shape)
            return vals * jnp.asarray(x["scale"], jnp.float32)
        if _is_quantized_leaf(x):
            return jnp.asarray(x["q"], jnp.float32) * x["scale"]
        return jnp.asarray(x, jnp.float32)

    return jax.tree.map(dq, qparams, is_leaf=_is_quantized_leaf)
