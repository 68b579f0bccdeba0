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

``quantize_params`` returns a params pytree of the SAME structure (leaves
stored quantized), ``dequantize_params`` restores float32 for ``apply``;
size accounting uses ``models.param_bytes`` (run.py:241-247 semantics).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Params = Any


def quantize_params(params: Params, mode: str = "float16",
                    per_leading_axis: bool = False) -> Params:
    """Quantize every leaf. mode in {'float16', 'bfloat16', 'int8'}.

    int8 leaves become dicts ``{'q': int8 array, 'scale': float32}``
    (symmetric, zero-point-free — INR weights are zero-centred by SIREN
    init, models.py:105-112, so an asymmetric zero point buys nothing).

    ``per_leading_axis=True`` gives each slice along axis 0 its own int8
    scale — REQUIRED for chunk-stacked multi-INR parameters, where per-chunk
    weight magnitudes differ enough that one tensor-wide scale destroys the
    reconstruction (measured: -1 dB vs >20 dB on the same fit).
    """
    if mode in ("float16", "bfloat16"):
        dt = jnp.float16 if mode == "float16" else jnp.bfloat16
        return jax.tree.map(lambda l: jnp.asarray(l, dt), params)
    if mode == "int8":
        def q(l):
            l = jnp.asarray(l, jnp.float32)
            if per_leading_axis and l.ndim >= 2:
                axes = tuple(range(1, l.ndim))
                peak = jnp.max(jnp.abs(l), axis=axes, keepdims=True)
            else:
                peak = jnp.max(jnp.abs(l))
            scale = jnp.maximum(peak, 1e-12) / 127.0
            return {"q": jnp.clip(jnp.round(l / scale), -127, 127)
                    .astype(jnp.int8),
                    "scale": jnp.asarray(scale, jnp.float32)}
        return jax.tree.map(q, params)
    raise ValueError(f"unknown quantization mode {mode!r}")


def dequantize_params(qparams: Params) -> Params:
    """Inverse of ``quantize_params`` -> float32 leaves for ``apply``."""
    def is_q(x):
        return isinstance(x, dict) and set(x) == {"q", "scale"}

    def dq(x):
        if is_q(x):
            return jnp.asarray(x["q"], jnp.float32) * x["scale"]
        return jnp.asarray(x, jnp.float32)

    return jax.tree.map(dq, qparams, is_leaf=is_q)
