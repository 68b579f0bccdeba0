"""Input encodings: Gaussian random Fourier features and NeRF positional
encoding.

TPU-native re-design of the reference's two coordinate encodings:

- The reference applies ``rff.layers.GaussianEncoding(sigma=10, input_size=1,
  encoded_size=num_freq)`` to coords *outside* the model (run.py:22,141-144;
  run_experimental.py:83-86), producing ``2*num_freq`` features.  Here the
  projection matrix B ~ N(0, sigma^2) is sampled once at init and the encoding
  is a pure function — one (n, d) @ (d, num_freq) matmul plus cos/sin on the
  VPU, fully fusable by XLA.
- ``PosEncodingNeRF`` (models.py:14-59): per-axis [sin(s^i pi c), cos(s^i pi c)]
  with the frequency count optionally auto-derived from Nyquist
  (``get_num_frequencies_nyquist``, models.py:43-45).  The reference never
  wires it up live (models.py:320-341 is commented out); here it is a
  first-class encoding.

Encodings are applied in float32: the arguments to sin/cos reach
``2 pi sigma |c|`` (~60 for sigma=10) and ``2^(L-1) pi`` — far beyond bf16's
ulp at that magnitude (SURVEY.md section 7, numerics).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Gaussian random Fourier features
# ---------------------------------------------------------------------------

def rff_init(key: jax.Array, input_size: int, encoded_size: int,
             sigma: float = 10.0) -> jax.Array:
    """Sample the fixed projection B ~ N(0, sigma^2), shape (encoded_size, d).

    Matches rff.layers.GaussianEncoding's ``sample_b(sigma, (encoded_size,
    input_size))`` (the reference constructs it at run.py:141 with sigma=10).
    B is *not* trained — it is part of the model pytree but held constant via
    ``jax.lax.stop_gradient`` in :func:`rff_apply`.
    """
    return sigma * jax.random.normal(key, (encoded_size, input_size),
                                     dtype=jnp.float32)


def rff_apply(b: jax.Array, coords: jax.Array) -> jax.Array:
    """``[cos(2 pi v B^T), sin(2 pi v B^T)]`` — (n, d) -> (n, 2*encoded_size).

    Same layout as rff's ``gaussian_encoding`` (cos first, then sin), so a
    model trained here has feature-for-feature the reference's input space.
    """
    b = jax.lax.stop_gradient(b)
    vp = 2.0 * jnp.pi * coords.astype(jnp.float32) @ b.T
    return jnp.concatenate([jnp.cos(vp), jnp.sin(vp)], axis=-1)


def rff_output_dim(encoded_size: int) -> int:
    return 2 * encoded_size


# ---------------------------------------------------------------------------
# NeRF positional encoding
# ---------------------------------------------------------------------------

def num_frequencies_nyquist(num_samples: int) -> int:
    """Frequency count from the Nyquist rate of the sample grid
    (reference ``get_num_frequencies_nyquist``, models.py:43-45):
    ``floor(log2(nyquist)) = floor(log2(samples/2))`` expressed via the
    reference's ``int(log2(0.5 * samples))`` formula."""
    nyquist_rate = num_samples / 2.0
    return int(math.floor(math.log(nyquist_rate, 2)))


def posenc_nerf(coords: jax.Array, num_frequencies: int,
                include_input: bool = True) -> jax.Array:
    """Per-axis ``[sin(2^i pi c), cos(2^i pi c)]`` for i in [0, L).

    (n, d) -> (n, d + 2*d*L) with the input prepended, matching the
    reference's ``out_dim = in + 2*in*num_frequencies`` (models.py:41) and its
    interleaved per-frequency [sin, cos] stacking (models.py:47-57).
    """
    c = coords.astype(jnp.float32)
    feats = [c] if include_input else []
    for i in range(num_frequencies):
        w = (2.0 ** i) * jnp.pi
        feats.append(jnp.sin(w * c))
        feats.append(jnp.cos(w * c))
    return jnp.concatenate(feats, axis=-1)


def posenc_output_dim(in_features: int, num_frequencies: int,
                      include_input: bool = True) -> int:
    return (in_features if include_input else 0) + 2 * in_features * num_frequencies
