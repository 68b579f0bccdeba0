"""Trainable activations: Snake (Ziyin et al. 2020).

Reference models.py:185-241 — ``x + (1/a) sin^2(a x)`` with a per-feature
trainable frequency ``a``.  The reference's ``self.a.requiresGrad`` typo
(models.py:233) is a no-op; ``a`` trains regardless, and it trains here too.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def snake_init(key: jax.Array, features: int,
               a_initial: float | None = None) -> jax.Array:
    """Per-feature ``a``: constant when ``a_initial`` is given (the runner
    uses 0.5, run.py:30), else Exponential(0.1) random init — "a mix of
    frequencies" (models.py:227-231)."""
    if a_initial is not None:
        return jnp.full((features,), float(a_initial), dtype=jnp.float32)
    return jax.random.exponential(key, (features,), dtype=jnp.float32) * 0.1


def snake_apply(a: jax.Array, x: jax.Array) -> jax.Array:
    """``x + (1/a) sin^2(a x)`` (models.py:235-241).

    Evaluated via the double-angle identity ``sin^2(t) = (1 - cos(2t))/2`` —
    one transcendental instead of two on the VPU.  The reference adds no
    epsilon to 1/a; with the runner's a=0.5 init this is safe, and parity
    keeps it that way.
    """
    x = x.astype(jnp.float32)
    return x + (0.5 / a) * (1.0 - jnp.cos(2.0 * a * x))


def sine_activation(x: jax.Array, omega: float = 30.0) -> jax.Array:
    """Fixed-frequency sine activation ``sin(omega * x)``.

    Parity with the reference's ``SineActivation`` (models.py:80-82 — a
    3-line module the reference defines but never calls; ported for a
    complete symbol inventory).  The production sine layers
    (models/siren.py SineLayer) fold omega into their init scaling instead;
    use this only as a drop-in functional activation.
    """
    return jnp.sin(omega * x.astype(jnp.float32))
