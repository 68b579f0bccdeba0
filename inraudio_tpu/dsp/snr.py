"""Signal-to-noise ratio — the framework's headline quality metric.

Matches reference utils.py:77-97: SNR(dB) = 10*log10(mean(orig^2) /
mean((noisy-orig)^2)).  Works on jnp or np arrays; pure function, jittable.
"""

from __future__ import annotations

import jax.numpy as jnp


def calculate_snr(original_signal, noisy_signal) -> jnp.ndarray:
    original_signal = jnp.asarray(original_signal)
    noisy_signal = jnp.asarray(noisy_signal)
    noise = noisy_signal - original_signal
    signal_power = jnp.mean(jnp.square(original_signal))
    noise_power = jnp.mean(jnp.square(noise))
    return 10.0 * jnp.log10(signal_power / noise_power)
