"""Measure KAN training steps/s: XLA backward vs fused Pallas backward.

Full-batch value_and_grad on gt_bach.wav coordinates (308,207 rows), the
BASELINE.md "KAN train steps/s" row.  Usage: python scripts/bench_kan_train.py
[hidden...] (default 128 256).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

from inraudio_tpu.data import waveform_fitting
from inraudio_tpu.models import KANConfig, build_model

STEPS = 20


def measure(model, coords, targets):
    params = model.init(jax.random.PRNGKey(0))

    @jax.jit
    def step(p):
        def loss(p):
            return jnp.mean((model.apply(p, coords) - targets) ** 2)
        l, g = jax.value_and_grad(loss)(p)
        return jax.tree.map(lambda a, b: a - 1e-3 * b, p, g), l

    params, l = step(params)
    jax.block_until_ready(l)
    t0 = time.time()
    for _ in range(STEPS):
        params, l = step(params)
    # real device->host fetch anchors timing on the tunneled axon backend
    float(l)
    dt = time.time() - t0
    return STEPS / dt, float(l)


def main():
    hiddens = [int(a) for a in sys.argv[1:]] or [128, 256]
    prob = waveform_fitting("/root/reference/gt_bach.wav", duration=7)
    coords = np.asarray(prob.coords, np.float32)   # host consts: device
    targets = np.asarray(prob.targets, np.float32)  # captures fetch at lowering
    print(f"rows={coords.shape[0]}")
    for h in hiddens:
        cfg = KANConfig(layers_hidden=(1, h, h, 1))
        for fused in (False, True):
            try:
                model = build_model("kan", cfg, fused=fused)
                sps, l = measure(model, coords, targets)
                print(f"h={h} fused={fused}: {sps:.1f} steps/s "
                      f"(loss {l:.3e})")
            except Exception as e:  # noqa: BLE001 — report OOM et al.
                print(f"h={h} fused={fused}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
