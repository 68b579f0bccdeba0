"""KAN-on-audio with/without the whole-network data-adaptive grid update.

Measures whether the reference's ``update_grid`` semantics (kan.py:274-279,
now wired as ``TrainConfig.update_grid_every`` -> ``kan_update_grid``) lift
the BASELINE.md "KAN fits real audio" row (27.5 dB after 1200 steps,
arch='kan', num_freq=256, sigma=1500, KAN(512,128,128,1), fused).

Usage: python scripts/bench_kan_update_grid.py [steps] [every ...]
       (defaults: 1200 steps; every in {0, 300})
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

from inraudio_tpu.data import waveform_fitting  # noqa: E402
from inraudio_tpu.dsp import calculate_snr  # noqa: E402
from inraudio_tpu.models import (KANConfig, build_model, rff_apply,  # noqa: E402
                                 rff_init)
from inraudio_tpu.train import TrainConfig, fit  # noqa: E402


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
    everies = [int(a) for a in sys.argv[2:]] or [0, 300]

    prob = waveform_fitting("/root/reference/gt_bach.wav", duration=7)
    b = rff_init(jax.random.PRNGKey(7), 1, 256, sigma=1500.0)
    enc = np.asarray(rff_apply(b, jnp.asarray(prob.coords)))
    model = build_model("kan", KANConfig(layers_hidden=(512, 128, 128, 1)),
                        fused=True)
    print(f"rows={enc.shape[0]} features={enc.shape[1]}", flush=True)

    for every in everies:
        cfg = TrainConfig(total_steps=steps, scan_chunk=100,
                          update_grid_every=every)
        t0 = time.time()
        res = fit(model, enc, prob.targets, cfg, key=jax.random.PRNGKey(0))
        out = np.asarray(jax.jit(model.apply)(res.params, jnp.asarray(enc)))
        snr = float(calculate_snr(prob.targets.reshape(-1), out.reshape(-1)))
        print(f"update_grid_every={every}: SNR {snr:.2f} dB in "
              f"{time.time() - t0:.0f}s ({res.steps_per_sec:.2f} steps/s)",
              flush=True)


if __name__ == "__main__":
    main()
