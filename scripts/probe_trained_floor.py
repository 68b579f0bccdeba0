"""Trained-checkpoint decode-noise floors for the fused tiers at h=256.

The `_DECODE_TIERS` gate table (ops/pallas_siren.py) is calibrated on
TRAINED models — trained activations are larger than random-init ones, so
trained floors are lower and are the binding numbers.  This probe loads the
results_parity/ref_default_20k checkpoint (the reference's own production
recipe, run.py:30: h=256, omega0=22000, 20k steps) and measures, for each
candidate tier, (a) decode noise vs the exact-sin f32 apply on the model's
real 441k-coord decode grid and (b) throughput on the 1M-row anchor shape —
specifically to decide whether the r4 bf16x2 matmul mode (97 Msamples/s at a
60.5 dB random-param floor, bench_logs_r4/23_tune256_x2.log) can replace the
bf16x3+mixed tier (82 Ms/s) as the fidelity-neutral tier.

Usage: python scripts/probe_trained_floor.py [tag]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

from bench import measure_decode  # noqa: E402
from inraudio_tpu.models import SirenSnakeTanhConfig, build_model  # noqa: E402
from inraudio_tpu.ops.pallas_siren import fused_siren_apply  # noqa: E402
from inraudio_tpu.train.checkpoint import load_checkpoint  # noqa: E402
from inraudio_tpu.train.loop import TrainConfig, init_train_state  # noqa: E402

# (name, fused_siren_apply kwargs, block_rows) — tiers carrying the
# precise-sin lowering need smaller tiles: jnp.sin's scratch at
# (4096, 256) blew the 16 MB scoped-vmem budget (23.66M measured)
TIERS = (
    ("bf16+deg7 (tier1, 43dB)", dict(approx_sin=True, sin_poly_degree=7,
                                     compute_dtype=jnp.bfloat16), 4096),
    ("bf16x3+deg7+mixed (tier2)", dict(approx_sin=True, sin_poly_degree=7,
                                       mixed_matmul=True), 4096),
    ("bf16x2+deg7+mixed (cand)", dict(approx_sin=True, sin_poly_degree=7,
                                      mixed_matmul=True, f32_mode="bf16x2"),
     4096),
    ("bf16x2+deg9+mixed (cand)", dict(approx_sin=True, sin_poly_degree=9,
                                      mixed_matmul=True, f32_mode="bf16x2"),
     4096),
    ("bf16x3+deg9 (tier3, 90dB)", dict(approx_sin=True, sin_poly_degree=9),
     4096),
    ("bf16x3+deg11 (tier4)", dict(approx_sin=True, sin_poly_degree=11),
     4096),
    # r5 high-omega mixed tiers: layer 0 on the precise sin, polynomial on
    # the hidden omega=30 layers
    ("L0exact+deg7+bf16 (r5)", dict(approx_sin=True, sin_poly_degree=7,
                                    compute_dtype=jnp.bfloat16,
                                    exact_first_sin=True), 2048),
    ("L0exact+deg7+x2+mixed (r5)", dict(approx_sin=True, sin_poly_degree=7,
                                        mixed_matmul=True, f32_mode="bf16x2",
                                        exact_first_sin=True), 2048),
    ("L0exact+deg9 (r5)", dict(approx_sin=True, sin_poly_degree=9,
                               exact_first_sin=True), 2048),
    ("exact-sin f32 (fused)", dict(approx_sin=False), 2048),
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "ref_default_20k"
    folder = os.path.join("results_parity", tag)
    with open(os.path.join(folder, "parameters.json")) as f:
        rec = json.load(f)
    cfg = SirenSnakeTanhConfig(
        in_features=1, hidden_features=rec["hidden"],
        num_sine=rec["num_sine"], num_snake=rec["num_snake"],
        num_tanh=rec["num_tanh"], first_linear=rec["first_linear"],
        last_linear=rec["last_linear"], scaled_first=rec["scaled_first"],
        first_omega_0=rec["omega"], hidden_omega_0=rec["hidden_omega"],
        a_initial=rec["a_initial"])
    model = build_model("mlp", cfg)  # exact-sin f32 apply
    template = init_train_state(model, jax.random.PRNGKey(0), TrainConfig())
    state = load_checkpoint(os.path.join(folder, "saved_ckpt.npz"), template)
    params = state.best_params
    print(f"[{tag}] fit SNR {rec['SNR']:.2f} dB, h={rec['hidden']}, "
          f"omega0={rec['omega']}", flush=True)

    # (a) trained floor on the model's real decode grid (method='wave':
    # get_coord scale=1.0, data/fittings.py:82)
    n_fit = int(rec["duration"] * 44100 / rec["decimation"])
    grid = jnp.linspace(-1.0, 1.0, n_fit).reshape(-1, 1)
    exact = np.asarray(jax.jit(lambda p, c: model.apply(p, c))(params, grid))
    sig = float(np.sum(exact ** 2))
    # (b) throughput anchor: 1M rows (the BASELINE.md decode-row shape)
    coords1m = jnp.linspace(-1.0, 1.0, 1_000_000).reshape(-1, 1)
    for name, kw, block in TIERS:
        fn = jax.jit(lambda p, c, k=dict(kw), b=block: fused_siren_apply(
            p, cfg, c, block_rows=b, **k))
        out = np.asarray(fn(params, grid))
        floor = 10 * np.log10(sig / max(float(np.sum((out - exact) ** 2)),
                                        1e-30))
        msps = measure_decode(fn, (params, coords1m), 1_000_000)
        drop = 10 * np.log10(1 + 10 ** ((rec["SNR"] - floor) / 10))
        print(f"{name:28s} trained-floor {floor:6.1f} dB  "
              f"recon-drop {drop:5.3f} dB  {msps:6.1f} Msamples/s",
              flush=True)


if __name__ == "__main__":
    main()
