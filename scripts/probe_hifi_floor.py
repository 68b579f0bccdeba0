"""Trained decode-noise floors at the codec's HI-FI operating point.

ADVICE r4 #3: the 100.2/114.4 dB RD points (omega0=1000/500 chunk
recipes) relied on a >=~95 dB deg-11 floor EXTRAPOLATED from an 83.2 dB
fit at omega0=1000 (bench_logs_r4/73_gap3.log) — the floor above ~95 dB
fits was never measured at those omegas.  This probe trains the hi-fi
multi-INR population itself (0.05 s chunks, omega0=500, h=128 — the
codec's 110 dB-class recipe, BASELINE.md recipe scan) and measures each
fused tier's reconstruction against the exact XLA apply on the trained
params, i.e. the floors exactly where the codec's tier gate needs them.

Usage: python scripts/probe_hifi_floor.py [steps=6000] [omega=500]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

from inraudio_tpu.data import get_coord, read_wav  # noqa: E402
from inraudio_tpu.models import SirenSnakeTanhConfig, build_model  # noqa: E402
from inraudio_tpu.ops.pallas_siren import fused_siren_apply_stacked  # noqa: E402
from inraudio_tpu.train import MultiINRConfig, TrainConfig  # noqa: E402
from inraudio_tpu.train.multi_inr import chunk_signal, multi_inr_fit  # noqa: E402

TIERS = (
    ("deg-11 (tier4)", dict(approx_sin=True, sin_poly_degree=11)),
    ("deg-9 (tier3)", dict(approx_sin=True, sin_poly_degree=9)),
    ("x2+deg7+mixed (tier2)", dict(approx_sin=True, sin_poly_degree=7,
                                   mixed_matmul=True, f32_mode="bf16x2")),
    ("exact-sin f32 (fused)", dict(approx_sin=False)),
)


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    omega = float(sys.argv[2]) if len(sys.argv) > 2 else 500.0
    _, sig = read_wav("/root/reference/gt_bach.wav", channel=0)
    sig = sig.astype(np.float32)
    cfg = SirenSnakeTanhConfig(hidden_features=128, first_omega_0=omega,
                               num_sine=2, num_snake=2)
    model = build_model("mlp", cfg, fused=True, approx_sin=True)
    mcfg = MultiINRConfig(chunk_seconds=0.05)
    t0 = time.time()
    res = multi_inr_fit(
        model, sig, 44100, mcfg,
        TrainConfig(total_steps=steps, learning_rate=1e-3,
                    grad_clip_norm=1.0, plateau_patience=75))
    params = res.states.best_params
    n, k = res.chunk_length, res.num_chunks
    coords = np.asarray(get_coord(n, dim=1), np.float32)
    exact_model = build_model("mlp", cfg)  # exact XLA apply ('high' matmuls)
    oracle = np.asarray(jax.jit(jax.vmap(
        lambda p: exact_model.apply(p, coords)))(params))
    # fit SNR vs the actual chunk targets (tail zero-padded like the fit)
    tgt, _, _ = chunk_signal(sig, 44100, mcfg)
    scales = np.asarray(res.chunk_scales)
    fit = oracle[:, :, 0] * scales[:, None]
    p_sig = float(np.sum(tgt ** 2))
    fit_snr = 10 * np.log10(p_sig / max(float(np.sum((fit - tgt) ** 2)),
                                        1e-30))
    print(f"[hifi 0.05s/omega{omega:.0f}/h128 {steps} steps] "
          f"fit SNR {fit_snr:.2f} dB  ({time.time() - t0:.0f}s, "
          f"{k} chunks)", flush=True)
    p_or = float(np.sum(oracle ** 2))
    for name, kw in TIERS:
        out = np.asarray(fused_siren_apply_stacked(params, cfg,
                                                   coords, **kw))
        floor = 10 * np.log10(p_or / max(
            float(np.sum((out - oracle) ** 2)), 1e-30))
        # the operational number: reconstruction SNR vs the target when
        # decoding THROUGH this tier (at hi-fi fits the floor-vs-oracle
        # statistic saturates on the oracle's own bf16x3 rounding)
        rec = out[:, :, 0] * scales[:, None]
        rsnr = 10 * np.log10(p_sig / max(
            float(np.sum((rec - tgt) ** 2)), 1e-30))
        print(f"{name:24s} floor-vs-exact {floor:7.1f} dB   "
              f"recon-SNR {rsnr:7.2f} dB (exact {fit_snr:.2f})",
              flush=True)


if __name__ == "__main__":
    main()
