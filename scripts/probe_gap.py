"""Bisect the bench-vs-codec 20 dB gap at the hi-fi recipe.

bench.py at 0.1 s / omega 1000 / lr 1e-3 / patience 50 reaches 78.3 dB in
5400 steps (bench_logs_r4/60_scanrow_01_1000.log) while ``encode`` with
the same knobs caps at ~58.5 at 8000 steps AT EVERY PRECISION
(70_hifi_restamp.log) — so the gap is in the training/decode setup, not
the kernels.  This runs the two paths side by side in one process with
identical TrainConfig and reports the stitched SNR of each, decoded both
ways (multi_inr_decode vs codec decode).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np  # noqa: E402

from inraudio_tpu.codec import CodecConfig, decode, encode  # noqa: E402
from inraudio_tpu.data import read_wav  # noqa: E402
from inraudio_tpu.dsp import calculate_snr  # noqa: E402
from inraudio_tpu.models import SirenSnakeTanhConfig, build_model  # noqa: E402
from inraudio_tpu.train import (MultiINRConfig, TrainConfig,  # noqa: E402
                                multi_inr_decode, multi_inr_fit)

WAV = "/root/reference/gt_bach.wav"
STEPS = 5400


def main() -> None:
    fs, sig = read_wav(WAV, channel=0)
    sig = sig.astype(np.float32)

    mcfg = MultiINRConfig(chunk_seconds=0.1, overlap_fraction=0.1)
    model_cfg = SirenSnakeTanhConfig(first_omega_0=1000.0,
                                     hidden_features=128,
                                     num_sine=2, num_snake=2)
    tc = TrainConfig(total_steps=STEPS, scan_chunk=200,
                     learning_rate=1e-3, grad_clip_norm=1.0,
                     plateau_patience=50, plateau_factor=0.8)
    model = build_model("mlp", model_cfg, fused=True, approx_sin=True)

    t0 = time.time()
    res = multi_inr_fit(model, sig, fs, mcfg, tc,
                        key=jax.random.PRNGKey(0))
    rec_lib = multi_inr_decode(model, res, track_best=True)
    m = min(len(rec_lib), len(sig))
    snr_lib = float(calculate_snr(sig[:m], rec_lib[:m]))
    print(json.dumps({"path": "multi_inr_fit+multi_inr_decode",
                      "snr_db": round(snr_lib, 2),
                      "wall_s": round(time.time() - t0, 1)}), flush=True)

    t0 = time.time()
    cfg = CodecConfig(chunk_seconds=0.1, hidden_features=128,
                      first_omega_0=1000.0, learning_rate=1e-3,
                      plateau_patience=50, total_steps=STEPS,
                      quantize=None, fused=True)
    payload = encode(sig, fs, cfg)
    _, rec_cod = decode(payload)
    snr_cod = float(calculate_snr(sig, rec_cod))
    print(json.dumps({"path": "encode+decode",
                      "snr_db": round(snr_cod, 2),
                      "wall_s": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
