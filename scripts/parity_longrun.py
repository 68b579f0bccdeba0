"""Long-run parity evidence: the reference's own workload run to completion.

The reference's primary experiment (run.py:30,426,466) is ONE
SirenWithSnakeTanh fit full-batch for 20,000 Adam steps with
ReduceLROnPlateau — no multi-INR, no budget cap.  This script runs that
exact shape on the TPU through the product path
(`inraudio_tpu.experiments.runner.train`) and records final SNR +
wall-clock, so BASELINE.md can carry a "reference workload, run to
completion" row instead of only 30 s-budget numbers.

Phases (each writes results_parity/<tag>/parameters.json):
  1. ref_default_20k  — the reference's untouched defaults (omega0=22000,
     h=256, lr 1e-3, 20k steps) on gt_bach.wav.
  2. tuned_20k        — the BASELINE.md best full-batch recipe
     (omega0=3000, lr 3e-4) for the same 20k steps.

Usage:  python -u scripts/parity_longrun.py [out_dir]
"""

from __future__ import annotations

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

from inraudio_tpu.experiments.runner import train  # noqa: E402

WAV = "/root/reference/gt_bach.wav"


def run(tag: str, out_dir: str, **kw) -> None:
    t0 = time.time()
    ckpt = train(out_dir, tag, filename=WAV, duration=10.0,
                 make_plots=False, fused=True, **kw)
    folder = os.path.dirname(ckpt)
    with open(os.path.join(folder, "parameters.json")) as f:
        rec = json.load(f)
    print(f"[{tag}] SNR={rec['SNR']:.2f} dB  "
          f"steps/s={rec.get('steps_per_sec', float('nan')):.1f}  "
          f"wall={time.time() - t0:.0f}s", flush=True)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "results_parity"
    os.makedirs(out_dir, exist_ok=True)
    # phase 1: the reference's exact default recipe (run.py:30)
    run("ref_default_20k", out_dir)
    # phase 2: the tuned full-batch recipe from the BASELINE.md scan
    run("tuned_20k", out_dir, omega=3000.0, learning_rate=3e-4)


if __name__ == "__main__":
    main()
