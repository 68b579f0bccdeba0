"""Headline benchmark: SNR reached on gt_bach.wav within a 30 s wall-clock
training budget on the available TPU chip(s).

Prints ONE JSON line:
  {"metric": "snr_db_at_30s_gt_bach", "value": <dB>, "unit": "dB",
   "vs_baseline": <dB / 40>}

The baseline is the north-star target from BASELINE.json — >= 40 dB SNR on
gt_bach.wav within 30 s (the reference publishes no numbers of its own; its
default workload is 20k full-batch Adam steps on a single GPU, run.py:30).
vs_baseline >= 1.0 means the target is met or beaten.

Default recipe (BENCH_MODE=multi): the framework's chunk-parallel multi-INR
path — the clip splits into 512-sample windows (one fused-kernel tile
each), one SirenWithSnakeTanh (h=128, omega0=115) per window, ALL windows
trained simultaneously as one vmapped jitted scan with global-norm grad
clipping (chunk axis = batch axis on the MXU; shards across chips on a
multi-chip mesh), fused Pallas kernels, decoded with crossfade
overlap-add.  Reaches ~124.9 dB on one v5e chip vs 0 dB for the
reference's single full-batch model at omega0=22000 (which is frozen at
signal power for its first thousands of steps).  BENCH_MODE=full runs
that reference-style full-batch fit instead; see BASELINE.md for the
recipe-scan history.

Secondary numbers (steps/sec, decode Msamples/sec) go to stderr for
BASELINE.md.
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

# BENCH_PLATFORM=cpu: CPU smoke-testing of the bench wiring (the image's
# sitecustomize presets the axon TPU platform before env vars can act;
# backends initialise lazily so the runtime switch still works — same
# mechanism as tests/conftest.py)
if os.environ.get("BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

# persistent compile cache: XLA compiles of the vmapped scan take ~10 min on
# a 1-core host; cached reruns start in seconds
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("BENCH_COMPILE_CACHE",
                   os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".jax_cache")))

from inraudio_tpu.data import read_wav, waveform_fitting  # noqa: E402
from inraudio_tpu.data.coords import get_coord  # noqa: E402
from inraudio_tpu.dsp import calculate_snr  # noqa: E402
from inraudio_tpu.models import SirenSnakeTanhConfig, build_model  # noqa: E402
from inraudio_tpu.parallel import (make_mesh, replicated_sharding,  # noqa: E402
                                   shard_problem_arrays)
from inraudio_tpu.train import (MultiINRConfig, TrainConfig,  # noqa: E402
                                init_train_state, make_train_step)
from inraudio_tpu.train.multi_inr import (MultiINRResult,  # noqa: E402
                                          chunk_eval_fn, chunk_signal,
                                          multi_inr_decode)
from inraudio_tpu.utils.observability import MetricsLogger  # noqa: E402

WAV = os.environ.get("BENCH_WAV", "/root/reference/gt_bach.wav")
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "30"))
TARGET_DB = 40.0
MODE = os.environ.get("BENCH_MODE", "multi")
# BENCH_INTERPRET=1 runs the Pallas kernels in the interpreter (CPU-only
# smoke tests of the fused wiring; never set on a real bench run)
_INTERPRET = os.environ.get("BENCH_INTERPRET", "0") == "1"
ROUND_STEPS = int(os.environ.get("BENCH_CHUNK_STEPS", "200"))
MAX_STEPS = int(os.environ.get("BENCH_MAX_STEPS", "200000"))
# per-round JSONL metric stream (same MetricsLogger the runner uses) —
# created lazily so `from bench import measure_decode` (scripts/) does not
# open the file as an import side effect
_METRICS: MetricsLogger | None = None


def _metrics() -> MetricsLogger:
    global _METRICS
    if _METRICS is None:
        _METRICS = MetricsLogger(os.environ.get(
            "BENCH_METRICS",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_metrics.jsonl")))
    return _METRICS


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(value: float) -> None:
    print(json.dumps({
        "metric": "snr_db_at_30s_gt_bach",
        "value": round(float(value), 3),
        "unit": "dB",
        "vs_baseline": round(float(value) / TARGET_DB, 4),
    }), flush=True)


def peak_tflops() -> float:
    """MXU peak (dense matmul TFLOP/s) for the attached chip, for MFU.

    bf16 peak — the MXU computes bf16 multiplies with f32 accumulate, so
    this is the hardware ceiling per MXU pass.  The framework's default
    f32-accurate matmul (bf16x3, ops/pallas_siren.py) issues 3 MXU passes
    per logical f32 matmul, so hardware-pass utilization is ~3x the
    model-FLOPs MFU reported here.
    """
    env = os.environ.get("BENCH_PEAK_TFLOPS")
    if env:
        return float(env)
    kind = jax.devices()[0].device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 197.0
    if "v5p" in kind or "v5" in kind:
        return 459.0
    if "v4" in kind:
        return 275.0
    if "v6" in kind:
        return 918.0
    return 197.0  # unknown chip: assume v5e so MFU stays conservative


def fwd_flops_per_sample(params) -> int:
    """Forward-pass matmul FLOPs per coordinate: 2*in*out per weight."""
    return sum(2 * int(np.prod(leaf.shape))
               for leaf in jax.tree_util.tree_leaves(params)
               if getattr(leaf, "ndim", 0) == 2)


def log_mfu(tag: str, samples_per_sec: float, fwd_flops: int,
            training: bool) -> None:
    # training step ~= 3x forward FLOPs (fwd 2*P, bwd 4*P per sample)
    factor = 3.0 if training else 1.0
    tflops = samples_per_sec * fwd_flops * factor / 1e12
    peak = peak_tflops()
    log(f"  {tag}: {tflops:.2f} TFLOP/s model FLOPs = "
        f"{100.0 * tflops / peak:.2f}% MFU (peak {peak:.0f} bf16 TFLOP/s; "
        f"{fwd_flops / 1e3:.1f} kFLOP/sample fwd)")


def _fetch_anchor(out):
    """Force completion via a real device->host fetch: on the tunneled axon
    backend block_until_ready can return before remote execution finishes
    (same caveat as train/loop.py), so timings must be anchored by bytes
    actually arriving on the host."""
    np.asarray(out.reshape(-1)[-1:])


def measure_decode(decode_fn, args, samples_per_call: int, reps: int = 20,
                   trials: int = 3):
    """Best-of-``trials`` steady-state throughput over ``reps`` back-to-back
    dispatches (max over trials rejects scheduler noise, not work)."""
    out = decode_fn(*args)
    _fetch_anchor(out)
    best = 0.0
    for _ in range(trials):
        t = time.time()
        for _ in range(reps):
            out = decode_fn(*args)
        _fetch_anchor(out)
        best = max(best, samples_per_call * reps / (time.time() - t) / 1e6)
    return best


def bench_multi() -> float:
    """Chunk-parallel multi-INR fit of the whole clip under the budget."""
    fs, signal = read_wav(WAV, channel=0)
    signal = signal.astype(np.float32)
    log(f"fit target: {len(signal)} samples @ {fs} Hz, multi-INR")

    # chunk_seconds picked so the chunk length is EXACTLY 512 rows at
    # 44.1 kHz — one fused-kernel tile (the cost-model tile picker takes a
    # non-compact 512-row block over padding to 1024), zero row-padding
    # waste.  Shorter chunks are easier fitting problems (more chunks =
    # more total capacity, omega scales down with the window), worth
    # several dB: 0.05 s/2205 rows -> 108.9, 2048 rows -> 110.5,
    # 1024 rows -> 114.9, **512 rows -> 115.6** dB at the same budget;
    # 256-row chunks reach 116.1 but drop stitched decode to
    # 94 Msamples/s (< the 100 north star).  BASELINE.md has the scan.
    mc = MultiINRConfig(
        chunk_seconds=float(os.environ.get("BENCH_CHUNK_S", "0.01161")),
        overlap_fraction=float(os.environ.get("BENCH_OVERLAP", "0.1")))
    model_cfg = SirenSnakeTanhConfig(
        first_omega_0=float(os.environ.get("BENCH_OMEGA", "115")),
        hidden_features=int(os.environ.get("BENCH_HIDDEN", "128")),
        num_sine=int(os.environ.get("BENCH_NUM_SINE", "2")),
        num_snake=int(os.environ.get("BENCH_NUM_SNAKE", "2")))
    # fused Pallas kernel + polynomial sin: ~3x steps/sec and decode vs the
    # XLA path (BASELINE.md); BENCH_FUSED=0 falls back to plain XLA
    fused = os.environ.get("BENCH_FUSED", "1") == "1"
    approx = os.environ.get("BENCH_APPROX_SIN", "1") == "1" and fused
    model = build_model("mlp", model_cfg, fused=fused, approx_sin=approx,
                        interpret=_INTERPRET)
    tc = TrainConfig(
        total_steps=MAX_STEPS, scan_chunk=ROUND_STEPS,
        learning_rate=float(os.environ.get("BENCH_LR", "1.5e-3")),
        # global-norm clip: individual chunks otherwise diverge at lrs the
        # rest of the population likes (BASELINE.md scan data)
        grad_clip_norm=float(os.environ.get("BENCH_CLIP", "1.0")),
        # fast plateau decay: 512-row chunks saturate their lr-1e-3 descent
        # within ~50 steps of stalling, and an earlier decay lets every
        # chunk descend ~5 dB deeper inside the budget (r2 patience scan at
        # 89 steps/s: 200 -> 115.6 dB, 100 -> 120.6, **50 -> 121.3**,
        # 25 -> 111.6; factor 0.9 ties 0.8, 0.7 decays too hard).  r3: the
        # whole-step fused kernel runs 1.7x the steps in-budget, so the
        # best patience shrank with it (scan at 152 steps/s, lr 1.5e-3:
        # 25 -> 124.6, **35 -> 125.7**, 50 -> 125.6, 85 -> 124.5,
        # 120 -> 120.8)
        plateau_patience=int(os.environ.get("BENCH_PATIENCE", "35")),
        plateau_factor=float(os.environ.get("BENCH_PLATEAU_FACTOR", "0.8")))

    chunks, n, hop = chunk_signal(signal, fs, mc)
    k = chunks.shape[0]
    scales = np.maximum(np.max(np.abs(chunks), axis=1), 1e-9)
    targets = jnp.asarray((chunks / scales[:, None])[..., None])
    # coords stays a HOST numpy array: it is closed over into jit(run), and a
    # closed-over *device* array becomes an MLIR constant whose value must be
    # fetched device->host at LOWERING time — on the axon tunnel that fetch
    # queues behind all pending device work and was the entire "218 s cold
    # compile" of round 2 (the real XLA compile is ~2 s).  A host constant
    # embeds instantly.
    coords = np.asarray(get_coord(n, dim=1), np.float32)
    log(f"{k} chunks x {n} samples, model h={model_cfg.hidden_features} "
        f"omega0={model_cfg.first_omega_0}")

    # whole-step fused kernel: fwd+bwd+clip+Adam in ONE Pallas call per
    # chunk (loop.fused_step_plan; INRAUDIO_FUSED_STEP=0 for the A/B)
    from inraudio_tpu.train.loop import (fused_step_plan,
                                         make_vmapped_fused_step)
    block = fused_step_plan(model, tc, n)
    if block is not None:
        # shared wiring (padding + flat-state contract): train/loop.py
        vstep, to_flat, _from_flat, best_unflatten, pad_targets = \
            make_vmapped_fused_step(model, tc, coords, block)
        targets = jnp.asarray(pad_targets(targets, k))
        log(f"fused whole-step kernel: block_rows={block}")

        def init_states(seed):
            ks = jax.random.split(jax.random.PRNGKey(seed), k)
            sts = jax.vmap(lambda kk: init_train_state(model, kk, tc))(ks)
            return to_flat(sts)

        def best_pytree(states):
            return best_unflatten(states.best_params)
    else:
        train_step = make_train_step(model, tc)
        vstep = jax.vmap(lambda s, t: train_step(s, coords, t),
                         in_axes=(0, 0))

        def init_states(seed):
            ks = jax.random.split(jax.random.PRNGKey(seed), k)
            return jax.vmap(lambda kk: init_train_state(model, kk, tc))(ks)

        def best_pytree(states):
            return states.best_params

    states = init_states(0)

    def make_run(vs):
        def run(states, targets):
            def body(s, _):
                s, (loss, lr) = vs(s, targets)
                return s, loss
            return jax.lax.scan(body, states, None, length=ROUND_STEPS)
        return jax.jit(run, donate_argnums=(0,))

    run = make_run(vstep)

    # BENCH_SCHEDULE=1 (fused path only): quality-scheduled training
    # precision — start every round on a CHEAP numerically-bounded step
    # tier (bf16x2 fwd matmuls, 1-pass bf16 grads, deg-7 sin polynomial;
    # ~-63 dB activation floor) and permanently escalate to the full tier
    # (bf16x3/bf16x2/deg-11) once the round's mean chunk loss crosses the
    # tier's noise floor — the training-side mirror of the decode gate
    # (ops/pallas_siren.auto_decode_kwargs).  BENCH_SCHEDULE_DB sets the
    # handover fit-SNR (default 45: safely under the cheap tier's cap so
    # the escalation happens before its bias binds).
    schedule = os.environ.get("BENCH_SCHEDULE", "0") == "1" and block is not None
    use_cheap = schedule
    sched_thr = float("inf")
    run_cheap = None
    if schedule:
        from inraudio_tpu.train.loop import schedule_tiers
        cheap_tier, _full = schedule_tiers()
        vstep_cheap = make_vmapped_fused_step(model, tc, coords, block,
                                              tier=cheap_tier)[0]
        run_cheap = make_run(vstep_cheap)
        power = float(np.mean(np.asarray(targets) ** 2))
        sched_db = float(os.environ.get("BENCH_SCHEDULE_DB", "45"))
        sched_thr = power / 10.0 ** (sched_db / 10.0)
        log(f"precision schedule: cheap tier {cheap_tier} until mean loss "
            f"< {sched_thr:.3e} (~{sched_db:.0f} dB fit)")

    # optional per-round stitched-SNR tracking (adds one vmapped decode per
    # round, ~40 ms) — reports time-to-40dB, the BASELINE.md secondary metric
    track_snr = os.environ.get("BENCH_TRACK_SNR", "0") == "1"
    if track_snr:
        sig_d = np.asarray(signal, np.float32)   # host consts (see coords)
        scales_d = np.asarray(scales, np.float32)

        # rough stitch: ignore crossfade, take each chunk's first `hop`
        # samples — good to ~1 dB, enough for the time-to-40dB marker.
        # k*hop can be SHORTER than the signal (tail covered only by the
        # last chunk's overlap region), so compare over the covered prefix.
        m = min(k * hop, len(signal))

        @jax.jit
        def quick_snr(states):
            outs = jax.vmap(lambda p: model.apply(p, coords))(
                best_pytree(states))[:, :, 0] * scales_d[:, None]
            flat = outs[:, :hop].reshape(-1)[:m]
            return calculate_snr(sig_d[:m], flat)

    # compile outside the budget (first TPU compile is slow), then
    # RE-INITIALIZE the states so the measured 30 s contains every
    # optimization step — no warmup progress leaks into the headline
    t_setup = time.time()
    states, h = run(states, targets)
    # REAL device->host fetch: on the axon tunnel block_until_ready returns
    # before remote compile+execution finish, so without this the first
    # timed round silently absorbs the whole compile (train/loop.py:232-237)
    _ = np.asarray(h[-1])
    if schedule:
        states, h = run_cheap(states, targets)  # compile the cheap tier too
        _ = np.asarray(h[-1])
    if track_snr:
        _ = float(quick_snr(states))  # compile outside the budget too
    states = init_states(1)
    _ = np.asarray(jax.tree_util.tree_leaves(states.params)[0])
    log(f"compile: {time.time() - t_setup:.1f}s "
        "(states re-initialized; budget contains all training steps)")

    # STRICT budget: a round that finishes past BUDGET_S is discarded — the
    # headline state is the device-side snapshot taken at the last round
    # boundary INSIDE the budget (the snapshot copy is ~ms against ~2 s
    # rounds).  r02 reported the state at t=31.5 s; this never exceeds 30.0.
    t0 = time.time()
    steps = 0
    t40 = None
    snap_states, snap_steps, snap_t = None, 0, 0.0
    while time.time() - t0 < BUDGET_S and steps < MAX_STEPS:
        states, h = (run_cheap if use_cheap else run)(states, targets)
        # fetch BEFORE reading the clock: this is the real round boundary
        # (axon block_until_ready returns early; np.asarray does not)
        last = np.asarray(h[-1])
        worst = float(np.max(last))
        if use_cheap and float(np.mean(last)) < sched_thr:
            use_cheap = False
            log(f"  precision schedule: escalating to the full tier at "
                f"step {steps + ROUND_STEPS} (mean loss "
                f"{float(np.mean(last)):.3e})")
        steps += ROUND_STEPS
        t_now = time.time() - t0
        if t_now <= BUDGET_S:
            snap_states = jax.tree_util.tree_map(jnp.copy, states)
            snap_steps, snap_t = steps, t_now
        extra = ""
        if track_snr:
            s_now = float(quick_snr(states))
            if t40 is None and s_now >= TARGET_DB:
                t40 = time.time() - t0
            extra = f" snr~{s_now:6.2f} dB"
        _metrics().log({"event": "round", "mode": "multi", "step": steps,
                     "worst_chunk_loss": worst,
                     "elapsed_s": round(time.time() - t0, 3),
                     **({"snr_db": s_now} if track_snr else {})})
        log(f"  t={time.time() - t0:5.1f}s steps={steps:6d} "
            f"worst-chunk loss={worst:.3e}{extra}")
    if snap_states is not None:
        states, steps, train_time = snap_states, snap_steps, snap_t
        log(f"strict budget: headline state is the t={snap_t:.1f}s snapshot "
            f"({snap_steps} steps); later steps discarded")
    else:
        # not even one round fit the budget (tiny BENCH_BUDGET_S): keep the
        # first round's state and disclose the overshoot
        train_time = time.time() - t0
        log(f"WARNING: no round completed within {BUDGET_S}s; reporting the "
            f"t={train_time:.1f}s state (over budget)")
    if track_snr and t40 is not None:
        log(f"time-to-{TARGET_DB:.0f}dB: {t40:.1f}s "
            f"(round granularity {ROUND_STEPS} steps)")

    if block is not None:
        states = _from_flat(states)
    res = MultiINRResult(states=states, chunk_scales=scales, chunk_length=n,
                         hop=hop, num_chunks=k, signal_length=len(signal),
                         loss_history=np.zeros((1, k)), train_time_s=train_time)
    if fused:
        # Two fused-inference decode configs (f32 matmuls both — bf16
        # decode of a trained model caps reconstruction near 43 dB):
        # polynomial sin (~116 Msamples/s, output floor ~-68 dB) and exact
        # sin (~46 Msamples/s).  Report whichever yields the better SNR,
        # with ITS throughput — at high fit quality the polynomial floor
        # starts to bind.
        from inraudio_tpu.models import INRModel
        from inraudio_tpu.ops.pallas_siren import (fused_siren_apply,
                                                   fused_siren_apply_stacked)

        def mk(approx):
            return INRModel(
                name=f"{model.name}_decode_{approx}", config=model_cfg,
                init=model.init,
                apply=lambda p, c: fused_siren_apply(
                    p, model_cfg, c, block_rows=2048, approx_sin=approx,
                    interpret=_INTERPRET),
                # multi-chunk stacked kernel: zero row padding on the
                # 512-row chunks + compact packed output (the vmapped
                # single-chunk kernel pads each chunk to its tile and pays
                # a device relayout copy — BASELINE.md r3 trace rows)
                apply_stacked=lambda P, c: fused_siren_apply_stacked(
                    P, model_cfg, c, approx_sin=approx,
                    interpret=_INTERPRET))
        candidates = [("approx-sin", mk(True)), ("exact-sin", mk(False))]
    else:
        candidates = [("xla", model)]

    params = res.states.best_params
    best = None
    for name, dm in candidates:
        rec = multi_inr_decode(dm, res)
        snr = float(calculate_snr(signal, rec))
        decode = chunk_eval_fn(dm, coords)
        msps = measure_decode(decode, (params,), k * n)
        log(f"  decode[{name}]: {msps:.1f} Msamples/s, SNR {snr:.2f} dB")
        if best is None or snr > best[1] + 0.3:
            best = (name, snr, msps)
    name, snr, msps = best
    sps = steps / max(train_time, 1e-9)
    log(f"steps/sec: {sps:.1f}  "
        f"decode[{name}]: {msps:.1f} Msamples/s  SNR: {snr:.2f} dB in "
        f"{train_time:.1f}s (budget contains all steps)")
    fwd = fwd_flops_per_sample(jax.tree_util.tree_map(lambda x: x[0], params))
    log_mfu("train MFU", sps * k * n, fwd, training=True)
    log_mfu("decode MFU", msps * 1e6, fwd, training=False)
    return snr


def bench_full() -> float:
    """Reference-style single full-batch model (run.py:30 shape)."""
    problem = waveform_fitting(WAV, duration=10.0)
    log(f"fit target: {problem.num_samples} coords @ {problem.sample_rate} Hz")

    cfg = TrainConfig(
        total_steps=MAX_STEPS,
        learning_rate=float(os.environ.get("BENCH_LR", "1e-3")),
        scan_chunk=ROUND_STEPS,
        grad_clip_norm=float(os.environ.get("BENCH_CLIP", "0.0")),
        plateau_patience=int(os.environ.get("BENCH_PATIENCE", "200")),
        plateau_factor=float(os.environ.get("BENCH_PLATEAU_FACTOR", "0.8")))
    # BENCH_NUM_FREQ > 0: Gaussian RFF encoding owned by the model (folded
    # into the fused kernel) — the reference's num_freq family, run.py:141-144
    num_freq = int(os.environ.get("BENCH_NUM_FREQ", "0"))
    rff_b = None
    in_features = 1
    if num_freq:
        from inraudio_tpu.models import rff_init
        rff_b = rff_init(jax.random.PRNGKey(7), 1, num_freq,
                         sigma=float(os.environ.get("BENCH_SIGMA", "10")))
        in_features = 2 * num_freq
    model_cfg = SirenSnakeTanhConfig(
        in_features=in_features,
        first_omega_0=float(os.environ.get("BENCH_OMEGA", "22000")),
        hidden_features=int(os.environ.get("BENCH_HIDDEN", "256")),
        num_sine=int(os.environ.get("BENCH_NUM_SINE", "2")),
        num_snake=int(os.environ.get("BENCH_NUM_SNAKE", "2")))
    fused = os.environ.get("BENCH_FUSED", "1") == "1"
    model = build_model("mlp", model_cfg, fused=fused, approx_sin=fused,
                        rff_b=rff_b, interpret=_INTERPRET)

    mesh = make_mesh()

    # whole-step fused kernel at the production shape (VERDICT r3 item 4):
    # route through loop.fused_step_plan exactly like fit() does.
    # INRAUDIO_FUSED_STEP=0 gives the A/B against the two-kernel path.
    from inraudio_tpu.train.loop import fused_step_plan
    block = (fused_step_plan(model, cfg, problem.coords.shape[0])
             if mesh.devices.size == 1 else None)
    if block is not None:
        from inraudio_tpu.ops.pallas_siren_step import (
            flat_state_from_train_state, make_fused_mse_train_step,
            pad_step_inputs, unflatten_params)
        ctx = model.fused_step_ctx
        cp, tp, nv = pad_step_inputs(problem.coords, problem.targets, block)
        coords_d, targets_d, weight_d = jnp.asarray(cp), jnp.asarray(tp), None
        fstep = make_fused_mse_train_step(
            ctx["cfg"], cfg, nv, block, rff_b=ctx["rff_b"],
            approx_sin=ctx["approx_sin"], interpret=ctx["interpret"])
        train_step = lambda s, c, t, w: fstep(s, c, t)
        log(f"fused whole-step kernel: block_rows={block}")
        cheap_step = None
        if os.environ.get("BENCH_SCHEDULE", "0") == "1":
            from inraudio_tpu.train.loop import schedule_tiers
            cheap_tier, _full = schedule_tiers()
            fstep_c = make_fused_mse_train_step(
                ctx["cfg"], cfg, nv, block, rff_b=ctx["rff_b"],
                approx_sin=ctx["approx_sin"], interpret=ctx["interpret"],
                tier=cheap_tier)
            cheap_step = lambda s, c, t, w: fstep_c(s, c, t)
            log(f"precision schedule: cheap tier {cheap_tier}")

        def mk_state(seed):
            st = init_train_state(model, jax.random.PRNGKey(seed), cfg)
            return flat_state_from_train_state(
                st, ctx["cfg"], rff=ctx["rff_b"] is not None)

        def best_of(st):
            return unflatten_params(list(st.best_params), ctx["cfg"])
    else:
        coords_d, targets_d, weight_d, _ = shard_problem_arrays(
            mesh, problem.coords, problem.targets)
        train_step = make_train_step(model, cfg)

        def mk_state(seed):
            return jax.device_put(
                init_train_state(model, jax.random.PRNGKey(seed), cfg),
                replicated_sharding(mesh))

        def best_of(st):
            return st.best_params
        cheap_step = None
    state = mk_state(0)

    def mk_run(stp):
        def run_chunk(state, coords, targets, weight):
            def body(s, _):
                s, (loss, lr) = stp(s, coords, targets, weight)
                return s, loss
            return jax.lax.scan(body, state, None, length=ROUND_STEPS)
        return jax.jit(run_chunk, donate_argnums=(0,))

    run_chunk = mk_run(train_step)
    run_cheap = mk_run(cheap_step) if cheap_step is not None else None
    use_cheap = run_cheap is not None
    sched_thr = float("inf")
    if use_cheap:
        power = float(np.mean(np.asarray(problem.targets) ** 2))
        sched_db = float(os.environ.get("BENCH_SCHEDULE_DB", "45"))
        sched_thr = power / 10.0 ** (sched_db / 10.0)
        log(f"precision schedule: escalate below loss {sched_thr:.3e} "
            f"(~{sched_db:.0f} dB fit)")

    # SNR over the UNPADDED problem (the fused-step path zero-pads
    # coords/targets to the kernel tile)
    coords_full = jnp.asarray(problem.coords)
    targets_full = jnp.asarray(problem.targets)
    snr_now = jax.jit(lambda st, c, t: calculate_snr(
        t, model.apply(best_of(st), c)))

    t_setup = time.time()
    state, _ = run_chunk(state, coords_d, targets_d, weight_d)
    jax.block_until_ready(state.params)
    if run_cheap is not None:
        state, _ = run_cheap(state, coords_d, targets_d, weight_d)
        jax.block_until_ready(state.params)
    _ = float(snr_now(state, coords_full, targets_full))
    # re-initialize so warmup progress doesn't leak into the budget
    state = mk_state(1)
    jax.block_until_ready(state.params)
    log(f"compile: {time.time() - t_setup:.1f}s "
        "(state re-initialized; budget contains all training steps)")

    # strict budget (same policy as bench_multi): only rounds that complete
    # within BUDGET_S count toward the reported state
    t0 = time.time()
    steps = 0
    best_snr = -np.inf
    snap_state, snap_steps, snap_t = None, 0, 0.0
    while time.time() - t0 < BUDGET_S and steps < MAX_STEPS:
        state, losses = (run_cheap if use_cheap else run_chunk)(
            state, coords_d, targets_d, weight_d)
        # fetch BEFORE reading the clock: this is the real round boundary
        # (axon block_until_ready returns early; np.asarray does not)
        last_loss = float(np.asarray(losses[-1]))
        if use_cheap and last_loss < sched_thr:
            use_cheap = False
            log(f"  precision schedule: escalating to the full tier at "
                f"step {steps + ROUND_STEPS} (loss {last_loss:.3e})")
        steps += ROUND_STEPS
        t_now = time.time() - t0
        snr = float(snr_now(state, coords_full, targets_full))
        if t_now <= BUDGET_S:
            snap_state = jax.tree_util.tree_map(jnp.copy, state)
            snap_steps, snap_t = steps, t_now
            best_snr = max(best_snr, snr)
        _metrics().log({"event": "round", "mode": "full", "step": steps,
                     "loss": last_loss, "snr_db": snr,
                     "elapsed_s": round(time.time() - t0, 3)})
        log(f"  t={time.time() - t0:5.1f}s steps={steps:6d} "
            f"loss={last_loss:.3e} snr={snr:6.2f} dB")
        if snr >= TARGET_DB:
            break
    if snap_state is not None:
        state, steps, train_time = snap_state, snap_steps, snap_t
        log(f"strict budget: headline state is the t={snap_t:.1f}s snapshot "
            f"({snap_steps} steps)")
    else:
        train_time = time.time() - t0
        log(f"WARNING: no round completed within {BUDGET_S}s; reporting the "
            f"t={train_time:.1f}s state (over budget)")

    coords_j = jnp.asarray(problem.coords)
    best_params = jax.jit(best_of)(state)
    # quality-gated decode (same tier logic the codec ships): pick the
    # fastest fused tier whose floor clears this fit's SNR + margin —
    # low-fidelity full-batch fits decode on the ~100 Msamples/s bf16
    # tier instead of the exact apply
    snr_est = float(snr_now(state, coords_full, targets_full))
    if model.decode_apply is not None:
        decode = jax.jit(lambda p, c: model.decode_apply(p, c, snr_est))
    else:
        decode = jax.jit(lambda p, c: model.apply(p, c))
    msps = measure_decode(decode, (best_params, coords_j),
                          problem.num_samples)
    out = np.asarray(decode(best_params, coords_j))
    final_snr = float(calculate_snr(problem.targets, out))
    sps = steps / max(train_time, 1e-9)
    log(f"steps/sec: {sps:.1f}  decode: "
        f"{msps:.1f} Msamples/s  final SNR: {final_snr:.2f} dB")
    fwd = fwd_flops_per_sample(best_params)
    log_mfu("train MFU", sps * problem.num_samples, fwd, training=True)
    log_mfu("decode MFU", msps * 1e6, fwd, training=False)
    return max(best_snr, final_snr)


def _preflight() -> None:
    """Wait out a wedged device backend with retry-with-backoff; exit 2
    (no JSON line) only after the full retry window is exhausted.

    The tunneled axon backend can hang indefinitely even for a tiny
    fetch (r3 outage: `np.asarray(jnp.ones((8,8)))` blocked >15 min in
    fresh processes) — but it also RECOVERS: the r4 driver run aborted at
    a single-shot 180 s probe two hours after the identical command
    succeeded, so a known-transient outage deserves more than one coin
    flip.  Policy: spawn a fresh probe thread every BENCH_PREFLIGHT_ATTEMPT_S
    (default 75 s — probes blocked on a hung fetch complete the moment the
    server recovers, so old threads double as recovery detectors) until one
    completes or BENCH_PREFLIGHT_TOTAL_S (default 1500 s = 25 min) elapses.
    A healthy backend completes the first probe in <5 s even cold; after a
    late recovery the full training budget still runs (BUDGET_S is measured
    from training start, not process start).  Emitting NO metric line after
    25 min of heartbeat logs is strictly better than hanging the driver or
    reporting a fake 0 dB."""
    import threading
    total_s = float(os.environ.get("BENCH_PREFLIGHT_TOTAL_S", "1500"))
    attempt_s = float(os.environ.get("BENCH_PREFLIGHT_ATTEMPT_S", "75"))
    ok: list[float] = []

    def probe():
        # fresh tiny fetch per thread: the blocking np.asarray releases the
        # GIL, so any number of probes can wait concurrently; whichever one
        # the recovered server answers first unblocks the wait loop
        ok.append(float(np.asarray(jnp.zeros((8,), jnp.float32)).sum()))

    t0 = time.time()
    attempt = 0
    while True:
        attempt += 1
        threading.Thread(target=probe, daemon=True).start()
        deadline = time.time() + attempt_s
        while time.time() < deadline:
            if ok:
                if attempt > 1:
                    log(f"bench preflight: backend recovered after "
                        f"{time.time() - t0:.0f}s ({attempt} probes) — "
                        f"running the full budget")
                return
            time.sleep(1.0)
        elapsed = time.time() - t0
        if elapsed >= total_s:
            print(f"bench preflight: device backend unresponsive after "
                  f"{elapsed:.0f}s ({attempt} probes) — aborting without "
                  f"a metric line", file=sys.stderr, flush=True)
            os._exit(2)
        log(f"bench preflight: probe {attempt} unanswered at "
            f"t={elapsed:.0f}s — retrying (window {total_s:.0f}s)")


def main() -> None:
    _preflight()
    emit(bench_multi() if MODE == "multi" else bench_full())


if __name__ == "__main__":
    main()
