"""Jitted full-batch training loop: lax.scan over steps, zero host sync.

TPU-native re-design of the reference hot loop (run.py:149-190).  The
reference pays a ``loss.item()`` host round-trip every step for best-model
bookkeeping and the plateau scheduler (run.py:171,180,187); here the entire
optimisation — forward, loss mix, backward, Adam, ReduceLROnPlateau, best-
params snapshot — is one ``lax.scan`` compiled once and run on device,
returning only the per-step loss/LR histories at the end.

Best-model semantics: the reference's ``best_model = model`` (run.py:173) is
an alias, so its decode actually uses the FINAL parameters (SURVEY.md C21).
Here ``track_best=True`` (default) keeps a TRUE on-device snapshot of the
best parameters (a ~1 MB select per improving step); ``track_best=False``
reproduces the reference behavior (final params, best_* labels only).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import INRModel
from ..parallel.mesh import make_mesh, replicated_sharding, shard_problem_arrays
from ..utils.observability import MetricsLogger, profile_trace
from .losses import mix_loss
from .optim import (AdamConfig, AdamState, PlateauConfig, PlateauState,
                    adam_init, adam_update, clip_by_global_norm,
                    plateau_init, plateau_update)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Reference runner knobs (run.py:30): loss_mode in {mse, mae, snr},
    alpha mixes in the STFT term, lr/min_lr feed Adam + plateau."""

    total_steps: int = 20000
    learning_rate: float = 1e-3
    min_learning_rate: float = 1e-6
    loss_mode: str = "mse"
    alpha: float = 0.0
    multi_resolution_stft: bool = False
    track_best: bool = True
    plateau_factor: float = 0.8
    plateau_patience: int = 200
    # History stride applied host-side after the run (1 = per-step, like
    # the reference's per-iteration lists, run.py:180-190).
    log_every: int = 1
    # Optional global-norm gradient clipping (0 = off, the reference has
    # none).  Stabilises multi-INR chunk populations at aggressive lrs.
    grad_clip_norm: float = 0.0
    # Every N steps, call the model's data-adaptive refresh hook
    # (INRModel.update_grid) between scan rounds — the KAN whole-network
    # grid update (reference kan.py:274-279).  0 = never.
    update_grid_every: int = 0
    # Row cap for the refresh batch: kan_linear_update_grid's unreduced
    # spline output is (batch, in, out) — full audio batches (~3e5 rows x
    # 512 features) would need ~80 GB; an evenly-strided subsample preserves
    # the activation distribution the adaptive grid needs.
    update_grid_batch: int = 4096
    # Steps per jitted lax.scan dispatch. The full loop is a host loop over
    # scan chunks: on TPU the chunk is large (dispatch overhead amortised to
    # nothing); it also keeps each device executable short, which matters on
    # virtual-device CPU test meshes where XLA's in-process collectives have
    # a 40 s rendezvous termination timeout.
    scan_chunk: int = 500
    # Quality-scheduled training precision (fused-step path only): rounds
    # start on the cheap tier (bf16x2 fwd matmuls, 1-pass bf16 grads,
    # deg-7 sin — see schedule_tiers) and permanently escalate to the full
    # tier once the round loss crosses the floor implied by schedule_db.
    # Measured r5 (bench_logs_r5/12+13): +6.1 dB at the same strict 30 s
    # budget on the h=256 full-batch shape (89.6 -> 134.3 steps/s, the
    # whole budget rides the cheap tier); neutral on the fast-converging
    # multi-INR headline (escalates after one round).  Off by default:
    # the escalation is a host-side re-dispatch, so fits dominated by
    # sub-second rounds pay an extra compile for nothing.
    precision_schedule: bool = False
    schedule_db: float = 45.0


class TrainState(NamedTuple):
    params: Any
    opt: AdamState
    plateau: PlateauState
    best_params: Any
    best_loss: jax.Array
    best_iter: jax.Array


@dataclasses.dataclass
class FitResult:
    params: Any            # parameters used for decode (best or final)
    final_params: Any
    state: TrainState
    loss_history: np.ndarray
    lr_history: np.ndarray
    best_loss: float
    best_iter: int
    steps: int
    train_time_s: float
    steps_per_sec: float


def init_train_state(model: INRModel, key: jax.Array,
                     cfg: TrainConfig) -> TrainState:
    params = model.init(key)
    adam_cfg = AdamConfig(lr=cfg.learning_rate)
    return TrainState(
        params=params,
        opt=adam_init(params, adam_cfg),
        plateau=plateau_init(),
        # distinct buffers: params and best_params are both donated to the
        # scan — aliasing them would be a double-donation
        best_params=jax.tree.map(jnp.copy, params),
        best_loss=jnp.float32(jnp.inf),
        best_iter=jnp.int32(0),
    )


def make_train_step(model: INRModel, cfg: TrainConfig):
    """One full-batch step as a pure function:
    (state, coords, targets, weight) -> (state, (loss, lr))."""
    adam_cfg = AdamConfig(lr=cfg.learning_rate)
    plateau_cfg = PlateauConfig(factor=cfg.plateau_factor,
                                patience=cfg.plateau_patience,
                                min_lr=cfg.min_learning_rate)

    def loss_fn(params, coords, targets, weight):
        pred = model.apply(params, coords)
        return mix_loss(pred, targets, loss_mode=cfg.loss_mode,
                        alpha=cfg.alpha, weight=weight,
                        multi_resolution=cfg.multi_resolution_stft)

    def train_step(state: TrainState, coords, targets, weight=None):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, coords,
                                                  targets, weight)
        loss = loss.astype(jnp.float32)
        if cfg.grad_clip_norm > 0:
            grads = clip_by_global_norm(grads, cfg.grad_clip_norm)
        new_params, opt = adam_update(state.opt, grads, state.params, adam_cfg)
        plateau, new_lr = plateau_update(state.plateau, loss, opt.lr,
                                         plateau_cfg)
        opt = opt._replace(lr=new_lr)
        improved = loss < state.best_loss
        if cfg.track_best:
            # true snapshot: select per-leaf (models are ~1 MB; free on TPU)
            best_params = jax.tree.map(
                lambda b, p: jnp.where(improved, p, b),
                state.best_params, state.params)
        else:
            best_params = state.best_params  # reference alias semantics
        best_loss = jnp.where(improved, loss, state.best_loss)
        best_iter = jnp.where(improved, opt.step - 1, state.best_iter)
        new_state = TrainState(params=new_params, opt=opt, plateau=plateau,
                               best_params=best_params, best_loss=best_loss,
                               best_iter=best_iter)
        return new_state, (loss, new_lr)

    return train_step


def _as_train_state(carry, model: INRModel) -> TrainState:
    """Identity for a TrainState carry; converts a FlatTrainState from the
    whole-step fused path back to the standard pytree layout."""
    if isinstance(carry, TrainState):
        return carry
    from ..ops.pallas_siren_step import train_state_from_flat
    return train_state_from_flat(carry, model.fused_step_ctx["cfg"])


def fused_step_plan(model: INRModel, cfg: TrainConfig, n_rows: int,
                    has_weight: bool = False) -> int | None:
    """Row-tile size for the whole-step fused kernel, or None when the fit
    cannot route through it (non-mse loss, grid refresh, a model without
    the fused-step context, or a VMEM-overflowing stack).  Per-row loss
    WEIGHTS ride the kernel since r5 (the psychoacoustic mask streams in
    like the targets — VERDICT r4 item 9).
    ``INRAUDIO_FUSED_STEP=0`` disables the path for A/B measurement."""
    import os
    ctx = model.fused_step_ctx
    if ctx is None:
        return None
    if cfg.loss_mode != "mse" or cfg.alpha != 0.0 or cfg.update_grid_every:
        return None
    if os.environ.get("INRAUDIO_FUSED_STEP", "1") == "0":
        return None
    from ..ops.pallas_siren_step import step_block_rows, step_supported
    rffb = ctx["rff_b"]
    rf = 0 if rffb is None else rffb.shape[0]
    if not step_supported(ctx["cfg"], n_rows, rf, cfg.track_best):
        return None
    return step_block_rows(ctx["cfg"], n_rows, rf, cfg.track_best)


def make_vmapped_fused_step(model: INRModel, cfg: TrainConfig,
                            coords: np.ndarray, block: int,
                            tier: dict | None = None):
    """Wire the whole-step fused kernel for a vmapped chunk population.

    Companion to ``fused_step_plan`` (call only when it returned
    ``block``): pads the shared per-chunk coordinate grid, builds the
    fused (FlatTrainState, targets) -> (FlatTrainState, (loss, lr)) step,
    and returns the conversions every caller needs.  Shared by
    ``multi_inr._fit_chunk_population`` and bench.py so the padding /
    flat-layout contract lives in ONE place.

    Returns ``(vstep, to_flat, from_flat, best_unflatten, pad_targets)``:
    ``vstep(states, targets)`` the vmapped step (coords are a host-numpy
    closure constant — see the lowering note in multi_inr), ``to_flat`` /
    ``from_flat`` vmapped TrainState <-> FlatTrainState, ``best_unflatten``
    flat stacked best-params -> pytree, ``pad_targets(t, k)`` the
    (k, n_pad, 1) zero-padded target stack.
    """
    from ..ops.pallas_siren_step import (flat_state_from_train_state,
                                         make_fused_mse_train_step,
                                         pad_step_inputs,
                                         train_state_from_flat,
                                         unflatten_params)
    ctx = model.fused_step_ctx
    n = coords.shape[0]
    coords_p, _, _ = pad_step_inputs(coords, np.zeros((n, 1), np.float32),
                                     block)
    fstep = make_fused_mse_train_step(
        ctx["cfg"], cfg, n, block, rff_b=ctx["rff_b"],
        approx_sin=ctx["approx_sin"], interpret=ctx["interpret"],
        tier=tier)
    vstep = jax.vmap(lambda s, t: fstep(s, coords_p, t), in_axes=(0, 0))
    to_flat = jax.vmap(lambda s: flat_state_from_train_state(
        s, ctx["cfg"], rff=ctx["rff_b"] is not None))
    from_flat = jax.vmap(lambda s: train_state_from_flat(s, ctx["cfg"]))
    best_unflatten = jax.vmap(
        lambda f: unflatten_params(list(f), ctx["cfg"]))

    def pad_targets(targets, k_rows: int) -> np.ndarray:
        tp = np.zeros((k_rows, coords_p.shape[0], 1), np.float32)
        tp[:, :n] = np.asarray(targets)
        return tp

    return vstep, to_flat, from_flat, best_unflatten, pad_targets


def schedule_tiers() -> tuple[dict, None]:
    """The quality-scheduled training precision ladder: (cheap, full).

    The training-side mirror of the decode gate (VERDICT r4 item 3 /
    ops/pallas_siren.auto_decode_kwargs): early optimization steps at loss
    ~1e-2 cannot need the numerical floor that step 5000 at loss ~1e-13
    needs, so rounds start on a CHEAP step tier and escalate when the
    carried loss crosses the tier's measured noise floor.

    cheap = bf16x2 forward matmuls (forward-bias cap ~68 dB, BASELINE.md
    r4 A/B), single-pass bf16 backward (gradient rounding is zero-mean
    noise Adam absorbs), deg-7 sin polynomial (~-63 dB activation floor)
    — 4 of the 9 MXU passes per hidden layer per step, and the shortest
    VPU transcendental chain.  full = None (the process defaults:
    bf16x3 fwd / INRAUDIO_GRAD_PRECISION bwd / deg-11).

    The escalation is host-side re-dispatch between identically-shaped
    jitted scans (the FlatTrainState carry is tier-independent), so the
    switch costs one extra compile, nothing per-step.
    """
    return dict(f32_mode="bf16x2", grad_mode="bf16", sin_degree=7), None


def fit(model: INRModel,
        coords: np.ndarray,
        targets: np.ndarray,
        cfg: TrainConfig | None = None,
        key: jax.Array | None = None,
        weight: np.ndarray | None = None,
        mesh=None,
        state: TrainState | None = None,
        checkpoint_every: int = 0,
        checkpoint_path: str | None = None,
        metrics: MetricsLogger | None = None,
        profile_dir: str | None = None) -> FitResult:
    """Fit the INR to (coords, targets) with the full jitted scan loop.

    ``mesh=None`` builds a 1-D mesh over all visible devices: coords/targets
    sharded on the sample axis, params replicated — single-device meshes
    degrade to the trivial layout.  ``state`` warm-starts from a previous
    phase (procedural curriculum, run.py:486-495).

    ``checkpoint_every`` > 0 saves the full TrainState to
    ``checkpoint_path`` roughly every that many steps (rounded to scan-chunk
    boundaries) — crash resilience the reference lacks (its only recovery is
    the end-of-run checkpoint, run.py:356-363); resume by loading it into
    ``state``.

    ``metrics`` streams one JSONL record per scan-chunk round (step, loss,
    lr, steps/sec) — the structured replacement for the reference's host-side
    loss lists (run.py:180-190).  ``profile_dir`` captures a jax.profiler
    trace of one post-compile round into that directory.
    """
    cfg = cfg or TrainConfig()
    key = key if key is not None else jax.random.PRNGKey(0)
    mesh = mesh or make_mesh()

    if state is None:
        state = init_train_state(model, key, cfg)
    rep = replicated_sharding(mesh)
    state = jax.device_put(state, rep)

    # Whole-step fused path.  Single device: one kernel does
    # fwd+bwd+clip+Adam+best.  Multi-device mesh: rows shard over the
    # data axis — the step splits into a per-shard grad-accumulation
    # kernel, a psum of (loss, grads), and the clip+Adam+best epilogue
    # kernel on the replicated result (make_sharded_fused_mse_train_step)
    # so the reference's own full-batch workload shape (run.py:135-137)
    # rides the fused kernels on any mesh size.
    n_dev = mesh.devices.size
    block = fused_step_plan(model, cfg, -(-coords.shape[0] // n_dev),
                            has_weight=weight is not None)
    step_fn_cheap = None  # set by the fused branches when cfg.precision_schedule
    if block is not None and weight is not None:
        # mean-1 normalisation over real rows (mix_loss weights arrive
        # pre-normalised from shard_problem_arrays on the XLA path; the
        # kernel path normalises here), zero-padded alongside the targets
        w = np.asarray(weight, np.float32).reshape(-1)
        weight_n = (w * (len(w) / max(float(np.sum(w)), 1e-12)))[:, None]
    if block is not None and n_dev == 1:
        from ..ops.pallas_siren_step import (flat_state_from_train_state,
                                             make_fused_mse_train_step,
                                             pad_step_inputs)
        ctx = model.fused_step_ctx
        cp, tp, n_valid = pad_step_inputs(coords, targets, block)
        # run() ARGUMENTS (not closures): device residency is safe and
        # avoids re-uploading the grid every scan round
        coords_d, targets_d = jnp.asarray(cp), jnp.asarray(tp)
        weight_d = None
        if weight is not None:
            wp = np.zeros((cp.shape[0], 1), np.float32)
            wp[: len(weight_n)] = weight_n
            weight_d = jnp.asarray(wp)
        fstep = make_fused_mse_train_step(
            ctx["cfg"], cfg, n_valid, block, rff_b=ctx["rff_b"],
            approx_sin=ctx["approx_sin"], interpret=ctx["interpret"])
        step_fn = lambda s, c, t, w: fstep(s, c, t, w)
        if cfg.precision_schedule:
            fstep_c = make_fused_mse_train_step(
                ctx["cfg"], cfg, n_valid, block, rff_b=ctx["rff_b"],
                approx_sin=ctx["approx_sin"], interpret=ctx["interpret"],
                tier=schedule_tiers()[0])
            step_fn_cheap = lambda s, c, t, w: fstep_c(s, c, t, w)
        carry = flat_state_from_train_state(
            state, ctx["cfg"], rff=ctx["rff_b"] is not None)
    elif block is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..ops.pallas_siren_step import (
            flat_state_from_train_state, make_sharded_fused_mse_train_step,
            pad_step_inputs)
        ctx = model.fused_step_ctx
        axis = mesh.axis_names[0]
        # every shard gets whole kernel tiles: pad rows to block * n_dev
        cp, tp, n_valid = pad_step_inputs(coords, targets, block * n_dev)
        shard_rows = cp.shape[0] // n_dev
        row_sh = NamedSharding(mesh, P(axis))
        coords_d = jax.device_put(jnp.asarray(cp), row_sh)
        targets_d = jax.device_put(jnp.asarray(tp), row_sh)
        weight_d = None
        if weight is not None:
            wp = np.zeros((cp.shape[0], 1), np.float32)
            wp[: len(weight_n)] = weight_n
            weight_d = jax.device_put(jnp.asarray(wp), row_sh)
        sstep = make_sharded_fused_mse_train_step(
            ctx["cfg"], cfg, n_valid, block, shard_rows, axis_name=axis,
            rff_b=ctx["rff_b"], approx_sin=ctx["approx_sin"],
            interpret=ctx["interpret"])
        def _wrap_sharded(stp):
            if weight is not None:
                sm = jax.shard_map(stp, mesh=mesh,
                                   in_specs=(P(), P(axis), P(axis), P(axis)),
                                   out_specs=(P(), (P(), P())),
                                   check_vma=False)
                return lambda s, c, t, w: sm(s, c, t, w)
            sm = jax.shard_map(lambda s, c, t: stp(s, c, t), mesh=mesh,
                               in_specs=(P(), P(axis), P(axis)),
                               out_specs=(P(), (P(), P())),
                               check_vma=False)
            return lambda s, c, t, w: sm(s, c, t)

        step_fn = _wrap_sharded(sstep)
        if cfg.precision_schedule:
            step_fn_cheap = _wrap_sharded(make_sharded_fused_mse_train_step(
                ctx["cfg"], cfg, n_valid, block, shard_rows, axis_name=axis,
                rff_b=ctx["rff_b"], approx_sin=ctx["approx_sin"],
                interpret=ctx["interpret"], tier=schedule_tiers()[0]))
        carry = flat_state_from_train_state(
            state, ctx["cfg"], rff=ctx["rff_b"] is not None)
    else:
        coords_d, targets_d, weight_d, _n = shard_problem_arrays(
            mesh, coords, targets, weight)
        step_fn = make_train_step(model, cfg)
        carry = state

    def _mk_run(stp):
        @functools.partial(jax.jit, donate_argnums=(0,),
                           static_argnames=("length",))
        def run(state, coords, targets, weight, length):
            def body(s, _):
                s, (loss, lr) = stp(s, coords, targets, weight)
                return s, (loss, lr)
            return jax.lax.scan(body, state, None, length=length)
        return run

    run = _mk_run(step_fn)
    run_cheap = _mk_run(step_fn_cheap) if step_fn_cheap is not None else None
    use_cheap = run_cheap is not None
    sched_thr = float("inf")
    if use_cheap:
        # escalate once the round loss crosses the cheap tier's floor:
        # loss below power/10^(db/10) means the fit has reached schedule_db
        power = float(np.mean(np.asarray(targets, np.float32) ** 2))
        sched_thr = power / 10.0 ** (cfg.schedule_db / 10.0)

    chunk = max(1, min(cfg.scan_chunk, cfg.total_steps))
    n_rounds = -(-cfg.total_steps // chunk)
    t0 = time.time()
    loss_chunks, lr_chunks = [], []
    done = 0
    last_ckpt = 0
    last_grid_update = 0
    rounds = 0
    while done < cfg.total_steps:
        n = min(chunk, cfg.total_steps - done)
        # profile a post-compile round (round 1, or round 0 if it's the only
        # one) so the trace holds steady-state step time, not compilation
        profiled = profile_dir is not None and rounds == min(1, n_rounds - 1)
        with profile_trace(profile_dir, enabled=profiled):
            carry, (lh, lrh) = (run_cheap if use_cheap else run)(
                carry, coords_d, targets_d, weight_d, length=n)
            if profiled:
                jax.block_until_ready(carry.params)
        if use_cheap and float(lh[-1]) < sched_thr:
            use_cheap = False  # permanent escalation to the full tier
        loss_chunks.append(lh)
        lr_chunks.append(lrh)
        done += n
        rounds += 1
        if (cfg.update_grid_every and model.update_grid is not None
                and done - last_grid_update >= cfg.update_grid_every
                and done < cfg.total_steps):
            # data-adaptive knot refresh (KAN): re-grid every layer from the
            # activations that actually reach it, keep Adam moments (the
            # reference's torch optimizer is likewise not reset)
            n_rows = coords.shape[0]
            if n_rows > cfg.update_grid_batch:
                stride = -(-n_rows // cfg.update_grid_batch)
                grid_x = jnp.asarray(coords[::stride])
            else:
                grid_x = coords_d
            new_params = model.update_grid(carry.params, grid_x)
            carry = carry._replace(
                params=jax.device_put(new_params, rep))
            last_grid_update = done
        if metrics is not None:
            elapsed = time.time() - t0
            metrics.log({"event": "round", "step": done,
                         "loss": float(lh[-1]), "lr": float(lrh[-1]),
                         "elapsed_s": round(elapsed, 3),
                         "steps_per_sec": round(done / max(elapsed, 1e-9), 2)})
        if (checkpoint_every and checkpoint_path
                and done - last_ckpt >= checkpoint_every
                and done < cfg.total_steps):
            from .checkpoint import save_checkpoint
            jax.block_until_ready(carry.params)
            save_checkpoint(checkpoint_path, _as_train_state(carry, model),
                            extra={"steps_done": done})
            last_ckpt = done
    jax.block_until_ready(carry.params)
    # On the tunneled axon TPU backend block_until_ready can return before
    # remote execution finishes; a real device->host fetch of one final-state
    # leaf forces the whole scan chain to complete, so train_time is
    # wall-truth (measured: 3.7 s "internal" vs 102 s actual without this).
    np.asarray(jax.tree_util.tree_leaves(carry.params)[0])
    train_time = time.time() - t0
    state = _as_train_state(carry, model)
    loss_hist = jnp.concatenate(loss_chunks) if len(loss_chunks) > 1 else loss_chunks[0]
    lr_hist = jnp.concatenate(lr_chunks) if len(lr_chunks) > 1 else lr_chunks[0]
    if cfg.log_every > 1:
        loss_hist = loss_hist[:: cfg.log_every]
        lr_hist = lr_hist[:: cfg.log_every]

    decode_params = state.best_params if cfg.track_best else state.params
    return FitResult(
        params=jax.device_get(decode_params),
        final_params=jax.device_get(state.params),
        state=state,
        loss_history=np.asarray(loss_hist),
        lr_history=np.asarray(lr_hist),
        best_loss=float(state.best_loss),
        best_iter=int(state.best_iter),
        steps=cfg.total_steps,
        train_time_s=train_time,
        steps_per_sec=cfg.total_steps / max(train_time, 1e-9),
    )
