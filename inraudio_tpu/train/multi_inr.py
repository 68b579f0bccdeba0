"""Chunked multi-INR fitting: long audio as many small INRs, trained
SIMULTANEOUSLY.

The reference handles long audio only by decimation/truncation/band-split
(SURVEY.md section 5); its natural extension — split into overlapping windows,
fit an INR per window, overlap-add the decodes (BASELINE.json config 5) —
would run serially on a GPU.  The TPU-native design instead treats the chunk
axis as a batch axis:

- every chunk shares ONE coordinate grid, so the whole population is a
  single ``vmap``-ed training step: (k, n, h) batched matmuls on the MXU
  instead of k sequential fits;
- the chunk axis is sharded over the device mesh (each chip fits its own
  chunks) — embarrassingly parallel, ZERO inter-chip collectives during
  training, perfect ICI-free scaling;
- decode is the same vmap + an overlap-add crossfade stitch on device.

Each chunk is peak-normalised individually (stored per-chunk scale restores
amplitude at stitch time, like the waveform builders' decode contract).

On a multi-device mesh the vmapped step runs under ``jax.shard_map`` over
the chunk axis: each device executes its local chunks only (zero
collectives), which also makes the Pallas ``fused`` apply work unchanged —
the custom call never needs to be partitioned by XLA.  Validated on the
8-virtual-device CPU mesh with interpret-mode kernels
(tests/test_experiments.py).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.coords import get_coord
from ..models import INRModel
from ..parallel.mesh import make_mesh
from jax.sharding import NamedSharding, PartitionSpec as P

from .loop import (TrainConfig, TrainState, fused_step_plan,
                   init_train_state, make_train_step,
                   make_vmapped_fused_step)


@dataclasses.dataclass(frozen=True)
class MultiINRConfig:
    chunk_seconds: float = 1.0
    overlap_fraction: float = 0.25  # of the chunk length, each side

    def __post_init__(self):
        # >0.5 would make the fade-out ramp overwrite part of the fade-in
        # in _crossfade_window, silently degrading the stitch
        if not 0.0 <= self.overlap_fraction <= 0.5:
            raise ValueError(
                f"overlap_fraction must be in [0, 0.5], got "
                f"{self.overlap_fraction}")


class MultiINRResult(NamedTuple):
    states: TrainState        # stacked on the chunk axis
    chunk_scales: np.ndarray  # (k,) per-chunk peak de-normalisation
    chunk_length: int
    hop: int
    num_chunks: int
    signal_length: int
    loss_history: np.ndarray  # (steps, k)
    train_time_s: float


def chunk_signal(signal: np.ndarray, sample_rate: int,
                 cfg: MultiINRConfig) -> tuple[np.ndarray, int, int]:
    """Slice into overlapping windows -> (chunks (k, n), chunk_length, hop).

    The tail is zero-padded to a full window; stitching trims back to the
    original length.
    """
    n = int(round(cfg.chunk_seconds * sample_rate))
    overlap = int(round(cfg.overlap_fraction * n))
    hop = max(n - overlap, 1)
    length = len(signal)
    k = max(1, int(np.ceil(max(length - n, 0) / hop)) + 1)
    padded = np.zeros(((k - 1) * hop + n,), dtype=np.float32)
    padded[:length] = signal
    idx = (np.arange(k)[:, None] * hop) + np.arange(n)[None, :]
    return padded[idx], n, hop


def _crossfade_window(n: int, overlap: int) -> np.ndarray:
    """Linear fade-in/out ramps over the overlapped regions; interior flat.
    Normalised at stitch time by the accumulated weight, so edges are exact."""
    w = np.ones(n, dtype=np.float32)
    if overlap > 0:
        ramp = np.linspace(0.0, 1.0, overlap + 2, dtype=np.float32)[1:-1]
        w[:overlap] = ramp
        w[-overlap:] = ramp[::-1]
    return w


def multi_inr_fit(model: INRModel,
                  signal: np.ndarray,
                  sample_rate: int,
                  cfg: MultiINRConfig | None = None,
                  train_cfg: TrainConfig | None = None,
                  key: jax.Array | None = None,
                  mesh=None,
                  metrics=None,
                  max_chunks_per_batch: int | None = None) -> MultiINRResult:
    """Fit one INR per chunk, all chunks at once (vmap over the chunk axis,
    chunk axis sharded over the mesh).  ``metrics`` (a MetricsLogger)
    streams one record per scan round.

    ``max_chunks_per_batch`` bounds device memory for LONG audio: each
    chunk's TrainState (params + best + Adam moments) is ~1.3 MB at h=128,
    so an unbatched population OOMs one 16 GB chip past roughly 4 minutes
    of 44.1 kHz input.  With a bound, the population is trained in fixed-
    size batches (padded so every batch reuses ONE compiled executable)
    and finished states accumulate on the HOST — device memory holds one
    batch regardless of clip length.
    """
    cfg = cfg or MultiINRConfig()
    train_cfg = train_cfg or TrainConfig()
    key = key if key is not None else jax.random.PRNGKey(0)
    chunks, n, hop = chunk_signal(np.asarray(signal, dtype=np.float32),
                                  sample_rate, cfg)
    return _fit_chunks(model, chunks, n, hop, len(signal), cfg, train_cfg,
                       key, mesh, metrics, max_chunks_per_batch)


def _fit_chunks(model, chunks, n, hop, signal_length, cfg, train_cfg, key,
                mesh, metrics, max_chunks_per_batch) -> MultiINRResult:
    """Train a (k, n) chunk population, optionally in fixed-size padded
    batches (the ``max_chunks_per_batch`` memory bound) — shared by
    ``multi_inr_fit`` and ``multi_inr_fit_many``."""
    key = key if key is not None else jax.random.PRNGKey(0)
    k = chunks.shape[0]
    if not max_chunks_per_batch or k <= max_chunks_per_batch:
        return _fit_chunk_population(model, chunks, n, hop, signal_length,
                                     cfg, train_cfg, key, mesh,
                                     metrics=metrics)
    kb = max_chunks_per_batch
    parts = []
    for bi, start in enumerate(range(0, k, kb)):
        batch = chunks[start:start + kb]
        real = batch.shape[0]
        if real < kb:  # pad: every batch compiles to the same executable
            batch = np.concatenate(
                [batch, np.zeros((kb - real, n), np.float32)], axis=0)
        r = _fit_chunk_population(model, batch, n, hop, batch.shape[0] * n,
                                  cfg, train_cfg,
                                  jax.random.fold_in(key, bi), mesh,
                                  metrics=metrics)
        # pull this batch's states to the host before the next one compiles
        parts.append((jax.tree.map(lambda x: np.asarray(x)[:real],
                                   r.states),
                      r.chunk_scales[:real],
                      np.asarray(r.loss_history)[:, :real],
                      r.train_time_s))
    states = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0),
                          *[p[0] for p in parts])
    return MultiINRResult(
        states=states,
        chunk_scales=np.concatenate([p[1] for p in parts]),
        chunk_length=n, hop=hop, num_chunks=k,
        signal_length=signal_length,
        loss_history=np.concatenate([p[2] for p in parts], axis=1),
        train_time_s=sum(p[3] for p in parts))


def multi_inr_fit_many(model: INRModel,
                       signals: list[np.ndarray],
                       sample_rate: int,
                       cfg: MultiINRConfig | None = None,
                       train_cfg: TrainConfig | None = None,
                       key: jax.Array | None = None,
                       mesh=None,
                       metrics=None,
                       max_chunks_per_batch: int | None = None
                       ) -> list[MultiINRResult]:
    """Fit SEVERAL clips at once: their chunk populations concatenate into
    one vmapped batch, trained in a single scan.

    The reference's driver fits instruments serially (run.py:419 loops over
    ['oboe', 'castanets']); on TPU the chunk axis is a batch axis, so a
    whole directory of clips is just a bigger population — one compile, one
    launch, same wall-clock as the longest clip alone (until the chip
    saturates).  All clips share ``sample_rate`` and the chunk grid.
    Returns one MultiINRResult per input, decodable with
    ``multi_inr_decode``.
    """
    cfg = cfg or MultiINRConfig()
    train_cfg = train_cfg or TrainConfig()
    if not signals:
        return []
    # chunk each clip separately (not a concatenation) so chunk boundaries
    # stay aligned to clip starts, then fit the stacked population once
    per_clip = [chunk_signal(np.asarray(s, dtype=np.float32), sample_rate,
                             cfg) for s in signals]
    n, hop = per_clip[0][1], per_clip[0][2]
    chunks = np.concatenate([c for c, _, _ in per_clip], axis=0)
    res = _fit_chunks(model, chunks, n, hop, chunks.shape[0] * n, cfg,
                      train_cfg, key, mesh, metrics, max_chunks_per_batch)
    # split the stacked states/scales back per clip
    out = []
    start = 0
    for (c, _, _), sig in zip(per_clip, signals):
        k = c.shape[0]
        sl = slice(start, start + k)
        states_i = jax.tree.map(lambda x: x[sl], res.states)
        out.append(MultiINRResult(
            states=states_i, chunk_scales=res.chunk_scales[sl],
            chunk_length=n, hop=hop, num_chunks=k,
            signal_length=len(np.asarray(sig).reshape(-1)),
            loss_history=res.loss_history[:, sl],
            train_time_s=res.train_time_s))
        start += k
    return out


def _fit_chunk_population(model, chunks, n, hop, signal_length, cfg,
                          train_cfg, key, mesh,
                          metrics=None) -> MultiINRResult:
    """Core of multi_inr_fit: train a (k, n) chunk population."""
    key = key if key is not None else jax.random.PRNGKey(0)
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    k = chunks.shape[0]
    scales = np.maximum(np.max(np.abs(chunks), axis=1), 1e-9)
    targets = (chunks / scales[:, None])[..., None]
    k_pad = (-k) % n_dev
    if k_pad:
        targets = np.concatenate(
            [targets, np.zeros((k_pad, n, 1), dtype=np.float32)], axis=0)
    k_total = k + k_pad
    # HOST constant on purpose: coords is closed over into jit(run) below, and
    # a closed-over device array becomes an MLIR constant whose value is
    # fetched device->host during lowering — through the axon tunnel that
    # fetch serializes behind pending device work (the round-2 "218 s
    # compile").  A numpy constant embeds from host memory instantly.
    coords = np.asarray(get_coord(n, dim=1), np.float32)
    keys = jax.random.split(key, k_total)
    states = jax.vmap(lambda kk: init_train_state(model, kk, train_cfg))(keys)

    def shard_leaf(x):
        spec = P(*(("data",) + (None,) * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    # Whole-step fused kernel (fwd+bwd+clip+Adam in one Pallas call): the
    # per-chunk step has no cross-device traffic, so it composes with the
    # shard_map chunk sharding exactly like the two-kernel path.  Carries a
    # FlatTrainState through the scan; converted back after training.
    block = fused_step_plan(model, train_cfg, n)
    if block is not None:
        # shared wiring (padding + flat-state contract): loop.py
        vstep, to_flat, from_flat, _, pad_targets = make_vmapped_fused_step(
            model, train_cfg, coords, block)
        targets = pad_targets(targets, k_total)
        states = to_flat(states)
    else:
        train_step = make_train_step(model, train_cfg)
        vstep = jax.vmap(lambda s, t: train_step(s, coords, t),
                         in_axes=(0, 0))
    states = jax.tree.map(shard_leaf, states)
    targets_d = shard_leaf(jnp.asarray(targets))

    if n_dev > 1:
        vstep = jax.shard_map(vstep, mesh=mesh,
                              in_specs=(P("data"), P("data")),
                              out_specs=P("data"), check_vma=False)

    @functools.partial(jax.jit, donate_argnums=(0,),
                       static_argnames=("length",))
    def run(states, targets, length):
        def body(s, _):
            s, (loss, lr) = vstep(s, targets)
            return s, loss
        return jax.lax.scan(body, states, None, length=length)

    chunk_sz = max(1, min(train_cfg.scan_chunk, train_cfg.total_steps))
    t0 = time.time()
    hists = []
    done = 0
    while done < train_cfg.total_steps:
        m = min(chunk_sz, train_cfg.total_steps - done)
        states, h = run(states, targets_d, length=m)
        hists.append(h)
        done += m
        if metrics is not None:
            last = np.asarray(h[-1])[:k]
            elapsed = time.time() - t0
            metrics.log({"event": "round", "step": done,
                         "loss": float(np.mean(last)),
                         "worst_chunk_loss": float(np.max(last)),
                         "elapsed_s": round(elapsed, 3),
                         "steps_per_sec": round(done / max(elapsed, 1e-9), 2)})
    jax.block_until_ready(states.params)
    # real device->host fetch: the axon tunnel's block_until_ready can
    # return before remote execution completes (see loop.py fit())
    np.asarray(jax.tree_util.tree_leaves(states.params)[0])
    train_time = time.time() - t0
    if block is not None:
        states = from_flat(states)
    hist = np.concatenate([np.asarray(h) for h in hists], axis=0)[:, :k]
    return MultiINRResult(states=states, chunk_scales=scales,
                          chunk_length=n, hop=hop, num_chunks=k,
                          signal_length=signal_length, loss_history=hist,
                          train_time_s=train_time)


def stitch_chunks(outs: np.ndarray, hop: int, length: int) -> np.ndarray:
    """Crossfade overlap-add of (k, n) chunk decodes -> (length,) waveform.
    Shared by ``multi_inr_decode`` and the codec's ``decode``."""
    k, n = outs.shape
    w = _crossfade_window(n, n - hop)
    total = (k - 1) * hop + n
    acc = np.zeros(total, dtype=np.float64)
    den = np.zeros(total, dtype=np.float64)
    for i in range(k):
        acc[i * hop: i * hop + n] += outs[i] * w
        den[i * hop: i * hop + n] += w
    return (acc / np.maximum(den, 1e-12)).astype(np.float32)[:length]


def chunk_eval_fn(model: INRModel, coords, fit_snr_db: float | None = None):
    """Jitted per-chunk dense eval over STACKED params -> (k, n, 1).

    Routes through the multi-chunk stacked kernel when the model carries
    one and the shape qualifies (``ops.pallas_siren.stacked_supported``:
    zero row padding + compact packed output vs vmapping the single-chunk
    kernel over ~670 row-padded instances); otherwise falls back to the
    vmapped apply.  ``fit_snr_db`` selects the quality-gated decode tier
    (``model.decode_apply``/``decode_apply_stacked``) exactly as the
    codec's decode does; None decodes through the plain ``apply``.

    ``coords`` stays HOST numpy: the vmap fallback closes over it inside
    jit, and a device-array capture embeds a device constant at lowering
    time (tests/test_lowering.py — the fetch can stall for minutes behind
    pending work on the tunneled backend)."""
    coords = np.asarray(coords, dtype=np.float32)
    use_tier = fit_snr_db is not None and model.decode_apply is not None
    stacked = (model.decode_apply_stacked if use_tier
               else model.apply_stacked)
    if stacked is not None:
        from ..ops.pallas_siren import stacked_supported
        if stacked_supported(model.config, coords.shape[0]):
            if use_tier:
                return lambda P: stacked(P, coords, fit_snr_db)
            return lambda P: stacked(P, coords)
    if use_tier:
        return jax.jit(jax.vmap(
            lambda p: model.decode_apply(p, coords, fit_snr_db)))
    return jax.jit(jax.vmap(lambda p: model.apply(p, coords)))


def batched_chunk_eval(fn, params, k: int,
                       max_chunks_per_batch: int | None) -> np.ndarray:
    """Evaluate a vmapped per-chunk ``fn`` over stacked params in
    fixed-size batches: the last batch pads by repeating row 0 so every
    batch reuses ONE compiled executable, and results accumulate on the
    host — device memory is bounded by the batch size.  ``None`` (or
    ``k <= batch``) evaluates in one shot.  Shared by ``multi_inr_decode``
    and the codec's ``decode``."""
    kb = max_chunks_per_batch
    if not kb or k <= kb:
        return np.asarray(fn(jax.tree.map(jnp.asarray, params)))
    host = jax.tree.map(np.asarray, params)
    pieces = []
    for start in range(0, k, kb):
        real = min(kb, k - start)
        sl = jax.tree.map(lambda x: x[start:start + real], host)
        if real < kb:
            sl = jax.tree.map(
                lambda x: np.concatenate(
                    [x, np.repeat(x[:1], kb - real, axis=0)], axis=0), sl)
        pieces.append(np.asarray(fn(jax.tree.map(jnp.asarray, sl)))[:real])
    return np.concatenate(pieces, axis=0)


def decode_chunk_range(fn, params, scales: np.ndarray, n: int, hop: int,
                       k: int, signal_length: int, start: int, stop: int,
                       max_chunks_per_batch: int | None = None) -> np.ndarray:
    """Random-access decode of samples ``[start, stop)``: evaluate ONLY the
    chunks whose windows overlap the range and stitch them locally.

    Work is O(stop - start), independent of clip length — an INR seeks in
    constant time where a frame-based codec must roll forward from the
    previous keyframe (the reference can only decode whole clips,
    run.py:249-296).  The selected chunk set ``[i_lo, i_hi]`` is exactly
    the covering set of every sample in the range, and ``stitch_chunks``
    accumulates the same contributions in the same order as the full
    decode, so the result equals ``full_decode[start:stop]`` up to ~1 ulp
    (XLA may vectorize the smaller vmapped eval batch differently).

    ``fn`` is a jitted vmapped per-chunk dense eval returning ``(k, n, 1)``;
    ``params`` the stacked per-chunk pytree (chunk axis 0).
    """
    start = int(max(0, min(start, signal_length)))
    stop = int(max(start, min(stop, signal_length)))
    if stop == start:
        return np.zeros((0,), np.float32)
    # smallest i with i*hop + n > start; largest i with i*hop < stop
    i_lo = max(0, (start - n) // hop + 1)
    i_hi = min(k - 1, (stop - 1) // hop)
    ksel = i_hi - i_lo + 1
    sel = jax.tree.map(lambda x: x[i_lo:i_hi + 1], params)
    outs = batched_chunk_eval(fn, sel, ksel, max_chunks_per_batch)
    outs = np.asarray(outs)[:ksel, :, 0] * scales[i_lo:i_hi + 1, None]
    local = stitch_chunks(outs, hop, stop - i_lo * hop)
    return local[start - i_lo * hop:]


def multi_inr_decode_range(model: INRModel, result: MultiINRResult,
                           start: int, stop: int,
                           track_best: bool = True,
                           max_chunks_per_batch: int | None = None
                           ) -> np.ndarray:
    """Decode only samples ``[start, stop)`` of the fitted clip — see
    ``decode_chunk_range`` (bit-identical to slicing the full decode)."""
    n = result.chunk_length
    coords = np.asarray(get_coord(n, dim=1), np.float32)  # host const
    params = (result.states.best_params if track_best
              else result.states.params)
    fn = chunk_eval_fn(model, coords)
    return decode_chunk_range(fn, params, result.chunk_scales, n,
                              result.hop, result.num_chunks,
                              result.signal_length, start, stop,
                              max_chunks_per_batch)


def multi_inr_decode(model: INRModel, result: MultiINRResult,
                     track_best: bool = True,
                     max_chunks_per_batch: int | None = None) -> np.ndarray:
    """Decode every chunk (one vmapped dense eval) and overlap-add with a
    crossfade window -> the stitched waveform at the training rate.

    ``max_chunks_per_batch`` evaluates the population in fixed-size padded
    batches (device memory bounded for long clips; same knob as
    ``multi_inr_fit``)."""
    n, hop, k = result.chunk_length, result.hop, result.num_chunks
    coords = np.asarray(get_coord(n, dim=1), np.float32)  # host const (see multi_inr_fit)
    params = (result.states.best_params if track_best
              else result.states.params)
    fn = chunk_eval_fn(model, coords)
    outs = batched_chunk_eval(fn, params, k, max_chunks_per_batch)
    outs = np.asarray(outs)[:k, :, 0] * result.chunk_scales[:, None]  # (k, n)
    return stitch_chunks(outs, hop, result.signal_length)
