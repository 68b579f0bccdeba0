"""Audio <-> INR codec: the end-user surface of "the weights ARE the audio".

The reference's whole premise is that an overfit network is a compressed
representation of one clip (README.md:1-3), but it never ships an actual
encode/decode pair — artifacts are experiment folders.  This module is that
pair, built on the framework's fastest path:

- ``encode``: split the clip into windows (multi-INR, train/multi_inr.py),
  fit every window simultaneously in one vmapped jitted scan, snapshot each
  window's best parameters, optionally quantize (float16 / bfloat16 / int8 / int4,
  models/quantize.py), and pack everything into a single file — the INRA
  container (per-leaf best-of lossless entropy coding, ``save_inr``) by
  default, legacy .npz on request.
- ``decode``: rebuild the model from the stored config, dense-evaluate every
  window (one vmapped forward), de-quantize + de-normalise, and stitch with
  the crossfade overlap-add.

The payload is self-describing: architecture + chunking metadata ride along,
so decode needs nothing but the file.  Compression ratio is reported against
16-bit PCM, the reference's implicit baseline format.
"""

from __future__ import annotations

import dataclasses
import json
import lzma
import zlib
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .data.coords import get_coord
from .models import (SirenSnakeTanhConfig, build_model,
                     dequantize_params, param_bytes, quantize_params)
from .train.loop import TrainConfig
from .train.multi_inr import (MultiINRConfig, batched_chunk_eval,
                              chunk_eval_fn,
                              chunk_signal, decode_chunk_range,
                              multi_inr_fit_many, stitch_chunks)
from .train.optim import AdamConfig, adam_init, adam_update

# v2: quantization is sensitivity-aware (layer-0 weights/biases stay
# float32) — v1 payloads (uniform leaf quantization) are NOT readable
_FORMAT = "inraudio_tpu.inr.v2"


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    """Encode-side knobs; the decoded side reads everything from the file."""

    chunk_seconds: float = 0.25
    overlap_fraction: float = 0.1
    hidden_features: int = 128
    num_sine: int = 2
    num_snake: int = 2
    first_omega_0: float = 1800.0
    hidden_omega_0: float = 30.0
    learning_rate: float = 7e-4   # matches the 0.25 s recipe scans
    grad_clip_norm: float = 1.0   # 0 = off; stops lone-chunk divergence
    total_steps: int = 3000
    # Plateau LR decay (ReduceLROnPlateau, reference run.py:171).  The r4
    # decode-fixed patience A/B (scripts/probe_patience.py,
    # bench_logs_r4/80_patience_ab_fixed.log) measured fast decay (35,
    # the bench headline setting) against the loop default (200) across
    # the RD operating points: 35 never wins (mid 57.9 vs 60.0 dB, comp
    # 30.4 vs 30.6, deep 25.0 vs 25.75; hi-fi fit 78.6 at 35 vs 84.9 at
    # 75) — the codec keeps 200 as the default and pins per-point values
    # in _RD_POINTS where a different patience calibrated better.
    plateau_patience: int = 200
    plateau_factor: float = 0.8
    quantize: str | None = "float16"   # None | float16 | bfloat16 | int8 | int16 | int4
    # int modes: one scale per (chunk, output unit) instead of per chunk —
    # k*h extra float32 scales for a much tighter grid (int4 needs this to
    # stay audible; see BASELINE.md rate-distortion table)
    per_row_scales: bool = False
    # Store the layers-1+ side leaves (biases, snake a) as fp16 — ~20% of
    # an h=32 int8 payload halved for <=0.03 dB at the <=44 dB calibration
    # points, but -2.75 dB on a ~96 dB fit (r4 restamp) — 'auto' (default)
    # ships fp16 sides only when the estimated fit SNR is below ~70 dB;
    # True/False force the pre-r4 behaviors.
    side_quantize: bool | str = "auto"
    fused: bool = False                # Pallas path (TPU only)
    seed: int = 0
    # Quantization-aware refit: after quantizing the hidden/last weight
    # matrices, fine-tune the REMAINING float32 leaves (layer-0 weights,
    # every bias, snake a) against the chunks with the quantized weights
    # frozen at their dequantized values — the float32 leaves absorb part
    # of the quantization error.  0 = off.
    refit_steps: int = 0
    refit_lr: float = 1e-4
    # Bound device memory for long inputs: train/decode the chunk
    # population in fixed-size batches (None = whole population at once;
    # past ~4 min of 44.1 kHz the unbatched states exceed one 16 GB chip).
    max_chunks_per_batch: int | None = None


# Measured rate-distortion frontier on gt_bach.wav (44.1 kHz; BASELINE.md
# codec table + r3 frontier scan, scripts/bench_codec_rd.py): on-disk
# bits/sample -> the knobs that won that operating point.  int8 at reduced
# width strictly dominates int4 at larger width on the 2-4.5 bps frontier.
# Every knob the measurements depended on is pinned explicitly, so a
# target-bps encode reproduces the calibrated point regardless of what
# other flags/base config say (only the training budget, fused/seed, and
# memory bound pass through).
_RD_CAL = dict(overlap_fraction=0.1, first_omega_0=1800.0,
               learning_rate=7e-4, per_row_scales=False, refit_steps=0)
# (bits/sample on disk, calibrated SNR dB on gt_bach.wav, knobs)
# r4 recalibration, post decode-fix (commit 1224932: the one-pass bf16
# XLA decode had capped every reading near 58 dB — rows at/above the mid
# point were understated): bench_logs_r4/80_patience_ab_fixed.log,
# 82_hifi_ultra_cal.log, 83_restamp_old_payloads.log, 84_int16row.log.
# All rates are INRA-container on-disk figures.  Weight-tier rules:
# fp16 below its ~76 dB cap (int16 codes 7-14% bigger at equal SNR
# there); int16 per-row reaches ~80.6 and is resolution-bound (per-row
# scales and QA refit do NOT lift it — refit measured -9.5 dB at hi-fi);
# above ~80 dB the weights ship float32.  Hi-fi/ultra points pin the
# plateau patience that calibrated them (0.1 s chunks want 200, 0.05 s
# want 75 — shorter chunks converge faster, so faster decay wins).
_RD_POINTS: tuple[tuple[float, float, dict[str, Any]], ...] = (
    (1.88, 19.2, dict(_RD_CAL, chunk_seconds=0.5, hidden_features=32,
                      quantize="int8", refit_steps=400)),
    (2.32, 22.3, dict(_RD_CAL, chunk_seconds=0.5, hidden_features=36,
                      quantize="int8", refit_steps=400)),
    (2.82, 25.75, dict(_RD_CAL, chunk_seconds=0.5, hidden_features=40,
                       quantize="int8", refit_steps=400)),
    (3.98, 30.6, dict(_RD_CAL, chunk_seconds=0.5, hidden_features=48,
                      quantize="int8")),
    (6.91, 32.1, dict(_RD_CAL, chunk_seconds=0.5, hidden_features=48,
                      quantize="float16")),
    (50.9, 46.3, dict(_RD_CAL, chunk_seconds=0.25, hidden_features=128,
                      quantize="int8")),
    (90.2, 60.0, dict(_RD_CAL, chunk_seconds=0.25, hidden_features=128,
                      quantize="float16")),
    (230.6, 80.0, dict(_RD_CAL, chunk_seconds=0.1, hidden_features=128,
                       first_omega_0=1000.0, learning_rate=1e-3,
                       quantize="float16")),
    (268.9, 80.6, dict(_RD_CAL, chunk_seconds=0.1, hidden_features=128,
                       first_omega_0=1000.0, learning_rate=1e-3,
                       quantize="int16", per_row_scales=True)),
    (452.9, 100.2, dict(_RD_CAL, chunk_seconds=0.1, hidden_features=128,
                        first_omega_0=1000.0, learning_rate=1e-3,
                        quantize=None)),
    (903.7, 114.4, dict(_RD_CAL, chunk_seconds=0.05, hidden_features=128,
                        first_omega_0=500.0, learning_rate=1e-3,
                        quantize=None, plateau_patience=75)),
)


def config_for_bitrate(target_bits_per_sample: float,
                       base: CodecConfig | None = None) -> CodecConfig:
    """Pick the measured operating point with the highest SNR whose
    bits/sample fits the target (the cheapest point if none fits).

    The frontier was calibrated on 44.1 kHz material (BASELINE.md
    rate-distortion table); bits/sample scales inversely with the sample
    rate at fixed ``chunk_seconds``, so treat the target as approximate
    for other rates.  ``base`` carries every knob the table doesn't set
    (fused, seed, max_chunks_per_batch, ...).

    Per-chunk points only; ``plan_for_bitrate`` additionally considers the
    shared-backbone modulated mode, which dominates parts of the frontier
    once the backbone amortises over the clip.
    """
    base = base or CodecConfig()
    chosen = _RD_POINTS[0][2]
    for bps, _snr, knobs in _RD_POINTS:
        if bps <= target_bits_per_sample * 1.05:
            chosen = knobs
    return dataclasses.replace(base, **chosen)


# Modulated operating points for target-bps planning.  Unlike the
# per-chunk table, a modulated point's bits/sample DEPENDS ON CLIP LENGTH
# (the backbone amortises), so entries store knobs + the SNR calibrated on
# gt_bach.wav and ``estimate_modulated_bps`` prices each candidate at the
# actual clip length at plan time.  ``snr_db=None`` = not yet calibrated
# on TPU (excluded from selection); values are stamped from
# scripts/bench_modulated.py runs.
_MOD_RD_CAL = dict(chunk_seconds=0.05, overlap_fraction=0.1,
                   first_omega_0=500.0, learning_rate=1e-3,
                   mods_lr_mult=5.0)
_MOD_RD_POINTS: tuple[tuple[str, float | None, dict[str, Any]], ...] = (
    # low-rate: whole-clip backbone, int8 mods + QA backbone refit.
    # r4 TPU calibration (bench_logs_r4/20_mod_table_lowrate.log, 3000
    # steps, gt_bach 7 s): h48 = 15.4 dB @ 1.44 disk bps — the only
    # operating point below the per-chunk frontier's 1.88 bps floor
    # (ultra-low-rate targets land here); h64 = 19.1 dB @ 2.08 bps, which
    # per-chunk h32+refit (19.2 @ 1.88) narrowly dominates.
    ("mod_h48_i8", 15.4, dict(_MOD_RD_CAL, hidden_features=48,
                              quantize_mods="int8",
                              refit_backbone_steps=400)),
    ("mod_h64_i8", 19.1, dict(_MOD_RD_CAL, hidden_features=64,
                              quantize_mods="int8",
                              refit_backbone_steps=400)),
    # mid/hi-fi: 1 s segmented backbones, int16 mods (the tier that
    # removes fp16's ~76 dB cap at identical bytes).  r4 TPU calibration
    # (bench_logs_r4/08_modulated_i16.log, 3000 steps, gt_bach 7 s):
    # h96 = 31.6 dB @ 15.5 disk bps, h128 = 40.8 dB @ 25.7 (decode-fix
    # restamps, bench_logs_r4/83_restamp_old_payloads.log) — at THIS clip
    # length and step budget the segmented mode TIES the per-chunk
    # frontier rather than beating it (per-chunk fp16 h128 0.25 s
    # interpolates to ~40 dB at 26 bps); its advantage needs longer clips
    # where the backbone amortises.
    ("mod_seg1_h96_i16", 31.6, dict(_MOD_RD_CAL, hidden_features=96,
                                    segment_s=1.0, quantize_mods="int16")),
    ("mod_seg1_h128_i16", 40.8, dict(_MOD_RD_CAL, hidden_features=128,
                                     segment_s=1.0, quantize_mods="int16")),
)

# r5 minute-scale calibration (scripts/bench_minute_rd.py, 60 s tiled
# gt_bach, 3000 steps, bench_logs_r5/03_minute_low.log + 04_minute_mid.log):
#   - whole-clip-backbone points amortise (h64: 2.08 -> 1.26 disk bps) but
#     LOSE quality as one backbone spans more content (19.1 -> 16.77 dB) —
#     they still own the frontier below per-chunk's 1.88 bps floor, which
#     no per-chunk config reaches at any length;
#   - 5 s-segment mid-rate points are a measured NEGATIVE: seg5_h128
#     21.6 dB @ 9.0 bps vs per-chunk 0.5 s h48 fp16 31.6 dB @ 6.6 bps —
#     capacity per content-second binds (the r3 rule), so segments must
#     stay ~1 s, where bits/sample no longer amortises.  Mid-rate minute
#     encodes belong to the per-chunk codec.
# Planner consequence: at long clips the whole-clip points' 7 s SNR
# calibrations are replaced by the 60 s measurement (or derated by its
# measured delta when unmeasured).
_MOD_LONG_CLIP_S = 20.0
_MOD_SNR_60S = {"mod_h64_i8": 16.77}
_MOD_LONG_DERATE_DB = 19.1 - 16.77   # measured h64 7 s -> 60 s delta


def estimate_modulated_bps(cfg: ModulatedCodecConfig, n_samples: int,
                           sample_rate: int, channels: int = 1) -> float:
    """Exact in-memory bits/sample a ``encode_modulated`` payload of this
    shape will occupy (the INRA container then shaves a further ~6-15% on
    disk, BASELINE.md storage-layer findings).  Pure arithmetic — mirrors
    the payload layout (mods + per-column scales + stored backbones +
    chunk scales) without touching a device, so target-bps planning can
    price duration-dependent modulated candidates for free."""
    from .models.modulated import mod_dim as _mod_dim

    n = int(round(cfg.chunk_seconds * sample_rate))
    hop = max(n - int(round(cfg.overlap_fraction * n)), 1)
    k = max(1, int(np.ceil(max(n_samples - n, 0) / hop)) + 1)
    kc = k * channels
    model_cfg = SirenSnakeTanhConfig(
        hidden_features=cfg.hidden_features, num_sine=cfg.num_sine,
        num_snake=cfg.num_snake)
    md = _mod_dim(model_cfg, cfg.film_scale)
    quant = cfg.quantize_mods
    if quant is None:
        mods_b = kc * md * 4
    elif quant == "int8":
        mods_b = kc * md * 1 + md * 4          # per-column f32 scales
    else:  # float16 / int16 / auto — all 2 bytes/value at this grain
        mods_b = kc * md * 2 + (md * 4 if quant in ("int16", "auto") else 0)
    if cfg.segment_s is None:
        n_seg = 1
    else:
        n_seg = max(1, min(k, int(np.ceil(
            n_samples / (cfg.segment_s * sample_rate)))))
    h = cfg.hidden_features
    kinds = model_cfg.layer_kinds
    bb = 0
    for li, kind in enumerate(kinds):
        in_f = model_cfg.in_features if li == 0 else h
        out_f = model_cfg.out_features if li == len(kinds) - 1 else h
        vals = in_f * out_f + out_f + (out_f if kind == "linear_snake" else 0)
        # _store_shared: layer 0 stays float32 (omega0-amplified), the
        # rest ship fp16 when shared_fp16
        bb += vals * (4 if (li == 0 or not cfg.shared_fp16) else 2)
    total = mods_b + n_seg * bb + kc * 4       # + per-chunk peak scales
    return 8.0 * total / (n_samples * channels)


def plan_for_bitrate(target_bits_per_sample: float, n_samples: int,
                     sample_rate: int, channels: int = 1,
                     base: CodecConfig | None = None,
                     mod_base: ModulatedCodecConfig | None = None,
                     _mod_points=None
                     ) -> tuple[str, CodecConfig | ModulatedCodecConfig]:
    """Pick the best calibrated operating point — per-chunk OR modulated —
    for a target on-disk bits/sample: the highest-SNR candidate that fits
    the target (the cheapest candidate overall if none fits).

    -> ("per_chunk", CodecConfig) or ("modulated", ModulatedCodecConfig).

    Per-chunk candidates carry their calibrated on-disk bps (duration-
    independent: payload scales with the clip); modulated candidates are
    priced at THIS clip's length via ``estimate_modulated_bps`` (scaled by
    the ~0.93 in-memory -> INRA-on-disk factor measured on modulated
    payloads) because the backbone amortises.  SNR calibrations are
    gt_bach.wav (7 s, 44.1 kHz) measurements; uncalibrated modulated
    entries (snr_db None) never get selected.  ``base``/``mod_base`` carry
    the knobs the tables don't pin (fused, seed, max_chunks_per_batch...).
    """
    base = base or CodecConfig()
    mod_base = mod_base or ModulatedCodecConfig()
    # (snr, fits_target, bps, kind, cfg)
    cands: list[tuple[float, float, str, Any]] = []
    for bps, snr, knobs in _RD_POINTS:
        cands.append((snr, bps, "per_chunk",
                      dataclasses.replace(base, **knobs)))
    long_clip = n_samples > _MOD_LONG_CLIP_S * sample_rate
    for _name, snr, knobs in (_MOD_RD_POINTS if _mod_points is None
                              else _mod_points):
        if snr is None:
            continue
        if long_clip and knobs.get("segment_s") is None:
            # whole-clip backbone spanning more content than it was
            # calibrated on: use the 60 s measurement where it exists,
            # else derate by its measured delta (r5 minute-scale rows)
            snr = _MOD_SNR_60S.get(_name, snr - _MOD_LONG_DERATE_DB)
        mcfg = dataclasses.replace(mod_base, **knobs)
        bps = 0.93 * estimate_modulated_bps(mcfg, n_samples, sample_rate,
                                            channels)
        cands.append((snr, bps, "modulated", mcfg))
    fitting = [c for c in cands
               if c[1] <= target_bits_per_sample * 1.05]
    if fitting:
        snr, _bps, kind, cfg = max(fitting, key=lambda c: c[0])
    else:
        snr, _bps, kind, cfg = min(cands, key=lambda c: c[1])
    return kind, cfg


# Side leaves (layers-1+ biases, snake a) ship as fp16 for every quantize
# mode: measured exactly free (<=0.03 dB) at 15/19/28/44 dB operating
# points, while int8 sides — cheap at <=19 dB (-0.03) — cost 3.4 dB at a
# 44 dB point (tests/test_codec.py::test_side_quantization_snr_parity's
# config).  fp16 halves the ~20% float32 side share of an h=32 payload.
# side_quantize='auto' threshold: fp16 sides measured free (<=0.03 dB) at
# <=44 dB fits and -2.75 dB at ~96 dB; the region between is unmeasured,
# so gate at 70 (the mid operating point, est fit ~60-65, keeps them).
_SIDE_AUTO_DB = 70.0

_SIDE_MODE = {"float16": "float16", "bfloat16": "bfloat16",
              "int8": "float16", "int16": "float16", "int4": "float16"}


def quantize_inr_params(params: Any, mode: str,
                        per_row: bool = False,
                        side: bool = True) -> Any:
    """Sensitivity-aware quantization of (stacked) SirenWithSnakeTanh params.

    The FIRST layer sits inside ``sin(omega0 * (Wx + b))`` with omega0
    ~10^2-10^4, so BOTH its weights and bias are amplified — fp16's ~5e-4
    relative error becomes an O(0.1 rad) phase error there and destroys
    the reconstruction (measured: 27 dB vs 98 dB on the same fit for the
    weights; casting the whole of layer 0 costs ~9 dB even at a ~19 dB
    operating point).  Layer 0 therefore stays float32 end to end.

    Hidden/last weight matrices quantize at ``mode`` with per-chunk
    scales.  ``side=True`` (default) additionally stores the layers-1+
    SIDE leaves (biases, snake ``a``) at the conservative ``_SIDE_MODE``
    tier (fp16): hidden pre-activations see only omega_hidden ~30, so fp16
    sides are exact to the measurement at 15-44 dB operating points —
    while the float32 side share is ~20% of an h=32 int8 payload (int8
    sides were tried and rejected: free at <=19 dB but -3.4 dB at 44 dB).
    ``side=False`` reproduces the legacy layout (how ``load_inr`` rebuilds
    templates for payloads without the ``side_quantized`` header key).
    """
    out_layers = []
    for li, layer in enumerate(params["layers"]):
        new = dict(layer)
        if li > 0:
            new["w"] = quantize_params(layer["w"], mode,
                                       per_leading_axis=True,
                                       per_row=per_row)
        out_layers.append(new)
    out = {"layers": out_layers}
    return _quantize_sides(out, mode) if side else out


def _quantize_sides(params: Any, mode: str) -> Any:
    """Quantize the layers-1+ SIDE leaves (non-``w``, not already
    quantized) at the conservative ``_SIDE_MODE`` tier."""
    out_layers = []
    for li, layer in enumerate(params["layers"]):
        new = dict(layer)
        if li > 0:
            for k, v in layer.items():
                if k != "w" and not isinstance(v, dict):
                    new[k] = quantize_params(v, _SIDE_MODE[mode],
                                             per_leading_axis=True)
        out_layers.append(new)
    return {"layers": out_layers}


def dequantize_inr_params(params: Any) -> Any:
    """Inverse of ``quantize_inr_params`` -> float32 leaves."""
    return dequantize_params(params)


def _refit_trainable(model, params: Any, mode: str, targets: np.ndarray,
                     coords: np.ndarray, steps: int, lr: float,
                     per_row: bool = False) -> Any:
    """Core of the quantization-aware refit: fine-tune the float32 leaves
    around FROZEN dequantized weight matrices; returns the refitted
    trainable pytree (plain float arrays, leading chunk axis)."""
    q = quantize_inr_params(params, mode, per_row=per_row)
    dq = dequantize_inr_params(q)
    n_layers = len(dq["layers"])
    # frozen weights / data enter jit as ARGUMENTS: closed-over device arrays
    # become MLIR constants fetched device->host at lowering (slow on the axon
    # tunnel), and frozen_ws alone is ~100 MB at production shapes — far too
    # big to embed in the lowered module.
    frozen_ws = tuple(jnp.asarray(dq["layers"][li]["w"])
                      for li in range(1, n_layers))
    trainable = {"layers": [
        {k: jnp.asarray(v) for k, v in layer.items()
         if not (li > 0 and k == "w")}
        for li, layer in enumerate(dq["layers"])]}

    def merge(tr, frozen):
        layers = []
        for li, layer in enumerate(tr["layers"]):
            full = dict(layer)
            if li > 0:
                full["w"] = frozen[li - 1]
            layers.append(full)
        return {"layers": layers}

    adam_cfg = AdamConfig(lr=lr)
    opt = adam_init(trainable, adam_cfg)

    @jax.jit
    def run(tr, opt, frozen, coords_j, targets_j):
        def step(carry, _):
            tr, opt = carry

            def loss_fn(tr):
                full = merge(tr, frozen)
                pred = jax.vmap(model.apply, in_axes=(0, None))(full,
                                                                coords_j)
                return jnp.mean((pred - targets_j) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(tr)
            tr, opt = adam_update(opt, grads, tr, adam_cfg)
            return (tr, opt), loss
        (tr, opt), losses = jax.lax.scan(step, (tr, opt), None,
                                         length=steps)
        return tr, losses
    trainable, _ = run(trainable, opt, frozen_ws, jnp.asarray(coords),
                       jnp.asarray(targets))
    return jax.tree.map(np.asarray, trainable)


def quantization_aware_refit(model, params: Any, mode: str,
                             targets: np.ndarray, coords: np.ndarray,
                             steps: int, lr: float = 1e-4,
                             max_chunks_per_batch: int | None = None,
                             per_row: bool = False,
                             side: bool = True) -> Any:
    """Refit the float32 leaves around frozen quantized weights.

    ``params`` is the stacked (k, ...) float32 best-params pytree;
    ``targets`` the (k, n, 1) normalised chunk targets it was fit to.  The
    hidden/last weight matrices are quantized (``mode``) and FROZEN at the
    values the decoder will reconstruct; the remaining float32 leaves
    (layer-0 weights, biases, snake a — the ~1% byte share that ships
    unquantized) are fine-tuned so they absorb part of the quantization
    error.  Returns the stored-form pytree (quantized weight dicts +
    refitted float32 leaves), same structure ``load_inr`` expects.

    ``max_chunks_per_batch`` refits in fixed-size batches (chunks are
    independent, and the per-chunk quantization scales make a slice's
    frozen weights identical to the full population's) — the same
    device-memory bound the encode-side fit honors.
    """
    params = jax.tree.map(np.asarray, params)
    targets = np.asarray(targets)
    k = targets.shape[0]
    kb = max_chunks_per_batch
    if kb and k > kb:
        parts = []
        for start in range(0, k, kb):
            real = min(kb, k - start)
            sl_p = jax.tree.map(lambda x: x[start:start + real], params)
            sl_t = targets[start:start + real]
            if real < kb:  # repeat row 0: one executable for every batch
                pad = (lambda x: np.concatenate(
                    [x, np.repeat(x[:1], kb - real, axis=0)], axis=0))
                sl_p = jax.tree.map(pad, sl_p)
                sl_t = pad(sl_t)
            part = _refit_trainable(model, sl_p, mode, sl_t, coords,
                                    steps, lr, per_row=per_row)
            parts.append(jax.tree.map(lambda x: x[:real], part))
        trainable = jax.tree.map(
            lambda *xs: np.concatenate(xs, axis=0), *parts)
    else:
        trainable = _refit_trainable(model, params, mode, targets, coords,
                                     steps, lr, per_row=per_row)

    q = quantize_inr_params(params, mode, per_row=per_row, side=False)
    stored_layers = []
    for li in range(len(q["layers"])):
        new = {kk: np.asarray(v)
               for kk, v in trainable["layers"][li].items()}
        if li > 0:
            new["w"] = q["layers"][li]["w"]
        stored_layers.append(new)
    # the refitted side leaves ship at the same conservative fp16 tier as
    # a non-refit payload (the refit's absorption survives the cast — fp16
    # sides are exact to the measurement at 15-44 dB points)
    stored = {"layers": stored_layers}
    return _quantize_sides(stored, mode) if side else stored


def encode(signal: np.ndarray, sample_rate: int,
           cfg: CodecConfig | None = None) -> dict[str, Any]:
    """Fit the multi-INR and return the codec payload (in-memory dict).

    ``signal`` is (n,) mono or (n, c) multichannel: every channel's chunks
    join ONE vmapped population (the chunk axis is a batch axis on the
    MXU — stereo costs one launch, not two; the reference drops all but
    one channel, utils.py:113-115).

    Keys: 'meta' (json-able header), 'scales' (c*k,), and per-leaf arrays
    of the stacked per-chunk parameter pytree (quantized if requested),
    chunk axis ordered channel-major: chunk i of channel j at row j*k+i.
    """
    cfg = cfg or CodecConfig()
    model_cfg = SirenSnakeTanhConfig(
        hidden_features=cfg.hidden_features, num_sine=cfg.num_sine,
        num_snake=cfg.num_snake, first_omega_0=cfg.first_omega_0,
        hidden_omega_0=cfg.hidden_omega_0)
    model = build_model("mlp", model_cfg, fused=cfg.fused,
                        approx_sin=cfg.fused)
    chans = _split_channels(signal)
    mcfg = MultiINRConfig(chunk_seconds=cfg.chunk_seconds,
                          overlap_fraction=cfg.overlap_fraction)
    results = multi_inr_fit_many(
        model, chans, sample_rate, mcfg,
        TrainConfig(total_steps=cfg.total_steps,
                    learning_rate=cfg.learning_rate,
                    grad_clip_norm=cfg.grad_clip_norm,
                    plateau_patience=cfg.plateau_patience,
                    plateau_factor=cfg.plateau_factor),
        key=jax.random.PRNGKey(cfg.seed),
        max_chunks_per_batch=cfg.max_chunks_per_batch)
    res = results[0]

    # best params, channel-major chunk stack, real chunks only
    per_ch = [jax.tree.map(lambda x: np.asarray(x)[: r.num_chunks],
                           jax.device_get(r.states.best_params))
              for r in results]
    params = (per_ch[0] if len(per_ch) == 1 else
              jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *per_ch))
    scales = np.concatenate(
        [r.chunk_scales[: r.num_chunks] for r in results])

    # Estimate the fit SNR from the per-chunk best train losses (the best
    # snapshot is what ships): unnormalized mse = best_loss * scale^2.
    # Used by the side-quantize gate below and stored in the header so
    # decode can pick a quality-gated fused tier without touching audio.
    best_mses = np.concatenate(
        [np.min(np.asarray(r.loss_history), axis=0)[: r.num_chunks]
         for r in results]) if results[0].loss_history.size else None
    fit_snr = None
    if best_mses is not None and best_mses.shape == scales.shape:
        pw = float(np.mean(np.concatenate(
            [np.asarray(c, np.float32).reshape(-1) ** 2 for c in chans])))
        mse = float(np.mean(best_mses * scales.astype(np.float64) ** 2))
        fit_snr = round(10.0 * np.log10(max(pw, 1e-30) / max(mse, 1e-30)), 2)

    # Quality-gated fp16 side leaves: free (<=0.03 dB) at the <=44 dB
    # calibration points, but at hi-fi fits the bias rounding binds —
    # measured -2.75 dB on a ~96 dB fp16-weight fit
    # (bench_logs_r4/83_restamp_old_payloads.log: side0 80.03 vs side1
    # 77.28).  'auto' ships fp16 sides only below the gate; an UNKNOWN
    # fit SNR (empty loss history) defaults to float32 sides — they cost
    # only payload size, never quality.
    side = (cfg.side_quantize if isinstance(cfg.side_quantize, bool)
            else fit_snr is not None and fit_snr < _SIDE_AUTO_DB)
    if cfg.quantize and cfg.refit_steps > 0:
        n = res.chunk_length
        chunks = np.concatenate(
            [chunk_signal(ch, sample_rate, mcfg)[0] for ch in chans], axis=0)
        targets = (chunks / scales[:, None])[..., None]
        stored = quantization_aware_refit(
            model, params, cfg.quantize, targets,
            np.asarray(get_coord(n, dim=1)), cfg.refit_steps, cfg.refit_lr,
            max_chunks_per_batch=cfg.max_chunks_per_batch,
            per_row=cfg.per_row_scales, side=side)
    elif cfg.quantize:
        stored = quantize_inr_params(params, cfg.quantize,
                                     per_row=cfg.per_row_scales,
                                     side=side)
    else:
        stored = params

    meta = {
        "format": _FORMAT,
        "sample_rate": int(sample_rate),
        "signal_length": int(res.signal_length),
        "chunk_length": int(res.chunk_length),
        "hop": int(res.hop),
        "num_chunks": int(res.num_chunks),
        "num_channels": len(chans),
        "quantize": cfg.quantize,
        "per_row_scales": bool(cfg.per_row_scales),
        "side_quantized": bool(cfg.quantize and side),
        # decode-side routing: which forward semantics trained the params
        # (the fused kernel's bf16x3 matmuls + polynomial sin, or the XLA
        # exact apply) and the estimated fit SNR for the decode-tier gate
        "trained_forward": "fused_approx" if cfg.fused else "exact",
        **({"fit_snr_db": fit_snr} if fit_snr is not None else {}),
        "model": {
            "hidden_features": cfg.hidden_features,
            "num_sine": cfg.num_sine, "num_snake": cfg.num_snake,
            "first_omega_0": cfg.first_omega_0,
            "hidden_omega_0": cfg.hidden_omega_0,
        },
    }
    return {"meta": meta, "scales": scales.astype(np.float32),
            "params": stored}


def decode(payload: dict[str, Any], fused: bool | None = None,
           upsample: int = 1,
           max_chunks_per_batch: int | None = None) -> tuple[int, np.ndarray]:
    """Payload -> (sample_rate, waveform). Inverse of ``encode``.

    ``fused=None`` (auto) decodes fused-trained payloads through the
    Pallas kernel on TPU, quality-gated by the header's ``fit_snr_db``
    (auto_decode_kwargs tier); pass True/False to force a path.

    ``upsample`` > 1 evaluates every chunk's INR on a grid that many times
    denser — bandwidth-extension decode straight from the compressed
    payload (the INR is continuous; this is the codec-side analogue of the
    runner's ``bwe`` flag, reference run.py:131,251-253).  Returns the
    upsampled rate.  ``max_chunks_per_batch`` bounds device memory for
    long clips (same knob as ``multi_inr_fit``).
    """
    if payload["meta"].get("codec") == "modulated":
        meta = payload["meta"]
        _check_format(meta)
        u = max(1, int(upsample))
        coords = _decode_grid(meta["chunk_length"], u)
        fn, mods = _cached_eval(payload, ("modulated", u),
                                lambda: _modulated_decode_fn(payload, coords))
        return _stitch_payload(payload, fn, mods, upsample,
                               max_chunks_per_batch)
    meta, model, params = _payload_model_params(payload, fused)
    u = max(1, int(upsample))
    coords = _decode_grid(meta["chunk_length"], u)
    fit = _routing_fit_snr(meta)
    fn = _cached_eval(payload, _eval_key(meta, model.name, u, fit),
                      lambda: chunk_eval_fn(model, coords, fit))
    return _stitch_payload(payload, fn, params, upsample,
                           max_chunks_per_batch)


def decode_many(payloads: list[dict[str, Any]], fused: bool | None = None,
                upsample: int = 1,
                max_chunks_per_batch: int | None = None
                ) -> list[tuple[int, np.ndarray]]:
    """Decode SEVERAL payloads, batching compatible ones into one device
    dispatch -> list of (sample_rate, waveform) in input order.

    Why: the stitched decode of one clip is transport-bound on dispatch
    overhead, not kernel time (BASELINE.md r5: ~1.78 ms fixed per call vs
    a ~223 Msamples/s marginal kernel rate — at one 7 s clip per call the
    wall ceiling is ~193 Msamples/s).  Serving N clips per call moves the
    operating point up the samples-per-dispatch curve: payloads whose
    decode compiles identically (same model recipe, chunk length, and
    quality-gated tier) have their chunk populations CONCATENATED into a
    single stacked eval, so N clips cost one dispatch instead of N.

    Incompatible payloads (different recipes/tiers, modulated codec)
    fall back to per-payload ``decode`` — the result is always identical
    to calling ``decode`` on each payload.
    """
    from .ops.pallas_siren import auto_decode_kwargs

    results: list[tuple[int, np.ndarray] | None] = [None] * len(payloads)
    groups: dict[Any, list[tuple[int, dict, Any, Any, float | None]]] = {}
    for i, p in enumerate(payloads):
        if p["meta"].get("codec") == "modulated":
            results[i] = decode(p, fused, upsample, max_chunks_per_batch)
            continue
        meta, model, params = _payload_model_params(p, fused)
        fit = _routing_fit_snr(meta)
        # group key = everything that shapes the compiled eval: the model
        # recipe, the per-chunk grid, and the RESOLVED decode tier (two
        # fits that land on the same tier share an executable)
        if model.decode_apply is not None and fit is not None:
            tier = repr(sorted(auto_decode_kwargs(
                fit, first_omega_0=meta["model"].get("first_omega_0")
            ).items(), key=str))
        else:
            tier = "plain"
        key = (tuple(sorted(meta["model"].items())), meta["chunk_length"],
               model.name, tier)
        groups.setdefault(key, []).append((i, p, model, params, fit))

    for items in groups.values():
        i0, p0, model0, _, fit0 = items[0]
        meta0 = p0["meta"]
        u = max(1, int(upsample))
        coords = _decode_grid(meta0["chunk_length"], u)
        fn = _cached_eval(p0, _eval_key(meta0, model0.name, u, fit0),
                          lambda: chunk_eval_fn(model0, coords, fit0))
        cks = [int(p["meta"].get("num_channels", 1)) * p["meta"]["num_chunks"]
               for _, p, _, _, _ in items]
        cat = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0),
                           *[params for _, _, _, params, _ in items])
        outs = np.asarray(batched_chunk_eval(fn, cat, sum(cks),
                                             max_chunks_per_batch))
        off = 0
        for (i, p, _, _, _), ck in zip(items, cks):
            results[i] = _stitch_outs(p, outs[off:off + ck], upsample)
            off += ck
    return results  # type: ignore[return-value]


# The header's fit_snr_db is an ESTIMATE from per-chunk best train losses:
# it ignores crossfade stitching (decorrelated chunk errors average down in
# the overlaps, so the true reconstruction usually sits ABOVE the estimate)
# and is test-bounded to +-6 dB of the measured value
# (tests/test_codec.py::test_meta_trained_forward_and_fit_snr).  Tier
# routing must be safe against the underestimate direction — a fit 6 dB
# better than its header could otherwise land on a tier whose floor sits
# at its true quality — so routing inflates the estimate by the bound
# before applying auto_decode_kwargs' own margin (ADVICE r4).
_FIT_EST_SLACK_DB = 6.0


def _routing_fit_snr(meta: dict[str, Any]) -> float | None:
    fit = meta.get("fit_snr_db")
    return None if fit is None else float(fit) + _FIT_EST_SLACK_DB


def _decode_grid(n0: int, u: int) -> np.ndarray:
    """Per-chunk decode grid as a HOST constant; ``u`` > 1 subdivides the
    TRAINING grid (step 2/(n0-1)) u times so every u-th decode sample sits
    exactly on a training coordinate — ``get_coord(n0*u)`` would
    time-stretch each chunk by u*(n0-1)/(n0*u-1) and add phase mismatch in
    the crossfade overlaps."""
    if u == 1:
        return np.asarray(get_coord(n0, dim=1), np.float32)
    j = np.arange(n0 * u, dtype=np.float64)
    return (-1.0 + 2.0 * j / (u * (n0 - 1)))[:, None].astype(np.float32)


def _stitch_outs(payload: dict[str, Any], outs: np.ndarray, upsample: int
                 ) -> tuple[int, np.ndarray]:
    """Scale + overlap-add one payload's raw (c*k, n, 1) chunk evals."""
    meta = payload["meta"]
    u = max(1, int(upsample))
    hop = meta["hop"] * u
    c = int(meta.get("num_channels", 1))
    k = meta["num_chunks"]
    outs = np.asarray(outs)[:, :, 0] * payload["scales"][:, None]
    length = meta["signal_length"] * u
    if c == 1:
        return meta["sample_rate"] * u, stitch_chunks(outs, hop, length)
    wav = np.stack([stitch_chunks(outs[j * k:(j + 1) * k], hop, length)
                    for j in range(c)], axis=1)
    return meta["sample_rate"] * u, wav


def _stitch_payload(payload: dict[str, Any], fn, params, upsample: int,
                    max_chunks_per_batch: int | None
                    ) -> tuple[int, np.ndarray]:
    """Evaluate every chunk with ``fn`` and overlap-add per channel —
    shared by the per-chunk-params and modulated decode paths."""
    meta = payload["meta"]
    ck = int(meta.get("num_channels", 1)) * meta["num_chunks"]
    outs = batched_chunk_eval(fn, params, ck, max_chunks_per_batch)
    return _stitch_outs(payload, outs, upsample)


@dataclasses.dataclass(frozen=True)
class ModulatedCodecConfig:
    """Shared-backbone codec mode (COIN++-class): ONE SirenSnakeTanh
    backbone for the whole clip + a tiny per-chunk modulation vector
    (``models/modulated.py``).  Per-chunk storage is ``mod_dim = hidden *
    (layers-1)`` floats instead of a full parameter set, so the backbone
    amortises and bits/sample falls with clip length."""

    chunk_seconds: float = 0.05
    overlap_fraction: float = 0.1
    hidden_features: int = 64
    num_sine: int = 2
    num_snake: int = 2
    first_omega_0: float = 500.0
    hidden_omega_0: float = 30.0
    learning_rate: float = 1e-3
    grad_clip_norm: float = 1.0
    total_steps: int = 3000
    # Plateau decay knobs (see CodecConfig).  The _MOD_POINTS calibration
    # table was measured at the loop default (200); keep that default here
    # until a recalibration sweep says otherwise.
    plateau_patience: int = 200
    plateau_factor: float = 0.8
    # None | float16 | int8 | int16 | auto.  int8/int16 use per-COLUMN
    # scales (each mod feature has coherent statistics across chunks:
    # +3 dB over per-chunk rows, scripts/probe_mod_quant.py).  int16 is
    # the hi-fi tier: fp16's 2 bytes spent as 16 uniform bits removes
    # fp16's ~76 dB mod cap (+20 dB at equal size on a 110 dB fit, same
    # probe).  'auto' applies the measured rule at encode time: fp16
    # while the fit's own SNR is below ~70 dB (fp16 then costs nothing
    # and entropy-codes ~4% smaller), int16 above it.
    quantize_mods: str | None = "int8"
    shared_fp16: bool = True  # backbone in fp16 except the omega0-amplified
    #                           first layer (same sensitivity rule as
    #                           quantize_inr_params)
    # Full FiLM: per-unit gains as well as shifts (2x mod bytes, per-unit
    # frequency modulation on sine layers)
    film_scale: bool = False
    # Modulation lr as a multiple of the backbone's (per-chunk, low-dim
    # params tolerate a hotter rate; plateau scales both, ratio preserved)
    mods_lr_mult: float = 1.0
    # One backbone per ~segment_s seconds instead of per clip (None = one
    # for the whole clip).  The r3 probe showed backbone capacity PER
    # CONTENT-SECOND sets the quality ceiling (a 1 s clip reaches ~96 dB
    # where 2 s saturates at ~45 with the same h=96 backbone); segments
    # hold quality on long clips while the chunk grid — and therefore
    # stitching, random access and streaming — stays global (adjacent
    # chunks from different backbones crossfade like any others).
    segment_s: float | None = None
    # Quantization-aware backbone refit: after quantizing the modulations,
    # fine-tune the (float) backbone with the mods FROZEN at their
    # dequantized values — the backbone absorbs part of the quantization
    # error (probe: int8 mods cap a 99 dB fit at ~48 dB, float16 at ~76;
    # the dual of CodecConfig.refit_steps).  0 = off.
    refit_backbone_steps: int = 0
    refit_lr: float = 2e-4
    seed: int = 0


def _split_channels(signal: np.ndarray) -> list[np.ndarray]:
    """(n,) or (n, c) float32 -> list of contiguous channel vectors.
    Shared preamble of ``encode`` and ``encode_modulated``."""
    sig = np.asarray(signal, np.float32)
    if sig.size == 0:
        raise ValueError("cannot encode an empty signal")
    if sig.ndim == 2 and sig.shape[1] == 1:
        sig = sig[:, 0]
    if sig.ndim == 1:
        return [sig]
    return [np.ascontiguousarray(sig[:, j]) for j in range(sig.shape[1])]


def _model_cfg_from_meta(meta: dict[str, Any]) -> SirenSnakeTanhConfig:
    """meta['model'] -> SirenSnakeTanhConfig — the ONE place the payload's
    model-header keys are interpreted (decode, decode_range, load_inr)."""
    m = meta["model"]
    return SirenSnakeTanhConfig(
        hidden_features=m["hidden_features"], num_sine=m["num_sine"],
        num_snake=m["num_snake"], first_omega_0=m["first_omega_0"],
        hidden_omega_0=m["hidden_omega_0"])


def _store_shared(shared: Any, fp16: bool) -> Any:
    if not fp16:
        return jax.tree.map(np.asarray, shared)
    layers = shared["layers"]
    out = [jax.tree.map(np.asarray, layers[0])]
    out += [jax.tree.map(lambda x: np.asarray(x, np.float16), l)
            for l in layers[1:]]
    return {"layers": out}


def _load_shared_host(shared: Any) -> Any:
    """Stored backbone -> float32 HOST arrays (closed into the decode jit
    as instant MLIR constants — see the lowering note in multi_inr)."""
    return jax.tree.map(lambda x: np.asarray(x, np.float32), shared)


# auto mod-tier switch point: fp16 mods cap reconstruction at ~76 dB
# (scripts/probe_mod_quant.py); below that fp16 is free AND entropy-codes
# ~4% smaller than int16's uniform grid (probe_seg_int16.py), above it
# int16 removes the cap at identical in-memory bytes.  70 dB hands over
# slightly before the cap starts shaving the fit.
_MOD_AUTO_INT16_DB = 70.0


def _auto_mod_tier(fit_mses: list[float], fit_powers: list[float],
                   fit_weights: list[int]) -> str:
    """Pick fp16 vs int16 mods from the fit's own quality (no decode):
    fit SNR ~= 10*log10(target power / best MSE), chunk-count-weighted
    across segments."""
    w = np.asarray(fit_weights, np.float64)
    mse = float(np.sum(np.asarray(fit_mses) * w) / np.sum(w))
    power = float(np.sum(np.asarray(fit_powers) * w) / np.sum(w))
    fit_snr = 10.0 * np.log10(power / max(mse, 1e-30))
    return "int16" if fit_snr > _MOD_AUTO_INT16_DB else "float16"


def encode_modulated(signal: np.ndarray, sample_rate: int,
                     cfg: ModulatedCodecConfig | None = None
                     ) -> dict[str, Any]:
    """Fit the shared-backbone codec and return the payload.

    ``signal`` is (n,) or (n, c) like ``encode``; every channel's chunks
    join the one jointly-trained population (channel-major order)."""
    from .models.modulated import mod_dim
    from .train.modulated import modulated_fit

    cfg = cfg or ModulatedCodecConfig()
    if cfg.quantize_mods not in (None, "float16", "int8", "int16", "auto"):
        raise ValueError(f"quantize_mods {cfg.quantize_mods!r}: use "
                         "None | float16 | int8 | int16 | auto")
    if cfg.segment_s is not None and cfg.segment_s <= 0:
        raise ValueError(f"segment_s must be positive, got {cfg.segment_s}")
    if cfg.refit_backbone_steps > 0 and cfg.quantize_mods is None:
        raise ValueError("refit_backbone_steps needs quantized modulations "
                         "(quantize_mods float16/int8/int16) — with float mods "
                         "there is no quantization error to absorb")
    chans = _split_channels(signal)
    mcfg = MultiINRConfig(chunk_seconds=cfg.chunk_seconds,
                          overlap_fraction=cfg.overlap_fraction)
    per_ch = [chunk_signal(ch, sample_rate, mcfg) for ch in chans]
    n, hop = per_ch[0][1], per_ch[0][2]
    chunks = np.concatenate([c for c, _, _ in per_ch], axis=0)
    scales = np.maximum(np.max(np.abs(chunks), axis=1), 1e-9)
    targets = (chunks / scales[:, None])[..., None]
    model_cfg = SirenSnakeTanhConfig(
        hidden_features=cfg.hidden_features, num_sine=cfg.num_sine,
        num_snake=cfg.num_snake, first_omega_0=cfg.first_omega_0,
        hidden_omega_0=cfg.hidden_omega_0)
    tc = TrainConfig(total_steps=cfg.total_steps,
                     learning_rate=cfg.learning_rate,
                     grad_clip_norm=cfg.grad_clip_norm,
                     plateau_patience=cfg.plateau_patience,
                     plateau_factor=cfg.plateau_factor)
    coords = np.asarray(get_coord(n, dim=1))
    k = per_ch[0][0].shape[0]
    c = len(chans)
    if cfg.segment_s is None:
        n_seg = 1
    else:
        n_seg = max(1, min(k, int(np.ceil(
            len(chans[0]) / (cfg.segment_s * sample_rate)))))
    fit_mses, fit_powers, fit_weights = [], [], []
    if n_seg == 1:
        res = modulated_fit(model_cfg, targets, coords,
                            tc, key=jax.random.PRNGKey(cfg.seed),
                            film_scale=cfg.film_scale,
                            mods_lr_mult=cfg.mods_lr_mult)
        mods = np.asarray(res.mods)
        backbones_f32 = [res.shared]
        bounds = [0, k]
        fit_mses.append(float(np.min(res.loss_history)))
        fit_powers.append(float(np.mean(targets ** 2)))
        fit_weights.append(targets.shape[0])
    else:
        # one backbone per chunk-index range (all channels' chunks of a
        # segment fit together); the chunk grid stays GLOBAL, so stitch /
        # random access / streaming are untouched
        bounds = [round(g * k / n_seg) for g in range(n_seg + 1)]
        mods = np.zeros((c * k, mod_dim(model_cfg, cfg.film_scale)),
                        np.float32)
        backbones = []
        for g in range(n_seg):
            a, b = bounds[g], bounds[g + 1]
            tg = np.concatenate([targets[j * k + a: j * k + b]
                                 for j in range(c)], axis=0)
            rg = modulated_fit(model_cfg, tg, coords, tc,
                               key=jax.random.fold_in(
                                   jax.random.PRNGKey(cfg.seed), g),
                               film_scale=cfg.film_scale,
                               mods_lr_mult=cfg.mods_lr_mult)
            mg = np.asarray(rg.mods)
            for j in range(c):
                mods[j * k + a: j * k + b] = mg[j * (b - a): (j + 1) * (b - a)]
            backbones.append(rg.shared)
            fit_mses.append(float(np.min(rg.loss_history)))
            fit_powers.append(float(np.mean(tg ** 2)))
            fit_weights.append(tg.shape[0])
        backbones_f32 = backbones
    quant = cfg.quantize_mods
    if quant == "auto":
        quant = _auto_mod_tier(fit_mses, fit_powers, fit_weights)
    if quant in ("int8", "int16"):
        # per-COLUMN scales: each mod feature's statistics are coherent
        # across chunks (scripts/probe_mod_quant.py: +3 dB over per-chunk
        # row scales at int8; decode is shape-driven so older per-row
        # payloads keep working)
        stored_mods = quantize_params(jnp.asarray(mods), quant,
                                      per_last_axis=True)
        stored_mods = jax.tree.map(np.asarray, stored_mods)
        deq_mods = np.asarray(dequantize_params(
            jax.tree.map(jnp.asarray, stored_mods)))
    elif quant == "float16":
        stored_mods = mods.astype(np.float16)
        deq_mods = stored_mods.astype(np.float32)
    else:  # None (validated before the fit)
        stored_mods = mods
        deq_mods = mods
    if quant and cfg.refit_backbone_steps > 0:
        # quantization-aware backbone refit: freeze the mods at their
        # dequantized values, fine-tune each (float) backbone to absorb
        # part of the quantization error
        rtc = TrainConfig(total_steps=cfg.refit_backbone_steps,
                          learning_rate=cfg.refit_lr,
                          grad_clip_norm=cfg.grad_clip_norm)
        refitted = []
        for g in range(n_seg):
            a, b = bounds[g], bounds[g + 1]
            rows = np.concatenate([deq_mods[j * k + a: j * k + b]
                                   for j in range(c)], axis=0)
            tg = (targets if n_seg == 1 else np.concatenate(
                [targets[j * k + a: j * k + b] for j in range(c)], axis=0))
            rr = modulated_fit(model_cfg, tg, coords, rtc,
                               frozen_mods=rows,
                               init_shared=backbones_f32[g],
                               film_scale=cfg.film_scale)
            refitted.append(rr.shared)
        backbones_f32 = refitted
    stored_bb = [_store_shared(bb, cfg.shared_fp16) for bb in backbones_f32]
    shared_stored = (stored_bb[0] if n_seg == 1 else
                     jax.tree.map(lambda *xs: np.stack(xs), *stored_bb))
    meta = {
        "format": _FORMAT,
        "codec": "modulated",
        "sample_rate": int(sample_rate),
        "signal_length": int(len(chans[0])),
        "chunk_length": int(n),
        "hop": int(hop),
        "num_chunks": int(per_ch[0][0].shape[0]),
        "num_channels": len(chans),
        "quantize": quant,
        "shared_fp16": bool(cfg.shared_fp16),
        "mod_dim": int(mod_dim(model_cfg, cfg.film_scale)),
        "film_scale": bool(cfg.film_scale),
        "num_segments": int(n_seg),
        "segment_bounds": [int(x) for x in bounds],
        "model": {
            "hidden_features": cfg.hidden_features,
            "num_sine": cfg.num_sine, "num_snake": cfg.num_snake,
            "first_omega_0": cfg.first_omega_0,
            "hidden_omega_0": cfg.hidden_omega_0,
        },
    }
    return {"meta": meta, "scales": scales.astype(np.float32),
            "params": {"mods": stored_mods, "shared": shared_stored}}


def _modulated_decode_fn(payload: dict[str, Any], coords: np.ndarray):
    """-> (vmapped jitted per-chunk eval, per-chunk params tree).

    The params tree is what ``batched_chunk_eval`` / ``decode_chunk_range``
    slice on the chunk axis: the bare modulation matrix for a one-backbone
    payload, or {'mod', 'g'} rows for a segmented payload — each chunk
    gathers its segment's backbone out of the stacked host constant, so
    range/stream decode work identically.  The f32 backbone(s) stay
    host-numpy closure constants."""
    from .models.modulated import modulated_apply

    meta = payload["meta"]
    model_cfg = _model_cfg_from_meta(meta)
    shared = _load_shared_host(payload["params"]["shared"])
    mods = payload["params"]["mods"]
    if isinstance(mods, dict):  # int8 {'q', 'scale', ...}
        mods = np.asarray(dequantize_params(
            jax.tree.map(jnp.asarray, mods)))
    mods = np.asarray(mods, np.float32)
    film = bool(meta.get("film_scale", False))
    n_seg = int(meta.get("num_segments", 1))
    if n_seg == 1:
        fn = jax.jit(jax.vmap(
            lambda mo: modulated_apply(shared, model_cfg, coords, mo,
                                       film_scale=film)))
        return fn, mods
    bounds = np.asarray(meta["segment_bounds"], np.int64)
    k = meta["num_chunks"]
    c = int(meta.get("num_channels", 1))
    # group of per-channel chunk index i, repeated channel-major
    g_of_i = (np.searchsorted(bounds, np.arange(k), side="right") - 1
              ).clip(0, n_seg - 1).astype(np.int32)
    g_rows = np.tile(g_of_i, c)

    def one(chunk):
        # jnp.asarray: the stacked HOST backbone embeds as a constant at
        # trace time; the per-chunk gather picks its segment's slice
        sh = jax.tree.map(lambda x: jnp.asarray(x)[chunk["g"]], shared)
        return modulated_apply(sh, model_cfg, coords, chunk["mod"],
                               film_scale=film)

    fn = jax.jit(jax.vmap(one))
    return fn, {"mod": mods, "g": g_rows}


def _check_format(meta: dict[str, Any]) -> None:
    if meta.get("format") != _FORMAT:
        raise ValueError(
            f"unsupported payload format {meta.get('format')!r}: this build "
            f"reads {_FORMAT} only (older payloads, e.g. v1's uniform leaf "
            "quantization, must be re-encoded from the source audio)")


# decode/decode_range/decode_stream stash the dequantized DEVICE params
# under this payload key after the first call: a seek-heavy serving
# pattern (N decode_range calls on one loaded payload) would otherwise
# re-dequantize and re-upload the ENTIRE parameter set per seek — O(clip)
# transfer for an O(range) evaluation.  The cache entry holds a reference
# to the exact ``payload['params']`` object it was built from and is
# rebuilt whenever that object is replaced; it lives only as long as the
# payload dict (``payload.pop(_DEVICE_CACHE_KEY, None)`` frees the HBM).
_DEVICE_CACHE_KEY = "_device_params"

# Same lifetime/invalidaton story for the jitted per-chunk eval fn:
# ``chunk_eval_fn`` wraps a FRESH ``jax.jit``/stacked closure per call, so
# every decode retraced and re-lowered the whole vmapped eval — measured
# 336 ms fresh vs 27 ms reused per call on the small-payload CPU drive —
# which dominated seek/stream serving latency.  Entries are keyed on
# everything the compiled fn depends on (model variant + recipe, grid,
# decode tier), so metadata-edited dict copies rebuild instead of reusing
# a stale executable.
_EVAL_CACHE_KEY = "_eval_fns"


def _cached_eval(payload: dict[str, Any], key: Any, build):
    cache = payload.get(_EVAL_CACHE_KEY)
    params = payload["params"]
    if cache is None or cache[0] is not params:
        cache = (params, {})
        payload[_EVAL_CACHE_KEY] = cache
    fn = cache[1].get(key)
    if fn is None:
        fn = cache[1][key] = build()
    return fn


def _eval_key(meta: dict[str, Any], model_name: str, upsample: int,
              fit: float | None) -> tuple:
    return (model_name, tuple(sorted(meta["model"].items())),
            meta["chunk_length"], int(upsample), fit)


def _payload_model_params(payload: dict[str, Any], fused: bool | None):
    """Validate the payload header and rebuild (meta, model, device params)
    — shared by ``decode`` and ``decode_range``.

    ``fused=None`` = auto: decode through the fused Pallas kernel when the
    payload was TRAINED under it (``trained_forward == 'fused_approx'``)
    and a non-CPU backend is available — the kernel path is both the
    faster and the semantics-matched decode.  On CPU (or for legacy/XLA-
    trained payloads) the exact XLA apply is used; its hidden-layer
    matmuls run at 'high' (bf16x3) precision on TPU since the r4 bisect
    showed the one-pass bf16 default capping a trained omega0=1000
    reconstruction at 58.5 dB vs 83.2 (models/siren.py)."""
    meta = payload["meta"]
    _check_format(meta)
    if fused is None:
        # gate on == 'tpu', not != 'cpu': the fused path is a Mosaic TPU
        # (pltpu) kernel with no GPU lowering — any other accelerator
        # backend must fall back to the exact XLA apply
        fused = (meta.get("trained_forward") == "fused_approx"
                 and jax.default_backend() == "tpu")
    model = build_model("mlp", _model_cfg_from_meta(meta), fused=fused,
                        approx_sin=fused)
    params = payload["params"]
    cached = payload.get(_DEVICE_CACHE_KEY)
    if cached is not None and cached[0] is params:
        return meta, model, cached[1]
    dq = dequantize_inr_params(params) if meta.get("quantize") else params
    dev = jax.tree.map(jnp.asarray, dq)
    payload[_DEVICE_CACHE_KEY] = (params, dev)
    return meta, model, dev


def decode_range(payload: dict[str, Any], start_s: float, stop_s: float,
                 fused: bool | None = None,
                 max_chunks_per_batch: int | None = None
                 ) -> tuple[int, np.ndarray]:
    """Random-access decode of ``[start_s, stop_s)`` seconds straight from
    the compressed payload -> (sample_rate, waveform slice).

    Only the INR chunks overlapping the requested range are evaluated, so
    seeking into an arbitrarily long file costs O(range) — a capability
    frame-based codecs (and the reference's whole-clip decode,
    run.py:249-296) don't have.  Matches the corresponding slice of
    ``decode(payload)`` to ~1 ulp (see
    ``train.multi_inr.decode_chunk_range``).
    """
    meta = payload["meta"]
    if meta.get("codec") == "modulated":
        _check_format(meta)
        coords = _decode_grid(meta["chunk_length"], 1)
        fn, params = _cached_eval(payload, ("modulated", 1),
                                  lambda: _modulated_decode_fn(payload,
                                                               coords))
    else:
        meta, model, params = _payload_model_params(payload, fused)
        coords = _decode_grid(meta["chunk_length"], 1)
        fit = _routing_fit_snr(meta)
        fn = _cached_eval(payload, _eval_key(meta, model.name, 1, fit),
                          lambda: chunk_eval_fn(model, coords, fit))
    sr = meta["sample_rate"]
    n0 = meta["chunk_length"]
    c = int(meta.get("num_channels", 1))
    k = meta["num_chunks"]
    scales = np.asarray(payload["scales"], np.float32)
    a, b = int(round(start_s * sr)), int(round(stop_s * sr))
    chans = [decode_chunk_range(
        fn, jax.tree.map(lambda x: x[j * k:(j + 1) * k], params),
        scales[j * k:(j + 1) * k], n0, meta["hop"], k,
        meta["signal_length"], a, b, max_chunks_per_batch)
        for j in range(c)]
    return sr, (chans[0] if c == 1 else np.stack(chans, axis=1))


def decode_stream(payload: dict[str, Any], block_s: float = 1.0,
                  fused: bool = False):
    """Generator of (start_sample, waveform_block) pairs covering the whole
    clip in ``block_s``-second blocks — constant-memory streaming decode
    for serving (each block evaluates only its covering chunks via
    ``decode_range``; concatenating all blocks equals the full decode to
    ~1 ulp).  The eval jit is built once and reused across blocks."""
    meta = payload["meta"]
    sr = meta["sample_rate"]
    coords = _decode_grid(meta["chunk_length"], 1)
    if meta.get("codec") == "modulated":
        _check_format(meta)
        fn, params = _cached_eval(payload, ("modulated", 1),
                                  lambda: _modulated_decode_fn(payload,
                                                               coords))
    else:
        _, model, params = _payload_model_params(payload, fused)
        fn = _cached_eval(payload, _eval_key(meta, model.name, 1, None),
                          lambda: chunk_eval_fn(model, coords))
    c = int(meta.get("num_channels", 1))
    k = meta["num_chunks"]
    scales = np.asarray(payload["scales"], np.float32)
    total = meta["signal_length"]
    step = max(1, int(round(block_s * sr)))
    for a in range(0, total, step):
        b = min(a + step, total)
        chans = [decode_chunk_range(
            fn, jax.tree.map(lambda x: x[j * k:(j + 1) * k], params),
            scales[j * k:(j + 1) * k], meta["chunk_length"], meta["hop"],
            k, total, a, b) for j in range(c)]
        yield a, (chans[0] if c == 1 else np.stack(chans, axis=1))


def _flatten_payload(payload: dict[str, Any]) -> dict[str, np.ndarray]:
    arrays = {"__meta__": np.frombuffer(
        json.dumps(payload["meta"]).encode("utf-8"), dtype=np.uint8),
        "scales": payload["scales"]}
    leaves, treedef = jax.tree_util.tree_flatten(payload["params"])
    arrays["__nleaves__"] = np.asarray(len(leaves))
    for i, leaf in enumerate(leaves):
        leaf = np.asarray(leaf)
        if leaf.dtype == jnp.bfloat16:
            # npz round-trips bfloat16 as an opaque void dtype; store the
            # raw bits as uint16 and view back at load (template-typed)
            leaf = leaf.view(np.uint16)
        arrays[f"leaf_{i:05d}"] = leaf
    return arrays


# ---- INRA container: per-leaf best-of lossless entropy coding ----------
#
# np.savez_compressed is zipfile DEFLATE (zlib ~level 6) over each leaf's
# raw bytes.  Two lossless transforms beat that on INR payloads (measured
# on real gt_bach encodes): a BYTE-PLANE SHUFFLE before compression for
# multi-byte floats (fp16 leaves: deflate 0.92 of raw -> shuffled-LZMA
# 0.84-0.88 — exponent bytes group together), and a chunk-axis->last
# TRANSPOSE for int8 modulation matrices (adjacent chunks are temporally
# correlated per coordinate: 0.97 -> 0.93).  Trained int8 weight streams
# are near entropy-flat (deflate ~0.96, nothing beats it meaningfully).
# The container tries every applicable coding per leaf and stores the
# winner's tag, so it is never worse than raw and decode is exact.

_INRA_MAGIC = b"INRA1\x00"
_LZMA_FILTERS = ({"id": lzma.FILTER_LZMA2, "preset": 6},)


def _lzma_c(b: bytes) -> bytes:
    return lzma.compress(b, format=lzma.FORMAT_RAW,
                         filters=list(_LZMA_FILTERS))


def _lzma_d(b: bytes) -> bytes:
    return lzma.decompress(b, format=lzma.FORMAT_RAW,
                           filters=list(_LZMA_FILTERS))


def _byte_shuffle(b: bytes, itemsize: int) -> bytes:
    a = np.frombuffer(b, np.uint8).reshape(-1, itemsize)
    return np.ascontiguousarray(a.T).tobytes()


def _byte_unshuffle(b: bytes, itemsize: int) -> bytes:
    a = np.frombuffer(b, np.uint8).reshape(itemsize, -1)
    return np.ascontiguousarray(a.T).tobytes()


def _encode_leaf(arr: np.ndarray) -> tuple[dict[str, Any], bytes]:
    """-> (spec, blob). Lossless; keeps the smallest applicable coding."""
    a = np.ascontiguousarray(np.asarray(arr))
    if a.dtype == jnp.bfloat16:
        dtype, bits = "bfloat16", a.view(np.uint16)
    else:
        dtype, bits = a.dtype.name, a
    raw = bits.tobytes()
    cands: dict[str, bytes] = {"raw": raw}
    if len(raw) >= 256:
        cands["zlib"] = zlib.compress(raw, 9)
        cands["lzma"] = _lzma_c(raw)
        if bits.dtype.itemsize > 1:
            sh = _byte_shuffle(raw, bits.dtype.itemsize)
            cands["shuf+zlib"] = zlib.compress(sh, 9)
            cands["shuf+lzma"] = _lzma_c(sh)
        if bits.dtype.itemsize == 1 and a.ndim >= 2 and a.shape[0] > 1:
            t = np.ascontiguousarray(np.moveaxis(bits, 0, -1)).tobytes()
            cands["T+lzma"] = _lzma_c(t)
    enc = min(cands, key=lambda k: len(cands[k]))
    blob = cands[enc]
    return {"dtype": dtype, "shape": [int(s) for s in a.shape],
            "enc": enc, "n": len(blob)}, blob


def _decode_leaf(spec: dict[str, Any], blob: bytes) -> np.ndarray:
    dtype = (np.dtype(jnp.bfloat16) if spec["dtype"] == "bfloat16"
             else np.dtype(spec["dtype"]))
    shape = tuple(spec["shape"])
    enc = spec["enc"]
    store_dt = np.dtype(np.uint16) if spec["dtype"] == "bfloat16" else dtype
    if enc == "raw":
        b = blob
    elif enc == "zlib":
        b = zlib.decompress(blob)
    elif enc == "lzma":
        b = _lzma_d(blob)
    elif enc == "shuf+zlib":
        b = _byte_unshuffle(zlib.decompress(blob), store_dt.itemsize)
    elif enc == "shuf+lzma":
        b = _byte_unshuffle(_lzma_d(blob), store_dt.itemsize)
    elif enc == "T+lzma":
        t = np.frombuffer(_lzma_d(blob), store_dt)
        t = t.reshape(shape[1:] + shape[:1])
        return np.ascontiguousarray(np.moveaxis(t, -1, 0)).view(dtype)
    else:
        raise ValueError(f"unknown leaf coding {enc!r} — payload written "
                         "by a newer build?")
    return np.frombuffer(b, store_dt).reshape(shape).view(dtype)


def _write_inra(path: str, payload: dict[str, Any]) -> None:
    leaves, _ = jax.tree_util.tree_flatten(payload["params"])
    entries, blobs = [], []
    for name, arr in ([("scales", payload["scales"])]
                      + [(f"leaf_{i:05d}", l) for i, l in enumerate(leaves)]):
        spec, blob = _encode_leaf(np.asarray(arr))
        spec["name"] = name
        entries.append(spec)
        blobs.append(blob)
    header = json.dumps({"meta": payload["meta"], "entries": entries,
                         "nleaves": len(leaves)}).encode("utf-8")
    with open(path, "wb") as f:
        f.write(_INRA_MAGIC)
        f.write(len(header).to_bytes(4, "little"))
        f.write(header)
        for blob in blobs:
            f.write(blob)


def _read_inra(path: str):
    with open(path, "rb") as f:
        magic = f.read(len(_INRA_MAGIC))
        if magic != _INRA_MAGIC:
            raise ValueError(f"{path}: not an INRA payload")
        hlen = int.from_bytes(f.read(4), "little")
        header = json.loads(f.read(hlen).decode("utf-8"))
        arrays = {}
        for spec in header["entries"]:
            arrays[spec["name"]] = _decode_leaf(spec, f.read(spec["n"]))
    meta = header["meta"]
    scales = arrays["scales"]
    leaves = [arrays[f"leaf_{i:05d}"] for i in range(header["nleaves"])]
    return meta, scales, leaves


def save_inr(path: str, payload: dict[str, Any]) -> str:
    """Write the payload as one compressed file; returns the path.

    Default container is INRA (per-leaf best-of entropy coding, above) —
    measured 5-7% smaller than npz on fp16/modulated payloads, never
    larger.  A path ending in ``.npz`` selects the legacy npz container
    instead (still produced and read bit-compatibly with older builds).
    """
    if path.endswith(".npz"):
        np.savez_compressed(path, **_flatten_payload(payload))
        return path
    if not path.endswith(".inra"):
        path = path + ".inra"
    _write_inra(path, payload)
    return path


def _resolve_payload_path(path: str) -> str:
    """Accept the path the user passed to ``encode --output`` even though
    ``save_inr`` may have appended the ``.inra`` suffix."""
    import os
    if not os.path.exists(path) and os.path.exists(path + ".inra"):
        return path + ".inra"
    return path


def load_inr(path: str) -> dict[str, Any]:
    """Read a payload written by ``save_inr`` (INRA or legacy npz —
    detected by magic bytes, not extension).

    The parameter treedef is reconstructed from the stored model config
    (same rebuild-then-pour recipe as train/checkpoint.py).
    """
    path = _resolve_payload_path(path)
    with open(path, "rb") as fh:
        is_inra = fh.read(len(_INRA_MAGIC)) == _INRA_MAGIC
    if is_inra:
        meta, scales, leaves = _read_inra(path)
        return _payload_from_parts(meta, scales, leaves, typed=True)
    with np.load(path, allow_pickle=False) as f:
        meta = json.loads(bytes(f["__meta__"]).decode("utf-8"))
        scales = f["scales"]
        leaves = [f[f"leaf_{i:05d}"] for i in range(int(f["__nleaves__"]))]
    return _payload_from_parts(meta, scales, leaves, typed=False)


def _payload_from_parts(meta, scales, leaves, typed: bool):
    model_cfg = _model_cfg_from_meta(meta)
    if meta.get("codec") == "modulated":
        # template = {mods (maybe int8-dict), shared} — leaf count/structure
        # is all tree_unflatten needs; values come from the file
        from .models.modulated import modulated_init
        ck = meta["num_chunks"] * int(meta.get("num_channels", 1))
        t = modulated_init(jax.random.PRNGKey(0), model_cfg, ck,
                           film_scale=bool(meta.get("film_scale", False)))
        mods_t = (quantize_params(t["mods"], meta["quantize"],
                                  per_last_axis=True)
                  if meta.get("quantize") in ("int8", "int16")
                  else t["mods"])
        template = {"mods": mods_t,
                    "shared": _store_shared(t["shared"],
                                            meta.get("shared_fp16", False))}
    else:
        model = build_model("mlp", model_cfg)
        template = jax.vmap(model.init)(
            jax.random.split(jax.random.PRNGKey(0), meta["num_chunks"]))
        if meta.get("quantize"):
            template = quantize_inr_params(
                template, meta["quantize"],
                side=bool(meta.get("side_quantized", False)))
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(t_leaves) != len(leaves):
        raise ValueError("leaf count mismatch — corrupted payload")
    if not typed:
        # npz stores bfloat16 as raw uint16 bits; view back template-typed
        # (INRA records dtypes explicitly, leaves arrive already typed)
        leaves = [l.view(np.dtype(jnp.bfloat16))
                  if np.asarray(tl).dtype == jnp.bfloat16 else l
                  for tl, l in zip(t_leaves, leaves)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    return {"meta": meta, "scales": scales, "params": params}


def payload_info(path: str) -> dict[str, Any]:
    """Inspect a saved payload WITHOUT decoding any audio.

    Returns container kind, the stored codec meta, a per-leaf storage
    table (name, dtype, shape, coding, stored bytes) and on-disk totals
    incl. bits/sample vs the clip it encodes.  The reference's only
    payload observability is the parameters.json written at fit time
    (run.py:365-398); this reads the compressed artifact itself.

    INRA payloads are inspected from the header alone (no leaf decode);
    npz per-leaf stored sizes come from the zip entries.
    """
    import os
    import zipfile

    path = _resolve_payload_path(path)
    with open(path, "rb") as fh:
        is_inra = fh.read(len(_INRA_MAGIC)) == _INRA_MAGIC
    entries: list[dict[str, Any]] = []
    if is_inra:
        with open(path, "rb") as f:
            f.read(len(_INRA_MAGIC))
            hlen = int.from_bytes(f.read(4), "little")
            header = json.loads(f.read(hlen).decode("utf-8"))
        meta = header["meta"]
        for spec in header["entries"]:
            dt = (np.dtype(np.uint16) if spec["dtype"] == "bfloat16"
                  else np.dtype(spec["dtype"]))
            raw = int(np.prod(spec["shape"], dtype=np.int64)) * dt.itemsize
            entries.append({"name": spec["name"], "dtype": spec["dtype"],
                            "shape": list(spec["shape"]), "enc": spec["enc"],
                            "stored_bytes": int(spec["n"]),
                            "raw_bytes": raw})
    else:
        with zipfile.ZipFile(path) as zf:
            sizes = {i.filename: i.compress_size for i in zf.infolist()}
        with np.load(path, allow_pickle=False) as f:
            meta = json.loads(bytes(f["__meta__"]).decode("utf-8"))
            for name in f.files:
                if name.startswith("__"):
                    continue
                a = f[name]
                entries.append({
                    "name": name, "dtype": a.dtype.name,
                    "shape": list(a.shape), "enc": "zip-deflate",
                    "stored_bytes": int(sizes.get(name + ".npy", a.nbytes)),
                    "raw_bytes": int(a.nbytes)})
    file_bytes = os.path.getsize(path)
    n = int(meta["signal_length"]) * int(meta.get("num_channels", 1))
    return {"container": "inra" if is_inra else "npz",
            "file_bytes": int(file_bytes),
            "bits_per_sample": 8.0 * file_bytes / n,
            "ratio_vs_pcm16": (2 * n) / file_bytes,
            "meta": meta,
            "leaves": entries,
            "stored_leaf_bytes": int(sum(e["stored_bytes"] for e in entries)),
            "raw_leaf_bytes": int(sum(e["raw_bytes"] for e in entries))}


def compression_stats(payload: dict[str, Any],
                      path: str | None = None) -> dict[str, float]:
    """Bytes, bits/sample, and ratio vs 16-bit PCM.

    ``path``: a file written by ``save_inr`` — adds the ON-DISK numbers
    (the .npz is deflate-compressed, so int8 payloads shrink further)."""
    nbytes = param_bytes(payload["params"]) + payload["scales"].nbytes
    n = (payload["meta"]["signal_length"]
         * int(payload["meta"].get("num_channels", 1)))
    pcm16 = 2 * n
    stats = {"param_bytes": float(nbytes),
             "bits_per_sample": 8.0 * nbytes / n,
             "ratio_vs_pcm16": pcm16 / nbytes}
    if path is not None:
        import os
        fb = os.path.getsize(path)
        stats["file_bytes"] = float(fb)
        stats["file_bits_per_sample"] = 8.0 * fb / n
        stats["file_ratio_vs_pcm16"] = pcm16 / fb
    return stats
