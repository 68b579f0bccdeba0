"""CPU probe: int8 MODULATION-quantization granularity A/B at high fit SNR.

The modulated codec's int8 tier caps reconstruction far below fp16 (probe:
a ~96 dB float fit decodes at ~76 dB fp16 / ~48 dB int8 with the current
per-CHUNK row scales).  Modulations are additive pre-activation shifts
(models/modulated.py), so each mod FEATURE (column of the (k, mod_dim)
matrix) has coherent statistics across chunks — per-column mean folding +
per-column scales should spend the 8 bits on the residual spread instead
of the column offsets.  This script fits the DESIGN.md tier-probe setup
(1 s gt_bach decimated to 11.025 kHz, h=96, omega 125, 0.05 s chunks)
once, then decodes the SAME fit under each quantization scheme:

  float    — unquantized reference (the fit's own ceiling)
  fp16     — float16 cast (current hi-fi tier)
  row      — int8, one scale per chunk row (current int8 tier)
  tensor   — int8, one global scale
  col      — int8, per-column scale (no mean fold)
  colmean  — int8, per-column mean fold + per-column scale
  colrow   — colmean + a per-row scale on the standardized residual

Storage deltas: `col*` schemes add <= 2*mod_dim float32 side values
(mean+scale, fp16-able) vs `row`'s k float32 scales — both negligible
next to the int8 matrix itself at realistic chunk counts.

Measured (3000 steps, 110.3 dB float fit, 23 chunks x mod_dim 480):

    fp16 76.3 | row 47.3 | tensor 44.5 | col 50.4 | colmean 49.7
    row16 94.4 | col16 96.5 | colrow16 97.1

Conclusions (wired into codec.py): per-COLUMN scales beat the original
per-chunk rows by +3 dB at int8 (mean folding does NOT help — the
offsets don't dominate the column peaks); resolution, not granularity,
binds int8 (~26 dB under fp16 at every grain); and **int16-per-col beats
fp16 by +20 dB at identical 2 bytes/value** (16 uniform bits vs fp16's
10-bit mantissa — fp16 wastes bits on exponent range modulations never
use).  int16 ships as the hi-fi `quantize_mods` tier, int8 stays the
low-rate tier, both per-column.

Run: JAX_PLATFORMS=cpu python scripts/probe_mod_quant.py [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from inraudio_tpu.data.audio_io import decimate, read_wav  # noqa: E402
from inraudio_tpu.data.coords import get_coord  # noqa: E402
from inraudio_tpu.dsp.snr import calculate_snr  # noqa: E402
from inraudio_tpu.models.modulated import modulated_apply  # noqa: E402
from inraudio_tpu.models.siren import SirenSnakeTanhConfig  # noqa: E402
from inraudio_tpu.train.modulated import modulated_fit  # noqa: E402
from inraudio_tpu.train.multi_inr import (MultiINRConfig,  # noqa: E402
                                          chunk_signal, stitch_chunks)
from inraudio_tpu.train.loop import TrainConfig  # noqa: E402


def quant_int8(m: np.ndarray, scheme: str) -> np.ndarray:
    """Quantize the (k, d) mod matrix under `scheme`, return the
    dequantized float32 matrix (what decode would see)."""
    if scheme == "float":
        return m
    if scheme == "fp16":
        return m.astype(np.float16).astype(np.float32)
    levels = 32767.0 if scheme.endswith("16") else 127.0
    base = scheme[:-2] if scheme.endswith("16") else scheme
    mean = np.zeros((1, m.shape[1]), np.float32)
    if base.startswith("colmean") or base == "colrow":
        mean = m.mean(axis=0, keepdims=True).astype(np.float32)
    r = m - mean
    if base == "tensor":
        scale = np.maximum(np.abs(r).max(), 1e-12) / levels
    elif base == "row":
        scale = np.maximum(np.abs(r).max(axis=1, keepdims=True), 1e-12) / levels
    elif base in ("col", "colmean"):
        scale = np.maximum(np.abs(r).max(axis=0, keepdims=True), 1e-12) / levels
    elif base == "colrow":
        cs = np.maximum(np.abs(r).max(axis=0, keepdims=True), 1e-12)
        r = r / cs
        rs = np.maximum(np.abs(r).max(axis=1, keepdims=True), 1e-12) / levels
        q = np.clip(np.round(r / rs), -levels, levels)
        return (q.astype(np.float32) * rs * cs + mean).astype(np.float32)
    else:
        raise ValueError(scheme)
    q = np.clip(np.round(r / scale), -levels, levels)
    return (q.astype(np.float32) * scale + mean).astype(np.float32)


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    rate, wav = read_wav("/root/reference/gt_bach.wav", channel=0)
    wav = decimate(wav, 4)
    rate //= 4
    sig = wav[: rate].astype(np.float32)  # 1 s @ 11025 Hz
    mcfg = MultiINRConfig(chunk_seconds=0.05, overlap_fraction=0.1)
    chunks, n, hop = chunk_signal(sig, rate, mcfg)
    scales = np.maximum(np.max(np.abs(chunks), axis=1), 1e-9)
    targets = (chunks / scales[:, None])[..., None]
    coords = np.asarray(get_coord(n, dim=1))
    model_cfg = SirenSnakeTanhConfig(hidden_features=96, num_sine=2,
                                     num_snake=2, first_omega_0=125.0,
                                     hidden_omega_0=30.0)
    tc = TrainConfig(total_steps=steps, learning_rate=1e-3,
                     grad_clip_norm=1.0)
    cache = f"/tmp/probe_mod_quant_fit_{steps}.npz"
    if os.path.exists(cache):
        z = np.load(cache, allow_pickle=True)
        mods = z["mods"]
        shared = jax.tree.unflatten(
            jax.tree.structure(
                modulated_fit(model_cfg, targets[:1], coords,
                              TrainConfig(total_steps=1)).shared),
            list(z["shared_leaves"]))
        print(f"fit: loaded cache {cache}", flush=True)
    else:
        t0 = time.time()
        res = modulated_fit(model_cfg, targets, coords, tc,
                            key=jax.random.PRNGKey(0), mods_lr_mult=5.0)
        mods = np.asarray(res.mods)
        shared = jax.tree.map(np.asarray, res.shared)
        np.savez(cache, mods=mods, shared_leaves=np.asarray(
            [np.asarray(l) for l in jax.tree.leaves(shared)],
            dtype=object))
        print(f"fit: {steps} steps, {chunks.shape[0]} chunks x {n} rows, "
              f"{time.time() - t0:.1f} s", flush=True)

    fn = jax.jit(jax.vmap(lambda mo: modulated_apply(
        shared, model_cfg, coords, mo)))
    for scheme in ("float", "fp16", "row", "tensor", "col",
                   "colmean", "colrow", "row16", "col16", "colrow16"):
        deq = quant_int8(mods, scheme)
        outs = np.asarray(fn(jnp.asarray(deq)))[:, :, 0] * scales[:, None]
        rec = stitch_chunks(outs, hop, len(sig))
        snr = float(calculate_snr(sig, rec))
        print(f"{scheme:8s} SNR {snr:7.2f} dB", flush=True)


if __name__ == "__main__":
    main()
