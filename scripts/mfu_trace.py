"""Capture on-chip profiler traces of the headline train round and decode,
then extract VPU/MXU busy fractions (VERDICT r2 item 4: replace the
"transcendental-bound" assertion with trace evidence).

Runs on the real TPU.  Produces:
- <out>/train/  and  <out>/decode{128,256}/  jax.profiler traces
- a summary table on stdout (device busy %, MXU %, top self-time ops)

Usage:  python scripts/mfu_trace.py [--out /tmp/mfu_traces] [--steps 200]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

from inraudio_tpu.data import read_wav  # noqa: E402
from inraudio_tpu.data.coords import get_coord  # noqa: E402
from inraudio_tpu.models import (INRModel, SirenSnakeTanhConfig,  # noqa: E402
                                 build_model)
from inraudio_tpu.ops.pallas_siren import fused_siren_apply  # noqa: E402
from inraudio_tpu.train import (MultiINRConfig, TrainConfig,  # noqa: E402
                                init_train_state, make_train_step)
from inraudio_tpu.train.multi_inr import chunk_signal  # noqa: E402


def _fetch(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[:1]


def trace_block(outdir, fn, *args, reps=1):
    """Warm up (compile) outside the trace, then trace ``reps`` dispatches."""
    out = fn(*args)
    _fetch(out)
    os.makedirs(outdir, exist_ok=True)
    with jax.profiler.trace(outdir):
        for _ in range(reps):
            out = fn(*args)
        _fetch(out)
    return out


def analyze(outdir: str) -> dict:
    """Extract busy fractions from the xplane trace via the tensorboard
    profile plugin converters (best effort across plugin versions)."""
    planes = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                              recursive=True))
    if not planes:
        return {"error": f"no xplane under {outdir}"}
    res = {"xplane": planes[-1]}
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
    except Exception as e:  # pragma: no cover
        res["error"] = f"no converter: {e}"
        return res
    for tool in ("op_profile", "overview_page", "framework_op_stats"):
        for name in (tool, tool + "^"):
            try:
                data = raw_to_tool_data.xspace_to_tool_data(
                    [planes[-1]], name, {})
                if isinstance(data, tuple):
                    data = data[0]
                path = os.path.join(outdir, f"{tool}.json")
                with open(path, "w") as f:
                    if isinstance(data, (bytes, bytearray)):
                        f.write(data.decode("utf-8", "replace"))
                    else:
                        f.write(data if isinstance(data, str)
                                else json.dumps(data))
                res[tool] = path
                break
            except Exception as e:
                res.setdefault("convert_errors", []).append(
                    f"{name}: {type(e).__name__}: {e}")
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/mfu_traces")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--wav", default="/root/reference/gt_bach.wav")
    args = ap.parse_args()

    fs, signal = read_wav(args.wav, channel=0)
    signal = signal.astype(np.float32)

    # ---- headline train round: 669 chunks x 512 rows, h=128, fused
    mc = MultiINRConfig(chunk_seconds=0.01161, overlap_fraction=0.1)
    chunks, n, hop = chunk_signal(signal, fs, mc)
    k = chunks.shape[0]
    scales = np.maximum(np.max(np.abs(chunks), axis=1), 1e-9)
    targets = jnp.asarray((chunks / scales[:, None])[..., None])
    # host const: device closure captures are fetched at lowering (axon)
    coords = np.asarray(get_coord(n, dim=1), np.float32)
    cfg128 = SirenSnakeTanhConfig(first_omega_0=115.0, hidden_features=128)
    model = build_model("mlp", cfg128, fused=True, approx_sin=True)
    tc = TrainConfig(total_steps=10**6, scan_chunk=args.steps,
                     learning_rate=1.5e-3, grad_clip_norm=1.0,
                     plateau_patience=50)
    keys = jax.random.split(jax.random.PRNGKey(0), k)
    states = jax.vmap(lambda kk: init_train_state(model, kk, tc))(keys)
    step = make_train_step(model, tc)
    vstep = jax.vmap(lambda s, t: step(s, coords, t), in_axes=(0, 0))

    @jax.jit
    def run(states, targets):
        def body(s, _):
            s, (loss, lr) = vstep(s, targets)
            return s, loss
        return jax.lax.scan(body, states, None, length=args.steps)

    print(f"train: {k} chunks x {n}, h=128, {args.steps} steps", flush=True)
    t0 = time.time()
    states, _ = trace_block(os.path.join(args.out, "train"), run,
                            states, targets)
    print(f"  traced in {time.time() - t0:.1f}s")

    # ---- decode at h=128 (headline) and h=256 (production shape)
    for h in (128, 256):
        cfg = SirenSnakeTanhConfig(first_omega_0=115.0, hidden_features=h)
        m = build_model("mlp", cfg)
        params = jax.vmap(m.init)(jax.random.split(jax.random.PRNGKey(1), k))
        dm = INRModel(
            name=f"decode{h}", config=cfg, init=m.init,
            apply=lambda p, c, _cfg=cfg: fused_siren_apply(
                p, _cfg, c, block_rows=2048, approx_sin=True))
        decode = jax.jit(jax.vmap(lambda p: dm.apply(p, coords)))
        t0 = time.time()
        trace_block(os.path.join(args.out, f"decode{h}"), decode, params,
                    reps=10)
        dt = time.time() - t0
        print(f"decode h={h}: traced 10 reps in {dt:.1f}s "
              f"(~{10 * k * n / dt / 1e6:.0f} Msamples/s incl. overhead)")

    for sub in ("train", "decode128", "decode256"):
        print(sub, json.dumps(analyze(os.path.join(args.out, sub)))[:400])


if __name__ == "__main__":
    main()
