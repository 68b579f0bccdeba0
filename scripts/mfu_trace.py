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


def analyze(outdir: str, top: int = 10) -> dict:
    """Per-op device-time breakdown straight from the xplane proto.

    The tensorboard profile-plugin converters are broken in this image
    (protobuf/pywrap version skew), so parse the XSpace directly: the
    '/device:TPU:0' plane's 'XLA Ops' line carries one event per executed
    HLO op with device durations.  Aggregating self-time by op name gives
    the kernel-vs-XLA split (the inside of a Pallas custom call is opaque
    to the trace — its duration is the whole-kernel figure)."""
    import collections
    planes = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                              recursive=True))
    if not planes:
        return {"error": f"no xplane under {outdir}"}
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception as e:  # pragma: no cover
        return {"error": f"no xplane proto: {e}", "xplane": planes[-1]}
    xs = xplane_pb2.XSpace()
    with open(planes[-1], "rb") as f:
        xs.ParseFromString(f.read())
    res: dict = {"xplane": planes[-1]}
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        em = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            agg: collections.Counter = collections.Counter()
            cnt: collections.Counter = collections.Counter()
            t0 = min(e.offset_ps for e in line.events)
            t1 = max(e.offset_ps + e.duration_ps for e in line.events)
            for e in line.events:
                name = em[e.metadata_id].split(" = ")[0].lstrip("%")
                agg[name] += e.duration_ps / 1e12
                cnt[name] += 1
            res["span_s"] = round((t1 - t0) / 1e12, 6)
            res["ops"] = [
                {"op": n, "device_s": round(d, 6), "count": cnt[n]}
                for n, d in agg.most_common(top)]
    path = os.path.join(outdir, "op_times.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    res["json"] = path
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
    from inraudio_tpu.train.loop import fused_step_plan
    block = fused_step_plan(model, tc, n)
    if block is not None:
        from inraudio_tpu.ops.pallas_siren_step import (
            flat_state_from_train_state, make_fused_mse_train_step,
            pad_step_inputs)
        ctx = model.fused_step_ctx
        coords_p, _, _ = pad_step_inputs(coords, np.zeros((n, 1), np.float32),
                                         block)
        tp = np.zeros((k, coords_p.shape[0], 1), np.float32)
        tp[:, :n] = np.asarray(targets)
        targets = jnp.asarray(tp)
        fstep = make_fused_mse_train_step(
            ctx["cfg"], tc, n, block, rff_b=ctx["rff_b"],
            approx_sin=ctx["approx_sin"], interpret=ctx["interpret"])
        states = jax.vmap(lambda s: flat_state_from_train_state(
            s, ctx["cfg"]))(states)
        vstep = jax.vmap(lambda s, t: fstep(s, coords_p, t), in_axes=(0, 0))
        print(f"train path: fused whole-step kernel (block_rows={block})",
              flush=True)
    else:
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
