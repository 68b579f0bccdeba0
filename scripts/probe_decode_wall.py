"""Break the serving ``codec.decode`` wall into its phases on real hardware.

The bench's fetch-anchored stitched-decode rate (103-122 Msamples/s) times
the EVAL with parameters already resident on device; the product ``decode``
additionally pays, per call: host dequantize (int -> float32 numpy), the
float32 parameter upload, the dispatch, the output fetch, and host
stitching.  This probe times each phase with explicit synchronization so
the serving-path optimization work targets the real bottleneck.

Usage: python scripts/probe_decode_wall.py [steps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from inraudio_tpu.codec import (CodecConfig, _decode_grid,  # noqa: E402
                                _payload_model_params, _routing_fit_snr,
                                _stitch_outs, decode, encode)
from inraudio_tpu.data.audio_io import read_wav  # noqa: E402
from inraudio_tpu.models.quantize import dequantize_params  # noqa: E402
from inraudio_tpu.train.multi_inr import chunk_eval_fn  # noqa: E402

WAV = os.environ.get("BENCH_WAV", "/root/reference/gt_bach.wav")


def best_of(f, n=5):
    best = float("inf")
    for _ in range(n):
        t = time.time()
        f()
        best = min(best, time.time() - t)
    return best


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    fs, sig = read_wav(WAV, channel=0)
    cfg = CodecConfig(chunk_seconds=0.01161, overlap_fraction=0.1,
                      total_steps=steps, fused=True)
    t0 = time.time()
    pay = encode(np.asarray(sig, np.float32), fs, cfg)
    meta = pay["meta"]
    n_samples = meta["signal_length"]
    print(f"payload: {meta['num_chunks']} chunks x {meta['chunk_length']}, "
          f"quantize={meta.get('quantize')}, fit={meta.get('fit_snr_db')}, "
          f"encode {time.time() - t0:.1f}s")

    # phase 0: whole product decode
    decode(pay)  # warm
    t_decode = best_of(lambda: decode(pay))

    # phase 1: host dequantize
    q = pay["params"]
    t_dq = best_of(lambda: dequantize_params(q))
    host_params = jax.tree.map(np.asarray, dequantize_params(q))
    fp32_bytes = sum(x.nbytes for x in jax.tree.leaves(host_params))
    q_bytes = sum(np.asarray(x).nbytes for x in jax.tree.leaves(q))

    # phase 2: upload (synchronized)
    def upload():
        d = jax.tree.map(jnp.asarray, host_params)
        jax.block_until_ready(d)
        return d
    dev_params = upload()  # warm
    t_up = best_of(upload)

    # phase 3: eval dispatch with resident params, output left on device
    _, model, _ = _payload_model_params(pay, None)
    coords = _decode_grid(meta["chunk_length"], 1)
    fn = chunk_eval_fn(model, coords, _routing_fit_snr(meta))
    out = fn(dev_params)
    jax.block_until_ready(out)  # warm/compile
    t_eval = best_of(lambda: jax.block_until_ready(fn(dev_params)))

    # phase 4: output fetch
    out_host = np.asarray(out)
    t_fetch = best_of(lambda: np.asarray(out))

    # phase 5: host stitch
    t_st = best_of(lambda: _stitch_outs(pay, out_host, 1))

    ms = lambda s: f"{s * 1e3:8.1f} ms"
    print(f"param bytes: quantized {q_bytes / 1e6:.1f} MB -> "
          f"float32 {fp32_bytes / 1e6:.1f} MB; output "
          f"{out_host.nbytes / 1e6:.1f} MB")
    print(f"decode() wall      {ms(t_decode)}  "
          f"({n_samples / t_decode / 1e6:6.1f} Msamples/s)")
    print(f"  host dequantize  {ms(t_dq)}")
    print(f"  fp32 upload      {ms(t_up)}  "
          f"({fp32_bytes / t_up / 1e9:.2f} GB/s)")
    print(f"  eval (resident)  {ms(t_eval)}  "
          f"({n_samples / t_eval / 1e6:6.1f} Msamples/s)")
    print(f"  output fetch     {ms(t_fetch)}  "
          f"({out_host.nbytes / t_fetch / 1e9:.2f} GB/s)")
    print(f"  host stitch      {ms(t_st)}")
    acc = t_dq + t_up + t_eval + t_fetch + t_st
    print(f"  sum of phases    {ms(acc)}  (unattributed "
          f"{ms(t_decode - acc)})")


if __name__ == "__main__":
    main()
