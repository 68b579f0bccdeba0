"""Measure the decode_many serving win: N clips per dispatch vs N dispatches.

BASELINE.md r5 establishes the stitched decode is transport-bound: ~1.78 ms
fixed cost per device dispatch against a ~223 Msamples/s marginal kernel
rate, so one 7 s clip per call (~0.34 Msamples/dispatch with the stacked
kernel's single call) caps near ~193 Msamples/s.  ``codec.decode_many``
concatenates compatible payloads' chunk populations into ONE stacked eval —
this script measures what that buys wall-clock at serving fan-ins N=1..8.

Usage: python scripts/bench_decode_many.py [steps] [Ns...]
       python scripts/bench_decode_many.py rd<bps> [steps] [Ns...]
  steps  — encode budget for the probe payload (default 120: the decode
           shape, not the fit quality, is what's under test)
  rd<bps> — encode at the calibrated RD operating point for that
           bits/sample target (e.g. ``rd4``) instead of the headline
           decode shape.  The headline shape's payload is ~90 MB of
           parameters (a decode-THROUGHPUT probe, deliberately
           overparameterized), so its serving wall is payload-upload-
           bound and batching is neutral; a realistic codec payload is
           ~100-300 KB, the wall is per-dispatch latency, and batching
           is the lever (BASELINE.md r5 serving section).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

from inraudio_tpu.codec import (CodecConfig, config_for_bitrate,  # noqa: E402
                                decode, decode_many, encode)
from inraudio_tpu.data.audio_io import read_wav  # noqa: E402

WAV = os.environ.get("BENCH_WAV", "/root/reference/gt_bach.wav")


def main() -> None:
    argv = sys.argv[1:]
    rd_bps = None
    if argv and argv[0].startswith("rd"):
        rd_bps = float(argv[0][2:])
        argv = argv[1:]
    steps = int(argv[0]) if argv else 120
    ns = [int(a) for a in argv[1:]] or [1, 2, 4, 8]
    fs, sig = read_wav(WAV, channel=0)

    if rd_bps is not None:
        cfg = config_for_bitrate(rd_bps, CodecConfig(total_steps=steps,
                                                     fused=True))
    else:
        # Headline decode shape: 512-row chunks, h=128 (bench BENCH_CHUNK_S)
        cfg = CodecConfig(chunk_seconds=0.01161, overlap_fraction=0.1,
                          total_steps=steps, fused=True)
    t0 = time.time()
    # BENCH_PAYLOAD_CACHE: reuse a previously-encoded probe payload (the
    # decode A/B is what's under test; re-encoding after a backend wedge
    # wastes the retry window)
    cache_path = os.environ.get("BENCH_PAYLOAD_CACHE")
    if cache_path and os.path.exists(cache_path):
        from inraudio_tpu.codec import load_inr
        pay = load_inr(cache_path)
        print(f"loaded cached payload {cache_path}")
    else:
        pay = encode(np.asarray(sig, np.float32), fs, cfg)
        if cache_path:
            from inraudio_tpu.codec import save_inr
            save_inr(cache_path, pay)
    k = pay["meta"]["num_chunks"]
    pbytes = sum(np.asarray(x).nbytes
                 for x in jax.tree.leaves(pay["params"]))
    print(f"payload: {k} chunks, chunk_length={pay['meta']['chunk_length']}, "
          f"fit_snr_db={pay['meta'].get('fit_snr_db')}, "
          f"params {pbytes / 1e3:.1f} KB in memory, "
          f"encode {time.time() - t0:.1f}s")

    n_samples = pay["meta"]["signal_length"]
    for n in ns:
        # distinct payload dicts with fresh params containers: each
        # simulated client clip pays its own dequantize + upload (the
        # decode-side device-param cache keys on the params object, so
        # [pay] * n would measure N cache hits, not N clips)
        pays = [dict(pay, params=jax.tree.map(lambda x: x, pay["params"]))
                for _ in range(n)]
        # warm both paths (compile once per tier/shape)
        decode(pay)
        decode_many(pays)
        from inraudio_tpu.codec import _DEVICE_CACHE_KEY

        def fresh():
            # every timed rep pays the fresh-clip dequantize + upload
            for p in pays:
                p.pop(_DEVICE_CACHE_KEY, None)

        seq_best = many_best = float("inf")
        for _ in range(5):
            fresh()
            t = time.time()
            outs = [decode(p) for p in pays]
            seq_best = min(seq_best, time.time() - t)
            fresh()
            t = time.time()
            outs_m = decode_many(pays)
            many_best = min(many_best, time.time() - t)
        for (fa, a), (fb, b) in zip(outs, outs_m):
            assert fa == fb and np.array_equal(a, b), "decode_many mismatch"
        tot = n * n_samples / 1e6
        print(f"N={n}: sequential {tot / seq_best:7.1f} Msamples/s "
              f"({seq_best * 1e3:7.1f} ms)  |  decode_many "
              f"{tot / many_best:7.1f} Msamples/s ({many_best * 1e3:7.1f} ms)"
              f"  -> {seq_best / many_best:4.2f}x")


if __name__ == "__main__":
    main()
