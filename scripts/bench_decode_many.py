"""Serving throughput of ``codec.decode_many`` vs per-payload ``decode``.

The single-clip stitched decode is TRANSPORT-bound: ~1.78 ms of fixed
per-dispatch cost (tunnel round-trip + host stitch) against a ~223
Msamples/s marginal kernel rate (BASELINE.md r5 stacked-kernel section),
so one 7 s clip per call tops out near ~193 Msamples/s no matter how
fast the kernel gets.  ``decode_many`` concatenates the chunk
populations of payloads that compile identically into ONE stacked
dispatch — this script measures how far up the samples-per-dispatch
curve that moves a serving workload.

Method: encode gt_bach once with the headline codec recipe (quality is
irrelevant to throughput — the decode cost depends only on shapes and
the routed tier), replicate the payload N times, and time
``decode_many(N payloads)`` against N sequential ``decode`` calls.
Timing is wall-to-numpy (decode returns host arrays, so the fetch
anchor is intrinsic).  Usage: python scripts/bench_decode_many.py
[N ...] (default 1 2 4 8 16).
"""

import copy
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

from inraudio_tpu.codec import CodecConfig, decode, decode_many, encode  # noqa: E402
from inraudio_tpu.data import read_wav  # noqa: E402


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8, 16]
    sr, sig = read_wav("/root/reference/gt_bach.wav", channel=0)
    cfg = CodecConfig(total_steps=300, quantize=None)
    t0 = time.time()
    pay = encode(sig.astype(np.float32), sr, cfg)
    print(f"encode: {pay['meta']['num_chunks']} chunks x "
          f"{pay['meta']['chunk_length']} rows in {time.time() - t0:.0f}s",
          flush=True)
    n_samples = int(pay["meta"]["signal_length"])

    # warm both paths' compiles out of the timing
    decode(pay)
    decode_many([pay, copy.deepcopy(pay)])

    for n in ns:
        pays = [copy.deepcopy(pay) for _ in range(n)]
        best_m = best_s = float("inf")
        for _ in range(3):
            t0 = time.time()
            outs = decode_many(pays)
            best_m = min(best_m, time.time() - t0)
            t0 = time.time()
            singles = [decode(p) for p in pays]
            best_s = min(best_s, time.time() - t0)
        for (fs_m, rec_m), (fs_1, rec_1) in zip(outs, singles):
            assert fs_m == fs_1
            np.testing.assert_allclose(rec_m, rec_1, atol=1e-6)
        tot = n * n_samples
        print(f"N={n:3d}: decode_many {tot / best_m / 1e6:7.1f} Msamples/s "
              f"({best_m * 1e3:7.1f} ms)   per-payload "
              f"{tot / best_s / 1e6:7.1f} Msamples/s ({best_s * 1e3:7.1f} ms)"
              f"   speedup {best_s / best_m:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
