"""Measure the decode_many serving win: N clips per dispatch vs N dispatches.

BASELINE.md r5 establishes the stitched decode is transport-bound: ~1.78 ms
fixed cost per device dispatch against a ~223 Msamples/s marginal kernel
rate, so one 7 s clip per call (~0.34 Msamples/dispatch with the stacked
kernel's single call) caps near ~193 Msamples/s.  ``codec.decode_many``
concatenates compatible payloads' chunk populations into ONE stacked eval —
this script measures what that buys wall-clock at serving fan-ins N=1..8.

Usage: python scripts/bench_decode_many.py [steps] [Ns...]
  steps — encode budget for the probe payload (default 120: the decode
          shape, not the fit quality, is what's under test)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from inraudio_tpu.codec import CodecConfig, decode, decode_many, encode  # noqa: E402
from inraudio_tpu.data.audio_io import read_wav  # noqa: E402

WAV = os.environ.get("BENCH_WAV", "/root/reference/gt_bach.wav")


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    ns = [int(a) for a in sys.argv[2:]] or [1, 2, 4, 8]
    fs, sig = read_wav(WAV, channel=0)

    # Headline decode shape: 512-row chunks, h=128 (bench.py's BENCH_CHUNK_S)
    cfg = CodecConfig(chunk_seconds=0.01161, overlap_fraction=0.1,
                      total_steps=steps, fused=True)
    t0 = time.time()
    pay = encode(np.asarray(sig, np.float32), fs, cfg)
    k = pay["meta"]["num_chunks"]
    print(f"payload: {k} chunks, chunk_length={pay['meta']['chunk_length']}, "
          f"fit_snr_db={pay['meta'].get('fit_snr_db')}, "
          f"encode {time.time() - t0:.1f}s")

    n_samples = pay["meta"]["signal_length"]
    for n in ns:
        pays = [pay] * n
        # warm both paths (compile once per tier/shape)
        decode(pay)
        decode_many(pays)
        seq_best = many_best = float("inf")
        for _ in range(5):
            t = time.time()
            outs = [decode(p) for p in pays]
            seq_best = min(seq_best, time.time() - t)
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
