"""Decode-only restamp of this round's saved payloads.

The r4 decode fix (commit 1224932: XLA hidden matmuls were one-pass bf16
on TPU) means every codec SNR measured through ``decode`` before it is a
LOWER BOUND wherever the true quality sits near/above ~58 dB.  The
payloads themselves are fine — re-decode them with the fixed path and
print corrected SNRs.  No retraining.

Usage: python scripts/restamp_decode.py <payload> <source_wav> [...]
  default: the known r4 /tmp artifacts that still exist.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np  # noqa: E402

from inraudio_tpu.codec import decode, load_inr  # noqa: E402
from inraudio_tpu.data import read_wav  # noqa: E402
from inraudio_tpu.dsp import calculate_snr  # noqa: E402

GT = "/root/reference/gt_bach.wav"
DEFAULT = [
    ("/tmp/hifi_None_side0.inr.inra", GT),
    ("/tmp/hifi_float16_side0.inr.inra", GT),
    ("/tmp/hifi_float16_side1.inr.inra", GT),
    ("/tmp/hifi_int16_side1.inr.inra", GT),
    ("/tmp/long60.inra", "/tmp/long60.wav"),
    ("/tmp/mod_seg1_h128.inr.inra", GT),
    ("/tmp/mod_seg1_h128_i16.inr.inra", GT),
    ("/tmp/mod_seg1_h96_i16.inr.inra", GT),
    ("/tmp/mod_mid.inr.inra", GT),
    ("/tmp/mod_wide.inr.inra", GT),
]


def main() -> None:
    argv = sys.argv[1:]
    pairs = (list(zip(argv[::2], argv[1::2])) if argv else
             [(p, w) for p, w in DEFAULT if os.path.exists(p)])
    for path, wav in pairs:
        fs, sig = read_wav(wav, channel=0)
        sig = sig.astype(np.float32)
        _, rec = decode(load_inr(path))
        m = min(len(rec), len(sig))
        snr = float(calculate_snr(sig[:m], np.asarray(rec)[:m]))
        print(json.dumps({"payload": os.path.basename(path),
                          "snr_db": round(snr, 2)}), flush=True)


if __name__ == "__main__":
    main()
