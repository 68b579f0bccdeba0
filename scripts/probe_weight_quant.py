"""CPU probe: does int16 beat fp16 for per-chunk WEIGHT payloads too?

probe_mod_quant.py showed int16-per-column beats fp16 by +20 dB at equal
bytes on MODULATION matrices.  Weights differ: values span a wider range
within a leaf, where fp16's floating point could in principle out-resolve
a uniform 16-bit grid on the small entries.  But reconstruction error in
a linear layer is driven by ABSOLUTE weight perturbations, so the uniform
grid should still win.  This fits the per-chunk codec at high SNR on the
same 1 s decimated-gt_bach setup, then decodes the SAME fit at each
quantize tier (posthoc, no refit):

Run: python scripts/probe_weight_quant.py [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from inraudio_tpu.codec import (CodecConfig, decode, encode,  # noqa: E402
                                quantize_inr_params)
from inraudio_tpu.data.audio_io import decimate, read_wav  # noqa: E402
from inraudio_tpu.dsp.snr import calculate_snr  # noqa: E402


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    rate, wav = read_wav("/root/reference/gt_bach.wav", channel=0)
    wav = decimate(wav, 4)
    rate //= 4
    sig = wav[: rate].astype(np.float32)  # 1 s @ 11025 Hz
    cfg = CodecConfig(chunk_seconds=0.05, hidden_features=64,
                      first_omega_0=125.0, learning_rate=1e-3,
                      total_steps=steps, quantize=None)
    t0 = time.time()
    payload = encode(sig, rate, cfg)
    print(f"fit: {steps} steps, {payload['meta']['num_chunks']} chunks, "
          f"{time.time() - t0:.1f} s", flush=True)
    _, rec = decode(payload)
    print(f"float    SNR {float(calculate_snr(sig, rec)):7.2f} dB",
          flush=True)
    for mode in ("float16", "int16", "int8"):
        qp = quantize_inr_params(payload["params"], mode)
        p = {"meta": dict(payload["meta"], quantize=mode,
                          side_quantized=True),
             "scales": payload["scales"], "params": qp}
        _, recq = decode(p)
        snr = float(calculate_snr(sig, recq))
        print(f"{mode:8s} SNR {snr:7.2f} dB", flush=True)


if __name__ == "__main__":
    main()
