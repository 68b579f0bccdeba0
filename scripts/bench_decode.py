"""Honest decode-throughput measurements (fetch-anchored timing).

Re-measures the BASELINE.md decode rows with the device->host fetch anchor
(bench.measure_decode): on the tunneled axon backend block_until_ready can
return before remote execution completes, which inflated earlier decode
numbers.  Usage: python scripts/bench_decode.py [case ...]
cases: mlp128 mlp256 rff kan vmap (default: all)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

from bench import measure_decode  # noqa: E402
from inraudio_tpu.models import (KANConfig, SirenSnakeTanhConfig,  # noqa: E402
                                 build_model, rff_init)

N = 1_000_000


def run_case(name):
    key = jax.random.PRNGKey(0)
    coords = jnp.linspace(-1.0, 1.0, N).reshape(-1, 1)
    if name == "mlp128":
        model = build_model("mlp", SirenSnakeTanhConfig(
            hidden_features=128, first_omega_0=500.0), fused=True,
            approx_sin=True)
    elif name == "mlp256":
        model = build_model("mlp", SirenSnakeTanhConfig(
            hidden_features=256, first_omega_0=500.0), fused=True,
            approx_sin=True)
    elif name == "rff":
        b = rff_init(key, 1, 128, sigma=1500.0)
        model = build_model("mlp", SirenSnakeTanhConfig(
            in_features=256, hidden_features=256), fused=True,
            approx_sin=True, rff_b=b)
    elif name == "kan":
        model = build_model("kan", KANConfig(layers_hidden=(1, 128, 128, 1)),
                            fused=True)
    elif name == "vmap":
        # the bench headline shape: 672 chunks x 512 rows, h=128
        k, rows = 672, 512
        model = build_model("mlp", SirenSnakeTanhConfig(
            hidden_features=128, first_omega_0=500.0), fused=True,
            approx_sin=True)
        params = jax.vmap(model.init)(jax.random.split(key, k))
        c = jnp.broadcast_to(jnp.linspace(-1, 1, rows).reshape(1, -1, 1),
                             (k, rows, 1))
        fn = jax.jit(jax.vmap(lambda p, cc: model.apply(p, cc)))
        msps = measure_decode(fn, (params, c), k * rows)
        print(f"{name}: {msps:.1f} Msamples/s ({k}x{rows} rows)")
        return
    elif name == "stacked":
        # the multi-chunk stacked kernel vs the vmapped single-chunk kernel
        # on the bench headline shape (672 chunks x 512 rows, h=128, one
        # SHARED coordinate grid) — scan chunks-per-step
        from inraudio_tpu.ops.pallas_siren import fused_siren_apply_stacked
        k, rows = 672, 512
        cfg = SirenSnakeTanhConfig(hidden_features=128, first_omega_0=500.0)
        model = build_model("mlp", cfg, fused=True, approx_sin=True)
        params = jax.vmap(model.init)(jax.random.split(key, k))
        c = jnp.linspace(-1, 1, rows).reshape(-1, 1)
        ref = jax.jit(jax.vmap(lambda p: model.apply(p, c)))(params)
        for g in (2, 4, 8, 16, None):
            fn = lambda P, _g=g: fused_siren_apply_stacked(
                P, cfg, c, chunks_per_step=_g, approx_sin=True)
            out = fn(params)
            err = float(jnp.max(jnp.abs(out - ref)))
            msps = measure_decode(fn, (params,), k * rows)
            print(f"{name} g={g}: {msps:.1f} Msamples/s ({k}x{rows} rows) "
                  f"max|diff vs vmap|={err:.2e}")
        return
    elif name == "tune256":
        # VERDICT r3 item 2 + r4 item 3: h=256 decode levers — block_rows x
        # sin poly degree x mixed_matmul x packed_out (the h=128 lesson: the
        # (n, 1) output relayout copy costs more than the kernel,
        # ops/pallas_siren.py packed_out), with output-noise SNR vs the
        # exact XLA apply as the quality gate
        from inraudio_tpu.ops.pallas_siren import fused_siren_apply
        cfg = SirenSnakeTanhConfig(hidden_features=256, first_omega_0=500.0)
        model = build_model("mlp", cfg)  # exact reference apply
        params = model.init(key)
        ref = jax.jit(lambda p, c: model.apply(p, c))(params, coords)
        ref = jax.device_get(ref)
        import numpy as np
        # focused f32-frontier grid (r3 unpacked optimum: block 4096, deg 7
        # + mixed -> 82.7 Ms/s; the goal is the fidelity-neutral tier at
        # >= 100 Ms/s)
        # r4: f32_mode joins the grid — 'bf16x2' double-passes the sine
        # layers (x rounded to bf16, w split) as a decode-only midpoint
        # between the bf16 single-pass tier (floor ~43 dB) and bf16x3
        # (~50-60 with mixed) — candidates for the fidelity-neutral
        # >=100 Msamples/s tier at h=256
        for block in (2048, 4096, 8192):
            for deg, mixed, f32m in (
                    (7, False, None), (7, True, None), (9, False, None),
                    (11, False, None),
                    (7, True, "bf16x2"), (7, False, "bf16x2"),
                    (9, False, "bf16x2"), (9, True, "bf16x2")):
                for packed in (False, True):
                    fn = jax.jit(lambda p, c, b=block, d=deg, m=mixed,
                                 k=packed, fm=f32m:
                                 fused_siren_apply(p, cfg, c, block_rows=b,
                                                   approx_sin=True,
                                                   sin_poly_degree=d,
                                                   mixed_matmul=m,
                                                   packed_out=k,
                                                   f32_mode=fm))
                    msps = measure_decode(fn, (params, coords), N)
                    out = np.asarray(fn(params, coords))
                    if packed:
                        out = out.reshape(-1)[:N].reshape(N, 1)
                    err = out - ref
                    snr = 10 * np.log10(np.sum(ref ** 2)
                                        / max(np.sum(err ** 2), 1e-30))
                    print(f"tune256 block={block} deg={deg} "
                          f"mixed={int(mixed)} f32m={f32m or 'bf16x3'} "
                          f"packed={int(packed)}: "
                          f"{msps:6.1f} Msamples/s  "
                          f"noise-floor {snr:6.1f} dB", flush=True)
        return
    else:
        raise SystemExit(f"unknown case {name}")
    params = model.init(key)
    fn = jax.jit(lambda p, c: model.apply(p, c))
    msps = measure_decode(fn, (params, coords), N)
    print(f"{name}: {msps:.1f} Msamples/s ({N} rows)")


if __name__ == "__main__":
    for case in (sys.argv[1:] or ["mlp128", "mlp256", "rff", "kan", "vmap"]):
        run_case(case)
