"""Pallas fused-kernel A/B tests against the jnp reference implementation.

On the CPU test mesh the kernels run in interpreter mode (Mosaic compiles
only on TPU); numerical equivalence there validates the kernel logic, and
bench.py exercises the compiled path on the real chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inraudio_tpu.models import SirenSnakeTanhConfig, build_model
from inraudio_tpu.ops import fused_siren_apply

KEY = jax.random.PRNGKey(3)


CONFIGS = [
    SirenSnakeTanhConfig(),  # production: sine_first + 2 sine + 2 snake + lin
    SirenSnakeTanhConfig(first_omega_0=300.0, hidden_features=128,
                         num_sine=1, num_snake=1, num_tanh=1),
    SirenSnakeTanhConfig(in_features=2, first_omega_0=30.0,
                         hidden_features=128, num_sine=2, num_snake=0),
    SirenSnakeTanhConfig(first_linear=True, hidden_features=128),
    SirenSnakeTanhConfig(last_linear=False, hidden_features=128),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=lambda c: c.layer_kinds and
                         "-".join(k[:4] for k in c.layer_kinds))
def test_fused_matches_reference(cfg):
    model = build_model("mlp", cfg)
    params = model.init(KEY)
    coords = jax.random.uniform(KEY, (777, cfg.in_features), jnp.float32,
                                -1.0, 1.0)
    ref = model.apply(params, coords)
    out = fused_siren_apply(params, cfg, coords, block_rows=256,
                            interpret=True)
    assert out.shape == ref.shape
    # omega0 amplifies 1-ulp differences in the first pre-activation by
    # ~omega0*eps inside sin; at omega0=22000 that is ~2e-3 of a unit-
    # amplitude output (both paths are exact-f32 — the orderings differ)
    atol = 2e-5 if cfg.first_omega_0 <= 1000 else 1e-2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=atol, rtol=1e-4)


def test_fused_handles_non_tile_multiple_rows():
    cfg = SirenSnakeTanhConfig(first_omega_0=300.0, hidden_features=128,
                               num_sine=1, num_snake=1)
    model = build_model("mlp", cfg)
    params = model.init(KEY)
    for n in (1, 7, 255, 256, 1000):
        coords = jnp.linspace(-1, 1, n).reshape(-1, 1)
        ref = model.apply(params, coords)
        out = fused_siren_apply(params, cfg, coords, block_rows=256,
                                interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)


def test_fused_rejects_wide_inputs():
    cfg = SirenSnakeTanhConfig(in_features=256)
    model = build_model("mlp", cfg)
    params = model.init(KEY)
    with pytest.raises(ValueError):
        fused_siren_apply(params, cfg, jnp.zeros((4, 256)), interpret=True)


@pytest.mark.parametrize("num_freq,d", [(64, 1), (128, 1), (64, 2)])
def test_fused_rff_matches_xla_encoding(num_freq, d):
    """The in-kernel RFF fold is a drop-in for rff_apply + the XLA model:
    same features (cos-first layout), same output."""
    from inraudio_tpu.models import rff_apply, rff_init
    cfg = SirenSnakeTanhConfig(in_features=2 * num_freq, first_omega_0=30.0,
                               hidden_features=128, num_sine=1, num_snake=1)
    model = build_model("mlp", cfg)
    params = model.init(KEY)
    rff_b = rff_init(jax.random.PRNGKey(7), d, num_freq, sigma=10.0)
    coords = jax.random.uniform(KEY, (777, d), jnp.float32, -1.0, 1.0)
    ref = model.apply(params, rff_apply(rff_b, coords))
    out = fused_siren_apply(params, cfg, coords, block_rows=256,
                            interpret=True, rff_b=rff_b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_rff_via_build_model():
    """build_model(rff_b=...) owns the encoding on both paths."""
    from inraudio_tpu.models import rff_apply, rff_init
    num_freq = 64
    cfg = SirenSnakeTanhConfig(in_features=2 * num_freq, first_omega_0=30.0,
                               hidden_features=64, num_sine=1, num_snake=0)
    rff_b = rff_init(jax.random.PRNGKey(9), 1, num_freq)
    coords = jnp.linspace(-1, 1, 300).reshape(-1, 1)
    m_xla = build_model("mlp", cfg, rff_b=rff_b)
    m_fused = build_model("mlp", cfg, fused=True, interpret=True,
                          rff_b=rff_b)
    params = m_xla.init(KEY)
    plain = build_model("mlp", cfg)
    ref = plain.apply(params, rff_apply(rff_b, coords))
    np.testing.assert_allclose(np.asarray(m_xla.apply(params, coords)),
                               np.asarray(ref), atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m_fused.apply(params, coords)),
                               np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_fast_sin_cos_accuracy():
    """Cody-Waite + degree-11 polynomial: |err| ~1e-6 abs across the
    framework's argument range, including first-layer omega0*coord ~ 2e4
    and WaveformFittingExp's scale=100 coords at omega ~ 3e3."""
    from inraudio_tpu.ops.pallas_siren import _fast_cos, _fast_sin
    for lo, hi in ((-np.pi, np.pi), (-100.0, 100.0), (-22000.0, 22000.0),
                   (-3e5, 3e5)):
        x = jnp.asarray(np.random.default_rng(0).uniform(lo, hi, 200_000),
                        jnp.float32)
        es = float(jnp.max(jnp.abs(_fast_sin(x) - jnp.sin(x))))
        ec = float(jnp.max(jnp.abs(_fast_cos(x) - jnp.cos(x))))
        assert es < 2e-5 and ec < 2e-5, (lo, hi, es, ec)


def test_fused_apply_approx_sin_close():
    cfg = SirenSnakeTanhConfig(first_omega_0=22000.0, hidden_features=128,
                               num_sine=1, num_snake=1)
    model = build_model("mlp", cfg)
    params = model.init(jax.random.PRNGKey(3))
    coords = jnp.linspace(-1, 1, 700).reshape(-1, 1)
    ref = model.apply(params, coords)
    out = fused_siren_apply(params, cfg, coords, block_rows=256,
                            interpret=True, approx_sin=True)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-3


def test_kernel_dot_bf16x3_accuracy():
    """The hand-rolled 3-pass split keeps ~21 effective mantissa bits —
    orders of magnitude tighter than a single bf16 pass (~8 bits)."""
    from inraudio_tpu.ops.pallas_siren import _kernel_dot
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((256, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)
    exact = np.asarray(x, np.float64) @ np.asarray(w, np.float64)
    import os
    old = os.environ.get("INRAUDIO_F32_PRECISION")
    try:
        os.environ["INRAUDIO_F32_PRECISION"] = "bf16x3"
        out3 = np.asarray(_kernel_dot(x, w, (((1,), (0,)), ((), ())),
                                      jnp.float32), np.float64)
        os.environ["INRAUDIO_F32_PRECISION"] = "highest"
        outh = np.asarray(_kernel_dot(x, w, (((1,), (0,)), ((), ())),
                                      jnp.float32), np.float64)
    finally:
        if old is None:
            os.environ.pop("INRAUDIO_F32_PRECISION", None)
        else:
            os.environ["INRAUDIO_F32_PRECISION"] = old
    scale = np.max(np.abs(exact))
    err3 = np.max(np.abs(out3 - exact)) / scale
    errh = np.max(np.abs(outh - exact)) / scale
    single = np.asarray(
        x.astype(jnp.bfloat16).astype(jnp.float32) @
        w.astype(jnp.bfloat16).astype(jnp.float32), np.float64)
    err1 = np.max(np.abs(single - exact)) / scale
    assert err3 < 2e-5, err3          # ~21-bit
    assert errh < 5e-7, errh          # f32 rounding
    assert err1 > 50 * err3, (err1, err3)  # one pass is far worse


def test_kernel_dot_bf16x2_midpoint():
    """The 2-pass split (x rounded to bf16, w kept hi+lo) sits between one
    pass and the 3-pass split on the error ladder: w is fully accurate but
    x carries bf16 rounding, so the error is ~half a single pass's and far
    above bf16x3's."""
    from inraudio_tpu.ops.pallas_siren import _kernel_dot
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((256, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)
    exact = np.asarray(x, np.float64) @ np.asarray(w, np.float64)
    dims = (((1,), (0,)), ((), ()))
    import os
    old = os.environ.get("INRAUDIO_F32_PRECISION")
    try:
        errs = {}
        for mode in ("bf16", "bf16x2", "bf16x3"):
            os.environ["INRAUDIO_F32_PRECISION"] = mode
            out = np.asarray(_kernel_dot(x, w, dims, jnp.float32),
                             np.float64)
            errs[mode] = np.max(np.abs(out - exact)) / np.max(np.abs(exact))
    finally:
        if old is None:
            os.environ.pop("INRAUDIO_F32_PRECISION", None)
        else:
            os.environ["INRAUDIO_F32_PRECISION"] = old
    assert errs["bf16x2"] < errs["bf16"], errs
    assert errs["bf16x2"] > 10 * errs["bf16x3"], errs


def test_sin_poly_degree_floors():
    """deg 9 / 7 polynomials hit their documented error floors."""
    import jax.numpy as jnp
    from inraudio_tpu.ops.pallas_siren import _fast_cos, _fast_sin
    x = jnp.linspace(-2e4, 2e4, 400001)
    for deg, bound in ((11, 2e-6), (9, 4e-5), (7, 1.5e-3)):
        es = float(jnp.max(jnp.abs(_fast_sin(x, deg) - jnp.sin(x))))
        ec = float(jnp.max(jnp.abs(_fast_cos(x, deg) - jnp.cos(x))))
        assert es < bound and ec < bound, (deg, es, ec)


def test_mixed_matmul_decode_matches_reference():
    """mixed_matmul single-passes non-sine layers in bf16: output must stay
    within the bf16 activation floor of the uniform-precision kernel."""
    import jax
    import jax.numpy as jnp
    from inraudio_tpu.models import SirenSnakeTanhConfig, build_model
    from inraudio_tpu.ops.pallas_siren import fused_siren_apply
    cfg = SirenSnakeTanhConfig(first_omega_0=300.0, hidden_features=64,
                               num_sine=1, num_snake=1)
    model = build_model("mlp", cfg)
    p = model.init(jax.random.PRNGKey(0))
    coords = jnp.linspace(-1, 1, 512).reshape(-1, 1)
    ref = model.apply(p, coords)
    out = fused_siren_apply(p, cfg, coords, block_rows=512,
                            interpret=True, mixed_matmul=True)
    scale = float(jnp.max(jnp.abs(ref)))
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 2e-2 * max(scale, 1e-3), err


def test_packed_out_matches_reshaped():
    """packed_out returns the raw (n_pad // 128, 128) kernel block; host
    reshape must reproduce the standard (n, 1) output exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from inraudio_tpu.models import SirenSnakeTanhConfig, build_model
    from inraudio_tpu.ops.pallas_siren import fused_siren_apply
    cfg = SirenSnakeTanhConfig(first_omega_0=300.0, hidden_features=64,
                               num_sine=1, num_snake=1)
    model = build_model("mlp", cfg)
    p = model.init(jax.random.PRNGKey(0))
    n = 1500  # pads to 2048 rows
    coords = jnp.linspace(-1, 1, n).reshape(-1, 1)
    ref = np.asarray(fused_siren_apply(p, cfg, coords, block_rows=1024,
                                       interpret=True))
    packed = np.asarray(fused_siren_apply(p, cfg, coords, block_rows=1024,
                                          interpret=True, packed_out=True))
    assert packed.shape == (2048 // 128, 128)
    np.testing.assert_array_equal(packed.reshape(-1)[:n], ref[:, 0])


def test_packed_out_rounds_small_blocks_to_compact():
    """A sub-1024 tile request under packed_out is rounded up to the compact
    layout instead of failing (the cost-model pick may be non-compact)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from inraudio_tpu.models import SirenSnakeTanhConfig, build_model
    from inraudio_tpu.ops.pallas_siren import fused_siren_apply
    cfg = SirenSnakeTanhConfig(first_omega_0=300.0, hidden_features=64,
                               num_sine=1, num_snake=1)
    model = build_model("mlp", cfg)
    p = model.init(jax.random.PRNGKey(0))
    n = 256
    coords = jnp.linspace(-1, 1, n).reshape(-1, 1)
    ref = np.asarray(fused_siren_apply(p, cfg, coords, block_rows=256,
                                       interpret=True))
    packed = np.asarray(fused_siren_apply(p, cfg, coords, block_rows=512,
                                          interpret=True, packed_out=True))
    assert packed.shape == (1024 // 128, 128)  # rounded up to one 1024 tile
    np.testing.assert_allclose(packed.reshape(-1)[:n], ref[:, 0], atol=1e-6)


def test_auto_decode_kwargs_tiers():
    """The quality gate picks the fastest tier whose measured floor clears
    fit SNR + margin, and falls back to exact sin at headline fidelity."""
    import jax.numpy as jnp
    from inraudio_tpu.ops.pallas_siren import auto_decode_kwargs
    assert auto_decode_kwargs(33.6)["compute_dtype"] == jnp.bfloat16
    kw = auto_decode_kwargs(39.0)
    assert kw.get("mixed_matmul") and kw["sin_poly_degree"] == 7
    # r4 tier-2 swap: bf16x2 matmuls at the same measured floors, 1.16x
    # the throughput (bench_logs_r4/40_trained_floor.log, 23_tune256_x2)
    assert kw.get("f32_mode") == "bf16x2"
    assert auto_decode_kwargs(60.0)["sin_poly_degree"] == 9
    assert auto_decode_kwargs(124.9)["sin_poly_degree"] == 11
    assert auto_decode_kwargs(130.0) == {"approx_sin": False}
    # high-phase regime (omega0 >= 2000, r5 restamped floors): bf16 tiers
    # floor near ~43 dB (omega-amplified matmul rounding) so the
    # reference-default 33.6 dB fit keeps the fast bf16 tier; mid-fidelity
    # fits ride the bf16x3 deg-9 tier (measured floor 85.8 at omega0=22000,
    # bench_logs_r5/20_l0exact_floor_full.log) instead of falling to
    # exact-sin, which shares the same ~87 dB bf16x3 ceiling there
    hp = auto_decode_kwargs(33.6, first_omega_0=22000.0)
    assert hp["compute_dtype"] == jnp.bfloat16
    assert auto_decode_kwargs(39.0, first_omega_0=22000.0)[
        "sin_poly_degree"] == 9
    assert auto_decode_kwargs(70.0, first_omega_0=22000.0)[
        "sin_poly_degree"] == 9
    # above the ~87 dB high-phase matmul ceiling: exact sin (same ceiling,
    # but no polynomial term on top)
    assert auto_decode_kwargs(80.0, first_omega_0=22000.0) == {
        "approx_sin": False}
    # moderate omega keeps the full ladder
    assert auto_decode_kwargs(39.0, first_omega_0=115.0).get(
        "mixed_matmul")


def test_decode_dense_quality_gate_routes_through_tier():
    """decode_dense(fit_snr_db=...) routes a fused model through the
    quality-gated tier: output matches the exact apply within the tier's
    noise floor, and None keeps the training-apply path bit-exact."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from inraudio_tpu.eval.decode import decode_dense
    from inraudio_tpu.models import SirenSnakeTanhConfig, build_model
    cfg = SirenSnakeTanhConfig(first_omega_0=300.0, hidden_features=64,
                               num_sine=1, num_snake=1)
    model = build_model("mlp", cfg, fused=True, approx_sin=True,
                        interpret=True)
    assert model.decode_apply is not None
    p = model.init(jax.random.PRNGKey(0))
    coords = np.linspace(-1, 1, 700, dtype=np.float32).reshape(-1, 1)
    exact = np.asarray(jax.jit(model.apply)(p, jnp.asarray(coords)))
    gated = decode_dense(model, p, coords, fit_snr_db=25.0)
    assert gated.shape == exact.shape
    # 25 dB fit -> bf16 + deg-7 tier (floor ~43 dB): relative error must
    # stay well under the tier's quality budget
    scale = float(np.max(np.abs(exact)))
    assert float(np.max(np.abs(gated - exact))) < 2e-2 * max(scale, 1e-3)
    ungated = decode_dense(model, p, coords)
    np.testing.assert_array_equal(ungated, exact)


def test_f32_mode_decode_tier_ladder():
    """Per-call f32_mode overrides the env precision for the decode kernel:
    bf16x2 (2-pass, x rounded) must sit between bf16x3 and a pure-bf16
    compute in accuracy, and every mode must stay within its expected
    floor of the exact apply."""
    cfg = SirenSnakeTanhConfig(first_omega_0=300.0, hidden_features=64,
                               num_sine=1, num_snake=1)
    model = build_model("mlp", cfg)
    p = model.init(jax.random.PRNGKey(0))
    coords = jnp.linspace(-1, 1, 512).reshape(-1, 1)
    ref = model.apply(p, coords)
    scale = float(jnp.max(jnp.abs(ref)))

    def err(**kw):
        out = fused_siren_apply(p, cfg, coords, block_rows=512,
                                interpret=True, **kw)
        return float(jnp.max(jnp.abs(out - ref)))

    e_x3 = err()                      # default bf16x3
    e_x2 = err(f32_mode="bf16x2")
    e_bf = err(compute_dtype=jnp.bfloat16)
    assert e_x3 < 1e-4 * max(scale, 1e-3), e_x3
    assert e_x2 < 1e-2 * max(scale, 1e-3), e_x2
    # the ladder must be ordered: 3-pass <= 2-pass <= 1-pass bf16
    assert e_x3 <= e_x2 <= e_bf * 4, (e_x3, e_x2, e_bf)
    # f32_mode composes with mixed_matmul (sine 2-pass, non-sine 1-pass)
    e_x2m = err(f32_mode="bf16x2", mixed_matmul=True)
    assert e_x2m < 2e-2 * max(scale, 1e-3), e_x2m


# ---------------------------------------------------------------------------
# multi-chunk stacked decode kernel (ops/pallas_siren.fused_siren_apply_stacked)
# ---------------------------------------------------------------------------

def _stacked_population(cfg, k):
    model = build_model("mlp", cfg)
    return model, jax.vmap(model.init)(jax.random.split(KEY, k))


@pytest.mark.parametrize("cfg", CONFIGS, ids=lambda c: c.layer_kinds and
                         "-".join(k[:4] for k in c.layer_kinds))
def test_stacked_matches_vmapped_reference(cfg):
    if cfg.in_features > 1:
        pytest.skip("stacked decode serves the 1-D multi-INR chunk grid")
    model, params = _stacked_population(cfg, 5)
    coords = jnp.linspace(-1, 1, 300).reshape(-1, 1)  # non-128-multiple rows
    ref = jax.vmap(lambda p: model.apply(p, coords))(params)
    from inraudio_tpu.ops.pallas_siren import fused_siren_apply_stacked
    out = fused_siren_apply_stacked(params, cfg, coords, chunks_per_step=2,
                                    interpret=True)
    assert out.shape == ref.shape
    atol = 2e-5 if cfg.first_omega_0 <= 1000 else 1e-2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=atol, rtol=1e-4)


def test_stacked_matches_single_chunk_kernel_tiers():
    # every quality-tier kwarg must mean the SAME numerics in both kernels
    cfg = SirenSnakeTanhConfig(hidden_features=64, num_sine=1, num_snake=1,
                               first_omega_0=300.0)
    _, params = _stacked_population(cfg, 3)
    coords = jnp.linspace(-1, 1, 256).reshape(-1, 1)
    from inraudio_tpu.ops.pallas_siren import (fused_siren_apply,
                                               fused_siren_apply_stacked)
    for kw in (dict(),
               dict(approx_sin=True, sin_poly_degree=7, mixed_matmul=True),
               dict(approx_sin=True, sin_poly_degree=9, f32_mode="bf16x2"),
               dict(approx_sin=True, compute_dtype=jnp.bfloat16),
               dict(approx_sin=True, exact_first_sin=True)):
        one = jax.vmap(lambda p: fused_siren_apply(
            p, cfg, coords, block_rows=256, interpret=True, **kw))(params)
        many = fused_siren_apply_stacked(params, cfg, coords,
                                         chunks_per_step=2, interpret=True,
                                         **kw)
        np.testing.assert_allclose(np.asarray(many), np.asarray(one),
                                   atol=1e-6, rtol=1e-6, err_msg=str(kw))


def test_stacked_pads_chunk_count():
    # k not a multiple of chunks_per_step: padded with chunk 0, sliced off
    cfg = SirenSnakeTanhConfig(hidden_features=32, num_sine=1, num_snake=0,
                               num_tanh=0, first_omega_0=100.0)
    model, params = _stacked_population(cfg, 7)
    coords = jnp.linspace(-1, 1, 128).reshape(-1, 1)
    from inraudio_tpu.ops.pallas_siren import fused_siren_apply_stacked
    out = fused_siren_apply_stacked(params, cfg, coords, chunks_per_step=4,
                                    interpret=True)
    ref = jax.vmap(lambda p: model.apply(p, coords))(params)
    assert out.shape == (7, 128, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_stacked_supported_gates():
    from inraudio_tpu.ops.pallas_siren import stacked_supported
    assert stacked_supported(SirenSnakeTanhConfig(hidden_features=64), 512)
    # RFF models present in_features = 2F > 8 -> vmap fallback
    assert not stacked_supported(
        SirenSnakeTanhConfig(in_features=256, hidden_features=64), 512)


def test_chunk_eval_fn_routes_stacked_and_falls_back():
    from inraudio_tpu.train.multi_inr import chunk_eval_fn
    cfg = SirenSnakeTanhConfig(hidden_features=32, num_sine=1, num_snake=1,
                               first_omega_0=100.0)
    fused = build_model("mlp", cfg, fused=True, approx_sin=True,
                        interpret=True)
    exact = build_model("mlp", cfg)
    params = jax.vmap(exact.init)(jax.random.split(KEY, 3))
    coords = np.linspace(-1, 1, 200, dtype=np.float32).reshape(-1, 1)
    ref = jax.vmap(lambda p: exact.apply(p, coords))(params)
    for model in (fused, exact):
        for fit in (None, 20.0):
            out = chunk_eval_fn(model, coords, fit)(params)
            assert out.shape == (3, 200, 1)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=5e-4)
