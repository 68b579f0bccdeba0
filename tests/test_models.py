"""Model-zoo unit tests (SURVEY.md section 4, item 2): init distribution
bounds, forward shapes, gradient flow, KAN spline identities, Snake
periodic-ramp behavior, encoding layouts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inraudio_tpu.models import (
    INRModel, KANConfig, ReluMLPConfig, SirenConfig, SirenSnakeTanhConfig,
    b_splines, build_model, curve2coeff, kan_linear_init, kan_linear_update_grid,
    kan_regularization_loss, num_frequencies_nyquist, param_bytes, param_count,
    posenc_nerf, posenc_output_dim, rff_apply, rff_init, scaled_sine_layer_apply,
    scaled_sine_layer_init, sine_layer_init, siren_activations,
    siren_snake_tanh_activations, snake_apply, snake_init,
)

KEY = jax.random.PRNGKey(0)


# ---------------------------------------------------------------------------
# SIREN init + forward
# ---------------------------------------------------------------------------

class TestSirenInit:
    def test_first_layer_bound(self):
        # models.py:105-108: first layer W ~ U(-1/in, 1/in)
        p = sine_layer_init(KEY, 2, 4096, is_first=True, omega0=30.0)
        w = np.asarray(p["w"])
        assert np.all(np.abs(w) <= 1.0 / 2 + 1e-7)
        assert np.max(np.abs(w)) > 0.8 * (1.0 / 2)  # actually fills the range

    def test_hidden_layer_bound(self):
        # models.py:109-112: hidden W ~ U(-sqrt(6/in)/omega, +sqrt(6/in)/omega)
        p = sine_layer_init(KEY, 256, 4096, omega0=30.0)
        bound = np.sqrt(6.0 / 256) / 30.0
        w = np.asarray(p["w"])
        assert np.all(np.abs(w) <= bound + 1e-9)
        assert np.max(np.abs(w)) > 0.8 * bound

    def test_forward_shape_and_range(self):
        model = build_model("siren", SirenConfig(in_features=1))
        params = model.init(KEY)
        coords = jnp.linspace(-1, 1, 100).reshape(-1, 1)
        out = model.apply(params, coords)
        assert out.shape == (100, 1)
        assert out.dtype == jnp.float32

    def test_gradients_flow(self):
        model = build_model("siren", SirenConfig(hidden_features=32,
                                                 hidden_layers=1))
        params = model.init(KEY)
        coords = jnp.linspace(-1, 1, 64).reshape(-1, 1)

        def loss(p):
            return jnp.mean(model.apply(p, coords) ** 2)

        grads = jax.grad(loss)(params)
        norms = [float(jnp.linalg.norm(g)) for g in jax.tree.leaves(grads)]
        assert all(np.isfinite(n) for n in norms)
        assert any(n > 0 for n in norms)


class TestSirenSnakeTanh:
    def test_layer_recipe(self):
        # run.py:30 defaults -> sine_first, 2 sine, 2 snake, linear head
        cfg = SirenSnakeTanhConfig()
        assert cfg.layer_kinds == ("sine_first", "sine", "sine",
                                   "linear_snake", "linear_snake",
                                   "linear_last")
        cfg2 = SirenSnakeTanhConfig(first_linear=True, num_tanh=1)
        assert cfg2.layer_kinds[0] == "linear_snake"
        assert cfg2.layer_kinds[-2] == "linear_tanh"

    def test_forward_and_param_count(self):
        cfg = SirenSnakeTanhConfig()
        model = build_model("mlp", cfg)
        params = model.init(KEY)
        # 1->256 (+b), 3x 256->256 (+b), 256->256 (+b) + 2x snake a, 256->1 (+b)
        expected = (1 * 256 + 256) + 4 * (256 * 256 + 256) + 2 * 256 + (256 + 1)
        assert param_count(params) == expected
        assert param_bytes(params) == expected * 4
        out = model.apply(params, jnp.zeros((17, 1)))
        assert out.shape == (17, 1)

    def test_activations_introspection(self):
        cfg = SirenSnakeTanhConfig(hidden_features=16, num_sine=1, num_snake=1)
        params = build_model("mlp", cfg).init(KEY)
        coords = jnp.linspace(-1, 1, 8).reshape(-1, 1)
        acts = siren_snake_tanh_activations(params, cfg, coords)
        assert "input" in acts and "layer0_pre" in acts
        final = acts[f"layer{len(cfg.layer_kinds) - 1}"]
        ref = build_model("mlp", cfg).apply(params, coords)
        np.testing.assert_allclose(np.asarray(final), np.asarray(ref),
                                   atol=1e-6)

    def test_sine_ranges(self):
        cfg = SirenSnakeTanhConfig(hidden_features=32)
        params = build_model("mlp", cfg).init(KEY)
        acts = siren_snake_tanh_activations(
            params, cfg, jnp.linspace(-1, 1, 50).reshape(-1, 1))
        assert np.all(np.abs(np.asarray(acts["layer0"])) <= 1.0 + 1e-6)


class TestScaledSine:
    def test_first_layer_omega_linspace(self):
        # models.py:165-178: neuron k scaled by omega0 * linspace(0,1)[k]/out
        p = scaled_sine_layer_init(KEY, 1, 8, is_first=True, omega0=100.0)
        expected = np.linspace(0, 1, 8) / 8 * 100.0
        np.testing.assert_allclose(np.asarray(p["omega_scale"]), expected,
                                   rtol=1e-6)
        out = scaled_sine_layer_apply(p, jnp.ones((4, 1)))
        assert out.shape == (4, 8)
        # neuron 0 has omega 0 -> sin(0) = 0 identically
        np.testing.assert_allclose(np.asarray(out[:, 0]), 0.0, atol=1e-7)


class TestSnake:
    def test_constant_init(self):
        a = snake_init(KEY, 16, a_initial=0.5)
        np.testing.assert_allclose(np.asarray(a), 0.5)

    def test_exponential_init(self):
        a = snake_init(KEY, 20000, a_initial=None)
        assert np.all(np.asarray(a) > 0)
        assert abs(float(jnp.mean(a)) - 0.1) < 0.01  # Exponential(0.1) mean

    def test_matches_definition(self):
        # x + (1/a) sin^2(a x), models.py:235-241
        a = jnp.asarray([0.5, 2.0])
        x = jnp.asarray([[0.3, -1.2], [2.0, 0.0]])
        expected = x + (1.0 / a) * jnp.sin(a * x) ** 2
        np.testing.assert_allclose(np.asarray(snake_apply(a, x)),
                                   np.asarray(expected), atol=1e-6)

    def test_monotone_ramp(self):
        # snake(x) - x is periodic with period pi/a
        a = jnp.asarray([2.0])
        x = jnp.linspace(-3, 3, 101).reshape(-1, 1)
        resid = snake_apply(a, x) - x
        period = np.pi / 2.0
        np.testing.assert_allclose(np.asarray(snake_apply(a, x + period) - (x + period)),
                                   np.asarray(resid), atol=1e-5)


def test_sine_activation_parity():
    """Reference SineActivation (models.py:80-82): sin(30 * x) — the last
    unported symbol, dead in the reference too."""
    from inraudio_tpu.models import sine_activation
    x = jnp.linspace(-2, 2, 64)
    np.testing.assert_allclose(np.asarray(sine_activation(x)),
                               np.sin(30 * np.asarray(x)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sine_activation(x, omega=7.0)),
                               np.sin(7 * np.asarray(x)), atol=1e-5)


# ---------------------------------------------------------------------------
# Encodings
# ---------------------------------------------------------------------------

class TestEncodings:
    def test_rff_layout(self):
        b = rff_init(KEY, 1, 64, sigma=10.0)
        assert b.shape == (64, 1)
        coords = jnp.linspace(-1, 1, 32).reshape(-1, 1)
        enc = rff_apply(b, coords)
        assert enc.shape == (32, 128)
        # layout: [cos | sin] of the same projection (rff GaussianEncoding)
        vp = 2 * jnp.pi * coords @ b.T
        np.testing.assert_allclose(np.asarray(enc[:, :64]),
                                   np.asarray(jnp.cos(vp)), atol=1e-4)
        np.testing.assert_allclose(np.asarray(enc[:, 64:]),
                                   np.asarray(jnp.sin(vp)), atol=1e-4)

    def test_rff_sigma_scales_b(self):
        b1 = rff_init(KEY, 1, 4096, sigma=1.0)
        b10 = rff_init(KEY, 1, 4096, sigma=10.0)
        np.testing.assert_allclose(np.asarray(b10), 10 * np.asarray(b1))
        assert abs(float(jnp.std(b1)) - 1.0) < 0.05

    def test_rff_not_trained(self):
        b = rff_init(KEY, 1, 8)
        g = jax.grad(lambda bb: jnp.sum(rff_apply(bb, jnp.ones((2, 1)))))(b)
        np.testing.assert_allclose(np.asarray(g), 0.0)

    def test_posenc_dims_and_values(self):
        coords = jnp.asarray([[0.5, -0.25]])
        enc = posenc_nerf(coords, 3)
        assert enc.shape == (1, posenc_output_dim(2, 3))
        assert posenc_output_dim(2, 3) == 2 + 2 * 2 * 3
        np.testing.assert_allclose(np.asarray(enc[0, :2]), [0.5, -0.25])
        np.testing.assert_allclose(float(enc[0, 2]), np.sin(np.pi * 0.5),
                                   atol=1e-6)

    def test_nyquist_frequency_count(self):
        # models.py:43-45: int(log2(0.5 * samples))
        assert num_frequencies_nyquist(1024) == 9
        assert num_frequencies_nyquist(44100) == 14


# ---------------------------------------------------------------------------
# KAN
# ---------------------------------------------------------------------------

class TestKAN:
    def test_bspline_partition_of_unity(self):
        cfg = KANConfig()
        p = kan_linear_init(KEY, cfg, 2, 3)
        x = jax.random.uniform(KEY, (64, 2), minval=-0.99, maxval=0.99)
        bases = b_splines(x, p["grid"], cfg.spline_order)
        assert bases.shape == (64, 2, cfg.grid_size + cfg.spline_order)
        np.testing.assert_allclose(np.asarray(bases.sum(-1)), 1.0, atol=1e-5)
        assert np.all(np.asarray(bases) >= -1e-7)

    @pytest.mark.slow
    def test_curve2coeff_interpolates(self):
        cfg = KANConfig()
        p = kan_linear_init(KEY, cfg, 1, 1)
        x = jnp.linspace(-0.95, 0.95, 30).reshape(-1, 1)
        y = jnp.sin(2 * x)[..., None]  # (30, 1, 1)
        coef = curve2coeff(x, y, p["grid"], cfg.spline_order)
        bases = b_splines(x, p["grid"], cfg.spline_order)
        recon = jnp.einsum("bic,oic->bio", bases, coef)
        np.testing.assert_allclose(np.asarray(recon), np.asarray(y), atol=5e-3)

    def test_forward_shape(self):
        cfg = KANConfig(layers_hidden=(1, 32, 32, 1))
        model = build_model("kan", cfg)
        params = model.init(KEY)
        out = model.apply(params, jnp.linspace(-1, 1, 10).reshape(-1, 1))
        assert out.shape == (10, 1)

    @pytest.mark.slow
    def test_gradients_flow(self):
        cfg = KANConfig(layers_hidden=(1, 16, 1))
        model = build_model("kan", cfg)
        params = model.init(KEY)
        x = jnp.linspace(-0.9, 0.9, 32).reshape(-1, 1)
        grads = jax.grad(lambda p: jnp.mean(model.apply(p, x) ** 2))(params)
        gw = grads["layers"][0]["spline_w"]
        assert float(jnp.linalg.norm(gw)) > 0
        # grid is a buffer: stop_gradient'd in apply
        np.testing.assert_allclose(np.asarray(grads["layers"][0]["grid"]), 0.0)

    @pytest.mark.slow
    def test_update_grid_preserves_output(self):
        # kan.py:168-215: re-gridding refits coefficients to the SAME curve
        cfg = KANConfig()
        p = kan_linear_init(KEY, cfg, 1, 2)
        x = jax.random.normal(KEY, (256, 1)) * 0.4
        from inraudio_tpu.models.kan import kan_linear_apply
        before = kan_linear_apply(p, cfg, x)
        p2 = kan_linear_update_grid(p, cfg, x)
        assert p2["grid"].shape == p["grid"].shape
        after = kan_linear_apply(p2, cfg, x)
        np.testing.assert_allclose(np.asarray(after), np.asarray(before),
                                   atol=2e-2)

    def test_regularization_loss_positive(self):
        cfg = KANConfig(layers_hidden=(1, 8, 1))
        params = build_model("kan", cfg).init(KEY)
        assert float(kan_regularization_loss(params)) > 0


# ---------------------------------------------------------------------------
# ReLU MLP (fixed)
# ---------------------------------------------------------------------------

class TestReluMLP:
    def test_nonlinearity_is_applied(self):
        """The reference's ReLU MLP is accidentally linear (models.py:68-71,
        SURVEY.md C12); the rebuild applies leaky-ReLU for real: f(a x) !=
        a f(x) for a model with zero bias contribution removed."""
        cfg = ReluMLPConfig(hidden_features=16, hidden_layers=1)
        model = build_model("relu", cfg)
        params = model.init(KEY)
        x = jnp.ones((1, 1))
        f2 = model.apply(params, 2 * x) - model.apply(params, jnp.zeros((1, 1)))
        f1 = model.apply(params, x) - model.apply(params, jnp.zeros((1, 1)))
        assert not np.allclose(np.asarray(f2), 2 * np.asarray(f1), atol=1e-6)

    def test_deep_linear_mode(self):
        """negative_slope=1.0 reproduces the reference's deep-linear bug-mode."""
        cfg = ReluMLPConfig(hidden_features=16, hidden_layers=1,
                            negative_slope=1.0)
        model = build_model("relu", cfg)
        params = model.init(KEY)
        z = model.apply(params, jnp.zeros((1, 1)))
        f1 = model.apply(params, jnp.ones((1, 1))) - z
        f2 = model.apply(params, 2 * jnp.ones((1, 1))) - z
        np.testing.assert_allclose(np.asarray(f2), 2 * np.asarray(f1),
                                   atol=1e-4)


def test_factory_rejects_unknown():
    with pytest.raises(ValueError):
        build_model("transformer")


class TestQuantization:
    """Post-fit quantization (reference drafts model.half() at
    run.py:236-239)."""

    def _params(self):
        from inraudio_tpu.models import SirenSnakeTanhConfig, build_model
        cfg = SirenSnakeTanhConfig(hidden_features=64, num_sine=1,
                                   num_snake=1, first_omega_0=30.0)
        model = build_model("mlp", cfg)
        return model, cfg, model.init(jax.random.PRNGKey(0))

    def test_half_precision_roundtrip_snr(self):
        from inraudio_tpu.models import (dequantize_params, param_bytes,
                                         quantize_params)
        model, cfg, params = self._params()
        coords = jnp.linspace(-1, 1, 1000).reshape(-1, 1)
        ref = model.apply(params, coords)
        for mode in ("float16", "bfloat16"):
            q = quantize_params(params, mode)
            assert param_bytes(q) * 2 == param_bytes(params)
            out = model.apply(dequantize_params(q), coords)
            err = jnp.mean((out - ref) ** 2)
            sig = jnp.mean(ref ** 2)
            snr = 10 * jnp.log10(sig / jnp.maximum(err, 1e-20))
            assert snr > (40 if mode == "float16" else 20), (mode, float(snr))

    def test_int8_structure_and_accuracy(self):
        from inraudio_tpu.models import dequantize_params, quantize_params
        model, cfg, params = self._params()
        q = quantize_params(params, "int8")
        leaf = q["layers"][0]["w"]
        assert set(leaf) == {"q", "scale"} and leaf["q"].dtype == jnp.int8
        d = dequantize_params(q)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(d)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=float(np.max(np.abs(a)) / 100))


def test_int16_per_last_axis():
    """int16 with per-COLUMN scales — the modulation-matrix grain.  Error
    is bounded by scale/2 per element, and on a matrix whose magnitudes
    sit away from powers of two, 16 uniform bits beat fp16's 10-bit
    mantissa at identical storage (the modulated codec's hi-fi mod tier,
    scripts/probe_mod_quant.py)."""
    from inraudio_tpu.models import dequantize_params, quantize_params
    k, d = 37, 24
    key = jax.random.PRNGKey(7)
    # column-coherent stats: per-column offsets + small spread (what
    # trained modulations look like across chunks)
    offs = jax.random.normal(jax.random.PRNGKey(8), (1, d)) * 3.0
    x = offs + 0.3 * jax.random.normal(key, (k, d), jnp.float32)
    q = quantize_params({"m": x}, "int16", per_last_axis=True)
    leaf = q["m"]
    assert set(leaf) == {"q", "scale"} and leaf["q"].dtype == jnp.int16
    assert leaf["scale"].shape == (1, d)
    deq = np.asarray(dequantize_params(q)["m"])
    xs = np.asarray(x)
    scale = np.asarray(leaf["scale"])
    # scale/2 rounding bound, plus the f32 ulp of l/scale at |q|~32767
    # (measured worst case 1.0012x the half-step)
    assert np.all(np.abs(deq - xs) <= scale / 2 * 1.005 + 1e-12)
    err16 = float(np.mean((deq - xs) ** 2))
    err_fp16 = float(np.mean((xs.astype(np.float16).astype(np.float32)
                              - xs) ** 2))
    assert err16 < err_fp16, (err16, err_fp16)


@pytest.mark.slow
def test_int4_pack_roundtrip():
    """int4: two nibbles per byte, error bounded by scale/2, odd counts."""
    from inraudio_tpu.models import dequantize_params, quantize_params
    key = jax.random.PRNGKey(5)
    for shape in ((64, 64), (7, 3), (5,), (3, 4, 5)):
        x = jax.random.normal(key, shape, jnp.float32)
        q = quantize_params({"w": x}, "int4")
        leaf = q["w"]
        assert set(leaf) == {"q4", "scale", "shape"}
        assert leaf["q4"].dtype == jnp.uint8
        assert leaf["q4"].size == (x.size + 1) // 2
        d = dequantize_params(q)["w"]
        assert d.shape == x.shape
        # symmetric 15-level: |err| <= scale/2 everywhere
        scale = float(np.max(np.abs(np.asarray(x)))) / 7.0
        np.testing.assert_allclose(np.asarray(d), np.asarray(x),
                                   atol=scale / 2 + 1e-7)


@pytest.mark.slow
def test_int4_per_leading_axis_scales():
    from inraudio_tpu.models import dequantize_params, quantize_params
    key = jax.random.PRNGKey(6)
    # two slices with wildly different magnitudes: per-axis scales keep
    # the small slice's relative error bounded
    x = jnp.concatenate([jax.random.normal(key, (1, 32)) * 100.0,
                         jax.random.normal(key, (1, 32)) * 0.01], axis=0)
    q = quantize_params({"w": x}, "int4", per_leading_axis=True)
    d = dequantize_params(q)["w"]
    small = np.asarray(x[1])
    err = np.max(np.abs(np.asarray(d[1]) - small))
    assert err <= np.max(np.abs(small)) / 7.0 / 2 + 1e-9


class TestKANWholeNetworkUpdateGrid:
    """VERDICT r2 item 6: layer-chained grid refresh (reference
    kan.py:274-279 — KAN.forward(x, update_grid=True))."""

    @pytest.mark.slow
    def test_network_update_preserves_output(self):
        import jax
        import jax.numpy as jnp
        from inraudio_tpu.models import KANConfig, build_model
        from inraudio_tpu.models.kan import kan_update_grid
        cfg = KANConfig(layers_hidden=(1, 8, 8, 1))
        model = build_model("kan", cfg)
        params = model.init(KEY)
        x = jax.random.normal(KEY, (512, 1)) * 0.4
        before = model.apply(params, x)
        p2 = kan_update_grid(params, cfg, x)
        # every layer re-gridded; later layers' updates see the UPDATED
        # earlier layers' outputs (chained semantics)
        for l_old, l_new in zip(params["layers"], p2["layers"]):
            assert l_new["grid"].shape == l_old["grid"].shape
            assert not np.allclose(np.asarray(l_new["grid"]),
                                   np.asarray(l_old["grid"]))
        after = model.apply(p2, x)
        np.testing.assert_allclose(np.asarray(after), np.asarray(before),
                                   atol=5e-2)

    def test_model_hook_exposed(self):
        from inraudio_tpu.models import KANConfig, build_model
        kan = build_model("kan", KANConfig(layers_hidden=(1, 8, 1)))
        mlp = build_model("mlp", hidden_features=16)
        assert kan.update_grid is not None
        assert mlp.update_grid is None

    @pytest.mark.slow
    def test_fit_with_update_grid_every(self):
        import jax
        import jax.numpy as jnp
        from inraudio_tpu.models import KANConfig, build_model
        from inraudio_tpu.parallel import make_mesh
        from inraudio_tpu.train import TrainConfig, fit
        n = 256
        coords = np.linspace(-1, 1, n, dtype=np.float32).reshape(-1, 1)
        targets = np.sin(2 * np.pi * 2 * coords).astype(np.float32)
        model = build_model("kan", KANConfig(layers_hidden=(1, 16, 1)))
        cfg = TrainConfig(total_steps=120, scan_chunk=40,
                          update_grid_every=40, learning_rate=5e-3)
        res = fit(model, coords, targets, cfg, key=jax.random.PRNGKey(0),
                  mesh=make_mesh(jax.devices()[:1]))
        assert np.all(np.isfinite(res.loss_history))
        assert res.loss_history[-1] < res.loss_history[0]


class TestScaledFirstRecipe:
    """C14 wired: ScaledSineLayer selectable as the hybrid model's first
    layer (reference models.py:124-183, previously dead)."""

    def test_layer_kinds_and_forward(self):
        import jax
        import jax.numpy as jnp
        from inraudio_tpu.models import SirenSnakeTanhConfig, build_model
        cfg = SirenSnakeTanhConfig(hidden_features=16, num_sine=1,
                                   num_snake=1, scaled_first=True,
                                   first_omega_0=300.0)
        assert cfg.layer_kinds[0] == "scaled_sine_first"
        model = build_model("mlp", cfg)
        p = model.init(jax.random.PRNGKey(0))
        scale = np.asarray(p["layers"][0]["omega_scale"])
        # per-neuron omega: linspace(0, 1, out)/out * omega0
        expect = np.linspace(0, 1, 16, dtype=np.float32) / 16 * 300.0
        np.testing.assert_allclose(scale, expect, rtol=1e-6)
        x = jnp.linspace(-1, 1, 64).reshape(-1, 1)
        out = model.apply(p, x)
        assert out.shape == (64, 1) and np.all(np.isfinite(np.asarray(out)))

    def test_fused_falls_back_for_scaled_first(self):
        from inraudio_tpu.models import SirenSnakeTanhConfig, build_model
        cfg = SirenSnakeTanhConfig(hidden_features=16, scaled_first=True)
        m = build_model("mlp", cfg, fused=True)
        assert "fused" not in m.name  # no Mosaic lowering: XLA path
