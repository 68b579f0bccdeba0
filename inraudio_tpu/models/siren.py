"""SIREN model family as functional pytree init/apply pairs.

TPU-native re-design of reference models.py — ``torch.nn.Module`` stacks
become (params pytree, pure apply fn).  The hot path is a chain of
``(n, h) @ (h, h)`` matmuls with sin/snake/tanh nonlinearities: MXU matmuls +
VPU transcendentals, which XLA fuses end to end.  A fused Pallas kernel for
the same chain lives in ``inraudio_tpu.ops``; this module is the reference
implementation it is A/B-tested against.

Architectures (reference file:line):

- ``sine_layer_*``        — SineLayer ``sin(omega0 (Wx+b))`` with the SIREN
                            init scheme (models.py:84-120)
- ``scaled_sine_layer_*`` — first-layer per-neuron omega linspace variant
                            (models.py:124-183)
- ``siren_*``             — classic SIREN (models.py:243-304)
- ``siren_snake_tanh_*``  — the production hybrid model (models.py:306-423):
                            sine front end, snake middle, optional tanh, SIREN-
                            init'd linear head.  Runner defaults omega0=22000,
                            hidden omega=30, hidden=256, 2 sine + 2 snake
                            (run.py:30).

Precision policy (SURVEY.md section 7): first-layer pre-activations reach
``omega0 * |coord|`` ~ 2e4 where bf16's ulp is ~128 — coords and the first
layer stay float32 always.  Hidden layers may run their matmuls in bf16 when
``compute_dtype=jnp.bfloat16`` (weights stay float32; pre-activations and
transcendentals are evaluated in float32).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .activations import snake_apply, snake_init

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------

def linear_init(key: jax.Array, in_features: int, out_features: int,
                w_bound: float, b_bound: float | None = None) -> Params:
    """U(-w_bound, w_bound) weights, U(-b_bound, b_bound) bias.

    torch ``nn.Linear`` defaults its bias to U(-1/sqrt(in), 1/sqrt(in)); the
    SIREN inits in the reference only reset the weight (models.py:105-112), so
    the torch bias default is reproduced when ``b_bound`` is None.
    """
    wk, bk = jax.random.split(key)
    if b_bound is None:
        b_bound = 1.0 / float(np.sqrt(in_features))
    w = jax.random.uniform(wk, (in_features, out_features), jnp.float32,
                           -w_bound, w_bound)
    b = jax.random.uniform(bk, (out_features,), jnp.float32, -b_bound, b_bound)
    return {"w": w, "b": b}


def sine_layer_init(key: jax.Array, in_features: int, out_features: int,
                    is_first: bool = False, omega0: float = 30.0) -> Params:
    """SIREN init (models.py:105-112): first layer W ~ U(-1/in, 1/in); hidden
    W ~ U(-sqrt(6/in)/omega0, +sqrt(6/in)/omega0)."""
    if is_first:
        bound = 1.0 / in_features
    else:
        bound = float(np.sqrt(6.0 / in_features)) / omega0
    return linear_init(key, in_features, out_features, bound)


def linear_apply(p: Params, x: jax.Array, compute_dtype=jnp.float32,
                 precision=None) -> jax.Array:
    """x @ W + b with optional reduced-precision matmul inputs.

    ``preferred_element_type=float32`` keeps the MXU accumulating in fp32
    even when inputs are bf16.  ``precision`` matters on TPU where f32
    matmuls default to one bf16 pass: the numerically delicate first layer
    (omega0 * coord reaches ~2e4) passes "highest"; hidden layers keep the
    fast default.
    """
    w = p["w"].astype(compute_dtype)
    x = x.astype(compute_dtype)
    y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=precision)
    return y + p["b"]


def sine_layer_apply(p: Params, x: jax.Array, omega0: float,
                     compute_dtype=jnp.float32, precision=None) -> jax.Array:
    """sin(omega0 * (Wx+b)) (models.py:114-115)."""
    return jnp.sin(omega0 * linear_apply(p, x, compute_dtype, precision))


def scaled_sine_layer_init(key: jax.Array, in_features: int, out_features: int,
                           is_first: bool = False,
                           omega0: float = 30.0) -> Params:
    """ScaledSineLayer (models.py:124-183): SIREN-init'd linear plus, for the
    first layer, a fixed per-neuron frequency scale.

    The reference's vectorised path (models.py:165-178) multiplies neuron k's
    pre-activation by ``omega0 * linspace(0, 1, out)[k] / out`` for the first
    layer and by plain ``omega0`` otherwise; the scale vector is a constant
    buffer, not trained.
    """
    p = sine_layer_init(key, in_features, out_features, is_first, omega0)
    if is_first:
        scale = np.linspace(0.0, 1.0, out_features, dtype=np.float32) / out_features
    else:
        scale = np.ones((out_features,), dtype=np.float32)
    p["omega_scale"] = jnp.asarray(scale * omega0)
    return p


def scaled_sine_layer_apply(p: Params, x: jax.Array,
                            compute_dtype=jnp.float32) -> jax.Array:
    pre = linear_apply(p, x, compute_dtype)
    return jnp.sin(jax.lax.stop_gradient(p["omega_scale"]) * pre)


# ---------------------------------------------------------------------------
# Classic SIREN
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SirenConfig:
    in_features: int = 1
    hidden_features: int = 256
    hidden_layers: int = 3
    out_features: int = 1
    outermost_linear: bool = True
    first_omega_0: float = 30.0
    hidden_omega_0: float = 30.0


def siren_init(key: jax.Array, cfg: SirenConfig) -> Params:
    """Classic SIREN (models.py:243-269): first SineLayer + hidden SineLayers
    + SIREN-init'd Linear head (or a final SineLayer)."""
    keys = jax.random.split(key, cfg.hidden_layers + 2)
    layers = [sine_layer_init(keys[0], cfg.in_features, cfg.hidden_features,
                              is_first=True, omega0=cfg.first_omega_0)]
    for i in range(cfg.hidden_layers):
        layers.append(sine_layer_init(keys[1 + i], cfg.hidden_features,
                                      cfg.hidden_features,
                                      omega0=cfg.hidden_omega_0))
    # Final linear keeps the SIREN hidden-layer weight bound (models.py:258-264).
    if cfg.outermost_linear:
        bound = float(np.sqrt(6.0 / cfg.hidden_features)) / cfg.hidden_omega_0
        layers.append(linear_init(keys[-1], cfg.hidden_features,
                                  cfg.out_features, bound))
    else:
        layers.append(sine_layer_init(keys[-1], cfg.hidden_features,
                                      cfg.out_features,
                                      omega0=cfg.hidden_omega_0))
    return {"layers": layers}


def siren_apply(params: Params, cfg: SirenConfig, coords: jax.Array,
                compute_dtype=jnp.float32) -> jax.Array:
    # 'high' = bf16x3 on TPU (no-op on CPU/GPU): see siren_snake_tanh_apply
    # — a one-pass bf16 default matmul under sin's omega amplification
    # caps trained reconstructions ~25 dB short (r4 bisect).
    prec = "high" if compute_dtype == jnp.float32 else None
    x = sine_layer_apply(params["layers"][0], coords.astype(jnp.float32),
                         cfg.first_omega_0, precision="highest")
    for p in params["layers"][1:-1]:
        x = sine_layer_apply(p, x, cfg.hidden_omega_0, compute_dtype, prec)
    last = params["layers"][-1]
    if cfg.outermost_linear:
        return linear_apply(last, x, compute_dtype, prec)
    return sine_layer_apply(last, x, cfg.hidden_omega_0, compute_dtype, prec)


def siren_activations(params: Params, cfg: SirenConfig,
                      coords: jax.Array) -> dict[str, jax.Array]:
    """Every intermediate (pre- and post-activation) keyed by position —
    functional analogue of ``forward_with_activations`` (models.py:277-304)."""
    acts: dict[str, jax.Array] = {"input": coords}
    x = coords.astype(jnp.float32)
    n = len(params["layers"])
    for i, p in enumerate(params["layers"]):
        pre = linear_apply(p, x)
        is_last = i == n - 1
        if i == 0:
            acts[f"layer{i}_pre"] = cfg.first_omega_0 * pre
            x = jnp.sin(cfg.first_omega_0 * pre)
        elif is_last and cfg.outermost_linear:
            x = pre
        else:
            acts[f"layer{i}_pre"] = cfg.hidden_omega_0 * pre
            x = jnp.sin(cfg.hidden_omega_0 * pre)
        acts[f"layer{i}"] = x
    return acts


# ---------------------------------------------------------------------------
# SirenWithSnakeTanh — the production model
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SirenSnakeTanhConfig:
    """Layer recipe of the production hybrid model (models.py:306-386).

    Reference runner defaults (run.py:30): omega0=22000, hidden omega=30,
    a_initial=0.5, hidden=256, num_sine=2, num_snake=2, num_tanh=0,
    first_linear=False, last_linear=True.
    """

    in_features: int = 1
    hidden_features: int = 256
    out_features: int = 1
    num_sine: int = 2
    num_snake: int = 2
    num_tanh: int = 0
    first_linear: bool = False
    # first layer = ScaledSineLayer (per-neuron omega linspace, reference
    # models.py:124-183) — the multi-band first layer, C14's capability
    scaled_first: bool = False
    last_linear: bool = True
    first_omega_0: float = 22000.0
    hidden_omega_0: float = 30.0
    a_initial: float | None = 0.5  # None => Exponential(0.1) random init

    @property
    def layer_kinds(self) -> tuple[str, ...]:
        if self.first_linear:
            first = "linear_snake"
        elif self.scaled_first:
            first = "scaled_sine_first"
        else:
            first = "sine_first"
        kinds = [first]
        kinds += ["sine"] * self.num_sine
        kinds += ["linear_snake"] * self.num_snake
        kinds += ["linear_tanh"] * self.num_tanh
        kinds += ["linear_last" if self.last_linear else "sine"]
        return tuple(kinds)


def siren_snake_tanh_init(key: jax.Array, cfg: SirenSnakeTanhConfig) -> Params:
    """Build the (a) first sine-or-linear+snake, (b) num_sine sine, (c)
    num_snake linear+snake, (d) num_tanh linear+tanh, (e) SIREN-init'd linear
    head recipe (models.py:342-384)."""
    kinds = cfg.layer_kinds
    keys = jax.random.split(key, len(kinds))
    hidden_bound = float(np.sqrt(6.0 / cfg.hidden_features)) / cfg.hidden_omega_0
    layers: list[Params] = []
    for i, (kind, k) in enumerate(zip(kinds, keys)):
        in_f = cfg.in_features if i == 0 else cfg.hidden_features
        out_f = cfg.out_features if i == len(kinds) - 1 else cfg.hidden_features
        if kind == "sine_first":
            layers.append(sine_layer_init(k, in_f, out_f, is_first=True,
                                          omega0=cfg.first_omega_0))
        elif kind == "scaled_sine_first":
            layers.append(scaled_sine_layer_init(k, in_f, out_f,
                                                 is_first=True,
                                                 omega0=cfg.first_omega_0))
        elif kind == "sine":
            layers.append(sine_layer_init(k, in_f, out_f,
                                          omega0=cfg.hidden_omega_0))
        elif kind == "linear_snake":
            k1, k2 = jax.random.split(k)
            # torch nn.Linear default init (models.py:346,358: plain Linear).
            bound = 1.0 / float(np.sqrt(in_f))
            p = linear_init(k1, in_f, out_f, bound)
            p["snake_a"] = snake_init(k2, out_f, cfg.a_initial)
            layers.append(p)
        elif kind == "linear_tanh":
            bound = 1.0 / float(np.sqrt(in_f))
            layers.append(linear_init(k, in_f, out_f, bound))
        elif kind == "linear_last":
            layers.append(linear_init(k, in_f, out_f, hidden_bound))
        else:  # pragma: no cover
            raise ValueError(kind)
    return {"layers": layers}


def siren_snake_tanh_apply(params: Params, cfg: SirenSnakeTanhConfig,
                           coords: jax.Array,
                           compute_dtype=jnp.float32) -> jax.Array:
    # Hidden-layer matmul precision: on TPU, f32 dots default to ONE
    # bf16 MXU pass, and sin(omega * (Wx + b)) amplifies that rounding
    # into phase error — the r4 bisect measured the default capping a
    # trained omega0=1000 reconstruction at 58.5 dB where 'high'/'highest'
    # (and the fused bf16x3 kernel) all reconstruct 83.2
    # (bench_logs_r4/73_gap3.log).  'high' (3-pass bf16x3) matches the
    # fused kernels' semantics class at half the cost of 'highest'; on
    # CPU/GPU it is a no-op (true f32 dots).  compute_dtype=bf16 callers
    # asked for speed and keep the single pass.
    prec = "high" if compute_dtype == jnp.float32 else None
    kinds = cfg.layer_kinds
    x = coords.astype(jnp.float32)
    for i, (kind, p) in enumerate(zip(kinds, params["layers"])):
        # First layer always fp32 (omega0 * coord reaches ~2e4).
        dtype = jnp.float32 if i == 0 else compute_dtype
        if kind == "sine_first":
            x = sine_layer_apply(p, x, cfg.first_omega_0, jnp.float32,
                                 precision="highest")
        elif kind == "scaled_sine_first":
            x = scaled_sine_layer_apply(p, x, jnp.float32)
        elif kind == "sine":
            x = sine_layer_apply(p, x, cfg.hidden_omega_0, dtype, prec)
        elif kind == "linear_snake":
            x = snake_apply(p["snake_a"], linear_apply(p, x, dtype, prec))
        elif kind == "linear_tanh":
            x = jnp.tanh(linear_apply(p, x, dtype, prec))
        else:  # linear_last
            x = linear_apply(p, x, dtype, prec)
    return x


def siren_snake_tanh_activations(params: Params, cfg: SirenSnakeTanhConfig,
                                 coords: jax.Array) -> dict[str, jax.Array]:
    """Intermediate-activation introspection (models.py:396-423)."""
    acts: dict[str, jax.Array] = {"input": coords}
    x = coords.astype(jnp.float32)
    for i, (kind, p) in enumerate(zip(cfg.layer_kinds, params["layers"])):
        pre = linear_apply(p, x)
        if kind == "sine_first":
            acts[f"layer{i}_pre"] = cfg.first_omega_0 * pre
            x = jnp.sin(cfg.first_omega_0 * pre)
        elif kind == "scaled_sine_first":
            scaled = jax.lax.stop_gradient(p["omega_scale"]) * pre
            acts[f"layer{i}_pre"] = scaled
            x = jnp.sin(scaled)
        elif kind == "sine":
            acts[f"layer{i}_pre"] = cfg.hidden_omega_0 * pre
            x = jnp.sin(cfg.hidden_omega_0 * pre)
        elif kind == "linear_snake":
            acts[f"layer{i}_pre"] = pre
            x = snake_apply(p["snake_a"], pre)
        elif kind == "linear_tanh":
            acts[f"layer{i}_pre"] = pre
            x = jnp.tanh(pre)
        else:
            x = pre
        acts[f"layer{i}"] = x
    return acts
