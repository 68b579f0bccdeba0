"""Model zoo: functional init/apply pairs for every architecture the
reference ships (models.py, kan.py), plus a uniform factory.

``build_model(...)`` returns an ``INRModel`` — (init, apply) closures over a
static config — which the training loop jits without retracing per step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax

from .activations import sine_activation, snake_apply, snake_init
from .encodings import (num_frequencies_nyquist, posenc_nerf,
                        posenc_output_dim, rff_apply, rff_init,
                        rff_output_dim)
from .kan import (KANConfig, b_splines, curve2coeff, kan_apply, kan_init,
                  kan_linear_apply, kan_linear_init, kan_linear_update_grid,
                  kan_regularization_loss, kan_update_grid)
from .quantize import dequantize_params, quantize_params
from .relu import ReluMLPConfig, relu_mlp_apply, relu_mlp_init
from .siren import (SirenConfig, SirenSnakeTanhConfig, linear_apply,
                    linear_init, scaled_sine_layer_apply,
                    scaled_sine_layer_init, sine_layer_apply, sine_layer_init,
                    siren_activations, siren_apply, siren_init,
                    siren_snake_tanh_activations, siren_snake_tanh_apply,
                    siren_snake_tanh_init)


@dataclasses.dataclass(frozen=True)
class INRModel:
    """A model as data: pure ``init(key) -> params`` and
    ``apply(params, coords) -> out``."""

    name: str
    config: Any
    init: Callable[[jax.Array], Any]
    apply: Callable[[Any, jax.Array], jax.Array]
    # Optional data-adaptive refresh hook: (params, coords) -> params.
    # Set for KAN archs (whole-network grid update, reference kan.py:274-279);
    # invoked between fit scan rounds when TrainConfig.update_grid_every > 0.
    update_grid: Callable[[Any, jax.Array], Any] | None = None
    # Optional quality-gated inference path: (params, coords, fit_snr_db)
    # -> out.  Set by the fused mlp branch: picks the fastest fused-decode
    # tier (sin polynomial degree / matmul precision) whose measured noise
    # floor clears the model's own fit SNR by a safety margin
    # (ops/pallas_siren.auto_decode_kwargs), so decode adds <~0.5 dB of
    # reconstruction loss.  None = decode through ``apply``.
    decode_apply: Callable[[Any, jax.Array, float], jax.Array] | None = None
    # Optional whole-step fused training path (ops/pallas_siren_step):
    # dict(cfg, rff_b, approx_sin, interpret) set by the fused mlp branch.
    # The train loop routes mse/alpha=0 fits through the single
    # fwd+bwd+clip+Adam kernel when the model fits the VMEM gate
    # (step_supported); everything else falls back to ``apply`` + autodiff.
    fused_step_ctx: dict[str, Any] | None = None
    # Optional multi-chunk stacked evals over a chunk population sharing
    # ONE coordinate grid (the multi-INR decode shape): (stacked_params,
    # coords) -> (k, n, 1), and the quality-gated variant taking
    # fit_snr_db.  Set by the fused mlp branch; zero row padding + compact
    # output vs vmapping ``apply`` (ops/pallas_siren._stack_kernel_multi).
    # Both return None for unsupported shapes — gate with
    # ``ops.pallas_siren.stacked_supported`` and fall back to vmap.
    apply_stacked: Callable[[Any, jax.Array], jax.Array] | None = None
    decode_apply_stacked: (Callable[[Any, jax.Array, float], jax.Array]
                           | None) = None


def build_model(arch: str, config: Any = None, fused: bool = False,
                approx_sin: bool = False, interpret: bool = False,
                rff_b: Any = None,
                **overrides) -> INRModel:
    """Factory over the zoo: arch in {'mlp', 'siren', 'kan', 'relu'}.

    'mlp' is the production ``SirenWithSnakeTanh`` recipe — the name matches
    the reference runner's ``arch='mlp'`` branch (run.py:95-96).
    ``fused=True`` routes apply through the Pallas full-stack kernel
    (differentiable; TPU only — raw-coordinate inputs); ``approx_sin=True``
    additionally swaps sin/cos for the in-kernel Cody-Waite polynomial pair
    (~1e-6 abs error) — the stack is transcendental-bound, so this is worth
    ~3x on both decode and the training step (measured, BASELINE.md).

    ``rff_b`` (F, d): the model OWNS the Gaussian Fourier encoding — apply
    takes raw coordinates and cfg.in_features must be 2F.  On the fused
    path the encoding is folded into the kernel (raw coords are the only
    per-step HBM input); on the XLA path it is recomputed per step and
    fused by XLA (cheaper than streaming a precomputed (n, 2F) feature
    matrix from HBM).
    """
    if arch == "mlp":
        cfg = config or SirenSnakeTanhConfig(**overrides)
        if fused and getattr(cfg, "scaled_first", False):
            # the fused kernel has no scaled-sine lowering; XLA path only
            fused = False
        if fused:
            # ``interpret=True`` runs the kernels in the Pallas interpreter
            # (CPU-executable — used by the virtual-device sharding tests)
            from ..ops.pallas_siren import (auto_decode_kwargs,
                                            fused_siren_apply,
                                            fused_siren_apply_stacked)
            from ..ops.pallas_siren_train import fused_siren_train_apply
            name = ("siren_snake_tanh_fused_rff" if rff_b is not None
                    else "siren_snake_tanh_fused")

            def _decode(p, c, fit_snr_db, _cfg=cfg, _rff=rff_b):
                kw = auto_decode_kwargs(
                    fit_snr_db,
                    first_omega_0=getattr(_cfg, "first_omega_0", None))
                return fused_siren_apply(p, _cfg, c, interpret=interpret,
                                         rff_b=_rff, **kw)

            def _decode_stacked(P, c, fit_snr_db, _cfg=cfg):
                kw = auto_decode_kwargs(
                    fit_snr_db,
                    first_omega_0=getattr(_cfg, "first_omega_0", None))
                return fused_siren_apply_stacked(P, _cfg, c,
                                                 interpret=interpret, **kw)

            return INRModel(
                name=name, config=cfg,
                init=lambda key: siren_snake_tanh_init(key, cfg),
                apply=lambda p, c: fused_siren_train_apply(
                    p, cfg, c, approx_sin=approx_sin, interpret=interpret,
                    rff_b=rff_b),
                decode_apply=_decode,
                fused_step_ctx=dict(cfg=cfg, rff_b=rff_b,
                                    approx_sin=approx_sin,
                                    interpret=interpret),
                # stacked evals fold the RFF encoding nowhere — RFF models
                # return None via the in_features gate and vmap instead
                apply_stacked=(None if rff_b is not None else
                               lambda P, c: fused_siren_apply_stacked(
                                   P, cfg, c, interpret=interpret,
                                   approx_sin=approx_sin)),
                decode_apply_stacked=(None if rff_b is not None
                                      else _decode_stacked))
        if rff_b is not None:
            return INRModel(
                name="siren_snake_tanh_rff", config=cfg,
                init=lambda key: siren_snake_tanh_init(key, cfg),
                apply=lambda p, c: siren_snake_tanh_apply(
                    p, cfg, rff_apply(rff_b, c)))
        return INRModel(
            name="siren_snake_tanh", config=cfg,
            init=lambda key: siren_snake_tanh_init(key, cfg),
            apply=lambda p, c: siren_snake_tanh_apply(p, cfg, c))
    if arch == "siren":
        cfg = config or SirenConfig(**overrides)
        return INRModel(
            name="siren", config=cfg,
            init=lambda key: siren_init(key, cfg),
            apply=lambda p, c: siren_apply(p, cfg, c))
    if arch == "kan":
        cfg = config or KANConfig(**overrides)
        if fused:
            # fused Pallas forward AND backward (per-tile basis recompute);
            # stacks too wide for VMEM-resident grad accumulators fall back
            # to XLA autodiff of kan_apply (ops/pallas_kan.py)
            from ..ops.pallas_kan import fused_kan_apply
            return INRModel(
                name="kan_fused", config=cfg,
                init=lambda key: kan_init(key, cfg),
                apply=lambda p, c: fused_kan_apply(p, cfg, c,
                                                   interpret=interpret),
                update_grid=lambda p, c: kan_update_grid(p, cfg, c))
        return INRModel(
            name="kan", config=cfg,
            init=lambda key: kan_init(key, cfg),
            apply=lambda p, c: kan_apply(p, cfg, c),
            update_grid=lambda p, c: kan_update_grid(p, cfg, c))
    if arch == "relu":
        cfg = config or ReluMLPConfig(**overrides)
        return INRModel(
            name="relu_mlp", config=cfg,
            init=lambda key: relu_mlp_init(key, cfg),
            apply=lambda p, c: relu_mlp_apply(p, cfg, c))
    raise ValueError(f"unknown arch {arch!r}")


def param_count(params: Any) -> int:
    return sum(x.size for x in jax.tree.leaves(params))


def param_bytes(params: Any) -> int:
    """Total parameter+buffer bytes — the reference's ``total_model_size``
    (nelement * element_size over params and buffers, run.py:241-247)."""
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
