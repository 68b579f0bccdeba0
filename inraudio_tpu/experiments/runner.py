"""Experiment runner with the reference ``train(...)`` surface.

Reproduces the L3 engine of reference run.py:30-400 / run_experimental.py:30-327
on the TPU stack: build the fitting problem, build the model (+ optional RFF
encoding), optionally warm-start from a previous checkpoint, run the jitted
fitting loop, decode (incl. bandwidth extension), evaluate SNR, and emit the
same artifact set — ``output.wav``, spectrogram/waveform/loss PNGs, a
checkpoint, and a ``parameters.json`` with the reference's schema
(run.py:365-398).

``train`` mirrors run.py:30 (file input, returns the checkpoint path);
``train_from_signal`` mirrors run_experimental.py:30 (in-memory signal,
coords scaled to [-100, 100], returns {'ckpt', 'ref', 'rec', 'res'} for
band-split/residual chaining, run_experimental.py:327).
"""

from __future__ import annotations

import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..data.audio_io import decimate as decimate_signal
from ..data.audio_io import read_wav, write_wav
from ..data.fittings import (FittingProblem, fft_fitting, mdct_fitting,
                             multi_waveform_fitting, waveform_fitting,
                             waveform_fitting_from_array)
from ..eval.decode import decode_problem
from ..eval.metrics import (experiment_record, reconstruction_snr,
                            save_parameters)
from ..eval.plots import (plot_loss_history, plot_waveform_comparison,
                          plotspec)
from ..models import (INRModel, KANConfig, SirenSnakeTanhConfig, build_model,
                      rff_apply, rff_init)
from ..train.checkpoint import load_checkpoint, save_checkpoint
from ..train.loop import TrainConfig, fit, init_train_state
from ..utils.observability import MetricsLogger


def make_experiment_folder(experiment_path: str, tag: str) -> str:
    """``<experiment_path>/<tag>`` with the reference's "(2)" collision
    rename (run.py:36-40), looped so a third run gets "(2)(2)" instead of
    silently overwriting."""
    folder = os.path.join(experiment_path, tag)
    while os.path.exists(folder):
        folder = folder + "(2)"
    os.makedirs(folder)
    return folder


def build_problem(method: str, filename: str, duration: float,
                  decimation: int = 1, n: int = 2048, takelog: bool = False,
                  num_channels: int = 1,
                  perceptual_mask: bool = False,
                  n_fft: int = 1024,
                  highpass: bool = False,
                  adaptive: bool = False) -> FittingProblem:
    """Method dispatch (run.py:44-76): wave | mdct | fft | multi.

    ``n_fft``/``highpass`` reach the fft builder (reference utils.py:242-251),
    ``highpass``/``perceptual_mask``/``adaptive`` the mdct builder."""
    if method == "wave":
        return waveform_fitting(filename, duration, decimation)
    if method == "mdct":
        return mdct_fitting(filename, duration, n=n, takelog=takelog,
                            highpass=highpass,
                            perceptual_mask=perceptual_mask,
                            adaptive=adaptive)
    if method == "fft":
        return fft_fitting(filename, duration, n_fft=n_fft, highpass=highpass)
    if method == "multi":
        return multi_waveform_fitting(filename, duration, num_channels)
    raise ValueError(f"unknown method {method!r}")


def build_arch(arch: str, in_features: int, hidden: int, num_sine: int,
               num_snake: int, num_tanh: int, omega: float,
               hidden_omega: float, a_initial: float | None,
               first_linear: bool = False,
               last_linear: bool = True,
               scaled_first: bool = False,
               fused: bool = False,
               rff_b=None) -> INRModel:
    """Arch dispatch (run.py:92-113): 'mlp' -> SirenWithSnakeTanh recipe,
    'kan' -> KAN([in, hidden, hidden, 1]).

    ``fused=True`` (TPU only) routes the mlp through the Pallas full-stack
    kernel with polynomial sin — ~1.8x training, ~3x decode (BASELINE.md).
    ``rff_b``: the mlp owns the RFF encoding (raw-coordinate apply; folded
    into the fused kernel), so the reference's num_freq sweep family
    (run.py:141-144) gets the kernel speedup too."""
    if arch == "mlp":
        fused = fused and (rff_b is not None or in_features <= 8)
        return build_model("mlp", SirenSnakeTanhConfig(
            in_features=in_features, hidden_features=hidden,
            num_sine=num_sine, num_snake=num_snake, num_tanh=num_tanh,
            first_linear=first_linear, last_linear=last_linear,
            scaled_first=scaled_first,
            first_omega_0=omega, hidden_omega_0=hidden_omega,
            a_initial=a_initial), fused=fused, approx_sin=fused,
            rff_b=rff_b)
    if arch == "kan":
        # fused=True: Pallas forward AND backward (ops/pallas_kan.py) —
        # measured 7.1x the XLA training step at full batch (BASELINE.md)
        return build_model("kan", KANConfig(
            layers_hidden=(in_features, hidden, hidden, 1)), fused=fused)
    raise ValueError(f"unknown arch {arch!r}")


def _run_experiment(
    problem: FittingProblem,
    experiment_folder: str,
    reference_signal: np.ndarray,
    reference_rate: int,
    *,
    arch: str, hidden: int, num_sine: int, num_snake: int, num_tanh: int,
    omega: float, hidden_omega: float, a_initial: float | None,
    num_freq: int | None, sigma: float,
    loss_mode: str, alpha: float, total_steps: int,
    learning_rate: float, min_learning_rate: float,
    bwe: bool, prev_ckpt_path: str | None, key: jax.Array,
    make_plots: bool, track_best: bool, visualization: bool,
    hparams: dict[str, Any],
    fused: bool = False,
    profile: bool = False,
    first_linear: bool = False,
    last_linear: bool = True,
    grad_clip_norm: float = 0.0,
    plateau_factor: float = 0.8,
    plateau_patience: int = 200,
    multi_resolution_stft: bool = False,
    update_grid_every: int = 0,
    scaled_first: bool = False,
    encoding: str = "rff",
) -> dict[str, Any]:
    """Shared engine behind train/train_from_signal.

    ``encoding`` selects the input featurisation when ``num_freq`` is set:
    'rff' = Gaussian Fourier features (reference run.py:141-144), 'nerf' =
    NeRF positional encoding with num_freq octaves (reference C11,
    models.py:14-59 — present but unwired there)."""
    if num_freq and encoding == "nerf":
        from ..models import posenc_nerf, posenc_output_dim
        in_features = posenc_output_dim(problem.in_features, num_freq)
        encode = lambda c, L=num_freq: posenc_nerf(c, L)  # noqa: E731
        enc_coords = np.asarray(encode(jnp.asarray(problem.coords)))
        rff_b = None
    elif num_freq:
        rff_b = rff_init(jax.random.fold_in(key, 1), problem.in_features,
                         num_freq, sigma=sigma)
        in_features = 2 * num_freq
        if arch == "mlp":
            # the model owns the encoding (folded into the fused kernel):
            # raw coords stream to the device, not a (n, 2F) feature matrix
            encode = None
            enc_coords = problem.coords
        else:
            # bind B via default arg: `rff_b` is rebound to None right
            # after, and a late-binding closure would call rff_apply(None)
            encode = lambda c, b=rff_b: rff_apply(b, c)  # noqa: E731
            enc_coords = np.asarray(rff_apply(rff_b,
                                              jnp.asarray(problem.coords)))
            rff_b = None  # arch consumes pre-encoded features
    else:
        rff_b, encode, in_features = None, None, problem.in_features
        enc_coords = problem.coords
    model = build_arch(arch, in_features, hidden, num_sine, num_snake,
                       num_tanh, omega, hidden_omega, a_initial,
                       first_linear=first_linear, last_linear=last_linear,
                       scaled_first=scaled_first, fused=fused, rff_b=rff_b)

    cfg = TrainConfig(total_steps=total_steps, learning_rate=learning_rate,
                      min_learning_rate=min_learning_rate,
                      loss_mode=loss_mode, alpha=alpha, track_best=track_best,
                      grad_clip_norm=grad_clip_norm,
                      plateau_factor=plateau_factor,
                      plateau_patience=plateau_patience,
                      multi_resolution_stft=multi_resolution_stft,
                      update_grid_every=update_grid_every)

    # --- warm start (run.py:84-106)
    state = None
    if prev_ckpt_path:
        template = init_train_state(model, key, cfg)
        state = load_checkpoint(prev_ckpt_path, template)

    # --- fit, streaming per-round metrics to <exp>/metrics.jsonl
    metrics = MetricsLogger(os.path.join(experiment_folder, "metrics.jsonl"))
    # hparams live under their own key so a knob named 'event'/'t' can never
    # clobber the record's tags
    metrics.log({"event": "config",
                 "hparams": {kk: v for kk, v in hparams.items()
                             if isinstance(v, (int, float, str, bool,
                                               type(None)))}})
    t0 = time.time()
    result = fit(model, enc_coords, problem.targets, cfg, key=key,
                 weight=problem.loss_weight, state=state, metrics=metrics,
                 profile_dir=(os.path.join(experiment_folder, "trace")
                              if profile else None))
    train_time = time.time() - t0

    # --- decode (+ BWE), de-normalise, write wav (run.py:249-296)
    # MSE fits carry their own quality estimate (signal power / best MSE):
    # it gates the fused decode tier (sin polynomial degree / matmul
    # precision) so dense decode runs at the fastest speed that cannot
    # audibly degrade THIS model's reconstruction (auto_decode_kwargs).
    fit_snr_est = None
    if loss_mode == "mse" and np.isfinite(result.best_loss) \
            and result.best_loss > 0:
        sig_pow = float(np.mean(np.square(problem.targets)))
        if sig_pow > 0:
            fit_snr_est = 10.0 * float(np.log10(sig_pow / result.best_loss))
    recovered, out_rate = decode_problem(model, result.params, problem,
                                         bwe=bwe, encode=encode,
                                         fit_snr_db=fit_snr_est)
    wav_path = os.path.join(experiment_folder, "output.wav")
    write_wav(wav_path, out_rate, recovered)

    # --- evaluate vs the reference signal (run.py:299-335)
    ref = reference_signal
    if bwe:
        ref_cmp, rate_cmp = ref, reference_rate
    else:
        # compare at the (possibly decimated) training rate (run.py:306-316)
        q = reference_rate // problem.sample_rate
        ref_cmp = decimate_signal(ref, q) if q > 1 else ref
        rate_cmp = problem.sample_rate
    if problem.method in ("mdct", "fft"):
        peak = float(np.max(np.abs(ref_cmp)))
        ref_cmp = ref_cmp / peak  # spectral targets fit on normalised audio
    # fft decodes via Griffin-Lim (phase recovery): SNR is finite but
    # phase-limited — spectral fidelity is the meaningful number there
    snr = reconstruction_snr(ref_cmp, recovered,
                             trim=1024 if problem.method in ("mdct", "fft")
                             else 0)

    # --- artifacts
    ckpt_path = save_checkpoint(
        os.path.join(experiment_folder, "saved_ckpt"), result.state,
        extra={"arch": arch, "hparams": {k: v for k, v in hparams.items()
                                         if isinstance(v, (int, float, str,
                                                           bool, type(None)))}})
    if visualization:
        # loss-landscape random plane (reference run.py:192-208) — on device
        from ..train.losses import mix_loss as _mix
        from ..utils.landscape import plot_landscape, random_plane
        # host constants: closed-over device arrays would be fetched
        # device->host during jit lowering (axon tunnel: slow + serialized)
        coords_h = np.asarray(enc_coords, np.float32)
        targets_h = np.asarray(problem.targets, np.float32)
        surface = random_plane(
            lambda p: _mix(model.apply(p, coords_h), targets_h,
                           loss_mode=loss_mode),
            result.params, jax.random.fold_in(key, 2))
        plot_landscape(surface,
                       os.path.join(experiment_folder, "landscape.png"))

    if make_plots:
        plot_loss_history(result.loss_history, result.lr_history,
                          os.path.join(experiment_folder, "loss.png"),
                          title=f"time {train_time/60:.2f} min")
        # fft now decodes to a waveform too (Griffin-Lim), so every method
        # gets the full plot set
        plotspec(ref_cmp, rate_cmp,
                 os.path.join(experiment_folder, "spec_ref.png"))
        plotspec(recovered, out_rate,
                 os.path.join(experiment_folder, "spec.png"))
        plot_waveform_comparison(
            ref_cmp, recovered, out_rate,
            os.path.join(experiment_folder, "wave.png"))

    record = experiment_record(hparams, result.params, train_time, snr)
    record["best_iter"] = result.best_iter
    record["best_loss"] = result.best_loss
    record["steps_per_sec"] = result.steps_per_sec
    save_parameters(experiment_folder, record)
    metrics.log({"event": "final", "snr_db": snr,
                 "best_loss": result.best_loss,
                 "best_iter": result.best_iter,
                 "train_time_s": round(train_time, 3),
                 "steps_per_sec": round(result.steps_per_sec, 2)})
    metrics.close()

    return {
        "ckpt": ckpt_path,
        "ref": ref_cmp,
        "rec": recovered,
        "res": ref_cmp[: len(recovered)] - recovered[: len(ref_cmp)],
        "snr": snr,
        "rate": out_rate,
        "result": result,
        "model": model,
        "problem": problem,
        "record": record,
    }


def train(experiment_path: str,
          tag: str,
          inst: str | None = None,
          duration: float = 10.0,
          *,
          filename: str | None = None,
          method: str = "wave",
          arch: str = "mlp",
          loss_mode: str = "mse",
          total_steps: int = 20000,
          learning_rate: float = 1e-3,
          min_learning_rate: float = 1e-6,
          num_sine: int = 2,
          num_snake: int = 2,
          num_tanh: int = 0,
          hidden: int = 256,
          omega: float = 22000.0,
          hidden_omega: float = 30.0,
          a_initial: float | None = 0.5,
          num_freq: int | None = None,
          sigma: float = 10.0,
          alpha: float = 0.0,
          decimation: int = 1,
          bwe: bool = False,
          takelog: bool = False,
          n: int = 2048,
          prev_ckpt_path: str | None = None,
          seed: int = 0,
          make_plots: bool = True,
          visualization: bool = False,
          track_best: bool = True,
          fused: bool = False,
          profile: bool = False,
          num_channels: int = 1,
          first_linear: bool = False,
          last_linear: bool = True,
          grad_clip_norm: float = 0.0,
          plateau_factor: float = 0.8,
          plateau_patience: int = 200,
          multi_resolution_stft: bool = False,
          n_fft: int = 1024,
          highpass: bool = False,
          perceptual_mask: bool = False,
          adaptive: bool = False,
          update_grid_every: int = 0,
          scaled_first: bool = False,
          encoding: str = "rff") -> str:
    """File-based experiment (reference run.py:30-400). Returns the
    checkpoint path (run.py:400) for procedural chaining.

    ``inst`` resolves ``data/<inst>.wav`` like the reference (run.py:33);
    ``filename`` overrides with an explicit path.  Defaults are the
    reference runner's (run.py:30), including ``num_channels`` /
    ``first_linear`` / ``last_linear`` (run.py:30,96,113).  The training
    knobs the headline bench depends on — ``grad_clip_norm``,
    ``plateau_factor``/``plateau_patience``, ``multi_resolution_stft`` —
    are exposed here so every recorded result is reproducible through this
    surface; ``n_fft``/``highpass``/``perceptual_mask``/``adaptive`` reach
    the fft/mdct builders.
    """
    if filename is None:
        if inst is None:
            raise ValueError("need inst or filename")
        filename = os.path.join("data", f"{inst}.wav")
    folder = make_experiment_folder(experiment_path, tag)
    problem = build_problem(method, filename, duration, decimation=decimation,
                            n=n, takelog=takelog, num_channels=num_channels,
                            perceptual_mask=perceptual_mask, n_fft=n_fft,
                            highpass=highpass, adaptive=adaptive)
    ref_rate, ref = read_wav(filename, channel=0 if method in ("wave", "multi")
                             else 1)
    ref = ref[: int(duration * ref_rate)]

    hparams = dict(
        tag=tag, inst=inst, filename=filename, duration=duration,
        method=method, arch=arch, loss_mode=loss_mode,
        total_steps=total_steps, learning_rate=learning_rate,
        min_learning_rate=min_learning_rate, num_sine=num_sine,
        num_snake=num_snake, num_tanh=num_tanh, hidden=hidden, omega=omega,
        hidden_omega=hidden_omega, a_initial=a_initial, num_freq=num_freq,
        alpha=alpha, decimation=decimation, bwe=bwe, takelog=takelog, N=n,
        prev_ckpt_path=prev_ckpt_path, seed=seed,
        num_channels=num_channels, first_linear=first_linear,
        last_linear=last_linear, grad_clip_norm=grad_clip_norm,
        plateau_factor=plateau_factor, plateau_patience=plateau_patience,
        multi_resolution_stft=multi_resolution_stft, n_fft=n_fft,
        highpass=highpass, perceptual_mask=perceptual_mask,
        adaptive=adaptive)
    hparams["update_grid_every"] = update_grid_every
    hparams["scaled_first"] = scaled_first
    hparams["encoding"] = encoding
    out = _run_experiment(
        problem, folder, ref, ref_rate,
        arch=arch, hidden=hidden, num_sine=num_sine, num_snake=num_snake,
        num_tanh=num_tanh, omega=omega, hidden_omega=hidden_omega,
        a_initial=a_initial, num_freq=num_freq, sigma=sigma,
        loss_mode=loss_mode, alpha=alpha, total_steps=total_steps,
        learning_rate=learning_rate, min_learning_rate=min_learning_rate,
        bwe=bwe, prev_ckpt_path=prev_ckpt_path,
        key=jax.random.PRNGKey(seed), make_plots=make_plots,
        track_best=track_best, visualization=visualization, hparams=hparams,
        fused=fused, profile=profile,
        first_linear=first_linear, last_linear=last_linear,
        grad_clip_norm=grad_clip_norm, plateau_factor=plateau_factor,
        plateau_patience=plateau_patience,
        multi_resolution_stft=multi_resolution_stft,
        update_grid_every=update_grid_every,
        scaled_first=scaled_first, encoding=encoding)
    return out["ckpt"]


def train_from_signal(experiment_path: str,
                      tag: str,
                      input_signal: np.ndarray,
                      input_fs: int,
                      *,
                      coord_scale: float = 100.0,
                      arch: str = "mlp",
                      loss_mode: str = "mse",
                      total_steps: int = 20000,
                      learning_rate: float = 1e-3,
                      min_learning_rate: float = 1e-6,
                      num_sine: int = 2,
                      num_snake: int = 2,
                      num_tanh: int = 0,
                      hidden: int = 256,
                      omega: float = 22000.0,
                      hidden_omega: float = 30.0,
                      a_initial: float | None = 0.5,
                      num_freq: int | None = None,
                      sigma: float = 10.0,
                      alpha: float = 0.0,
                      decimation: int = 1,
                      bwe: bool = False,
                      prev_ckpt_path: str | None = None,
                      seed: int = 0,
                      make_plots: bool = True,
                      visualization: bool = False,
                      track_best: bool = True,
                      fused: bool = False,
                      profile: bool = False,
                      first_linear: bool = False,
                      last_linear: bool = True,
                      grad_clip_norm: float = 0.0,
                      plateau_factor: float = 0.8,
                      plateau_patience: int = 200,
                      multi_resolution_stft: bool = False,
                      update_grid_every: int = 0,
                      scaled_first: bool = False,
                      encoding: str = "rff") -> dict[str, Any]:
    """In-memory experiment (reference run_experimental.py:30-327): coords
    span [-100, 100] by default (utils.py:172), the decode is de-normalised
    by the stored peak, and the residual ``input - recovered`` is returned
    for band-split chaining (run_experimental.py:215-217,327)."""
    folder = make_experiment_folder(experiment_path, tag)
    problem = waveform_fitting_from_array(input_signal, input_fs,
                                          decimation=decimation,
                                          coord_scale=coord_scale)
    hparams = dict(
        tag=tag, duration=len(input_signal) / input_fs, method="wave",
        arch=arch, loss_mode=loss_mode, total_steps=total_steps,
        learning_rate=learning_rate, min_learning_rate=min_learning_rate,
        num_sine=num_sine, num_snake=num_snake, num_tanh=num_tanh,
        hidden=hidden, omega=omega, hidden_omega=hidden_omega,
        a_initial=a_initial, num_freq=num_freq, alpha=alpha,
        decimation=decimation, bwe=bwe, coord_scale=coord_scale,
        prev_ckpt_path=prev_ckpt_path, seed=seed,
        first_linear=first_linear, last_linear=last_linear,
        grad_clip_norm=grad_clip_norm, plateau_factor=plateau_factor,
        plateau_patience=plateau_patience,
        multi_resolution_stft=multi_resolution_stft,
        update_grid_every=update_grid_every, scaled_first=scaled_first,
        encoding=encoding)
    out = _run_experiment(
        problem, folder, np.asarray(input_signal, dtype=np.float32), input_fs,
        arch=arch, hidden=hidden, num_sine=num_sine, num_snake=num_snake,
        num_tanh=num_tanh, omega=omega, hidden_omega=hidden_omega,
        a_initial=a_initial, num_freq=num_freq, sigma=sigma,
        loss_mode=loss_mode, alpha=alpha, total_steps=total_steps,
        learning_rate=learning_rate, min_learning_rate=min_learning_rate,
        bwe=bwe, prev_ckpt_path=prev_ckpt_path,
        key=jax.random.PRNGKey(seed), make_plots=make_plots,
        track_best=track_best, visualization=visualization, hparams=hparams,
        fused=fused, profile=profile,
        first_linear=first_linear, last_linear=last_linear,
        grad_clip_norm=grad_clip_norm, plateau_factor=plateau_factor,
        plateau_patience=plateau_patience,
        multi_resolution_stft=multi_resolution_stft,
        update_grid_every=update_grid_every,
        scaled_first=scaled_first, encoding=encoding)
    return out
