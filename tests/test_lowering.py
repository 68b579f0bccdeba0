"""Regression guard: no production jit may close over DEVICE arrays.

A jax.Array captured by a jitted closure is embedded into the lowered module
as an MLIR constant, and materialising that constant performs a device->host
fetch at LOWERING time.  On the tunneled axon TPU backend that fetch
serializes behind all pending device work — it was the entire "218 s cold
compile" of the round-2 headline bench (the actual XLA compile was ~2 s,
see BASELINE.md).  Closure constants must therefore be host numpy arrays
(embedded straight from host memory), or passed as jit arguments.

On the CPU test backend that fetch is free, so wall-clock can't catch a
regression here.  Instead these tests patch the MLIR constant handler for
``jax.Array`` to raise: any device-array constant reaching lowering —
exactly the operation that pays the tunnel fetch on TPU — fails the test,
while host-numpy constants use a different handler and pass untouched.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inraudio_tpu.codec import quantization_aware_refit
from inraudio_tpu.data.coords import get_coord
from inraudio_tpu.models import SirenSnakeTanhConfig, build_model
from inraudio_tpu.parallel.mesh import make_mesh
from inraudio_tpu.train import TrainConfig, fit
from inraudio_tpu.train.multi_inr import (MultiINRConfig, multi_inr_decode,
                                          multi_inr_fit)
from inraudio_tpu.utils.landscape import random_plane

FS = 44100


@pytest.fixture
def no_device_constants(monkeypatch):
    """Fail the test if lowering embeds any jax.Array as an MLIR constant."""
    from jax._src import array as _array
    from jax._src.interpreters import mlir as _mlir

    def raiser(*args, **kwargs):
        val = args[0]
        raise AssertionError(
            "device-array constant embedded at lowering time (shape="
            f"{getattr(val, 'shape', None)}): closure captures inside jit "
            "must be host numpy arrays or jit arguments — a device capture "
            "forces a device->host fetch during lowering, which stalls for "
            "minutes behind pending work on the axon TPU tunnel")

    monkeypatch.setitem(_mlir._constant_handlers, _array.ArrayImpl, raiser)


def _sine(dur, freq):
    t = np.arange(int(dur * FS)) / FS
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def _tiny_model(hidden=16):
    return build_model("mlp", SirenSnakeTanhConfig(
        first_omega_0=150.0, hidden_features=hidden,
        num_sine=1, num_snake=0))


def test_hook_catches_device_closure(no_device_constants):
    """Sanity: the hook distinguishes device captures from host constants."""
    dev = jnp.arange(8.0, dtype=jnp.float32)
    with pytest.raises(AssertionError, match="device-array constant"):
        jax.jit(lambda x: x + dev).lower(np.zeros(8, np.float32))
    host = np.arange(8.0, dtype=np.float32)
    jax.jit(lambda x: x + host).lower(np.zeros(8, np.float32))


def test_fit_lowers_without_device_constants(no_device_constants):
    sig = _sine(0.01, 440)
    coords = get_coord(len(sig), dim=1)
    fit(_tiny_model(), coords, sig[:, None],
        TrainConfig(total_steps=20, scan_chunk=10))


def test_multi_inr_fit_and_decode_lower_without_device_constants(
        no_device_constants):
    sig = 0.8 * _sine(0.04, 880)
    model = _tiny_model()
    res = multi_inr_fit(
        model, sig, FS,
        MultiINRConfig(chunk_seconds=0.02, overlap_fraction=0.25),
        TrainConfig(total_steps=20, scan_chunk=10),
        key=jax.random.PRNGKey(0), mesh=make_mesh(jax.devices()[:1]))
    out = multi_inr_decode(model, res)
    assert out.shape == sig.shape


def test_multi_inr_fused_step_lowers_without_device_constants(
        no_device_constants):
    """The whole-step fused path closes the padded coordinate grid over the
    vmapped kernel step (pad_step_inputs) — it must stay host numpy."""
    sig = 0.8 * _sine(0.04, 880)
    model = build_model("mlp", SirenSnakeTanhConfig(
        first_omega_0=150.0, hidden_features=16, num_sine=1, num_snake=0),
        fused=True, interpret=True)
    from inraudio_tpu.train.loop import fused_step_plan
    tc = TrainConfig(total_steps=10, scan_chunk=5, grad_clip_norm=1.0)
    assert fused_step_plan(model, tc, 882) is not None
    res = multi_inr_fit(
        model, sig, FS,
        MultiINRConfig(chunk_seconds=0.02, overlap_fraction=0.25),
        tc, key=jax.random.PRNGKey(0), mesh=make_mesh(jax.devices()[:1]))
    out = multi_inr_decode(model, res)
    assert out.shape == sig.shape


def test_random_plane_lowers_without_device_constants(no_device_constants):
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    coords = np.asarray(get_coord(64, dim=1), np.float32)
    targets = np.zeros((64, 1), np.float32)

    def loss_fn(p):
        return jnp.mean((model.apply(p, coords) - targets) ** 2)

    surf = random_plane(loss_fn, params, jax.random.PRNGKey(1), steps=3)
    assert surf.shape == (3, 3)


def test_qa_refit_lowers_without_device_constants(no_device_constants):
    model = _tiny_model()
    k, n = 3, 64
    params = jax.vmap(model.init)(jax.random.split(jax.random.PRNGKey(0), k))
    params = jax.tree.map(np.asarray, params)
    coords = np.asarray(get_coord(n, dim=1), np.float32)
    targets = np.zeros((k, n, 1), np.float32)
    quantization_aware_refit(model, params, "int8", targets, coords, steps=4)
