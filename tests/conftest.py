"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags BEFORE jax is imported anywhere, so this conftest performs
the environment setup at import time (pytest imports conftest first).
Multi-chip sharding logic is validated against these 8 fake devices
(equivalent to SURVEY.md section 4 item 5); real-TPU benchmarking happens in
bench.py, not in the test suite.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force override: the session presets JAX_PLATFORMS=axon (TPU)

# jax is already imported at interpreter startup by the image's sitecustomize,
# so JAX_ENABLE_X64 via env is too late — use the runtime config switch.
# (Backends initialise lazily, so JAX_PLATFORMS=cpu above still takes effect.)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # float64 for DSP-parity tests; library code is dtype-explicit float32
# Persistent compile cache (works for the CPU backend too — verified: a
# 2.5 s compile replays in 0.6 s from a second process).  Test-suite wall
# time is compile-dominated, so warm `-m fast` runs drop well under the
# cold time; the cache is keyed on jaxpr+flags, safe across edits.
# Measured r4 on this 1-core host: cold fast gate 10:00, warm 4:59
# (185 tests) — the <=6 min gate target holds once .jax_cache_tests is
# populated (first run after a clean clone pays the cold time once).
# r5 re-measure (1-core host): fast tier 182 tests — 6:44 cold cache,
# 4:27 fully warm (5:26 first run after new-kernel edits); slow tier 95
# tests — 23:35 warm.  Full suite 277 passed.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_WAV = "/root/reference/gt_bach.wav"

# ---------------------------------------------------------------------------
# fast/slow split: `pytest -m fast` is the quick gate (~8 min on the 1-core
# CPU host; the full suite is ~34 min — r3 measured durations).  Slow =
# whole modules that interpret Pallas kernels on CPU, plus individual tests
# over ~20 s (heavy e2e fits/encodes) marked @pytest.mark.slow in place.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402

SLOW_MODULES = {"test_pallas", "test_pallas_kan", "test_pallas_train"}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
        if item.get_closest_marker("slow") is None:
            item.add_marker(pytest.mark.fast)
