"""Observability: JSONL metric streaming, step timing, profiler traces.

The reference's observability is print statements + per-step Python lists
plotted once at the end + a summary parameters.json (SURVEY.md section 5).
The rebuild streams structured metrics to JSONL (one object per line, cheap
to append and to parse), exposes steps/sec / Msamples/sec counters, and
wraps ``jax.profiler`` for on-demand TPU traces.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Iterator


class MetricsLogger:
    """Append-only JSONL metric stream: ``log({"step": i, "loss": ...})``."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a", buffering=1)
        self._t0 = time.time()

    def log(self, record: dict[str, Any]) -> None:
        record = dict(record)
        record.setdefault("t", round(time.time() - self._t0, 4))
        self._f.write(json.dumps(record, default=float) + "\n")

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_metrics(path: str) -> list[dict[str, Any]]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


class StepTimer:
    """Wall-clock throughput counters: steps/sec and samples/sec."""

    def __init__(self, samples_per_step: int = 0):
        self.samples_per_step = samples_per_step
        self.reset()

    def reset(self) -> None:
        self._t0 = time.time()
        self.steps = 0

    def tick(self, n_steps: int = 1) -> None:
        self.steps += n_steps

    @property
    def elapsed(self) -> float:
        return time.time() - self._t0

    @property
    def steps_per_sec(self) -> float:
        return self.steps / max(self.elapsed, 1e-9)

    @property
    def msamples_per_sec(self) -> float:
        return self.steps * self.samples_per_step / max(self.elapsed, 1e-9) / 1e6


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True) -> Iterator[None]:
    """``with profile_trace("/tmp/trace"):`` — captures a jax.profiler trace
    viewable in TensorBoard/Perfetto; no-op when disabled."""
    if not enabled:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
