"""Device mesh + sharding layout for coordinate-sharded data parallelism.

The reference is single-GPU (``.cuda()``, run.py:102,115,136 — no
torch.distributed anywhere); the TPU rebuild's parallelism strategy is the
one that fits this small-model/huge-batch workload (SURVEY.md section 5):

- 1-D mesh over all chips, axis name "data";
- coords/targets/per-sample weights sharded on the sample axis (axis 0) —
  each chip holds ~n/8 rows over ICI;
- the ~1 MB parameter pytree replicated on every chip.

Under ``jit`` XLA's SPMD partitioner then emits exactly one psum per step
(the gradient all-reduce) — no hand-written collectives.  The layout is
validated on a virtual 8-device CPU mesh in
tests/test_train.py::TestShardingEquivalence,
tests/test_experiments.py (chunk-axis shard_map tests) and by
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def coord_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Rows sharded across chips, features replicated: P('data', None)."""
    return NamedSharding(mesh, P(axis_name, None))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: np.ndarray, multiple: int,
                    pad_value: float = 0.0) -> tuple[np.ndarray, int]:
    """Pad axis 0 up to a multiple of the device count (static shapes for
    XLA). Returns (padded, original_length); padded rows carry zero loss
    weight downstream."""
    n = x.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = np.full((rem,) + x.shape[1:], pad_value, dtype=x.dtype)
    return np.concatenate([x, pad], axis=0), n


def shard_problem_arrays(mesh: Mesh, coords: np.ndarray, targets: np.ndarray,
                         weight: np.ndarray | None = None):
    """Place (coords, targets, weight) on the mesh, sample-axis sharded.

    Pads to a device-count multiple; padded rows get weight 0 so every
    reduction ignores them — when no explicit weight is given and padding was
    needed, a mask weight normalised to mean 1 over real rows is created so
    plain weighted means stay exact.
    """
    n_dev = mesh.devices.size
    cs = coord_sharding(mesh)
    n = coords.shape[0]
    coords_p, _ = pad_to_multiple(np.asarray(coords), n_dev)
    targets_p, _ = pad_to_multiple(np.asarray(targets), n_dev)
    padded = coords_p.shape[0] != n
    if weight is None and padded:
        weight = np.ones((n, 1), dtype=np.float32)
    if weight is not None:
        # accept 1-D (n,) weights from the public fit() surface
        weight = np.asarray(weight, dtype=np.float32).reshape(n, -1)
        weight_p, _ = pad_to_multiple(weight, n_dev)
        # normalise so mean(weight) over the padded batch equals 1 on real rows
        weight_p = weight_p * (weight_p.shape[0] / max(np.sum(weight_p[:, 0]), 1e-12))
        weight_dev = jax.device_put(weight_p, cs)
    else:
        weight_dev = None
    return (jax.device_put(coords_p, cs), jax.device_put(targets_p, cs),
            weight_dev, n)
