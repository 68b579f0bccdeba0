"""Checkpoint / resume: the full TrainState as one .npz file.

Reference parity (run.py:84-106, 356-363): torch saves
``{'model_state_dict', 'optimizer_state_dict'}`` and warm-starts by building
the same architecture then loading both — the scheduler restarts fresh each
phase.  Here the ENTIRE TrainState pytree (params, Adam moments + step + lr,
plateau state, best-params snapshot) is saved, so resume is exact; the
procedural decimation curriculum (run.py:486-495) chains these files.

Format: numpy .npz with leaves keyed ``leaf_00000``... in tree-flatten
order, plus scalar metadata. No pickle — loads with allow_pickle=False.
Restoring follows the reference's "rebuild the same arch, then load" recipe:
the caller provides a template state (same model/config) whose treedef the
leaves are poured into.
"""

from __future__ import annotations

import json
from typing import Any

import jax
import numpy as np

from .loop import TrainState


def save_checkpoint(path: str, state: TrainState,
                    extra: dict[str, Any] | None = None) -> str:
    leaves, treedef = jax.tree_util.tree_flatten(jax.device_get(state))
    arrays = {f"leaf_{i:05d}": np.asarray(x) for i, x in enumerate(leaves)}
    meta = {"num_leaves": len(leaves), "format": "inraudio_tpu.ckpt.v1",
            "extra": extra or {}}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)
    return path if path.endswith(".npz") else path + ".npz"


def load_checkpoint(path: str, template: TrainState) -> TrainState:
    """Pour saved leaves into the treedef of ``template`` (a fresh
    ``init_train_state`` of the same model/config — the reference's
    rebuild-then-load_state_dict recipe, run.py:84-105)."""
    with np.load(path, allow_pickle=False) as f:
        meta = json.loads(bytes(f["__meta__"]).decode("utf-8"))
        leaves = [f[f"leaf_{i:05d}"] for i in range(meta["num_leaves"])]
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(t_leaves) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template has "
            f"{len(t_leaves)} — architecture mismatch")
    for tl, l in zip(t_leaves, leaves):
        if np.shape(tl) != l.shape:
            raise ValueError(
                f"leaf shape mismatch: template {np.shape(tl)} vs "
                f"checkpoint {l.shape} — architecture mismatch")
    return jax.tree_util.tree_unflatten(treedef, leaves)


def checkpoint_extra(path: str) -> dict[str, Any]:
    """Read back the metadata dict stored alongside the state."""
    with np.load(path, allow_pickle=False) as f:
        return json.loads(bytes(f["__meta__"]).decode("utf-8"))["extra"]
