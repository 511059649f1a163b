"""Checkpoint / resume for the control-loop carry state.

The reference has none (SURVEY §5); its persistent cross-step state is the
warm start (prev_traj_/prev_qp_sol/prev_dual_sol_, mpc/include/mpc.h:
267-291).  Here that state is an explicit pytree (SolverState + schedule +
stats ring), so checkpointing is a host dump of the pytree — enabling
crash-resume of long scenario sweeps and reproducible replay of hardware
sessions.
"""
from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def save(path: str, tree: Any, metadata: dict | None = None) -> str:
    """Dump a pytree of arrays to an .npz (+ structure sidecar)."""
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **arrays)
    side = {
        "treedef": str(treedef),
        "num_leaves": len(leaves),
        "leaf_shapes": [list(a.shape) for a in arrays.values()],
        "metadata": metadata or {},
    }
    with open(path + ".json", "w") as f:
        json.dump(side, f, indent=1)
    return path


class StructureMismatch(ValueError):
    """The checkpoint's pytree structure does not match the `like` template."""


def load(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save`; `like` supplies the structure
    (and dtypes) to restore into.

    Validates structurally before restoring: the stored treedef string (when
    the sidecar exists) and every leaf's shape must match `like` — a
    structurally different pytree with an equal leaf count must NOT silently
    load into the wrong slots."""
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(like)
    if len(leaves) != len(data.files):
        raise StructureMismatch(
            f"checkpoint has {len(data.files)} leaves, expected {len(leaves)}")
    side_path = path + ".json"
    if os.path.exists(side_path):
        with open(side_path) as f:
            side = json.load(f)
        stored_def = side.get("treedef")
        if stored_def is not None and stored_def != str(treedef):
            raise StructureMismatch(
                "checkpoint treedef does not match the template:\n"
                f"  stored:   {stored_def}\n  template: {treedef}")
    new_leaves = []
    for i, leaf in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        want = tuple(getattr(leaf, "shape", np.shape(leaf)))
        if tuple(arr.shape) != want:
            raise StructureMismatch(
                f"checkpoint leaf {i} has shape {tuple(arr.shape)}, "
                f"template expects {want}")
        new_leaves.append(jax.numpy.asarray(arr, dtype=leaf.dtype)
                          if hasattr(leaf, "dtype") else arr)
    return jax.tree.unflatten(treedef, new_leaves)


def metadata(path: str) -> dict:
    with open(path + ".json") as f:
        return json.load(f)["metadata"]
