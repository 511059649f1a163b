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
        "metadata": metadata or {},
    }
    with open(path + ".json", "w") as f:
        json.dump(side, f, indent=1)
    return path


def load(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save`; `like` supplies the structure
    (and dtypes) to restore into."""
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(like)
    assert len(leaves) == len(data.files), (
        f"checkpoint has {len(data.files)} leaves, expected {len(leaves)}")
    new_leaves = []
    for i, leaf in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        new_leaves.append(jax.numpy.asarray(arr, dtype=leaf.dtype)
                          if hasattr(leaf, "dtype") else arr)
    return jax.tree.unflatten(treedef, new_leaves)


def metadata(path: str) -> dict:
    with open(path + ".json") as f:
        return json.load(f)["metadata"]
