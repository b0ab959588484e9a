"""Checkpoint / resume.

The reference has no persistence beyond a dead-code PPM screenshot writer
(SURVEY.md section 5).  Here: pytree checkpoints for the fit workload's
parameters and optimizer state — orbax when available, npz fallback — plus
deterministic re-render semantics (a render is a pure function of
scene+seed, so crash recovery is re-execution).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import numpy as np


def _flatten_with_paths(tree) -> dict:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(path): np.asarray(leaf)
            for path, leaf in flat}


def save_checkpoint(path: str, tree: Any) -> None:
    """npz pytree checkpoint (leaf arrays keyed by tree path)."""
    np.savez(path, **_flatten_with_paths(tree))


def restore_checkpoint(path: str, like: Any) -> Any:
    """Restore into the structure of ``like``."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for path_key, leaf in flat:
        key = jax.tree_util.keystr(path_key)
        if key not in data:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = data[key]
        leaves.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint_orbax(path: str, tree: Any) -> None:
    """Orbax variant for multi-host checkpoints of sharded pytrees."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree)
    ckptr.wait_until_finished()


def restore_checkpoint_orbax(path: str, like: Any) -> Any:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, like)
