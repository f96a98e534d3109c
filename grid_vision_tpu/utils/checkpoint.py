"""Checkpoint / resume.

The reference has none (SURVEY §5: grid state lives in RAM; restart =
fresh prior). Here both the grid state and the model params checkpoint
via orbax (falling back to npz when orbax is unavailable), so a fleet
can resume mid-sequence.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    leaves_with_path = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves_with_path:
        key = prefix + "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out


def save(path: str, tree: Any) -> None:
    """Save any pytree. Directory -> orbax; .npz file -> flat npz."""
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    if path.endswith(".npz"):
        np.savez_compressed(path, **_flatten(tree))
        return
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), tree, force=True)
    except Exception:
        np.savez_compressed(path + ".npz", **_flatten(tree))


def restore(path: str, like: Any) -> Any:
    """Restore a pytree with the structure of `like`."""
    if path.endswith(".npz") or os.path.exists(path + ".npz"):
        f = path if path.endswith(".npz") else path + ".npz"
        data = np.load(f)
        flat = _flatten(like)
        keys = list(flat.keys())
        leaves = [data[k] for k in keys]
        treedef = jax.tree_util.tree_structure(like)
        return jax.tree_util.tree_unflatten(treedef, leaves)
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path), item=like)
