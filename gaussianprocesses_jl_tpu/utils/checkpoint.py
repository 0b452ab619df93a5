"""Checkpoint / resume for long sampling runs (SURVEY §5: the reference
persists nothing — samplers return the whole posterior in memory,
src/mcmc.jl:83).

Pod-scale MCMC needs restartable state: chain positions, adapted step
sizes, RNG keys, and accumulated statistics. Any pytree of arrays
round-trips through a single .npz file (no orbax dependency; the flat
key encoding preserves the tree structure)."""
from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint"]


def save_checkpoint(path: str, state) -> None:
    """Serialize a pytree of arrays/scalars to `path` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)  # atomic


def load_checkpoint(path: str, like):
    """Restore a pytree saved by save_checkpoint; `like` supplies the tree
    structure (e.g. an initial state of the same shape)."""
    data = np.load(path)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    n = len(leaves_like)
    leaves = []
    for i in range(n):
        key = f"leaf_{i}"
        if key not in data:
            raise ValueError(
                f"checkpoint {path} has {i} leaves, expected {n}")
        arr = data[key]
        ref = leaves_like[i]
        leaves.append(jnp.asarray(arr, dtype=jnp.asarray(ref).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
