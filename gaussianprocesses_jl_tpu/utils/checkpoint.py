"""Checkpoint / resume for long sampling runs (SURVEY §5: the reference
persists nothing — samplers return the whole posterior in memory,
src/mcmc.jl:83).

Pod-scale MCMC needs restartable state: chain positions, adapted step
sizes, RNG keys, and accumulated statistics. Any pytree of arrays
round-trips through a single .npz file (no orbax dependency; the flat
key encoding preserves the tree structure).

Format v2: the file records the pytree's treedef string and a format
version; `load_checkpoint` validates both against the `like` tree, so a
checkpoint from a *different* model/sampler configuration with the same
leaf count can never be silently misassigned into the wrong leaves."""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint"]

_FORMAT_VERSION = 2


def _encode_str(s: str) -> np.ndarray:
    return np.frombuffer(s.encode(), dtype=np.uint8)


def _decode_str(arr: np.ndarray) -> str:
    return arr.tobytes().decode()


def save_checkpoint(path: str, state) -> None:
    """Serialize a pytree of arrays/scalars to `path` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__treedef__"] = _encode_str(str(treedef))
    arrays["__version__"] = np.asarray(_FORMAT_VERSION, dtype=np.int64)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)  # atomic


def load_checkpoint(path: str, like):
    """Restore a pytree saved by save_checkpoint; `like` supplies the tree
    structure (e.g. an initial state of the same shape).

    Raises ValueError when the stored treedef, leaf count, or any leaf
    shape disagrees with `like` — a checkpoint written by a different
    configuration must never resume silently."""
    data = np.load(path)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    if "__treedef__" in data:
        stored = _decode_str(data["__treedef__"])
        if stored != str(treedef):
            raise ValueError(
                f"checkpoint {path} was written for a different pytree "
                f"structure:\n  stored:   {stored}\n  expected: {treedef}")
    n = len(leaves_like)
    leaves = []
    for i in range(n):
        key = f"leaf_{i}"
        if key not in data:
            raise ValueError(
                f"checkpoint {path} has {i} leaves, expected {n}")
        arr = data[key]
        ref = jnp.asarray(leaves_like[i])
        if tuple(arr.shape) != tuple(ref.shape):
            raise ValueError(
                f"checkpoint {path} leaf {i} has shape {arr.shape}, "
                f"expected {tuple(ref.shape)}")
        leaves.append(jnp.asarray(arr, dtype=ref.dtype))
    if f"leaf_{n}" in data:
        raise ValueError(
            f"checkpoint {path} has more than the expected {n} leaves")
    return jax.tree_util.tree_unflatten(treedef, leaves)
