"""Device-mesh helpers.

The reference is single-process (SURVEY §2.9: no DP/TP/PP/SP/EP, no
communication backend). This package adds the TPU-native distribution layer:
`jax.sharding.Mesh` + `shard_map` with XLA collectives over ICI/DCN.
Axis conventions:

  'chains' — data-parallel axis for MCMC chains / VI batches (config #5)
  'data'   — observation axis n for sharded gram/FITC reductions (config #4)
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "Mesh", "NamedSharding", "P"]


def make_mesh(axis_sizes: dict | None = None, devices=None) -> Mesh:
    """Build a mesh from {axis_name: size}; defaults to all devices on one
    'chains' axis."""
    devices = devices if devices is not None else jax.devices()
    if axis_sizes is None:
        axis_sizes = {"chains": len(devices)}
    names = tuple(axis_sizes)
    shape = tuple(axis_sizes.values())
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, names)
