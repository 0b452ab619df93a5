"""Ring-sharded gram-matrix construction (SURVEY §2.9 SP row / §5).

The GP analog of ring attention: the observation axis n is sharded over
the mesh, and the off-diagonal blocks of K = k(X, X) are produced by
rotating X row-blocks between ICI neighbors with `ppermute`. Each device
holds only its (n/P x n) block-row of K and only ever sees one visiting
(n/P x d) X block at a time, so both X and K stay sharded end-to-end —
the pattern the block-row builders for matvec-style solvers (CG, Lanczos)
and the distributed-Cholesky gram feed build on.

Differentiable: `jax.grad` flows through the shard_map/ppermute loop to
kernel hyperparameters (ppermute transposes to the reverse rotation).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["ring_gram"]


def _local_ring(axis, P_, kernel, X_loc):
    # kernel arrives as an explicit shard_map argument (replicated pytree),
    # so its hyperparameters stay differentiable through the map
    """Body: X_loc (n/P, d) local rows -> (n/P, n) local block-row of K."""
    me = jax.lax.axis_index(axis)
    chunk = X_loc.shape[0]
    ring = [(i, (i + 1) % P_) for i in range(P_)]

    def step(carry, s):
        V, Krow = carry  # V: the X block of device (me - s) mod P
        q = (me - s) % P_
        block = kernel.gram(X_loc, V)  # (chunk, chunk) — MXU gram tile
        Krow = jax.lax.dynamic_update_slice(Krow, block,
                                            (jnp.zeros((), q.dtype),
                                             q * chunk))
        V = jax.lax.ppermute(V, axis, ring)
        return (V, Krow), None

    Krow0 = jnp.zeros((chunk, chunk * P_), X_loc.dtype)
    (_, Krow), _ = jax.lax.scan(step, (X_loc, Krow0), jnp.arange(P_))
    return Krow


def ring_gram(kernel, X, mesh: Mesh, axis: str = "data"):
    """Block-row-sharded K = k(X, X) from row-sharded X.

    X: (n, d) sharded over `axis` along rows (n divisible by the axis
    size). Returns K (n, n) sharded the same way along rows. Total
    communication: each device sends its X block P-1 times around the ring
    (n*d floats), vs. n*n/P for an all-gather of K — the ring keeps the
    exchange proportional to the *inputs*, not the gram."""
    P_ = mesh.shape[axis]
    fn = shard_map(
        partial(_local_ring, axis, P_),
        mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=P(axis, None),
        check_vma=False,
    )
    return fn(kernel, X)
