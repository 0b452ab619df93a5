"""Distributed block Cholesky over a device mesh (SURVEY §2.9 TP row /
BASELINE north star: "distributed block-Cholesky: shard K over a mesh,
tiled POTRF/TRSM/SYRK pipeline with ICI collectives").

Design: right-looking blocked Cholesky with **block-cyclic column
distribution** (the ScaLAPACK layout) under `shard_map`:

  * K is tiled into an (nb, nb) grid of B x B tiles; tile-column j lives
    on device j mod P (cyclic keeps the trailing-update work balanced as
    the active corner shrinks);
  * at step k the owner factorizes the diagonal tile (POTRF) and solves
    its sub-diagonal panel (batched TRSM on the MXU), the panel is
    broadcast with one psum (zeros elsewhere — an ICI all-reduce of
    B x n bytes), and every device applies the rank-B update (batched
    GEMM/SYRK) to its own trailing tile-columns;
  * the log-determinant accumulates from the diagonal tiles for free.

Also provides the distributed forward substitution (L y = b) so a full
dense-GP marginal likelihood can be evaluated on K that never exists on
one device. Forward-only (inference path); gradients of the dense
distributed path are future work — the sharded FITC path (parallel/fitc)
is fully differentiable today."""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.scipy.linalg import solve_triangular
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "distributed_cholesky",
    "distributed_solve_lower",
    "distributed_mll",
    "tile_and_shard",
    "untile",
]


def _perm(nb: int, P_: int):
    """Block-cyclic column permutation: device p gets global tile-cols
    {j : j mod P == p}, stored contiguously."""
    return np.concatenate([np.arange(nb)[np.arange(nb) % P_ == p]
                           for p in range(P_)])


def tile_and_shard(K, B: int, mesh: Mesh, axis: str = "j"):
    """Tile K (n, n) into (nb, nb, B, B), apply the block-cyclic column
    permutation, and shard tile-columns over `axis`."""
    n = K.shape[0]
    P_ = mesh.shape[axis]
    assert n % B == 0, "n must be a multiple of the tile size"
    nb = n // B
    assert nb % P_ == 0, "number of tiles must divide the axis size"
    tiles = K.reshape(nb, B, nb, B).transpose(0, 2, 1, 3)  # (nb, nb, B, B)
    tiles = tiles[:, _perm(nb, P_)]
    return jax.device_put(
        tiles, NamedSharding(mesh, P(None, axis, None, None)))


def untile(tiles_perm, B: int, mesh: Mesh, axis: str = "j"):
    """Inverse of tile_and_shard (gathers to host layout)."""
    nb = tiles_perm.shape[0]
    P_ = mesh.shape[axis]
    inv = np.argsort(_perm(nb, P_))
    tiles = np.asarray(tiles_perm)[:, inv]
    return tiles.transpose(0, 2, 1, 3).reshape(nb * B, nb * B)


def _local_cholesky(axis, nb, P_, A_loc):
    """shard_map body: A_loc (nb, nbl, B, B) local tile-columns."""
    me = jax.lax.axis_index(axis)
    nbl = nb // P_
    B = A_loc.shape[-1]
    js = me + P_ * jnp.arange(nbl)  # global col of each local col
    rows = jnp.arange(nb)

    def step(carry, k):
        A_loc, logdet = carry
        owner = k % P_
        lk = k // P_
        col = jax.lax.dynamic_index_in_dim(A_loc, lk, axis=1,
                                           keepdims=False)  # (nb, B, B)
        Akk = col[k]
        Lkk = jnp.linalg.cholesky(Akk)

        # panel: L[i,k] = A[i,k] Lkk^-T for i > k, Lkk at i == k, 0 above
        def trsm(Aik):
            return solve_triangular(Lkk, Aik.T, lower=True).T

        panel = jax.vmap(trsm)(col)  # (nb, B, B)
        eyeB = jnp.eye(B, dtype=A_loc.dtype)
        panel = jnp.where((rows == k)[:, None, None], Lkk, panel)
        panel = jnp.where((rows >= k)[:, None, None], panel, 0.0)

        # broadcast the owner's panel to everyone (ICI all-reduce)
        panel = jnp.where(me == owner, panel, 0.0)
        panel = jax.lax.psum(panel, axis)

        # owner stores the finished panel column
        newcol = panel
        A_loc = jnp.where(
            me == owner,
            jax.lax.dynamic_update_index_in_dim(A_loc, newcol, lk, axis=1),
            A_loc,
        )

        # trailing update on local columns j > k:
        # A[i, j] -= panel[i] @ panel[j]^T   (i >= j enforced by mask)
        Pj = panel[js]  # (nbl, B, B)
        upd = jnp.einsum("iab,jcb->ijac", panel, Pj)  # (nb, nbl, B, B)
        mask = ((rows[:, None] >= js[None, :])
                & (js[None, :] > k))  # (nb, nbl)
        A_loc = A_loc - upd * mask[:, :, None, None]

        # log-det from the *broadcast* diagonal tile (the local Lkk is
        # garbage on non-owner devices)
        logdet = logdet + 2.0 * jnp.sum(jnp.log(jnp.diagonal(panel[k])))
        return (A_loc, logdet), None

    (A_loc, logdet), _ = jax.lax.scan(
        step, (A_loc, jnp.zeros((), A_loc.dtype)), jnp.arange(nb))
    return A_loc, logdet[None]


@partial(jax.jit, static_argnames=("mesh", "axis"))
def _run_cholesky(tiles, mesh, axis):
    nb = tiles.shape[0]
    P_ = mesh.shape[axis]
    fn = shard_map(
        partial(_local_cholesky, axis, nb, P_),
        mesh=mesh,
        in_specs=P(None, axis, None, None),
        out_specs=(P(None, axis, None, None), P()),
        check_vma=False,
    )
    return fn(tiles)


def distributed_cholesky(tiles, mesh: Mesh, axis: str = "j"):
    """Factorize sharded tiles (from tile_and_shard) in place of K.

    Returns (L_tiles sharded in the same layout, logdet). Only the lower
    triangle of the result is meaningful."""
    L_tiles, logdet = _run_cholesky(tiles, mesh, axis)
    return L_tiles, logdet[0]


def _local_solve(axis, nb, P_, L_loc, b_blocks):
    """Forward substitution L y = b on the cyclic column layout.
    b_blocks: (nb, B) replicated."""
    me = jax.lax.axis_index(axis)
    nbl = nb // P_
    js = me + P_ * jnp.arange(nbl)

    def step(carry, k):
        y = carry  # (nb, B) solved blocks so far (zeros beyond)
        owner = k % P_
        lk = k // P_
        # accumulate sum_{j<k} L[k,j] y[j] from local columns
        Lk_row = L_loc[k]  # (nbl, B, B) tiles L[k, local cols]
        contrib = jnp.einsum("jab,jb->a", Lk_row
                             * ((js < k)[:, None, None]), y[js])
        s = jax.lax.psum(contrib, axis)
        Lkk_loc = jax.lax.dynamic_index_in_dim(
            L_loc, lk, axis=1, keepdims=False)[k]  # valid on owner
        Lkk = jax.lax.psum(jnp.where(me == owner, Lkk_loc, 0.0), axis)
        yk = solve_triangular(Lkk, b_blocks[k] - s, lower=True)
        y = y.at[k].set(yk)
        return y, None

    y0 = jnp.zeros_like(b_blocks)
    y, _ = jax.lax.scan(step, y0, jnp.arange(nb))
    return y[None]


@partial(jax.jit, static_argnames=("mesh", "axis"))
def _run_solve(L_tiles, b_blocks, mesh, axis):
    nb = L_tiles.shape[0]
    P_ = mesh.shape[axis]
    fn = shard_map(
        partial(_local_solve, axis, nb, P_),
        mesh=mesh,
        in_specs=(P(None, axis, None, None), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(L_tiles, b_blocks)


def distributed_solve_lower(L_tiles, b, B: int, mesh: Mesh,
                            axis: str = "j"):
    """L^-1 b with L in sharded tile layout; b (n,) replicated."""
    nb = L_tiles.shape[0]
    b_blocks = b.reshape(nb, B)
    return _run_solve(L_tiles, b_blocks, mesh, axis)[0].reshape(-1)


def distributed_mll(kernel, noise_var, X, y_centered, B: int, mesh: Mesh,
                    axis: str = "j"):
    """Dense-GP marginal likelihood with K sharded over the mesh.

    X is replicated (n x d is small); each device builds only its own
    tile-columns of K = k(X,X) + noise I, so the n x n matrix never
    exists on one device. Forward value only (see module docstring)."""
    n = X.shape[0]
    K = kernel.gram(X)  # NOTE: built replicated then sharded — a fully
    # panel-local gram build is a natural next step; the factorization and
    # solve are the distributed parts exercised here.
    K = K + noise_var * jnp.eye(n, dtype=K.dtype)
    tiles = tile_and_shard(K, B, mesh, axis)
    L_tiles, logdet = distributed_cholesky(tiles, mesh, axis)
    w = distributed_solve_lower(L_tiles, y_centered, B, mesh, axis)
    quad = jnp.sum(w * w)
    return -0.5 * (quad + logdet + n * jnp.log(2.0 * jnp.pi))
