"""Distributed dense-GP linear algebra over a device mesh (SURVEY §2.9
TP/SP rows / BASELINE north star: "distributed block-Cholesky: shard K over
a mesh, tiled POTRF/TRSM/GEMM pipeline with ICI collectives").

Design: right-looking blocked Cholesky with **block-cyclic column
distribution** (the ScaLAPACK layout) under `shard_map`:

  * K is tiled into an (nb, nb) grid of B x B tiles; tile-column j lives
    on device j mod P (cyclic keeps the trailing-update work balanced as
    the active corner shrinks); device p's local column lj is global
    column j = p + P*lj;
  * each device builds ONLY its own tile-columns of K = k(X,X) + D
    directly from the (small, replicated) n x d inputs — the n x n matrix
    never exists on one device (`build_tiles`);
  * at step k the owner factorizes the diagonal tile (POTRF) and solves
    its sub-diagonal panel (batched TRSM on the MXU), the panel is
    broadcast with one psum (zeros elsewhere — an ICI all-reduce of
    B x n bytes), and every device applies the rank-B update (batched
    GEMM/SYRK) to its own trailing tile-columns;
  * the log-determinant accumulates from the diagonal tiles for free.

The marginal-likelihood core `distributed_quad_logdet` is **differentiable**
via a custom VJP mirroring ops.linalg.dense_quad_logdet: the backward pass
builds the device-local tile-columns of K^-1 by a distributed TRSM against
the (column-sharded) identity followed by a **ring GEMM** — W = L^-1 column
shards rotate between mesh neighbors with `ppermute` while each device
accumulates W^T W into its own tile-columns (the ring-attention-style
neighbor-exchange pattern, SURVEY §5 "long context" analog). The cotangent
d mll/dK = 1/2(aa^T - K^-1) (ref get_ααinvcKI!, src/GPE.jl:151-164) is then
assembled shard-locally, and JAX flows it back through the shard_mapped
gram build to kernel/noise/mean hyperparameters automatically.

Also provides distributed triangular/PD solves (forward + backward
substitution, matrix RHS) so prediction and whitened-latent sampling work
on a factor that never leaves its shards."""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.scipy.linalg import solve_triangular
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# all distributed contractions run at full-f32 MXU precision so the
# sharded factorization matches XLA's fused single-device Cholesky
_HIGH = jax.lax.Precision.HIGHEST

__all__ = [
    "build_tiles",
    "distributed_cholesky",
    "distributed_solve_lower",
    "distributed_solve_upper",
    "distributed_chol_solve",
    "distributed_unwhiten",
    "distributed_unwhiten_build",
    "distributed_quad_logdet",
    "distributed_mll",
    "identity_tiles",
    "tile_and_shard",
    "untile",
    "choose_tile_size",
    "ambient_gram",
    "ambient_cholesky",
    "ambient_identity_tiles",
    "ambient_solve_lower",
    "ambient_solve_upper",
    "ambient_unwhiten",
    "ambient_quad_logdet",
    "ambient_unwhiten_build",
    "ambient_mll",
]


def choose_tile_size(n: int, P_: int, max_B: int = 512) -> int:
    """Largest tile size B <= max_B with n % (B * P_) == 0 (the layout
    needs n a multiple of B and the tile count a multiple of P_)."""
    for B in range(min(max_B, n // P_), 0, -1):
        if n % (B * P_) == 0:
            return B
    raise ValueError(f"no valid tile size for n={n}, P={P_}")


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


def _local_js(axis, nb, P_):
    """Global tile-column indices owned by this device, plus helpers."""
    me = jax.lax.axis_index(axis)
    nbl = nb // P_
    js = me + P_ * jnp.arange(nbl)
    return me, nbl, js


# ---------------------------------------------------------------------------
# Device-local gram build (K never exists on one device)
# ---------------------------------------------------------------------------


def _local_gram(axis, nb, P_, B, kernel, noise_var, X):
    """Build this device's tile-columns of K = k(X, X) + diag(noise_var)
    from the replicated (n, d) inputs: one (n x n/P) gram per device."""
    me, nbl, js = _local_js(axis, nb, P_)
    n = nb * B
    Xb = X.reshape(nb, B, X.shape[-1])
    Xcols = jnp.take(Xb, js, axis=0).reshape(nbl * B, X.shape[-1])
    Kcols = kernel.gram(X, Xcols)  # (n, nbl*B) — MXU gram, 1/P of the work
    tiles = Kcols.reshape(nb, B, nbl, B).transpose(0, 2, 1, 3)
    # noise on the diagonal tiles (scalar or heteroscedastic vector)
    nv = jnp.broadcast_to(noise_var, (n,)).reshape(nb, B)
    eyeB = jnp.eye(B, dtype=tiles.dtype)
    dmask = (jnp.arange(nb)[:, None] == js[None, :])  # (nb, nbl)
    dtiles = eyeB[None] * jnp.take(nv, js, axis=0)[:, None, :]  # (nbl, B, B)
    return tiles + dmask[:, :, None, None] * dtiles[None]


def build_tiles(kernel, noise_var, X, B: int, mesh: Mesh, axis: str = "j"):
    """Shard-mapped, differentiable tile-column build of K + diag(noise).

    X is replicated (n x d is small — e.g. 4 MB at n=100k, d=10); each
    device computes only its own (n x n/P) slab of K, so the full n x n
    gram is never materialized on any single device."""
    n = X.shape[0]
    assert n % B == 0, "n must be a multiple of the tile size"
    nb = n // B
    P_ = mesh.shape[axis]
    assert nb % P_ == 0, "number of tiles must divide the axis size"
    fn = shard_map(
        partial(_local_gram, axis, nb, P_, B),
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(None, axis, None, None),
        check_vma=False,
    )
    return fn(kernel, noise_var, X)


def identity_tiles(nb: int, B: int, mesh: Mesh, axis: str = "j",
                   dtype=jnp.float64):
    """Identity matrix in the sharded tile-column layout (the fallback
    factor when a factorization fails — safe_cholesky semantics)."""
    P_ = mesh.shape[axis]

    def body(one):
        _, nbl, js = _local_js(axis, nb, P_)
        eyeB = jnp.eye(B, dtype=dtype)
        dmask = (jnp.arange(nb)[:, None] == js[None, :])
        return one * dmask[:, :, None, None] * eyeB[None, None]

    fn = shard_map(body, mesh=mesh, in_specs=P(),
                   out_specs=P(None, axis, None, None), check_vma=False)
    return fn(jnp.ones((), dtype))


# ---------------------------------------------------------------------------
# Factorization
# ---------------------------------------------------------------------------


def _local_cholesky(axis, nb, P_, A_loc):
    """shard_map body: A_loc (nb, nbl, B, B) local tile-columns."""
    me, nbl, js = _local_js(axis, nb, P_)
    B = A_loc.shape[-1]
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
        upd = jnp.einsum("iab,jcb->ijac", panel, Pj, precision=_HIGH)  # (nb, nbl, B, B)
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
    """Factorize sharded tiles (from build_tiles / tile_and_shard).

    Returns (L_tiles sharded in the same layout, logdet). Finished columns
    hold the exact lower factor (zeros above the diagonal tile row)."""
    L_tiles, logdet = _run_cholesky(tiles, mesh, axis)
    return L_tiles, logdet[0]


# ---------------------------------------------------------------------------
# Triangular / PD solves (replicated RHS, vector or matrix)
# ---------------------------------------------------------------------------


def _local_solve(axis, nb, P_, L_loc, b_blocks):
    """Forward substitution L y = b on the cyclic column layout.
    b_blocks: (nb, B, m) replicated."""
    me, nbl, js = _local_js(axis, nb, P_)

    def step(y, k):
        owner = k % P_
        lk = k // P_
        # accumulate sum_{j<k} L[k,j] y[j] from local columns
        Lk_row = L_loc[k]  # (nbl, B, B) tiles L[k, local cols]
        contrib = jnp.einsum("jab,jbm->am",
                             Lk_row * ((js < k)[:, None, None]), y[js],
                             precision=_HIGH)
        s = jax.lax.psum(contrib, axis)
        Lkk_loc = jax.lax.dynamic_index_in_dim(
            L_loc, lk, axis=1, keepdims=False)[k]  # valid on owner
        Lkk = jax.lax.psum(jnp.where(me == owner, Lkk_loc, 0.0), axis)
        yk = solve_triangular(Lkk, b_blocks[k] - s, lower=True)
        return y.at[k].set(yk), None

    y, _ = jax.lax.scan(step, jnp.zeros_like(b_blocks), jnp.arange(nb))
    return y[None]


def _local_solve_upper(axis, nb, P_, L_loc, b_blocks):
    """Backward substitution L^T y = b. Tile-column k of L lives entirely
    on its owner, so each step is owner-compute + one psum broadcast."""
    me, nbl, js = _local_js(axis, nb, P_)
    rows = jnp.arange(nb)

    def step(y, k):
        owner = k % P_
        lk = k // P_
        colk = jax.lax.dynamic_index_in_dim(L_loc, lk, axis=1,
                                            keepdims=False)  # (nb, B, B)
        # owner computes sum_{m>k} L[m,k]^T y[m] and the block solve
        contrib = jnp.einsum("mba,mbj->aj",
                             colk * ((rows > k)[:, None, None]), y,
                             precision=_HIGH)
        yk = solve_triangular(colk[k], b_blocks[k] - contrib,
                              lower=True, trans=1)
        yk = jax.lax.psum(jnp.where(me == owner, yk, 0.0), axis)
        return y.at[k].set(yk), None

    y, _ = jax.lax.scan(step, jnp.zeros_like(b_blocks),
                        jnp.arange(nb - 1, -1, -1))
    return y[None]


@partial(jax.jit, static_argnames=("mesh", "axis", "lower"))
def _run_solve(L_tiles, b_blocks, mesh, axis, lower=True):
    nb = L_tiles.shape[0]
    P_ = mesh.shape[axis]
    body = _local_solve if lower else _local_solve_upper
    fn = shard_map(
        partial(body, axis, nb, P_),
        mesh=mesh,
        in_specs=(P(None, axis, None, None), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(L_tiles, b_blocks)


def _blocked(b, nb, B):
    """(n,) or (n, m) -> (nb, B, m); returns (blocks, squeeze_flag)."""
    vec = b.ndim == 1
    bm = b[:, None] if vec else b
    return bm.reshape(nb, B, bm.shape[-1]), vec


def distributed_solve_lower(L_tiles, b, B: int, mesh: Mesh, axis: str = "j"):
    """L^-1 b with L in sharded tile layout; b (n,) or (n, m) replicated."""
    nb = L_tiles.shape[0]
    blocks, vec = _blocked(b, nb, B)
    y = _run_solve(L_tiles, blocks, mesh, axis, True)[0]
    y = y.reshape(nb * B, -1)
    return y[:, 0] if vec else y


def distributed_solve_upper(L_tiles, b, B: int, mesh: Mesh, axis: str = "j"):
    """L^-T b (backward substitution)."""
    nb = L_tiles.shape[0]
    blocks, vec = _blocked(b, nb, B)
    y = _run_solve(L_tiles, blocks, mesh, axis, False)[0]
    y = y.reshape(nb * B, -1)
    return y[:, 0] if vec else y


def distributed_chol_solve(L_tiles, b, B: int, mesh: Mesh, axis: str = "j"):
    """(L L^T)^-1 b via forward + backward substitution."""
    w = distributed_solve_lower(L_tiles, b, B, mesh, axis)
    return distributed_solve_upper(L_tiles, w, B, mesh, axis)


def _local_unwhiten(axis, nb, P_, L_loc, v_blocks):
    """L v: each device contracts its local (finished, exactly lower)
    columns against its slice of v; one psum combines."""
    _, nbl, js = _local_js(axis, nb, P_)
    out = jnp.einsum("ilab,lbm->iam", L_loc, v_blocks[js], precision=_HIGH)
    return jax.lax.psum(out, axis)[None]


@partial(jax.jit, static_argnames=("mesh", "axis"))
def _run_unwhiten(L_tiles, v_blocks, mesh, axis):
    nb = L_tiles.shape[0]
    P_ = mesh.shape[axis]
    fn = shard_map(
        partial(_local_unwhiten, axis, nb, P_),
        mesh=mesh,
        in_specs=(P(None, axis, None, None), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(L_tiles, v_blocks)


def distributed_unwhiten(L_tiles, v, B: int, mesh: Mesh, axis: str = "j"):
    """L v for replicated v (n,) or (n, m) — the whitened-latent map."""
    nb = L_tiles.shape[0]
    blocks, vec = _blocked(v, nb, B)
    y = _run_unwhiten(L_tiles, blocks, mesh, axis)[0].reshape(nb * B, -1)
    return y[:, 0] if vec else y


# ---------------------------------------------------------------------------
# Differentiable quad + logdet (the distributed mll core)
# ---------------------------------------------------------------------------


def _local_winv(axis, nb, P_, L_loc):
    """W = L^-1 restricted to this device's tile-columns, via a distributed
    TRSM against the column-sharded identity: a row-broadcast forward
    substitution (one (nb, B, B) psum per step — the same volume as the
    factorization's panel broadcasts). Shared by the quad+logdet and the
    unwhiten backward passes."""
    me, nbl, js = _local_js(axis, nb, P_)
    B = L_loc.shape[-1]
    rows = jnp.arange(nb)
    eyeB = jnp.eye(B, dtype=L_loc.dtype)

    def trsm_step(W, k):
        # assemble global row-block k of L from its per-column owners
        rowk = jax.lax.psum(
            jnp.zeros((nb, B, B), L_loc.dtype).at[js].set(L_loc[k]), axis)
        Lkk = rowk[k]
        below = (rows < k)[:, None, None]
        contrib = jnp.einsum("mab,mlbc->lac", rowk * below, W, precision=_HIGH)
        rhs = eyeB[None] * (js == k)[:, None, None] - contrib
        Wk = jax.vmap(
            lambda R: solve_triangular(Lkk, R, lower=True))(rhs)
        return W.at[k].set(Wk), None

    W0 = jnp.zeros((nb, nbl, B, B), L_loc.dtype)
    W, _ = jax.lax.scan(trsm_step, W0, jnp.arange(nb))
    return W


def _local_bwd(axis, nb, P_, L_loc, w_blocks, quad_bar, logdet_bar):
    """Backward pass on the shards: build this device's tile-columns of
    K^-1 = (L^-T)(L^-1) and assemble the K-cotangent

        K_bar = logdet_bar * K^-1 - quad_bar * a a^T,   a = K^-1 r

    (ref get_ααinvcKI!, src/GPE.jl:151-164, re-derived for the sharded
    layout). Two phases:

      1. distributed TRSM vs the column-sharded identity: W = L^-1 local
         columns, via a row-broadcast forward substitution (one (nb,B,B)
         psum per step — same volume as the factorization's panels);
      2. ring GEMM: W column shards rotate around the mesh with ppermute;
         each of the P hops contributes one row-block-set of
         Kinv[:, local] = W^T W[:, local]."""
    me, nbl, js = _local_js(axis, nb, P_)
    B = L_loc.shape[-1]
    W = _local_winv(axis, nb, P_, L_loc)

    # alpha = K^-1 r = W^T w restricted to local cols, then combined
    a_local = jnp.einsum("mlab,ma->lb", W, w_blocks, precision=_HIGH)  # (nbl, B)
    alpha = jax.lax.psum(
        jnp.zeros((nb, B), L_loc.dtype).at[js].set(a_local), axis)

    # --- phase 2: ring GEMM Kinv[:, local] = W^T W[:, local]
    ring = [(i, (i + 1) % P_) for i in range(P_)]

    def ring_step(carry, s):
        V, Kinv = carry  # V = W shard of device (me - s) mod P
        q = (me - s) % P_
        js_q = q + P_ * jnp.arange(nbl)
        block = jnp.einsum("mvab,mlac->vlbc", V, W, precision=_HIGH)  # (nbl, nbl, B, B)
        Kinv = Kinv.at[js_q].set(block)
        V = jax.lax.ppermute(V, axis, ring)
        return (V, Kinv), None

    Kinv0 = jnp.zeros((nb, nbl, B, B), L_loc.dtype)
    (V, Kinv), _ = jax.lax.scan(ring_step, (W, Kinv0),
                                jnp.arange(P_))

    # --- cotangents
    aaT = jnp.einsum("ia,lb->ilab", alpha, alpha[js], precision=_HIGH)  # (nb, nbl, B, B)
    tiles_bar = logdet_bar * Kinv - quad_bar * aaT
    r_bar = (2.0 * quad_bar) * alpha  # (nb, B) replicated
    return tiles_bar, r_bar[None]


@partial(jax.jit, static_argnames=("mesh", "axis"))
def _run_bwd(L_tiles, w_blocks, quad_bar, logdet_bar, mesh, axis):
    nb = L_tiles.shape[0]
    P_ = mesh.shape[axis]
    fn = shard_map(
        partial(_local_bwd, axis, nb, P_),
        mesh=mesh,
        in_specs=(P(None, axis, None, None), P(), P(), P()),
        out_specs=(P(None, axis, None, None), P()),
        check_vma=False,
    )
    return fn(L_tiles, w_blocks, quad_bar, logdet_bar)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def distributed_quad_logdet(tiles, r, B: int, mesh: Mesh, axis: str = "j"):
    """(r^T K^-1 r, logdet K, ok) for K given as sharded tile-columns.

    The distributed analog of ops.linalg.dense_quad_logdet, with the same
    custom-VJP strategy (explicit MXU-built K^-1 instead of the
    Cholesky-VJP TRSM chain) executed entirely on the shards."""
    L_tiles, logdet = distributed_cholesky(tiles, mesh, axis)
    w = distributed_solve_lower(L_tiles, r, B, mesh, axis)
    quad = jnp.sum(w * w)
    ok = jnp.isfinite(quad) & jnp.isfinite(logdet)
    return quad, logdet, ok


def _dql_fwd(tiles, r, B, mesh, axis):
    n = r.shape[0]
    L_tiles, logdet = distributed_cholesky(tiles, mesh, axis)
    w = distributed_solve_lower(L_tiles, r, B, mesh, axis)
    quad = jnp.sum(w * w)
    ok = jnp.isfinite(quad) & jnp.isfinite(logdet)
    return (quad, logdet, ok), (L_tiles, w.reshape(n // B, B))


def _dql_bwd(B, mesh, axis, res, cots):
    L_tiles, w_blocks = res
    quad_bar, logdet_bar, _ = cots
    tiles_bar, r_bar = _run_bwd(
        L_tiles, w_blocks,
        jnp.asarray(quad_bar, L_tiles.dtype),
        jnp.asarray(logdet_bar, L_tiles.dtype), mesh, axis)
    return tiles_bar, r_bar[0].reshape(-1)


distributed_quad_logdet.defvjp(_dql_fwd, _dql_bwd)


# ---------------------------------------------------------------------------
# Differentiable whitened-latent map f = L v (the distributed GPA core)
# ---------------------------------------------------------------------------
#
# Reverse mode through the factorization itself: with f = L(K) v,
#
#   v_bar = L^T f_bar
#   K_bar = L^-T phi(L^T L_bar) L^-1,   L_bar = tril(f_bar v^T)
#
# (the transpose of JAX's Cholesky JVP dL = L phi(L^-1 dK L^-T), phi = tril
# with halved diagonal — Murray 2016, arXiv:1602.07527; the reference's
# chol_unblocked_rev! plays this role at src/chol_utils.jl:15-39). Executed
# entirely on the shards:
#   * M = L^T tril(f_bar v^T) exploits the masked-rank-1 structure: per
#     local column-tile, one (nb, B) contraction T, its tile-suffix sums,
#     and a masked within-tile term — O(n^2 B / P), no n^3 GEMM;
#   * K_bar = W^T phi(M) W with W = L^-1 (shared _local_winv) via two ring
#     GEMMs (ppermute neighbor exchange, the ring-attention pattern);
#   * the result comes out row-sharded; one *local* tile transpose turns it
#     into the column-sharded layout (valid because downstream dK/dtheta is
#     symmetric, so feeding K_bar^T yields identical hyperparameter
#     cotangents).


def _local_unwhiten_bwd(axis, nb, P_, L_loc, gbar_blocks, v_blocks):
    me, nbl, js = _local_js(axis, nb, P_)
    B = L_loc.shape[-1]

    # v_bar = L^T g_bar: local columns contract all rows, scatter + psum
    vbar_loc = jnp.einsum("ilab,ia->lb", L_loc, gbar_blocks,
                          precision=_HIGH)
    vbar = jax.lax.psum(
        jnp.zeros((nb, B), L_loc.dtype).at[js].set(vbar_loc), axis)

    # W = L^-1 local columns
    W = _local_winv(axis, nb, P_, L_loc)

    # M = L^T tril(g_bar v^T), rows k local:
    # M[(kb,a),(jb,b)] = v[jb,b] * ( sum_{ib>jb} T[kb][ib,a]
    #                                + sum_{c>=b} L[jb,kb][c,a] g_bar[jb,c] )
    T = jnp.einsum("ilca,ic->lia", L_loc, gbar_blocks,
                   precision=_HIGH)  # (nbl, nb, B)
    suf = jnp.flip(jnp.cumsum(jnp.flip(T, 1), axis=1), 1) - T  # sum_{ib>jb}
    mask_cb = (jnp.arange(B)[:, None] >= jnp.arange(B)[None, :]
               ).astype(L_loc.dtype)  # c >= b
    Ppart = jnp.einsum("jlca,jc,cb->ljab", L_loc, gbar_blocks, mask_cb,
                       precision=_HIGH)  # (nbl, nb, B, B)
    M = (suf[..., None] + Ppart) * v_blocks[None, :, None, :]

    # phi: tril with halved diagonal, over global (k, j) with k rows local
    coltile = jnp.arange(nb)
    full = (js[:, None] > coltile[None, :]).astype(L_loc.dtype)
    eqt = (js[:, None] == coltile[None, :]).astype(L_loc.dtype)
    a_ = jnp.arange(B)
    tri = jnp.where(a_[:, None] > a_[None, :], 1.0,
                    jnp.where(a_[:, None] == a_[None, :], 0.5, 0.0)
                    ).astype(L_loc.dtype)
    P2 = M * (full[:, :, None, None] + eqt[:, :, None, None] * tri[None, None])

    # ring GEMM 1: A1 = phi(M) W, rows k local, all columns
    ring = [(i, (i + 1) % P_) for i in range(P_)]

    def ring1(carry, s):
        V, A1 = carry  # V = W shard of device q = (me - s) mod P
        q = (me - s) % P_
        js_q = q + P_ * jnp.arange(nbl)
        block = jnp.einsum("lmac,mqcb->lqab", P2, V,
                           precision=_HIGH)  # (nbl, nbl, B, B)
        A1 = A1.at[:, js_q].set(block)
        V = jax.lax.ppermute(V, axis, ring)
        return (V, A1), None

    A10 = jnp.zeros((nbl, nb, B, B), L_loc.dtype)
    (_, A1), _ = jax.lax.scan(ring1, (W, A10), jnp.arange(P_))

    # ring GEMM 2: K_bar = W^T A1, rows k local, all columns
    def ring2(carry, s):
        Aq, Kb = carry  # Aq = A1 shard of device q (rows js_q, all cols)
        q = (me - s) % P_
        js_q = q + P_ * jnp.arange(nbl)
        Wq = W[js_q]  # (nbl_rows_q, nbl_cols_local, B, B)
        Kb = Kb + jnp.einsum("qlca,qjcb->ljab", Wq, Aq, precision=_HIGH)
        Aq = jax.lax.ppermute(Aq, axis, ring)
        return (Aq, Kb), None

    Kb0 = jnp.zeros((nbl, nb, B, B), L_loc.dtype)
    (_, Kbar_rows), _ = jax.lax.scan(ring2, (A1, Kb0), jnp.arange(P_))

    # local tile transpose: row-sharded K_bar -> column-sharded K_bar^T
    tiles_bar = jnp.transpose(Kbar_rows, (1, 0, 3, 2))
    return tiles_bar, vbar[None]


@partial(jax.jit, static_argnames=("mesh", "axis"))
def _run_unwhiten_bwd(L_tiles, gbar_blocks, v_blocks, mesh, axis):
    nb = L_tiles.shape[0]
    P_ = mesh.shape[axis]
    fn = shard_map(
        partial(_local_unwhiten_bwd, axis, nb, P_),
        mesh=mesh,
        in_specs=(P(None, axis, None, None), P(), P()),
        out_specs=(P(None, axis, None, None), P()),
        check_vma=False,
    )
    return fn(L_tiles, gbar_blocks, v_blocks)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def distributed_unwhiten_build(tiles, v, B: int, mesh: Mesh,
                               axis: str = "j"):
    """(f, ok) with f = L v where L L^T = K given as sharded tile-columns —
    the whitened-latent map (ref f = m + L v, src/GPA.jl:101-109)
    differentiated THROUGH the distributed factorization (custom VJP
    above), so GPA targets on DistributedFullCovariance get exact
    kernel/noise gradients. On factorization failure f falls back to v
    (identity factor) and ok is False; callers gate on ok."""
    L_tiles, logdet = distributed_cholesky(tiles, mesh, axis)
    ok = jnp.isfinite(logdet)
    eye_t = identity_tiles(tiles.shape[0], B, mesh, axis,
                           dtype=tiles.dtype)
    L_tiles = jnp.where(ok, L_tiles, eye_t)
    f = distributed_unwhiten(L_tiles, v, B, mesh, axis)
    return f, ok


def _dub_fwd(tiles, v, B, mesh, axis):
    L_tiles, logdet = distributed_cholesky(tiles, mesh, axis)
    ok = jnp.isfinite(logdet)
    eye_t = identity_tiles(tiles.shape[0], B, mesh, axis,
                           dtype=tiles.dtype)
    L_tiles = jnp.where(ok, L_tiles, eye_t)
    f = distributed_unwhiten(L_tiles, v, B, mesh, axis)
    return (f, ok), (L_tiles, v)


def _dub_bwd(B, mesh, axis, res, cots):
    L_tiles, v = res
    f_bar, _ = cots  # the ok flag is boolean — no cotangent
    nb = L_tiles.shape[0]
    gb = jnp.asarray(f_bar, L_tiles.dtype).reshape(nb, B)
    vb = jnp.asarray(v, L_tiles.dtype).reshape(nb, B)
    tiles_bar, vbar = _run_unwhiten_bwd(L_tiles, gb, vb, mesh, axis)
    return tiles_bar, vbar[0].reshape(-1)


distributed_unwhiten_build.defvjp(_dub_fwd, _dub_bwd)


# ---------------------------------------------------------------------------
# Ambient-axis API: the same machinery usable INSIDE an enclosing shard_map
# ---------------------------------------------------------------------------
#
# The top-level functions above each open their own shard_map; shard_maps do
# not nest, so a sampler that is itself shard_mapped over a 'chains' axis
# (parallel/chains.sharded_hmc) cannot call them. These `ambient_*` variants
# call the `_local_*` bodies directly: they assume the caller is ALREADY
# inside a shard_map whose mesh includes `axis` (so lax.psum / ppermute over
# it resolve ambiently), and they take/return device-local tile-columns.
# This is what composes chains x j on a 2-D mesh (VERDICT r4 item 2):
# shard_map(mesh=('chains','j'), in_specs=P('chains')) makes 'j' ambient for
# every chain shard, and the custom VJPs below keep the target differentiable
# there.


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def ambient_gram(kernel, noise_var, X, B: int, P_: int, axis: str = "j"):
    """Device-local tile-columns of K + diag(noise) (build_tiles body).

    Custom VJP: the backward pass psums the kernel/noise/X cotangents over
    `axis` — each device's tile-columns contribute only a local share of
    the (replicated) hyperparameter gradient, and inside-the-body
    differentiation (see _aql_bwd note) has no boundary transpose to sum
    them. This is what makes grad-of-the-target correct for chains x j."""
    n = X.shape[0]
    assert n % B == 0 and (n // B) % P_ == 0
    return _local_gram(axis, n // B, P_, B, kernel, noise_var, X)


def _ag_fwd(kernel, noise_var, X, B, P_, axis):
    out = ambient_gram(kernel, noise_var, X, B, P_, axis)
    return out, (kernel, noise_var, X)


def _ag_bwd(B, P_, axis, res, tiles_bar):
    kernel, noise_var, X = res
    nb = X.shape[0] // B
    _, vjp = jax.vjp(
        lambda k, nv, x: _local_gram(axis, nb, P_, B, k, nv, x),
        kernel, noise_var, X)
    cots = vjp(tiles_bar)
    return jax.tree_util.tree_map(lambda g: jax.lax.psum(g, axis), cots)


ambient_gram.defvjp(_ag_fwd, _ag_bwd)


def ambient_cholesky(tiles_loc, P_: int, axis: str = "j"):
    """(L_tiles_local, logdet) from device-local tile-columns."""
    nb = tiles_loc.shape[0]
    L_loc, logdet = _local_cholesky(axis, nb, P_, tiles_loc)
    return L_loc, logdet[0]


def ambient_identity_tiles(nb: int, B: int, P_: int, axis: str = "j",
                           dtype=jnp.float64):
    _, nbl, js = _local_js(axis, nb, P_)
    eyeB = jnp.eye(B, dtype=dtype)
    dmask = (jnp.arange(nb)[:, None] == js[None, :])
    return dmask[:, :, None, None] * eyeB[None, None]


def _ambient_solve(L_loc, b, B, P_, axis, lower=True):
    nb = L_loc.shape[0]
    blocks, vec = _blocked(b, nb, B)
    body = _local_solve if lower else _local_solve_upper
    y = body(axis, nb, P_, L_loc, blocks)[0].reshape(nb * B, -1)
    return y[:, 0] if vec else y


def ambient_solve_lower(L_loc, b, B: int, P_: int, axis: str = "j"):
    return _ambient_solve(L_loc, b, B, P_, axis, True)


def ambient_solve_upper(L_loc, b, B: int, P_: int, axis: str = "j"):
    return _ambient_solve(L_loc, b, B, P_, axis, False)


def ambient_unwhiten(L_loc, v, B: int, P_: int, axis: str = "j"):
    nb = L_loc.shape[0]
    blocks, vec = _blocked(v, nb, B)
    y = _local_unwhiten(axis, nb, P_, L_loc, blocks)[0].reshape(nb * B, -1)
    return y[:, 0] if vec else y


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def ambient_quad_logdet(tiles_loc, r, B: int, P_: int, axis: str = "j"):
    """(r^T K^-1 r, logdet K, ok) on device-local tile-columns, inside an
    enclosing shard_map (ambient `axis`). Same custom-VJP strategy as
    distributed_quad_logdet (ring-ppermute K^-1 backward)."""
    L_loc, logdet = ambient_cholesky(tiles_loc, P_, axis)
    w = ambient_solve_lower(L_loc, r, B, P_, axis)
    quad = jnp.sum(w * w)
    ok = jnp.isfinite(quad) & jnp.isfinite(logdet)
    return quad, logdet, ok


def _aql_fwd(tiles_loc, r, B, P_, axis):
    n = r.shape[0]
    L_loc, logdet = ambient_cholesky(tiles_loc, P_, axis)
    w = ambient_solve_lower(L_loc, r, B, P_, axis)
    quad = jnp.sum(w * w)
    ok = jnp.isfinite(quad) & jnp.isfinite(logdet)
    return (quad, logdet, ok), (L_loc, w.reshape(n // B, B))


def _aql_bwd(B, P_, axis, res, cots):
    # IMPORTANT calling convention: differentiate these ambient functions
    # INSIDE the enclosing shard_map body (jax.value_and_grad around a
    # function that calls them, all within the body — what sharded_hmc
    # does). There the cotangents arriving here are plain device-level
    # values (quad_bar/logdet_bar replicated over `axis`, full logical
    # magnitude), and the device-local tile cotangents below are exactly
    # right. Differentiating THROUGH the shard_map boundary instead uses
    # jax's check_vma=False physical-share convention (per-device
    # cotangent = logical / axis size) and would need psum/1-P
    # rescaling — do not mix the two; test_chains_x_j pins the inside
    # convention.
    L_loc, w_blocks = res
    quad_bar, logdet_bar, _ = cots
    nb = L_loc.shape[0]
    tiles_bar, r_bar = _local_bwd(
        axis, nb, P_, L_loc, w_blocks,
        jnp.asarray(quad_bar, L_loc.dtype),
        jnp.asarray(logdet_bar, L_loc.dtype))
    return tiles_bar, r_bar[0].reshape(-1)


ambient_quad_logdet.defvjp(_aql_fwd, _aql_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def ambient_unwhiten_build(tiles_loc, v, B: int, P_: int, axis: str = "j"):
    """(f, ok), f = L v through the device-local factorization, inside an
    enclosing shard_map — the whitened-latent map for chains x j GPA."""
    L_loc, logdet = ambient_cholesky(tiles_loc, P_, axis)
    ok = jnp.isfinite(logdet)
    eye_t = ambient_identity_tiles(tiles_loc.shape[0], B, P_, axis,
                                   dtype=tiles_loc.dtype)
    L_loc = jnp.where(ok, L_loc, eye_t)
    f = ambient_unwhiten(L_loc, v, B, P_, axis)
    return f, ok


def _aub_fwd(tiles_loc, v, B, P_, axis):
    L_loc, logdet = ambient_cholesky(tiles_loc, P_, axis)
    ok = jnp.isfinite(logdet)
    eye_t = ambient_identity_tiles(tiles_loc.shape[0], B, P_, axis,
                                   dtype=tiles_loc.dtype)
    L_loc = jnp.where(ok, L_loc, eye_t)
    f = ambient_unwhiten(L_loc, v, B, P_, axis)
    return (f, ok), (L_loc, v)


def _aub_bwd(B, P_, axis, res, cots):
    # same inside-the-body calling convention as _aql_bwd (see its note)
    L_loc, v = res
    f_bar, _ = cots
    nb = L_loc.shape[0]
    gb = jnp.asarray(f_bar, L_loc.dtype).reshape(nb, B)
    vb = jnp.asarray(v, L_loc.dtype).reshape(nb, B)
    tiles_bar, vbar = _local_unwhiten_bwd(axis, nb, P_, L_loc, gb, vb)
    return tiles_bar, vbar[0].reshape(-1)


ambient_unwhiten_build.defvjp(_aub_fwd, _aub_bwd)


def ambient_mll(kernel, noise_var, X, y_centered, B: int, P_: int,
                axis: str = "j"):
    """Dense-GP mll with K sharded over the ambient `axis` (device-local
    build + factorization + differentiable quad/logdet), callable inside an
    enclosing shard_map — the chains x j inner target."""
    n = X.shape[0]
    tiles_loc = ambient_gram(kernel, noise_var, X, B, P_, axis)
    quad, logdet, ok = ambient_quad_logdet(tiles_loc, y_centered, B, P_,
                                           axis)
    mll = -0.5 * (quad + logdet + n * jnp.log(2.0 * jnp.pi))
    return jnp.where(ok, mll, -jnp.inf)


def distributed_mll(kernel, noise_var, X, y_centered, B: int, mesh: Mesh,
                    axis: str = "j"):
    """Dense-GP marginal likelihood with K sharded over the mesh,
    differentiable w.r.t. kernel params, noise, and y_centered.

    X is replicated (n x d is small); each device builds only its own
    tile-columns of K = k(X,X) + noise I (build_tiles), so the n x n
    matrix never exists on one device."""
    n = X.shape[0]
    tiles = build_tiles(kernel, noise_var, X, B, mesh, axis)
    quad, logdet, ok = distributed_quad_logdet(tiles, y_centered, B, mesh,
                                               axis)
    mll = -0.5 * (quad + logdet + n * jnp.log(2.0 * jnp.pi))
    return jnp.where(ok, mll, -jnp.inf)
