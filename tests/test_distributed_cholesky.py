"""Distributed block-Cholesky tests on the 8-device CPU mesh: factor,
log-det, forward solve, and end-to-end dense mll all match the
single-device results."""
import jax
import jax.numpy as jnp
import numpy as np

import gaussianprocesses_jl_tpu as gp
from gaussianprocesses_jl_tpu.parallel.cholesky import (
    distributed_cholesky,
    distributed_mll,
    distributed_solve_lower,
    tile_and_shard,
    untile,
)
from gaussianprocesses_jl_tpu.parallel.mesh import make_mesh

B = 8
N = 256  # nb = 32 tiles over 8 devices


def _spd_matrix(n, seed=0):
    rng = np.random.RandomState(seed)
    A = rng.randn(n, n)
    return jnp.asarray(A @ A.T + n * np.eye(n))


def test_distributed_cholesky_matches_dense():
    mesh = make_mesh({"j": 8})
    K = _spd_matrix(N)
    tiles = tile_and_shard(K, B, mesh)
    L_tiles, logdet = distributed_cholesky(tiles, mesh)
    L = untile(L_tiles, B, mesh)
    L = np.tril(L)
    L_ref = np.asarray(jnp.linalg.cholesky(K))
    assert np.allclose(L, L_ref, atol=1e-8 * np.abs(L_ref).max())
    sign, ld_ref = np.linalg.slogdet(np.asarray(K))
    assert np.allclose(float(logdet), ld_ref, rtol=1e-10)


def test_distributed_solve_matches_dense():
    mesh = make_mesh({"j": 8})
    K = _spd_matrix(N, seed=1)
    rng = np.random.RandomState(2)
    b = jnp.asarray(rng.randn(N))
    tiles = tile_and_shard(K, B, mesh)
    L_tiles, _ = distributed_cholesky(tiles, mesh)
    w = distributed_solve_lower(L_tiles, b, B, mesh)
    L_ref = np.asarray(jnp.linalg.cholesky(K))
    w_ref = np.linalg.solve(L_ref, np.asarray(b))
    assert np.allclose(np.asarray(w), w_ref, atol=1e-8 * np.abs(w_ref).max())


def test_distributed_mll_matches_gpe():
    mesh = make_mesh({"j": 8})
    rng = np.random.RandomState(3)
    n = 256
    X = rng.randn(n, 2)
    y = np.sin(X[:, 0]) + 0.2 * rng.randn(n)
    m = gp.GPE(X, y, kernel=gp.SE(0.2, 0.1), lognoise=-0.7)
    mll_ref = float(m.mll)
    nv = float(np.exp(2 * np.asarray(m.lognoise)))
    mll_dist = float(distributed_mll(
        m.params.kernel, nv, jnp.asarray(X), jnp.asarray(y), B=16,
        mesh=mesh))
    assert np.allclose(mll_dist, mll_ref, rtol=1e-9), (mll_dist, mll_ref)
