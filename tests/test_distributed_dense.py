"""Distributed dense-GP path on the 8-device CPU mesh: device-local gram
build, differentiable distributed mll (value+grad vs single-device to
rtol 1e-6 — the round-2 acceptance criterion), distributed solves,
prediction, and the ring-ppermute gram builder."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussianprocesses_jl_tpu as gp
from gaussianprocesses_jl_tpu.models.gpe import gpe_target
from gaussianprocesses_jl_tpu.parallel.cholesky import (
    build_tiles,
    choose_tile_size,
    distributed_cholesky,
    distributed_chol_solve,
    distributed_mll,
    distributed_solve_lower,
    distributed_solve_upper,
    distributed_unwhiten,
    tile_and_shard,
    untile,
)
from gaussianprocesses_jl_tpu.parallel.gram import ring_gram
from gaussianprocesses_jl_tpu.parallel.mesh import make_mesh

B = 8
N = 256  # nb = 32 tiles over 8 devices


def _mesh():
    return make_mesh({"j": 8})


def _data(n=N, d=3, seed=0):
    rng = np.random.RandomState(seed)
    X = jnp.asarray(rng.randn(n, d))
    y = jnp.asarray(np.sin(np.asarray(X[:, 0])) + 0.2 * rng.randn(n))
    return X, y


def _spd_matrix(n, seed=0):
    rng = np.random.RandomState(seed)
    A = rng.randn(n, n)
    return jnp.asarray(A @ A.T + n * np.eye(n))


def test_build_tiles_matches_dense_gram():
    mesh = _mesh()
    X, _ = _data()
    kern = gp.SE(0.3, 0.1) + gp.Matern(2.5, -0.2, 0.0)
    nv = 0.17
    tiles = build_tiles(kern, jnp.asarray(nv), X, B, mesh)
    K = untile(tiles, B, mesh)
    K_ref = np.asarray(kern.gram(X)) + nv * np.eye(N)
    assert np.allclose(K, K_ref, atol=1e-10 * np.abs(K_ref).max())


def test_build_tiles_heteroscedastic():
    mesh = _mesh()
    X, _ = _data(seed=5)
    rng = np.random.RandomState(6)
    nv = jnp.asarray(np.exp(rng.randn(N) * 0.3))
    kern = gp.SE(0.0, 0.0)
    tiles = build_tiles(kern, nv, X, B, mesh)
    K = untile(tiles, B, mesh)
    K_ref = np.asarray(kern.gram(X)) + np.diag(np.asarray(nv))
    assert np.allclose(K, K_ref, atol=1e-10)


def test_distributed_solves_match_dense():
    mesh = _mesh()
    K = _spd_matrix(N, seed=1)
    rng = np.random.RandomState(2)
    b = jnp.asarray(rng.randn(N))
    Bm = jnp.asarray(rng.randn(N, 5))
    tiles = tile_and_shard(K, B, mesh)
    L_tiles, logdet = distributed_cholesky(tiles, mesh)
    L_ref = np.asarray(jnp.linalg.cholesky(K))

    w = distributed_solve_lower(L_tiles, b, B, mesh)
    assert np.allclose(np.asarray(w), np.linalg.solve(L_ref, np.asarray(b)),
                       atol=1e-8)
    u = distributed_solve_upper(L_tiles, b, B, mesh)
    assert np.allclose(np.asarray(u),
                       np.linalg.solve(L_ref.T, np.asarray(b)), atol=1e-8)
    z = distributed_chol_solve(L_tiles, Bm, B, mesh)
    assert np.allclose(np.asarray(z),
                       np.linalg.solve(np.asarray(K), np.asarray(Bm)),
                       atol=1e-7)
    v = distributed_unwhiten(L_tiles, Bm, B, mesh)
    assert np.allclose(np.asarray(v), L_ref @ np.asarray(Bm), atol=1e-8)
    sign, ld_ref = np.linalg.slogdet(np.asarray(K))
    assert np.allclose(float(logdet), ld_ref, rtol=1e-10)


def test_distributed_mll_value_and_grad_match_single_device():
    """The round-2 acceptance test: value+grad of the GPE target with
    DistributedFullCovariance matches FullCovariance to rtol 1e-6."""
    mesh = _mesh()
    X, y = _data(seed=3)
    kern = gp.SE(0.2, 0.1) * gp.RQ(0.1, 0.0, 0.3) + gp.Matern(1.5, 0.0, -0.5)
    params = gp.GPEParams(lognoise=gp.Param(value=jnp.asarray(-0.7)),
                          mean=gp.MeanLin(beta=jnp.asarray([0.1, -0.2, 0.05])),
                          kernel=kern)
    dist = gp.DistributedFullCovariance(mesh=mesh, B=B)

    def tgt(covstrat):
        def f(vec):
            return gpe_target(params.with_flat_params(vec), X, y, covstrat)[0]
        return f

    vec = params.flat_params()
    v_ref, g_ref = jax.value_and_grad(tgt(gp.FullCovariance()))(vec)
    v_dist, g_dist = jax.value_and_grad(tgt(dist))(vec)
    assert np.allclose(float(v_dist), float(v_ref), rtol=1e-9)
    assert np.allclose(np.asarray(g_dist), np.asarray(g_ref), rtol=1e-6,
                       atol=1e-9 * float(np.abs(np.asarray(g_ref)).max()))


def test_distributed_mll_heteroscedastic_grad():
    mesh = _mesh()
    X, y = _data(seed=9)
    rng = np.random.RandomState(10)
    ln_vec = jnp.asarray(0.1 * rng.randn(N) - 0.5)
    params = gp.GPEParams(lognoise=gp.Param(value=ln_vec),
                          mean=gp.MeanZero(), kernel=gp.SE(0.0, 0.0))
    dist = gp.DistributedFullCovariance(mesh=mesh, B=B)

    def tgt(covstrat):
        return lambda vec: gpe_target(
            params.with_flat_params(vec), X, y, covstrat)[0]

    vec = params.flat_params()
    v_ref, g_ref = jax.value_and_grad(tgt(gp.FullCovariance()))(vec)
    v_dist, g_dist = jax.value_and_grad(tgt(dist))(vec)
    assert np.allclose(float(v_dist), float(v_ref), rtol=1e-9)
    assert np.allclose(np.asarray(g_dist), np.asarray(g_ref), rtol=1e-6,
                       atol=1e-10)


def test_gpe_with_distributed_strategy_end_to_end():
    """GPE(covstrat=DistributedFullCovariance): mll, target_and_dtarget,
    predict (diag + full), and a few optimizer steps all work and agree
    with the single-device strategy."""
    mesh = _mesh()
    X, y = _data(seed=4)
    m_ref = gp.GPE(X, y, kernel=gp.SE(0.2, 0.1), lognoise=-0.7)
    m_dist = gp.GPE(X, y, kernel=gp.SE(0.2, 0.1), lognoise=-0.7,
                    covstrat=gp.DistributedFullCovariance(mesh=mesh, B=B))
    assert np.allclose(float(m_dist.mll), float(m_ref.mll), rtol=1e-10)

    t_ref, g_ref = m_ref.target_and_dtarget()
    t_dist, g_dist = m_dist.target_and_dtarget()
    assert np.allclose(float(t_dist), float(t_ref), rtol=1e-10)
    assert np.allclose(np.asarray(g_dist), np.asarray(g_ref), rtol=1e-6)

    Xs = jnp.asarray(np.random.RandomState(7).randn(16, 3))
    mu_r, var_r = m_ref.predict_f(Xs)
    mu_d, var_d = m_dist.predict_f(Xs)
    assert np.allclose(np.asarray(mu_d), np.asarray(mu_r), atol=1e-8)
    assert np.allclose(np.asarray(var_d), np.asarray(var_r), atol=1e-8)
    mu_r, cov_r = m_ref.predict_f(Xs, full_cov=True)
    mu_d, cov_d = m_dist.predict_f(Xs, full_cov=True)
    assert np.allclose(np.asarray(cov_d), np.asarray(cov_r), atol=1e-8)

    res = m_dist.optimize(maxiter=5)
    assert np.isfinite(float(m_dist.target))
    assert float(m_dist.target) >= float(t_dist) - 1e-8


def test_distributed_mll_function_matches_gpe():
    mesh = _mesh()
    X, y = _data(seed=11)
    m = gp.GPE(X, y, kernel=gp.SE(0.2, 0.1), lognoise=-0.7)
    nv = jnp.exp(2.0 * m.params.lognoise.value)
    mll_dist = distributed_mll(m.params.kernel, nv, X, y, B=16, mesh=mesh)
    assert np.allclose(float(mll_dist), float(m.mll), rtol=1e-9)


def test_distributed_nonpd_rejected():
    """A wildly non-PD proposal must give -inf, not NaN (PosDefException
    semantics, ref src/optimize.jl:47-62)."""
    mesh = _mesh()
    X, y = _data(seed=12)
    # negative noise variance is impossible through the API; instead use a
    # kernel whose gram is rank-1 with huge magnitude and zero noise
    params = gp.GPEParams(lognoise=gp.Param(value=jnp.asarray(-200.0)),
                          mean=gp.MeanZero(),
                          kernel=gp.Const(20.0))
    dist = gp.DistributedFullCovariance(mesh=mesh, B=B)
    mll = gpe_target(params, X, y, dist)[0]
    assert np.isneginf(float(mll))


def test_ring_gram_matches_dense():
    mesh = make_mesh({"data": 8})
    X, _ = _data(seed=13)
    kern = gp.SE(0.1, 0.2) + gp.Periodic(0.0, 0.0, 0.5)
    K = ring_gram(kern, X, mesh)
    K_ref = np.asarray(kern.gram(X))
    assert np.allclose(np.asarray(K), K_ref, atol=1e-12)


def test_ring_gram_differentiable():
    mesh = make_mesh({"data": 8})
    X, y = _data(seed=14)
    kern = gp.SE(0.1, 0.2)

    def loss(k):
        K = ring_gram(k, X, mesh)
        return jnp.sum(K * jnp.outer(y, y))

    g = jax.grad(loss)(kern)
    g_ref = jax.grad(lambda k: jnp.sum(k.gram(X) * jnp.outer(y, y)))(kern)
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(g_ref)):
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-8)


def test_choose_tile_size():
    assert choose_tile_size(256, 8) == 32
    assert choose_tile_size(1024, 8, max_B=64) == 64
    with pytest.raises(ValueError):
        choose_tile_size(7, 8)


def test_distributed_unwhiten_build_vjp_matches_single_device():
    """Reverse mode THROUGH the sharded factorization (custom VJP with the
    Murray chol-reverse executed on the shards) equals single-device
    jax.grad through jnp.linalg.cholesky, for kernel hypers and v."""
    mesh = _mesh()
    from gaussianprocesses_jl_tpu.parallel.cholesky import (
        distributed_unwhiten_build,
    )

    n, b = 128, 8
    rng = np.random.RandomState(21)
    X = jnp.asarray(rng.randn(n, 3))
    v = jnp.asarray(rng.randn(n))
    gw = jnp.asarray(rng.randn(n))
    kern0 = gp.SE(0.2, 0.1) + gp.Matern(1.5, 0.0, -0.3)
    nv = 0.3

    def loss_dist(kern, vv):
        tiles = build_tiles(kern, jnp.asarray(nv), X, b, mesh)
        f, ok = distributed_unwhiten_build(tiles, vv, b, mesh)
        return jnp.sum(gw * jnp.sin(f))

    def loss_ref(kern, vv):
        K = kern.gram(X) + nv * jnp.eye(n)
        return jnp.sum(gw * jnp.sin(jnp.linalg.cholesky(K) @ vv))

    assert np.allclose(float(loss_dist(kern0, v)), float(loss_ref(kern0, v)),
                       rtol=1e-12)
    gk_r, gv_r = jax.grad(loss_ref, argnums=(0, 1))(kern0, v)
    gk_d, gv_d = jax.grad(loss_dist, argnums=(0, 1))(kern0, v)
    for a, b_ in zip(jax.tree_util.tree_leaves(gk_r),
                     jax.tree_util.tree_leaves(gk_d)):
        assert np.allclose(np.asarray(a), np.asarray(b_), rtol=1e-8,
                           atol=1e-10)
    assert np.allclose(np.asarray(gv_d), np.asarray(gv_r), rtol=1e-8)


@pytest.mark.parametrize("likname", ["bern", "pois"])
def test_gpa_distributed_target_and_grad(likname):
    """The round-3 acceptance test (VERDICT item 6): GPA value+grad on
    DistributedFullCovariance matches FullCovariance to rtol 1e-6."""
    from gaussianprocesses_jl_tpu.models.gpa import gpa_target

    mesh = _mesh()
    n = 128
    rng = np.random.RandomState(31)
    X = jnp.asarray(rng.randn(n, 2))
    f_true = np.sin(np.asarray(X[:, 0]))
    if likname == "bern":
        y = jnp.asarray((f_true + 0.3 * rng.randn(n) > 0).astype(float))
        lik = gp.BernLik()
    else:
        y = jnp.asarray(rng.poisson(np.exp(0.5 * f_true)).astype(float))
        lik = gp.PoisLik()
    kern = gp.Matern(1.5, jnp.zeros(2), 0.1)
    m_ref = gp.GPA(X, y, gp.MeanConst(beta=jnp.asarray(0.1)), kern, lik)
    dist = gp.DistributedFullCovariance(mesh=mesh, B=8)
    m_dist = gp.GPA(X, y, gp.MeanConst(beta=jnp.asarray(0.1)), kern, lik,
                    covstrat=dist)
    rng2 = np.random.RandomState(32)
    v = jnp.asarray(0.3 * rng2.randn(n))
    for m in (m_ref, m_dist):
        m.params = m.params.with_flat_params(
            m.params.flat_params().at[:n].set(v))

    def tgt(m):
        params, cs = m.params, m.covstrat
        return jax.value_and_grad(
            lambda vec: gpa_target(params.with_flat_params(vec), m.x, m.y,
                                   cs)[0])(params.flat_params())

    t_ref, g_ref = tgt(m_ref)
    t_dist, g_dist = tgt(m_dist)
    assert np.allclose(float(t_dist), float(t_ref), rtol=1e-10)
    scale = float(np.abs(np.asarray(g_ref)).max())
    assert np.allclose(np.asarray(g_dist), np.asarray(g_ref), rtol=1e-6,
                       atol=1e-9 * scale)
    # prediction path (build + solve + predict_mvn on the shards)
    Xs = jnp.asarray(np.random.RandomState(33).randn(8, 2))
    mu_r, var_r = m_ref.predict_f(Xs)
    mu_d, var_d = m_dist.predict_f(Xs)
    assert np.allclose(np.asarray(mu_d), np.asarray(mu_r), atol=1e-8)
    assert np.allclose(np.asarray(var_d), np.asarray(var_r), atol=1e-8)


def test_gpa_distributed_hmc_smoke():
    """A few HMC iterations on the distributed GPA target run and stay
    finite (the sharded-latents + sharded-K composition)."""
    from gaussianprocesses_jl_tpu.inference.hmc import hmc

    mesh = _mesh()
    n = 64
    rng = np.random.RandomState(41)
    X = jnp.asarray(rng.randn(n, 2))
    y = jnp.asarray((np.sin(np.asarray(X[:, 0])) > 0).astype(float))
    m = gp.GPA(X, y, gp.MeanZero(), gp.Matern(1.5, 0.0, 0.0), gp.BernLik(),
               covstrat=gp.DistributedFullCovariance(mesh=mesh, B=8))
    logprob, x0, _, _ = m.make_logprob()
    res = hmc(logprob, x0, jax.random.PRNGKey(0), n_iter=15, eps=0.02)
    assert np.all(np.isfinite(np.asarray(res.samples)))
    assert np.isfinite(float(res.final_target))
