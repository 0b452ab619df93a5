"""GPE tests (mirror of reference test/gp.jl + parts of test/optim.jl):
mll against a hand-rolled numpy computation, gradient vs finite differences,
posterior behavior at training points, predict consistency, sampling,
param round-trips, heteroscedastic noise, and optimization improvement."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussianprocesses_jl_tpu as gp
from gaussianprocesses_jl_tpu.utils.priors import Normal


@pytest.fixture(scope="module")
def dataset():
    rng = np.random.RandomState(0)
    n, d = 30, 2
    X = rng.randn(n, d)
    f = np.sin(X[:, 0]) + 0.3 * X[:, 1]
    y = f + 0.1 * rng.randn(n)
    return jnp.asarray(X), jnp.asarray(y)


def _numpy_mll(X, y, ll, lsigma, lognoise):
    X = np.asarray(X)
    y = np.asarray(y)
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    K = np.exp(2 * lsigma) * np.exp(-0.5 * d2 * np.exp(-2 * ll))
    K += np.exp(2 * lognoise) * np.eye(len(y))
    L = np.linalg.cholesky(K)
    alpha = np.linalg.solve(K, y)
    return float(
        -0.5 * (y @ alpha) - np.log(np.diag(L)).sum()
        - 0.5 * len(y) * np.log(2 * np.pi)
    )


def test_mll_matches_numpy(dataset):
    X, y = dataset
    m = gp.GPE(X, y, gp.MeanZero(), gp.SE(0.3, 0.1), lognoise=-1.0)
    expected = _numpy_mll(X, y, 0.3, 0.1, -1.0)
    assert np.allclose(float(m.mll), expected, rtol=1e-10)


def test_dtarget_vs_fd(dataset):
    X, y = dataset
    m = gp.GPE(X, y, gp.MeanConst(beta=jnp.asarray(0.2)),
               gp.SE(0.3, 0.1) + gp.Matern(1.5, 0.1, 0.0), lognoise=-1.0)
    t0, g = m.target_and_dtarget()
    vec = m.params.flat_params()
    eps = 1e-6
    from gaussianprocesses_jl_tpu.models.gpe import gpe_target

    def f(v):
        return float(
            gpe_target(m.params.with_flat_params(v), X, y, m.covstrat)[0])

    for p in range(vec.shape[0]):
        fd = (f(vec.at[p].add(eps)) - f(vec.at[p].add(-eps))) / (2 * eps)
        assert np.allclose(float(g[p]), fd, rtol=1e-4, atol=1e-6), (p, float(g[p]), fd)


def test_posterior_interpolates(dataset):
    X, y = dataset
    m = gp.GPE(X, y, kernel=gp.SE(0.0, 0.0), lognoise=-4.0)
    mu, var = m.predict_f(X)
    assert np.max(np.abs(np.asarray(mu - y))) < 0.1  # ref test/gp.jl atol=0.1
    assert np.all(np.asarray(var) >= -1e-9)


def test_full_cov_diag_consistency(dataset):
    X, y = dataset
    m = gp.GPE(X, y, kernel=gp.SE(0.2, 0.1), lognoise=-1.0)
    Xs = jnp.asarray(np.random.RandomState(3).randn(8, 2))
    mu_d, var = m.predict_f(Xs)
    mu_f, cov = m.predict_f(Xs, full_cov=True)
    assert np.allclose(np.asarray(mu_d), np.asarray(mu_f), atol=1e-10)
    assert np.allclose(np.asarray(var), np.asarray(jnp.diag(cov)), atol=1e-8)
    # predict_y adds noise
    mu_y, var_y = m.predict_y(Xs)
    assert np.allclose(np.asarray(var_y - var),
                       float(jnp.exp(2 * m.lognoise)), atol=1e-10)


def test_param_roundtrip_and_blocks(dataset):
    X, y = dataset
    m = gp.GPE(X, y, gp.MeanLin(beta=jnp.zeros(2)), gp.SE(0.3, 0.1),
               lognoise=-1.0)
    v = m.get_params()
    assert v.shape == (1 + 2 + 2,)
    m.set_params(v + 0.5)
    assert np.allclose(np.asarray(m.get_params()), np.asarray(v) + 0.5)
    # block flags: only kernel
    vk = m.get_params(noise=False, domean=False)
    assert vk.shape == (2,)
    m.set_params(vk - 1.0, noise=False, domean=False)
    assert np.allclose(np.asarray(m.get_params(noise=False, domean=False)),
                       np.asarray(vk) - 1.0)
    # noise/mean untouched
    assert np.allclose(float(m.lognoise), float(v[0]) + 0.5)


def test_rand_smoke(dataset):
    X, y = dataset
    m = gp.GPE(X, y, kernel=gp.SE(0.0, 0.0), lognoise=-1.0)
    Xs = jnp.linspace(-2, 2, 10)[:, None] @ jnp.ones((1, 2))
    s = m.rand(jax.random.PRNGKey(0), Xs, n_samples=4)
    assert s.shape == (10, 4)
    sp = m.rand(jax.random.PRNGKey(1), Xs, from_prior=True)
    assert s.shape[0] == 10 and np.all(np.isfinite(np.asarray(sp)))


def test_heteroscedastic_noise(dataset):
    X, y = dataset
    n = y.shape[0]
    m = gp.GPE(X, y, kernel=gp.SE(0.2, 0.1),
               lognoise=jnp.full((n,), -1.0))
    assert m.num_params() == n + 2
    t, g = m.target_and_dtarget()
    assert np.isfinite(float(t))
    assert np.all(np.isfinite(np.asarray(g)))
    # vector noise equals scalar noise when constant
    ms = gp.GPE(X, y, kernel=gp.SE(0.2, 0.1), lognoise=-1.0)
    assert np.allclose(float(m.mll), float(ms.mll), rtol=1e-12)
    # predict_y is supported at the TRAINING locations (where the noise
    # vector is defined; ref test/heteroscedastic.jl exercises prediction)
    mu_v, var_v = m.predict_y(X)
    mu_s, var_s = ms.predict_y(X)
    assert np.allclose(np.asarray(mu_v), np.asarray(mu_s), atol=1e-10)
    assert np.allclose(np.asarray(var_v), np.asarray(var_s), atol=1e-10)
    mu_fc, cov_fc = m.predict_y(X, full_cov=True)
    assert np.allclose(np.asarray(jnp.diag(cov_fc)), np.asarray(var_v),
                       atol=1e-10)
    # ... and refuses at NEW locations, where per-point noise is undefined
    with pytest.raises(ValueError, match="training locations"):
        m.predict_y(X + 0.5)
    with pytest.raises(ValueError, match="training locations"):
        m.predict_y(X[: n // 2])


def test_optimize_improves(dataset):
    X, y = dataset
    m = gp.GPE(X, y, gp.MeanConst(beta=jnp.asarray(0.0)), gp.SE(1.5, 1.0),
               lognoise=0.5)
    t0 = float(m.target)
    res = m.optimize(maxiter=100)
    assert float(m.target) > t0
    assert res.success or res.n_iter > 0


def test_optimize_respects_flags_and_bounds(dataset):
    X, y = dataset
    m = gp.GPE(X, y, kernel=gp.SE(1.0, 1.0), lognoise=0.3)
    k0 = np.asarray(m.params.kernel.flat_params())
    m.optimize(kern=False, maxiter=50)
    assert np.allclose(np.asarray(m.params.kernel.flat_params()), k0)
    # bounds on noise (ref test/optim.jl box-bounds case)
    m2 = gp.GPE(X, y, kernel=gp.SE(1.0, 1.0), lognoise=0.3)
    m2.optimize(noisebounds=(-1.0, 1.0), maxiter=50)
    assert -1.0 - 1e-9 <= float(m2.lognoise) <= 1.0 + 1e-9


def test_map_vs_ml(dataset):
    """MAP target with a pulling prior ends below the ML mll
    (ref test/optim.jl:36-51)."""
    X, y = dataset
    m_ml = gp.GPE(X, y, kernel=gp.SE(0.5, 0.5), lognoise=0.0)
    m_ml.optimize(maxiter=150)
    m_map = gp.GPE(X, y, kernel=gp.SE(0.5, 0.5), lognoise=0.0)
    m_map.set_priors(noise=[Normal(-5.0, 0.1)])
    m_map.optimize(maxiter=150)
    assert float(m_map.mll) <= float(m_ml.mll) + 1e-6


def test_fixed_kernel_optimize(dataset):
    X, y = dataset
    m = gp.GPE(X, y, kernel=gp.fix(gp.SE(0.7, 0.3), "lsigma"), lognoise=0.0)
    m.optimize(maxiter=50)
    assert np.allclose(float(m.params.kernel.kern.lsigma), 0.3)
