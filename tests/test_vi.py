"""VI tests (mirror + extension of reference test/test_vi.jl): closed-form
var_exp vs quadrature/autodiff, ELBO improvement, exactness on the Gaussian
likelihood (where the optimal mean-field Q is computable), and Poisson
end-to-end."""
import jax
import jax.numpy as jnp
import numpy as np

import gaussianprocesses_jl_tpu as gp
from gaussianprocesses_jl_tpu.inference.vi import elbo, vi, vi_predict_f, vi_predict_y
from gaussianprocesses_jl_tpu.ops.likelihoods import Likelihood


def test_var_exp_closed_vs_quadrature():
    y = jnp.asarray([0.0, 1.0, 3.0])
    m = jnp.asarray([0.2, -0.1, 0.8])
    v = jnp.asarray([0.3, 0.5, 0.2])
    pois = gp.PoisLik()
    closed = float(pois.var_exp(y, m, v))
    quad = float(Likelihood.var_exp(pois, y, m, v))
    assert np.allclose(closed, quad, rtol=1e-6)
    gauss = gp.GaussLik(lsigma=jnp.asarray(-0.3))
    yg = jnp.asarray([0.1, -0.5, 0.7])
    closed = float(gauss.var_exp(yg, m, v))
    quad = float(Likelihood.var_exp(gauss, yg, m, v))
    assert np.allclose(closed, quad, rtol=1e-6)


def test_dv_var_exp_matches_autodiff():
    """ref test/test_vi.jl checks dv_var_exp vs Zygote; here closed-form
    grad vs quadrature grad."""
    pois = gp.PoisLik()
    y = jnp.asarray([1.0, 2.0])
    m = jnp.asarray([0.1, 0.4])
    v = jnp.asarray([0.2, 0.3])
    g_closed = np.asarray(pois.dv_var_exp(y, m, v))
    g_quad = np.asarray(
        jax.grad(lambda vv: Likelihood.var_exp(pois, y, m, vv))(v))
    assert np.allclose(g_closed, g_quad, rtol=1e-5)


def _poisson_model():
    rng = np.random.RandomState(3)
    X = rng.uniform(-2, 2, size=(25, 1))
    f = 1.0 + 0.8 * np.sin(2 * X[:, 0])
    y = rng.poisson(np.exp(f)).astype(float)
    return gp.GPA(X, y, gp.MeanZero(), gp.SE(0.0, 0.0), gp.PoisLik())


def test_vi_improves_elbo_poisson():
    m = _poisson_model()
    mu0 = m.params.mean.mean(m.x)
    v0 = m.params.kernel.diag(m.x)
    e0 = float(elbo(m, mu0, v0))
    Q = vi(m, nits=200)
    e1 = float(elbo(m, Q.m, Q.v))
    assert e1 > e0
    assert np.all(np.asarray(Q.v) > 0)
    # predictive sanity: rates near data scale
    mu_y, var_y = vi_predict_y(m, Q, m.x)
    assert np.all(np.isfinite(np.asarray(mu_y)))
    corr = np.corrcoef(np.asarray(mu_y), np.asarray(m.y))[0, 1]
    assert corr > 0.5


def test_vi_gaussian_matches_exact():
    """With a Gaussian likelihood the true posterior is Gaussian; the
    mean-field optimum must match the exact posterior mean, and the ELBO at
    the optimum must approach the exact evidence from below."""
    rng = np.random.RandomState(0)
    X = rng.randn(20, 1)
    y = np.sin(X[:, 0]) + 0.2 * rng.randn(20)
    sn = 0.25
    m = gp.GPA(X, jnp.asarray(y), gp.MeanZero(), gp.SE(0.2, 0.1),
               gp.GaussLik(lsigma=jnp.asarray(float(np.log(sn)))))
    Q = vi(m, nits=400)
    # exact posterior mean of f: K (K + sn^2 I)^-1 y
    exact = gp.GPE(X, y, kernel=gp.SE(0.2, 0.1),
                   lognoise=float(np.log(sn)))
    mu_exact, _ = exact.predict_f(X)
    assert np.allclose(np.asarray(Q.m), np.asarray(mu_exact), atol=0.05)
    # ELBO lower-bounds the exact mll
    assert float(elbo(m, Q.m, Q.v)) <= float(exact.mll) + 1e-3


def test_vi_adam_backend():
    m = _poisson_model()
    Q = vi(m, nits=300, method="adam", lr=0.05)
    assert np.all(np.isfinite(np.asarray(Q.m)))
    assert np.all(np.asarray(Q.v) > 0)


def test_vi_predict_full_cov_consistency():
    m = _poisson_model()
    Q = vi(m, nits=100)
    xs = jnp.linspace(-2, 2, 7)[:, None]
    mu_d, var = vi_predict_f(m, Q, xs)
    mu_f, cov = vi_predict_f(m, Q, xs, full_cov=True)
    assert np.allclose(np.asarray(mu_d), np.asarray(mu_f), atol=1e-10)
    assert np.allclose(np.asarray(var), np.asarray(jnp.diag(cov)), atol=1e-8)
