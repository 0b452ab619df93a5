"""GPA tests (mirror of reference test/gpa.jl): for every likelihood, build
the model, randomize params, and check the exact dtarget against central
finite differences — the master correctness test for the whitened-latent
target. Plus prediction and optimization smoke."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussianprocesses_jl_tpu as gp
from gaussianprocesses_jl_tpu.models.gpa import gpa_target

N, D = 12, 2


def make_case(likname):
    rng = np.random.RandomState(5)
    X = jnp.asarray(rng.randn(N, D))
    f = np.sin(np.asarray(X[:, 0]))
    if likname == "bernoulli":
        lik, y = gp.BernLik(), jnp.asarray((f > 0).astype(float))
    elif likname == "poisson":
        lik, y = gp.PoisLik(), jnp.asarray(rng.poisson(np.exp(f)).astype(float))
    elif likname == "gaussian":
        lik, y = gp.GaussLik(lsigma=jnp.asarray(-0.5)), jnp.asarray(
            f + 0.1 * rng.randn(N))
    elif likname == "studentt":
        lik, y = gp.StuTLik(lsigma=jnp.asarray(-0.5), nu=3), jnp.asarray(
            f + 0.1 * rng.standard_t(3, N))
    elif likname == "exponential":
        lik, y = gp.ExpLik(), jnp.asarray(rng.exponential(np.exp(f)))
    elif likname == "binomial":
        lik, y = gp.BinLik(n=5), jnp.asarray(
            rng.binomial(5, 1 / (1 + np.exp(-f))).astype(float))
    else:
        raise ValueError(likname)
    m = gp.GPA(X, y, gp.MeanConst(beta=jnp.asarray(0.1)),
               gp.Matern(1.5, 0.2, 0.1), lik)
    return m


LIKS = ["bernoulli", "poisson", "gaussian", "studentt", "exponential",
        "binomial"]


@pytest.mark.parametrize("likname", LIKS)
def test_dtarget_vs_fd(likname):
    m = make_case(likname)
    rng = np.random.RandomState(11)
    # randomize all params incl. latents (ref test/gpa.jl:37-47)
    vec0 = m.params.flat_params()
    vec0 = vec0 + 0.3 * jnp.asarray(rng.randn(vec0.shape[0]))
    m.params = m.params.with_flat_params(vec0)
    t, g = m.target_and_dtarget()
    assert np.isfinite(float(t))

    def f(v):
        return float(gpa_target(m.params.with_flat_params(v), m.x, m.y,
                                m.covstrat)[0])

    eps = 1e-6
    idxs = list(range(min(5, vec0.shape[0]))) + \
        list(range(vec0.shape[0] - 5, vec0.shape[0]))
    for p in idxs:
        fd = (f(vec0.at[p].add(eps)) - f(vec0.at[p].add(-eps))) / (2 * eps)
        assert np.allclose(float(g[p]), fd, rtol=1e-4, atol=1e-6), (
            likname, p, float(g[p]), fd)


def test_param_layout():
    m = make_case("bernoulli")
    v = m.get_params()
    assert v.shape[0] == N + 0 + 1 + 2  # v + lik(0) + mean(1) + kern(2)
    m2 = make_case("gaussian")
    assert m2.get_params().shape[0] == N + 1 + 1 + 2
    assert m2.get_params(lik=False).shape[0] == N + 1 + 2
    m2.set_params(m2.get_params() + 0.1)
    assert np.allclose(np.asarray(m2.get_params()),
                       np.asarray(v := m2.params.flat_params()))


def test_predict_and_predict_y():
    m = make_case("bernoulli")
    # move latents toward the data a bit
    m.optimize(maxiter=30)
    Xs = jnp.asarray(np.random.RandomState(2).randn(6, D))
    mu, var = m.predict_f(Xs)
    assert mu.shape == (6,) and np.all(np.asarray(var) >= 0)
    p, pv = m.predict_y(Xs)
    assert np.all((np.asarray(p) >= 0) & (np.asarray(p) <= 1))
    assert np.allclose(np.asarray(pv), np.asarray(p - p**2), atol=1e-12)


def test_predict_obs_quadrature_vs_closed_form():
    """Gauss-Hermite default predict_obs matches the Bernoulli closed form."""
    from gaussianprocesses_jl_tpu.ops.likelihoods import Likelihood

    lik = gp.BernLik()
    mu = jnp.asarray([-1.0, 0.0, 0.7])
    var = jnp.asarray([0.3, 0.5, 0.2])
    p_closed, v_closed = lik.predict_obs(mu, var)
    p_quad, v_quad = Likelihood.predict_obs(lik, mu, var)
    assert np.allclose(np.asarray(p_closed), np.asarray(p_quad), atol=1e-6)
    assert np.allclose(np.asarray(v_closed), np.asarray(v_quad), atol=1e-6)


def test_gp_factory_dispatch():
    m = make_case("poisson")
    g2 = gp.GP(m.x, m.y, gp.MeanZero(), gp.SE(0.0, 0.0), lik=gp.PoisLik())
    assert isinstance(g2, gp.GPA)
    g3 = gp.GP(np.random.randn(5, 1), np.random.randn(5))
    assert isinstance(g3, gp.GPE)


def test_gpa_rejects_sparse_covstrat():
    """The low-rank sparse strategies have no unwhiten (no square factor),
    so GPA must reject them at construction instead of crashing deep in
    the latent build."""
    import pytest

    rng = np.random.RandomState(0)
    x = rng.randn(10, 1)
    y = (x[:, 0] > 0).astype(float)
    from gaussianprocesses_jl_tpu.models.sparse import SubsetOfRegsStrategy

    strat = SubsetOfRegsStrategy(inducing=jnp.asarray(x[:3]))
    with pytest.raises(TypeError, match="whitened-latent"):
        gp.GPA(x, y, gp.MeanZero(), gp.SE(0.0, 0.0), gp.BernLik(),
               covstrat=strat)
