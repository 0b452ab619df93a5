"""Sampler tests (beyond the reference's crash-only smoke tests in
test/mcmc.jl): HMC correctness on a known Gaussian, HMC/ESS on GPE and GPA,
vmapped multi-chain, and rejection robustness."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussianprocesses_jl_tpu as gp
from gaussianprocesses_jl_tpu.inference.hmc import hmc
from gaussianprocesses_jl_tpu.inference.ess import ess as ess_kernel
from gaussianprocesses_jl_tpu.utils.priors import Normal


def test_hmc_gaussian_moments():
    """HMC on a 2-D Gaussian recovers mean/cov within MC error."""
    mu = jnp.asarray([1.0, -2.0])
    sd = jnp.asarray([0.5, 2.0])

    def logp(th):
        return -0.5 * jnp.sum(((th - mu) / sd) ** 2)

    res = hmc(logp, jnp.zeros(2), jax.random.PRNGKey(0), n_iter=4000,
              eps=0.25, Lmin=5, Lmax=15)
    s = np.asarray(res.samples[500:])
    assert float(res.accept_rate) > 0.6
    assert np.allclose(s.mean(0), np.asarray(mu), atol=0.15)
    assert np.allclose(s.std(0), np.asarray(sd), rtol=0.2)


def test_ess_gaussian_moments():
    """ESS with prior N(0,1) and Gaussian likelihood recovers the exact
    product posterior."""
    # likelihood N(1, 0.5^2) per coordinate; prior N(0,1)
    def loglik(th):
        return -0.5 * jnp.sum(((th - 1.0) / 0.5) ** 2)

    res = ess_kernel(loglik, jnp.zeros(2), jnp.zeros(2), jnp.ones(2),
                     jax.random.PRNGKey(1), n_iter=4000)
    s = np.asarray(res.samples[500:])
    post_var = 1.0 / (1.0 + 1.0 / 0.25)
    post_mean = post_var * (1.0 / 0.25)
    assert np.allclose(s.mean(0), post_mean, atol=0.1)
    assert np.allclose(s.var(0), post_var, rtol=0.25)


def test_hmc_rejects_bad_regions():
    """Non-finite targets behave like the reference's exception->reject."""

    def logp(th):
        return jnp.where(th[0] < 2.0, -0.5 * jnp.sum(th**2), jnp.nan)

    res = hmc(logp, jnp.zeros(1), jax.random.PRNGKey(2), n_iter=500,
              eps=0.5)
    s = np.asarray(res.samples)
    assert np.all(np.isfinite(s))


@pytest.fixture(scope="module")
def gpe_model():
    rng = np.random.RandomState(0)
    x = rng.randn(15, 1)
    y = np.sin(x[:, 0]) + 0.2 * rng.randn(15)
    m = gp.GPE(x, y, kernel=gp.SE(0.0, 0.0), lognoise=-1.0)
    m.set_priors(noise=[Normal(-1.0, 1.0)],
                 kern=[Normal(0.0, 2.0), Normal(0.0, 2.0)])
    return m


def test_mcmc_gpe(gpe_model):
    res = gp.mcmc(gpe_model, jax.random.PRNGKey(0), n_iter=200, burn=50,
                  verbose=False)
    assert res.samples.shape == (150, 3)
    assert np.all(np.isfinite(np.asarray(res.samples)))
    assert 0.0 < float(res.accept_rate) <= 1.0
    # posterior property gives Julia layout
    assert res.posterior.shape == (3, 150)


def test_mcmc_gpa():
    rng = np.random.RandomState(1)
    X = rng.randn(10, 1)
    y = (np.sin(X[:, 0]) > 0).astype(float)
    m = gp.GPA(X, y, gp.MeanZero(), gp.SE(0.0, 0.0), gp.BernLik())
    res = gp.mcmc(m, jax.random.PRNGKey(3), n_iter=100, eps=0.05,
                  verbose=False)
    assert res.samples.shape == (100, 10 + 2)
    assert np.all(np.isfinite(np.asarray(res.samples)))


def test_mcmc_multichain(gpe_model):
    res = gp.mcmc(gpe_model, jax.random.PRNGKey(1), n_iter=50, chains=4,
                  verbose=False)
    assert res.samples.shape == (4, 50, 3)
    assert res.accept_rate.shape == (4,)


def test_ess_gpe(gpe_model):
    res = gp.ess(gpe_model, jax.random.PRNGKey(0), n_iter=200, burn=50,
                 verbose=False)
    assert res.samples.shape == (150, 3)
    assert np.all(np.isfinite(np.asarray(res.samples)))


def test_ess_multichain_best_selection(gpe_model):
    """Multi-chain ess() sets the model to the best chain by final mll
    (not arbitrarily chain 0), mirroring mcmc()'s best-target selection."""
    res = gp.ess(gpe_model, jax.random.PRNGKey(4), n_iter=50, chains=3,
                 verbose=False)
    assert res.samples.shape == (3, 50, 3)
    mll_fn, _, _, _ = gpe_model.make_logprob(include_priors=False)
    best = np.argmax([float(mll_fn(res.final[c])) for c in range(3)])
    assert np.allclose(np.asarray(gpe_model.params.flat_params()),
                       np.asarray(res.final[best]))


def test_ess_requires_normal_priors():
    rng = np.random.RandomState(0)
    m = gp.GPE(rng.randn(8, 1), rng.randn(8), kernel=gp.SE(0.0, 0.0))
    with pytest.raises(ValueError):
        gp.ess(m, n_iter=10, verbose=False)


def test_ess_gpa_rejected(gpe_model):
    rng = np.random.RandomState(0)
    m = gp.GPA(rng.randn(8, 1), (rng.randn(8) > 0).astype(float),
               gp.MeanZero(), gp.SE(0.0, 0.0), gp.BernLik())
    with pytest.raises(TypeError):
        gp.ess(m, n_iter=10, verbose=False)


def _cliff_logp(th):
    """Gaussian with a hard -inf cliff at th[0] > 1 (the f32
    failed-Cholesky analog: a region where the target is -inf but
    gradients near the boundary stay finite)."""
    good = -0.5 * jnp.sum(th * th)
    return jnp.where(th[0] > 1.0, -jnp.inf, good)


def test_hmc_never_absorbs_minus_inf():
    """Mid-run -inf proposals must be rejected, never committed: the chain
    samples the truncated Gaussian and its running target stays finite
    (VERDICT r2 small-fidelity item)."""
    res = hmc(_cliff_logp, jnp.asarray([0.9, 0.0]), jax.random.PRNGKey(3),
              n_iter=1500, eps=0.4, Lmin=5, Lmax=15)
    s = np.asarray(res.samples)
    assert np.all(np.isfinite(s))
    assert np.all(s[:, 0] <= 1.0)  # never entered the -inf region
    assert np.isfinite(float(res.final_target))
    # the chain moved (the cliff did not freeze it)
    assert s[:, 0].std() > 0.1


def test_hmc_recovers_from_minus_inf_start():
    """A -inf start state (e.g. a failed f32 Cholesky at the seed) must
    recover: the zeroed start gradient lets finite proposals be reached
    and any finite target beats -inf."""
    res = hmc(_cliff_logp, jnp.asarray([1.5, 0.0]), jax.random.PRNGKey(4),
              n_iter=800, eps=0.4, Lmin=5, Lmax=15)
    assert np.isfinite(float(res.final_target))
    s = np.asarray(res.samples)
    # once recovered, the chain never falls back into the -inf region
    first_ok = np.argmax(s[:, 0] <= 1.0)
    assert np.all(s[first_ok:, 0] <= 1.0)


def test_sharded_hmc_never_absorbs_minus_inf():
    from gaussianprocesses_jl_tpu.parallel.chains import sharded_hmc
    from gaussianprocesses_jl_tpu.parallel.mesh import make_mesh

    mesh = make_mesh({"chains": 8})
    C = 16
    # half the chains start inside the -inf region
    starts = jnp.stack([jnp.linspace(0.5, 1.5, C), jnp.zeros(C)], axis=1)
    res = sharded_hmc(_cliff_logp, starts, jax.random.PRNGKey(5), mesh,
                      n_iter=300, n_warmup=100, eps0=0.2)
    assert np.all(np.isfinite(np.asarray(res.final_target)))
    kept = np.asarray(res.samples)  # (C, n_keep, D)
    assert np.all(np.isfinite(kept))
    assert np.all(kept[..., 0] <= 1.0)


def test_ess_multichain_jitters_starts(gpe_model):
    """ess(chains=k) must jitter chain starts (identical starts blind
    split-R-hat to multimodality) and label its diagnostic honestly:
    accept_rate is None, mean_proposals is the shrinkage count."""
    res = gp.ess(gpe_model, jax.random.PRNGKey(7), n_iter=5, chains=3,
                 verbose=False)
    first = np.asarray(res.samples[:, 0, :])
    assert not np.allclose(first[0], first[1])
    assert res.accept_rate is None
    assert np.all(np.asarray(res.mean_proposals) >= 1.0)
