"""Split-block (factor-cached) HMC — the TPU analog of the reference's
"recompute K only if kern moved" cache (ref src/GPA.jl:118-128).

Master validity check: the alternation of conditional HMC kernels must
leave the same joint invariant as the joint sampler, so posterior moments
from `split_hmc` and `hmc` on the same GPA target must agree within Monte
Carlo error."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussianprocesses_jl_tpu as gp
from gaussianprocesses_jl_tpu.inference.diagnostics import (
    effective_sample_size,
    split_rhat,
)
from gaussianprocesses_jl_tpu.inference.hmc import hmc


@pytest.fixture(scope="module")
def gpa_model():
    rng = np.random.RandomState(5)
    n, d = 24, 2
    X = rng.randn(n, d)
    y = (np.sin(X[:, 0]) + 0.3 * rng.randn(n) > 0).astype(float)
    m = gp.GPA(X, y, gp.MeanZero(), gp.SE(0.0, 0.0), gp.BernLik())
    m.set_priors(kern=[gp.priors.Normal(0.0, 1.0),
                       gp.priors.Normal(0.0, 1.0)])
    return m


def _run_split(m, key, chains=16, n_iter=400):
    precompute, lp_a, lp_b, a0, b0 = m.make_split_logprob()
    keys = jax.random.split(key, chains)
    ja, jb = a0.size, b0.size

    def one(k):
        k1, k2 = jax.random.split(k)
        a_start = a0 + 0.05 * jax.random.normal(k1, a0.shape, a0.dtype)
        b_start = b0 + 0.05 * jax.random.normal(k2, b0.shape, b0.dtype)
        return gp.split_hmc(precompute, lp_a, lp_b, a_start, b_start, k,
                            n_iter=n_iter, a_iters=2, eps_a=0.25,
                            eps_b=0.08)

    res = jax.vmap(one)(keys)
    assert res.samples.shape == (chains, n_iter * 2, ja + jb)
    return res


def _run_joint(m, key, chains=16, n_iter=600):
    logprob, x0, _, _ = m.make_logprob()
    keys = jax.random.split(key, chains)

    def one(k):
        start = x0 + 0.05 * jax.random.normal(k, x0.shape, x0.dtype)
        return hmc(logprob, start, k, n_iter=n_iter, eps=0.08)

    return jax.vmap(one)(keys)


def test_split_matches_joint_moments(gpa_model):
    m = gpa_model
    rs = _run_split(m, jax.random.PRNGKey(0))
    rj = _run_joint(m, jax.random.PRNGKey(1))

    warm_s = rs.samples.shape[1] // 4
    warm_j = rj.samples.shape[1] // 4
    post_s = np.asarray(rs.samples[:, warm_s:, :])
    post_j = np.asarray(rj.samples[:, warm_j:, :])

    assert np.all(np.isfinite(post_s))
    acc_a = float(np.mean(np.asarray(rs.accept_rate_a)))
    acc_b = float(np.mean(np.asarray(rs.accept_rate_b)))
    assert acc_a > 0.5, acc_a
    assert acc_b > 0.5, acc_b

    # both samplers converged (many-chain split-Rhat over all coordinates)
    rh_s = np.asarray(split_rhat(post_s))
    assert np.nanmax(rh_s) < 1.05, rh_s.max()

    # pooled posterior moments agree within combined MC error
    mean_s = post_s.reshape(-1, post_s.shape[-1]).mean(axis=0)
    mean_j = post_j.reshape(-1, post_j.shape[-1]).mean(axis=0)
    sd_s = post_s.reshape(-1, post_s.shape[-1]).std(axis=0)
    sd_j = post_j.reshape(-1, post_j.shape[-1]).std(axis=0)
    ess_s = np.maximum(np.asarray(effective_sample_size(post_s)), 8.0)
    ess_j = np.maximum(np.asarray(effective_sample_size(post_j)), 8.0)
    se = np.sqrt(sd_s**2 / ess_s + sd_j**2 / ess_j)
    z = np.abs(mean_s - mean_j) / se
    # 5 sigma on every coordinate (26 coords; crossing is a real bug,
    # not noise)
    assert np.max(z) < 5.0, (z.max(), np.argmax(z))
    # standard deviations agree to 25%
    assert np.all(np.abs(sd_s - sd_j) / sd_j < 0.25)


def test_split_hmc_records_valid_joint_states(gpa_model):
    """Every recorded draw pairs a_i with the b in force at that moment;
    the stored final target equals the joint target at the final state."""
    m = gpa_model
    precompute, lp_a, lp_b, a0, b0 = m.make_split_logprob()
    res = gp.split_hmc(precompute, lp_a, lp_b, a0, b0,
                       jax.random.PRNGKey(2), n_iter=10, a_iters=3,
                       eps_a=0.2, eps_b=0.05)
    na = a0.size
    # the final state's a-block is the last recorded a (the B update that
    # follows only moves b)
    last = res.samples[-1]
    assert np.allclose(np.asarray(last[:na]), np.asarray(res.final[:na]))
    t = float(lp_b(res.final[na:], res.final[:na]))
    assert np.allclose(t, float(res.final_target), rtol=1e-10)


def test_split_hmc_rejects_bad_kernel_moves(gpa_model):
    """A kernel proposal whose factorization fails must never be accepted
    (-inf target via the ok flag)."""
    m = gpa_model
    precompute, lp_a, lp_b, a0, b0 = m.make_split_logprob()
    # absurd kernel params -> non-PD / overflow region returns -inf
    bad = jnp.asarray([500.0, 500.0], dtype=b0.dtype)
    val = float(lp_b(bad, a0))
    assert val == -np.inf or np.isfinite(val)
    res = gp.split_hmc(precompute, lp_a, lp_b, a0, b0,
                       jax.random.PRNGKey(3), n_iter=20, a_iters=2,
                       eps_a=0.2, eps_b=0.05)
    assert np.all(np.isfinite(np.asarray(res.samples)))


def test_mcmc_split_sampler_api(gpa_model):
    """gp.mcmc(..., sampler='split') drives the split sampler end to end,
    records n_iter * a_iters rows, and updates the model state."""
    m = gpa_model
    before = np.asarray(m.params.flat_params()).copy()
    res = gp.mcmc(m, jax.random.PRNGKey(9), n_iter=30, a_iters=4,
                  eps_a=0.2, eps_b=0.05, burn=20, sampler="split",
                  verbose=False)
    assert res.samples.shape == (30 * 4 - 20, before.shape[0])
    assert np.all(np.isfinite(np.asarray(res.samples)))
    assert np.asarray(res.accept_rate).shape == (2,)
    after = np.asarray(m.params.flat_params())
    assert not np.allclose(before, after)  # model moved to the final state

    res_c = gp.mcmc(m, jax.random.PRNGKey(10), n_iter=10, a_iters=2,
                    chains=3, sampler="split", verbose=False)
    assert res_c.samples.shape == (3, 20, before.shape[0])
    assert np.asarray(res_c.accept_rate).shape == (3, 2)

    with pytest.raises(TypeError, match="GPA"):
        rng = np.random.RandomState(0)
        mg = gp.GPE(rng.randn(8, 1), rng.randn(8), kernel=gp.SE(0.0, 0.0))
        gp.mcmc(mg, sampler="split", verbose=False)
    with pytest.raises(ValueError, match="flags"):
        gp.mcmc(m, sampler="split", kern=False, verbose=False)
    # truthy unknown kwargs must ALSO raise (a typo like noize=True was
    # silently ignored before; ADVICE r4)
    with pytest.raises(ValueError, match="noize"):
        gp.mcmc(m, sampler="split", noize=True, verbose=False)


def test_split_hmc_dual_averaging_adapts(gpa_model):
    """Per-block dual-averaging warmup: starting from a deliberately bad
    eps_a (too large -> near-zero acceptance), the adapted sampler must
    recover acceptance near the target after warmup, and the adapted step
    sizes must differ per block."""
    m = gpa_model
    precompute, lp_a, lp_b, a0, b0 = m.make_split_logprob()
    res = gp.split_hmc(precompute, lp_a, lp_b, a0, b0,
                       jax.random.PRNGKey(6), n_iter=150, a_iters=2,
                       eps_a=1.5, eps_b=0.5, n_warmup=150,
                       target_accept=0.8)
    # warmup is additive and its draws are returned separately
    assert res.samples.shape[0] == 150 * 2
    assert res.warmup_samples.shape[0] == 150 * 2
    ea, eb = float(res.eps_a_final), float(res.eps_b_final)
    assert 1e-4 < ea < 1.5 and 1e-4 < eb < 0.5, (ea, eb)
    # post-warmup acceptance near the target: re-run at the adapted eps
    res2 = gp.split_hmc(precompute, lp_a, lp_b, a0, b0,
                        jax.random.PRNGKey(7), n_iter=200, a_iters=2,
                        eps_a=ea, eps_b=eb)
    assert 0.55 < float(res2.accept_rate_a) <= 1.0, float(res2.accept_rate_a)
    assert 0.55 < float(res2.accept_rate_b) <= 1.0, float(res2.accept_rate_b)
    # without warmup the bad eps really is bad (sanity of the premise)
    res3 = gp.split_hmc(precompute, lp_a, lp_b, a0, b0,
                        jax.random.PRNGKey(8), n_iter=100, a_iters=2,
                        eps_a=1.5, eps_b=0.5)
    assert float(res3.accept_rate_a) < 0.3


def test_mcmc_split_warmup_plumbs_through(gpa_model):
    # n_warmup is additive and its draws never reach MCMCResult.samples;
    # burn applies to the post-warmup rows only
    res = gp.mcmc(gpa_model, jax.random.PRNGKey(11), n_iter=40, a_iters=2,
                  eps_a=1.0, eps_b=0.3, n_warmup=20, burn=40,
                  sampler="split", verbose=False)
    assert res.samples.shape[0] == 40 * 2 - 40
    assert np.all(np.isfinite(np.asarray(res.samples)))
    # the bad starting eps was adapted away: draws actually move
    assert np.asarray(res.samples).std(axis=0).max() > 0
