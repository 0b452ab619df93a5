"""Chain-sharded split-block HMC (parallel/chains.sharded_split_hmc):
the 10x factor-cached sampler (inference/split.py) sharded over a mesh
with COLLECTIVE per-block dual-averaging adaptation — the north-star
composition "MCMC chains sharded over hosts" x "recompute K only if kern
moved"."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussianprocesses_jl_tpu as gp
from gaussianprocesses_jl_tpu.parallel.chains import sharded_split_hmc
from gaussianprocesses_jl_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def model():
    rng = np.random.RandomState(5)
    n, d = 20, 2
    X = rng.randn(n, d)
    y = (np.sin(X[:, 0]) + 0.3 * rng.randn(n) > 0).astype(float)
    m = gp.GPA(X, y, gp.MeanZero(), gp.SE(0.0, 0.0), gp.BernLik())
    m.set_priors(kern=[gp.priors.Normal(0.0, 1.0)] * 2)
    return m


def _starts(m, chains, key):
    precompute, lp_a, lp_b, a0, b0 = m.make_split_logprob()
    x0 = jnp.concatenate([a0, b0])
    th = x0[None, :] + 0.05 * jax.random.normal(
        key, (chains, x0.shape[0]), x0.dtype)
    return precompute, lp_a, lp_b, a0.shape[0], th


def test_sharded_split_runs_and_adapts(model):
    pc, la, lb, na, th = _starts(model, 8, jax.random.PRNGKey(0))
    mesh = make_mesh({"chains": 8})
    res = sharded_split_hmc(pc, la, lb, th, jax.random.PRNGKey(1), mesh,
                            na, n_iter=60, a_iters=3, n_warmup=40,
                            eps_a0=0.8, eps_b0=0.3)
    assert res.samples.shape == (8, 100 * 3, th.shape[1])
    assert np.all(np.isfinite(np.asarray(res.samples)))
    ea, eb = float(res.eps_a_final), float(res.eps_b_final)
    # collective adaptation pulled the deliberately-bad step sizes down
    assert 1e-4 < ea < 0.8 and 1e-4 < eb < 0.3, (ea, eb)
    # post-warmup acceptance reasonable under the adapted eps
    assert float(jnp.mean(res.accept_rate_a)) > 0.3
    assert float(jnp.mean(res.accept_rate_b)) > 0.3
    assert np.all(np.isfinite(np.asarray(res.final_target)))


def test_sharded_split_mesh_size_invariant(model):
    """The same chains on 1, 2, or 8 devices run the same algorithm: the
    psum'd adaptation statistics differ only by floating-point reduction
    ORDER across layouts (measured ~6e-13 on the first iteration), which
    chaos then amplifies — so assert tight agreement early, adapted step
    sizes to reduction-order tolerance, and matching acceptance."""
    pc, la, lb, na, th = _starts(model, 8, jax.random.PRNGKey(2))
    key = jax.random.PRNGKey(3)
    kw = dict(n_iter=20, a_iters=2, n_warmup=10, eps_a0=0.3, eps_b0=0.1)
    r8 = sharded_split_hmc(pc, la, lb, th, key,
                           make_mesh({"chains": 8}), na, **kw)
    r2 = sharded_split_hmc(pc, la, lb, th, key,
                           make_mesh({"chains": 2},
                                     devices=jax.devices()[:2]), na, **kw)
    r1 = sharded_split_hmc(pc, la, lb, th, key,
                           make_mesh({"chains": 1},
                                     devices=jax.devices()[:1]), na, **kw)
    # first two outer iterations: before chaotic amplification
    assert np.allclose(np.asarray(r8.samples[:, :4]),
                       np.asarray(r2.samples[:, :4]), atol=1e-9)
    assert np.allclose(np.asarray(r8.samples[:, :4]),
                       np.asarray(r1.samples[:, :4]), atol=1e-9)
    # shared adaptation converges to the same step sizes across layouts
    assert np.allclose(float(r8.eps_a_final), float(r1.eps_a_final),
                       rtol=1e-4)
    assert np.allclose(float(r8.eps_b_final), float(r1.eps_b_final),
                       rtol=1e-4)
    assert np.allclose(float(jnp.mean(r8.accept_rate_a)),
                       float(jnp.mean(r1.accept_rate_a)), atol=0.1)


def test_sharded_split_segment_iters_bit_exact(model):
    """segment_iters only splits the scan into jitted segments; draws
    and adapted step sizes must be bit-identical to one long scan."""
    pc, la, lb, na, th = _starts(model, 8, jax.random.PRNGKey(4))
    key = jax.random.PRNGKey(5)
    mesh = make_mesh({"chains": 8})
    kw = dict(n_iter=18, a_iters=2, n_warmup=12, eps_a0=0.3, eps_b0=0.1)
    r_one = sharded_split_hmc(pc, la, lb, th, key, mesh, na, **kw)
    r_seg = sharded_split_hmc(pc, la, lb, th, key, mesh, na,
                              segment_iters=7, **kw)
    assert np.array_equal(np.asarray(r_one.samples),
                          np.asarray(r_seg.samples))
    assert float(r_one.eps_a_final) == float(r_seg.eps_a_final)
    assert float(r_one.eps_b_final) == float(r_seg.eps_b_final)


def test_sharded_split_validates_divisibility(model):
    pc, la, lb, na, th = _starts(model, 6, jax.random.PRNGKey(6))
    with pytest.raises(ValueError, match="divisible"):
        sharded_split_hmc(pc, la, lb, th, jax.random.PRNGKey(7),
                          make_mesh({"chains": 8}), na, n_iter=2)
