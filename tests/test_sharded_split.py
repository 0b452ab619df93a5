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
    # warmup draws come back SEPARATELY (n_warmup is additive)
    assert res.samples.shape == (8, 60 * 3, th.shape[1])
    assert res.warmup_samples.shape == (8, 40 * 3, th.shape[1])
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
    # first two outer iterations (warmup rows): before chaotic
    # amplification
    assert np.allclose(np.asarray(r8.warmup_samples[:, :4]),
                       np.asarray(r2.warmup_samples[:, :4]), atol=1e-9)
    assert np.allclose(np.asarray(r8.warmup_samples[:, :4]),
                       np.asarray(r1.warmup_samples[:, :4]), atol=1e-9)
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
    assert np.array_equal(np.asarray(r_one.warmup_samples),
                          np.asarray(r_seg.warmup_samples))
    assert float(r_one.eps_a_final) == float(r_seg.eps_a_final)
    assert float(r_one.eps_b_final) == float(r_seg.eps_b_final)


def test_sharded_split_validates_divisibility(model):
    pc, la, lb, na, th = _starts(model, 6, jax.random.PRNGKey(6))
    with pytest.raises(ValueError, match="divisible"):
        sharded_split_hmc(pc, la, lb, th, jax.random.PRNGKey(7),
                          make_mesh({"chains": 8}), na, n_iter=2)


def test_sharded_split_per_block_path_length(model):
    """Lmin_b/Lmax_b give the B block its own trajectory length; the
    default must reproduce the shared-L behaviour bit-exactly."""
    pc, la, lb, na, th = _starts(model, 8, jax.random.PRNGKey(12))
    mesh = make_mesh({"chains": 8})
    key = jax.random.PRNGKey(13)
    kw = dict(n_iter=8, a_iters=2, eps_a0=0.2, eps_b0=0.05)
    r_def = sharded_split_hmc(pc, la, lb, th, key, mesh, na, **kw)
    r_same = sharded_split_hmc(pc, la, lb, th, key, mesh, na,
                               Lmin_b=5, Lmax_b=15, **kw)
    assert np.array_equal(np.asarray(r_def.samples),
                          np.asarray(r_same.samples))
    r_long = sharded_split_hmc(pc, la, lb, th, key, mesh, na,
                               Lmin_b=20, Lmax_b=30, **kw)
    assert np.all(np.isfinite(np.asarray(r_long.samples)))
    # longer trajectories genuinely change the B-block draws
    assert not np.array_equal(np.asarray(r_long.samples[:, :, na:]),
                              np.asarray(r_def.samples[:, :, na:]))


def test_sharded_split_records_pre_update_b(model):
    """Each recorded draw must pair a_i with the kernel block b that was
    IN FORCE during the A sweep — not the b sampled afterwards (ADVICE r4
    high: post-update pairing records joint states the chain never
    occupied, biasing cross-block statistics). Signature: the first outer
    iteration's rows carry the INITIAL b exactly, and iteration i+1's
    rows carry a b that only changes when the B update accepted."""
    pc, la, lb, na, th = _starts(model, 8, jax.random.PRNGKey(8))
    mesh = make_mesh({"chains": 8})
    res = sharded_split_hmc(pc, la, lb, th, jax.random.PRNGKey(9), mesh,
                            na, n_iter=6, a_iters=3, n_warmup=0,
                            eps_a0=0.2, eps_b0=0.05)
    s = np.asarray(res.samples)  # (8, 6*3, D)
    b0 = np.asarray(th[:, na:])
    # iteration 0's three rows: b == the initial b, bit-exactly
    for j in range(3):
        assert np.array_equal(s[:, j, na:], b0), j
    # within every outer iteration the b rows are constant
    bb = s[:, :, na:].reshape(8, 6, 3, -1)
    assert np.all(bb == bb[:, :, :1, :])
    # and the final state's b is NOT what iteration-final rows carry
    # whenever the last B update accepted (b moved after recording)
    moved = ~np.all(np.isclose(np.asarray(res.final[:, na:]),
                               s[:, -1, na:]), axis=1)
    acc_any = np.asarray(res.accept_rate_b) > 0
    # chains whose last update accepted must show post-recording movement
    # (statistically: with eps_b=0.05 acceptance is high, so some chain
    # both accepted at the last step and moved)
    assert moved.any() or not acc_any.any()


def test_sharded_split_moments_match_single_device(model):
    """The sharded sampler must target the same joint as the
    single-device split_hmc: pooled posterior moments agree within
    Monte Carlo error (the draw-pairing fix makes cross-block statistics
    comparable too)."""
    from gaussianprocesses_jl_tpu.inference.diagnostics import (
        effective_sample_size,
    )

    pc, la, lb, na, th = _starts(model, 16, jax.random.PRNGKey(10))
    mesh = make_mesh({"chains": 8})
    kw = dict(n_iter=250, a_iters=2, eps_a0=0.25, eps_b0=0.08)
    rs = sharded_split_hmc(pc, la, lb, th, jax.random.PRNGKey(11), mesh,
                           na, n_warmup=50, **kw)
    post_s = np.asarray(rs.samples)[:, 100:, :]

    def one(t, k):
        return gp.split_hmc(pc, la, lb, t[:na], t[na:], k, n_iter=250,
                            a_iters=2, eps_a=0.25, eps_b=0.08)
    keys = jax.random.split(jax.random.PRNGKey(12), 16)
    rv = jax.vmap(one)(th, keys)
    post_v = np.asarray(rv.samples)[:, 150:, :]

    for post in (post_s, post_v):
        assert np.all(np.isfinite(post))
    mean_s = post_s.reshape(-1, post_s.shape[-1]).mean(axis=0)
    mean_v = post_v.reshape(-1, post_v.shape[-1]).mean(axis=0)
    sd_s = post_s.reshape(-1, post_s.shape[-1]).std(axis=0)
    sd_v = post_v.reshape(-1, post_v.shape[-1]).std(axis=0)
    ess_s = np.maximum(np.asarray(effective_sample_size(post_s)), 8.0)
    ess_v = np.maximum(np.asarray(effective_sample_size(post_v)), 8.0)
    se = np.sqrt(sd_s**2 / ess_s + sd_v**2 / ess_v)
    z = np.abs(mean_s - mean_v) / se
    assert np.max(z) < 5.0, (z.max(), np.argmax(z))
    assert np.all(np.abs(sd_s - sd_v) / sd_v < 0.3)
