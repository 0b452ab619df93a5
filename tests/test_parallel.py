"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY §4: the
distributed test pattern the reference lacks): chain-sharded HMC with
collective step-size adaptation, and observation-sharded FITC equal to the
single-device result."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussianprocesses_jl_tpu as gp
from gaussianprocesses_jl_tpu.parallel.mesh import make_mesh
from gaussianprocesses_jl_tpu.parallel.chains import sharded_hmc
from gaussianprocesses_jl_tpu.parallel.fitc import (
    fitc_mll_sharded_fn,
    shard_data,
)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_hmc_gaussian():
    mesh = make_mesh({"chains": 8})
    mu = jnp.asarray([1.0, -2.0])
    sd = jnp.asarray([0.5, 2.0])

    def logp(th):
        return -0.5 * jnp.sum(((th - mu) / sd) ** 2)

    C = 32
    theta0 = jnp.zeros((C, 2))
    res = sharded_hmc(logp, theta0, jax.random.PRNGKey(0), mesh,
                      n_iter=400, n_warmup=200, eps0=0.05)
    s = np.asarray(res.samples)  # (C, n_keep, D)
    assert s.shape == (C, 400, 2)
    pooled = s.reshape(-1, 2)
    assert np.allclose(pooled.mean(0), np.asarray(mu), atol=0.1)
    assert np.allclose(pooled.std(0), np.asarray(sd), rtol=0.15)
    # adaptation found a reasonable step size and acceptance near target
    acc = float(np.mean(np.asarray(res.accept_rate)))
    assert 0.6 < acc <= 1.0
    assert 1e-3 < float(res.eps_final) < 5.0


def test_sharded_hmc_gpe_target():
    """Chain-sharded HMC over a real GPE log-target."""
    mesh = make_mesh({"chains": 8})
    rng = np.random.RandomState(0)
    x = rng.randn(12, 1)
    y = np.sin(x[:, 0]) + 0.2 * rng.randn(12)
    m = gp.GPE(x, y, kernel=gp.SE(0.0, 0.0), lognoise=-1.0)
    logprob, x0, _, _ = m.make_logprob()
    C = 16
    theta0 = jnp.tile(x0[None, :], (C, 1)) + 0.05 * jax.random.normal(
        jax.random.PRNGKey(1), (C, x0.shape[0]))
    res = sharded_hmc(logprob, theta0, jax.random.PRNGKey(2), mesh,
                      n_iter=100, n_warmup=50, eps0=0.05)
    assert np.all(np.isfinite(np.asarray(res.samples)))
    assert np.all(np.isfinite(np.asarray(res.final_target)))


def test_sharded_fitc_matches_single_device():
    mesh = make_mesh({"data": 8})
    rng = np.random.RandomState(1)
    n = 1600
    x = 2 * np.pi * rng.rand(n)
    y = np.sin(x) + 0.3 * rng.randn(n)
    ind = np.linspace(0, 2 * np.pi, 16)
    fitc = gp.FITC(x, ind, y, kernel=gp.SE(0.3, 0.1), lognoise=-0.6)
    mll_single = float(fitc.mll)

    mll_fn = fitc_mll_sharded_fn(fitc.params.kernel, mesh)
    X = jnp.asarray(x)[:, None]
    Xs, ys = shard_data(X, jnp.asarray(y), mesh)
    Xu = fitc.covstrat.inducing
    mll_dist = float(jax.jit(mll_fn)(fitc.params, Xs, ys, Xu))
    assert np.allclose(mll_dist, mll_single, rtol=1e-6), (mll_dist,
                                                          mll_single)

    # gradient flows through the collectives
    g = jax.grad(
        lambda p: mll_fn(p, Xs, ys, Xu)
    )(fitc.params)
    gflat = np.concatenate([np.ravel(np.asarray(l))
                            for l in jax.tree_util.tree_leaves(g)])
    assert np.all(np.isfinite(gflat))
    # compare with single-device gradient
    t, g_single = fitc.target_and_dtarget()
    g_dist = jnp.concatenate([
        jnp.ravel(g.lognoise.value), jnp.ravel(jnp.zeros(0)),
        jnp.atleast_1d(g.kernel.ll), jnp.atleast_1d(g.kernel.lsigma)])
    assert np.allclose(np.asarray(g_dist), np.asarray(g_single),
                       rtol=1e-4, atol=1e-7)


def test_mass_matrix_adaptation_beats_scalar_eps():
    """Anisotropic Gaussian (condition 100): collective diagonal mass
    adaptation must deliver >= 5x the ESS/iteration of the scalar-eps
    sampler (the round-2 acceptance criterion)."""
    from gaussianprocesses_jl_tpu.inference.diagnostics import (
        effective_sample_size,
    )

    mesh = make_mesh({"chains": 8})
    sd = jnp.asarray([0.1, 0.3, 1.0, 3.0, 10.0])  # condition 100 in sd

    def logp(th):
        return -0.5 * jnp.sum((th / sd) ** 2)

    C, D, n_iter, n_warmup = 32, 5, 600, 400
    theta0 = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (C, D))

    res_mass = sharded_hmc(logp, theta0, jax.random.PRNGKey(4), mesh,
                           n_iter=n_iter, n_warmup=n_warmup, eps0=0.05,
                           adapt_mass=True)
    res_scalar = sharded_hmc(logp, theta0, jax.random.PRNGKey(4), mesh,
                             n_iter=n_iter, n_warmup=n_warmup, eps0=0.05,
                             adapt_mass=False)

    # the adapted inverse mass should approximate the target variances
    minv = np.asarray(res_mass.minv_final)
    assert np.all(minv[1:] / minv[:-1] > 1.5), minv  # strictly anisotropic

    ess_mass = np.asarray(effective_sample_size(np.asarray(res_mass.samples)))
    ess_scal = np.asarray(
        effective_sample_size(np.asarray(res_scalar.samples)))
    ratio = ess_mass.min() / max(ess_scal.min(), 1.0)
    assert ratio >= 5.0, (ess_mass, ess_scal)

    # moments recover under the mass-adapted sampler
    pooled = np.asarray(res_mass.samples).reshape(-1, D)
    assert np.allclose(pooled.std(0), np.asarray(sd), rtol=0.25)


def test_sharded_ess_gaussian_moments():
    """Sharded elliptical slice sampling: Normal prior x Gaussian
    likelihood has a closed-form posterior; the pooled chains must
    recover it."""
    from gaussianprocesses_jl_tpu.parallel.chains import sharded_ess

    mesh = make_mesh({"chains": 8})
    D = 3
    prior_mu = jnp.zeros(D)
    prior_sigma = jnp.ones(D)
    obs = jnp.asarray([1.0, -0.5, 2.0])
    lik_sd = 0.7

    def loglik(th):
        return -0.5 * jnp.sum(((th - obs) / lik_sd) ** 2)

    # posterior: var = 1/(1 + 1/lik_sd^2), mu = var * obs / lik_sd^2
    post_var = 1.0 / (1.0 + 1.0 / lik_sd**2)
    post_mu = post_var * np.asarray(obs) / lik_sd**2

    C = 64
    theta0 = jax.random.normal(jax.random.PRNGKey(5), (C, D))
    res = sharded_ess(loglik, theta0, prior_mu, prior_sigma,
                      jax.random.PRNGKey(6), mesh, n_iter=500)
    s = np.asarray(res.samples)[:, 100:, :].reshape(-1, D)  # drop burn-in
    assert np.allclose(s.mean(0), post_mu, atol=0.05)
    assert np.allclose(s.std(0), np.sqrt(post_var), rtol=0.1)
    assert float(res.mean_proposals) > 1.0
    assert np.all(np.isfinite(np.asarray(res.final_loglik)))


def test_sharded_hmc_checkpoint_resume_bit_exact(tmp_path):
    """Kill-and-resume: a run checkpointed every 50 iterations and resumed
    from disk must reproduce the uninterrupted chain bit-exactly
    (VERDICT round-1 item 9)."""
    mesh = make_mesh({"chains": 8})
    sd = jnp.asarray([0.5, 2.0])

    def logp(th):
        return -0.5 * jnp.sum((th / sd) ** 2)

    C = 16
    theta0 = 0.1 * jax.random.normal(jax.random.PRNGKey(7), (C, 2))
    kw = dict(n_iter=150, n_warmup=50, eps0=0.05)

    ref = sharded_hmc(logp, theta0, jax.random.PRNGKey(8), mesh, **kw)

    path = str(tmp_path / "hmc.ckpt.npz")
    # "killed" run: execute only the first segments by monkeypatching the
    # loop via a small total — instead simulate the kill by running with
    # checkpointing, then DELETING the in-memory result and re-running,
    # which must pick up the checkpoint file, not recompute from scratch.
    import gaussianprocesses_jl_tpu.parallel.chains as chains_mod

    # first run writes checkpoints every 50 iters (and stops mid-way:
    # interrupt by raising from a save hook after the 2nd segment)
    calls = {"n": 0}
    orig_save = chains_mod.save_checkpoint

    def interrupting_save(p, state):
        orig_save(p, state)
        calls["n"] += 1
        if calls["n"] == 2:
            raise KeyboardInterrupt  # simulate the pod job dying

    chains_mod.save_checkpoint = interrupting_save
    try:
        sharded_hmc(logp, theta0, jax.random.PRNGKey(8), mesh,
                    checkpoint_every=50, checkpoint_path=path, **kw)
        raise AssertionError("interrupt did not fire")
    except KeyboardInterrupt:
        pass
    finally:
        chains_mod.save_checkpoint = orig_save

    import os
    assert os.path.exists(path)
    resumed = sharded_hmc(logp, theta0, jax.random.PRNGKey(8), mesh,
                          checkpoint_every=50, checkpoint_path=path, **kw)

    assert np.array_equal(np.asarray(resumed.samples),
                          np.asarray(ref.samples))
    assert np.array_equal(np.asarray(resumed.final), np.asarray(ref.final))
    assert float(resumed.eps_final) == float(ref.eps_final)


def test_make_pod_mesh_axes():
    from gaussianprocesses_jl_tpu.parallel.mesh import make_pod_mesh

    mesh = make_pod_mesh({"j": 4})
    assert mesh.axis_names == ("chains", "j")
    assert mesh.shape["chains"] == 2 and mesh.shape["j"] == 4

    # a 2D chains x j mesh runs the distributed dense path per chain group
    from gaussianprocesses_jl_tpu.parallel.cholesky import distributed_mll
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.randn(32, 2))
    y = jnp.asarray(np.sin(np.asarray(X[:, 0])))
    m = gp.GPE(X, y, kernel=gp.SE(0.0, 0.0), lognoise=-1.0)
    nv = float(np.exp(2 * np.asarray(m.lognoise)))
    mll = distributed_mll(m.params.kernel, nv, X, y, B=4, mesh=mesh,
                          axis="j")
    assert np.allclose(float(mll), float(m.mll), rtol=1e-9)


def test_distributed_kwargs_parsing():
    """Env-var / argument resolution for the multi-host entry point
    (VERDICT r2: the silent except-pass could degrade a misconfigured pod
    job to single-process)."""
    from gaussianprocesses_jl_tpu.parallel.mesh import _distributed_kwargs

    # fully-specified explicit config
    kw = _distributed_kwargs("host:1234", 4, 2, env={})
    assert kw == {"coordinator_address": "host:1234",
                  "num_processes": 4, "process_id": 2}
    # env-var fallback
    env = {"JAX_COORDINATOR_ADDRESS": "h:1", "JAX_NUM_PROCESSES": "2",
           "JAX_PROCESS_ID": "0"}
    kw = _distributed_kwargs(env=env)
    assert kw == {"coordinator_address": "h:1", "num_processes": 2,
                  "process_id": 0}
    # auto-detect path: nothing configured -> empty kwargs
    assert _distributed_kwargs(env={}) == {}
    # half-specified configs fail loudly
    with pytest.raises(ValueError, match="requires"):
        _distributed_kwargs("h:1", env={})
    with pytest.raises(ValueError, match="together"):
        _distributed_kwargs(num_processes=2, env={})
    with pytest.raises(ValueError, match="together"):
        _distributed_kwargs(process_id=0, env={})
    # BOTH rank fields without an address pass through (Cloud TPU
    # auto-detects the coordinator from TPU metadata)
    assert _distributed_kwargs(num_processes=2, process_id=0, env={}) == {
        "num_processes": 2, "process_id": 0}
    with pytest.raises(ValueError, match="must be an int"):
        _distributed_kwargs(env={"JAX_COORDINATOR_ADDRESS": "h:1",
                                 "JAX_NUM_PROCESSES": "four",
                                 "JAX_PROCESS_ID": "0"})
    with pytest.raises(ValueError, match="out of range"):
        _distributed_kwargs("h:1", 2, 5, env={})


def test_initialize_distributed_single_process_warns():
    """The unconfigured auto-detect path falls back to single-process with
    a warning (never silently); a configured path would raise instead."""
    import warnings as _w

    from gaussianprocesses_jl_tpu.parallel import mesh as mesh_mod

    saved = {k: os.environ.pop(k, None)
             for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                       "JAX_PROCESS_ID")}
    try:
        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            ok = mesh_mod.initialize_distributed()
        assert ok is False
        assert any("single-process" in str(r.message) for r in rec)
    finally:
        for k, v in saved.items():
            if v is not None:
                os.environ[k] = v


def test_sharded_hmc_segment_iters_bit_exact():
    """segment_iters only splits the scan into jitted segments; the draws
    must be bit-identical to the single-scan run (it bounds device
    execution length for runtimes that kill multi-minute executions)."""
    mesh = make_mesh({"chains": 8})
    mu = jnp.asarray([0.5, -1.0])

    def logp(th):
        return -0.5 * jnp.sum((th - mu) ** 2)

    theta0 = jnp.zeros((16, 2))
    kw = dict(n_iter=60, n_warmup=30, eps0=0.1, Lmin=3, Lmax=5)
    a = sharded_hmc(logp, theta0, jax.random.PRNGKey(9), mesh, **kw)
    b = sharded_hmc(logp, theta0, jax.random.PRNGKey(9), mesh,
                    segment_iters=25, **kw)
    assert np.array_equal(np.asarray(a.samples), np.asarray(b.samples))
    assert np.array_equal(np.asarray(a.final), np.asarray(b.final))
    assert float(a.eps_final) == float(b.eps_final)
