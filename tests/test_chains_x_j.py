"""Chains x j composition: sharded HMC over a DISTRIBUTED dense-GP target
on a 2-D ('chains', 'j') mesh (VERDICT r4 item 2 / BASELINE north star
"MCMC chains sharded over hosts ... distributed block-Cholesky for large
N"; transcends the reference's single sequential chain, src/mcmc.jl:42).

The inner covariance runs on the AMBIENT 'j' axis (parallel/dense.
AmbientFullCovariance -> ambient_* custom VJPs in parallel/cholesky.py):
sharded_hmc opens ONE shard_map over the full 2-D mesh with chain shards
split over 'chains' and the tile collectives resolving against 'j'
ambiently. Correctness: the same seed must reproduce the single-axis run
on the dense (FullCovariance) target — the distributed factorization
matches the dense one to f64 round-off, so trajectories coincide."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussianprocesses_jl_tpu as gp
from gaussianprocesses_jl_tpu.parallel.chains import sharded_hmc
from gaussianprocesses_jl_tpu.parallel.dense import AmbientFullCovariance
from gaussianprocesses_jl_tpu.parallel.mesh import make_mesh, make_pod_mesh

CHAINS = 4
N, D_IN, B = 32, 2, 4


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    X = rng.randn(N, D_IN)
    y = np.sin(X[:, 0]) + 0.3 * rng.randn(N)
    return jnp.asarray(X), jnp.asarray(y)


def _meshes():
    pod = make_pod_mesh({"j": 4})  # ('chains', 'j') = (2, 4)
    ref = make_mesh({"chains": 2}, devices=jax.devices()[:2])
    return pod, ref


def test_pod_mesh_shape():
    pod, _ = _meshes()
    assert pod.axis_names == ("chains", "j")
    assert pod.shape["chains"] == 2 and pod.shape["j"] == 4


def test_gpe_chains_x_j_matches_single_axis(data):
    X, y = data
    pod, ref = _meshes()

    acs = AmbientFullCovariance(axis="j", P_=4, B=B)
    m_amb = gp.GPE(X, y, kernel=gp.SE(0.0, 0.0), lognoise=-1.0,
                   covstrat=acs)
    m_ref = gp.GPE(X, y, kernel=gp.SE(0.0, 0.0), lognoise=-1.0)
    lp_amb, x0, _, _ = m_amb.make_logprob()
    lp_ref, x0r, _, _ = m_ref.make_logprob()
    assert np.allclose(np.asarray(x0), np.asarray(x0r))

    key = jax.random.PRNGKey(3)
    theta0 = x0[None, :] + 0.05 * jax.random.normal(
        key, (CHAINS, x0.shape[0]), dtype=x0.dtype)

    res_amb = sharded_hmc(lp_amb, theta0, key, pod, n_iter=15, n_warmup=5,
                          eps0=0.05)
    res_ref = sharded_hmc(lp_ref, theta0, key, ref, n_iter=15, n_warmup=5,
                          eps0=0.05)
    # identical seeds + f64-round-off-identical targets => identical draws
    assert np.allclose(np.asarray(res_amb.samples),
                       np.asarray(res_ref.samples), atol=1e-6)
    assert np.allclose(np.asarray(res_amb.final_target),
                       np.asarray(res_ref.final_target), rtol=1e-8)
    assert np.all(np.isfinite(np.asarray(res_amb.samples)))


def test_gpa_chains_x_j_matches_single_axis(data):
    """The GPA (whitened-latent) target composes too: the latent map
    f = L v differentiates through the ambient factorization (custom VJP
    ambient_unwhiten_build)."""
    X, y = data
    yb = (np.asarray(y) > 0).astype(float)
    pod, ref = _meshes()

    acs = AmbientFullCovariance(axis="j", P_=4, B=B)
    m_amb = gp.GPA(X, yb, gp.MeanZero(), gp.SE(0.0, 0.0), gp.BernLik(),
                   covstrat=acs)
    m_ref = gp.GPA(X, yb, gp.MeanZero(), gp.SE(0.0, 0.0), gp.BernLik())
    lp_amb, x0, _, _ = m_amb.make_logprob()
    lp_ref, _, _, _ = m_ref.make_logprob()

    key = jax.random.PRNGKey(7)
    theta0 = x0[None, :] + 0.05 * jax.random.normal(
        key, (CHAINS, x0.shape[0]), dtype=x0.dtype)

    res_amb = sharded_hmc(lp_amb, theta0, key, pod, n_iter=12, n_warmup=4,
                          eps0=0.05)
    res_ref = sharded_hmc(lp_ref, theta0, key, ref, n_iter=12, n_warmup=4,
                          eps0=0.05)
    assert np.allclose(np.asarray(res_amb.samples),
                       np.asarray(res_ref.samples), atol=1e-6)
    assert np.all(np.isfinite(np.asarray(res_amb.samples)))


def test_ambient_matches_dense_value_and_grad(data):
    """The full GPE/GPA target over AmbientFullCovariance, differentiated
    INSIDE the shard_map body (the supported calling convention — what
    sharded_hmc does), equals the dense target's value and gradient."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    X, y = data
    mesh = make_mesh({"j": 4}, devices=jax.devices()[:4])
    acs = AmbientFullCovariance(axis="j", P_=4, B=B)

    # GPE target over [lognoise; kern]
    m_amb = gp.GPE(X, y, kernel=gp.SE(0.0, 0.0), lognoise=-1.0,
                   covstrat=acs)
    m_ref = gp.GPE(X, y, kernel=gp.SE(0.0, 0.0), lognoise=-1.0)
    lp_amb, x0, _, _ = m_amb.make_logprob()
    lp_ref, _, _, _ = m_ref.make_logprob()
    th = x0 + 0.03

    fn = jax.jit(shard_map(
        lambda t: jax.value_and_grad(lp_amb)(t), mesh=mesh,
        in_specs=(P(),), out_specs=(P(), P()), check_vma=False))
    val, grad = fn(th)
    val_d, grad_d = jax.value_and_grad(lp_ref)(th)
    assert np.allclose(float(val), float(val_d), rtol=1e-12)
    assert np.allclose(np.asarray(grad), np.asarray(grad_d), rtol=1e-8)

    # GPA target over [v; kern] (whitened-latent map through the ambient
    # factorization)
    yb = (np.asarray(y) > 0).astype(float)
    g_amb = gp.GPA(X, yb, gp.MeanZero(), gp.SE(0.0, 0.0), gp.BernLik(),
                   covstrat=acs)
    g_ref = gp.GPA(X, yb, gp.MeanZero(), gp.SE(0.0, 0.0), gp.BernLik())
    lpg_amb, xg0, _, _ = g_amb.make_logprob()
    lpg_ref, _, _, _ = g_ref.make_logprob()
    thg = xg0 + 0.05

    fng = jax.jit(shard_map(
        lambda t: jax.value_and_grad(lpg_amb)(t), mesh=mesh,
        in_specs=(P(),), out_specs=(P(), P()), check_vma=False))
    valg, gradg = fng(thg)
    valg_d, gradg_d = jax.value_and_grad(lpg_ref)(thg)
    assert np.allclose(float(valg), float(valg_d), rtol=1e-10)
    assert np.allclose(np.asarray(gradg), np.asarray(gradg_d), rtol=1e-6,
                       atol=1e-10)
