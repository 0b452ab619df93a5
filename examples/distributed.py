"""Distributed inference — the TPU-native layer the reference lacks
(SURVEY §2.9): this example runs every `parallel/` entry point on a
device mesh and is runnable anywhere via JAX's virtual CPU devices
(it forces an 8-device CPU backend when only one real device is
present, the same pattern as tests/conftest.py).

  1. Exact GP whose gram matrix is tile-column-sharded over the mesh:
     `DistributedFullCovariance` — build, factorize (block Cholesky with
     ring-ppermute K^-1 gradients), optimize, predict. K never exists
     on one device.
  2. Chain-sharded HMC with collective dual-averaging step size and
     psum'd diagonal mass-matrix adaptation (`sharded_hmc`), plus
     cross-chain split-R-hat / ESS diagnostics.
  3. Observation-sharded FITC marginal likelihood + gradient
     (`fitc_mll_sharded_fn`): each device holds n/P observations and the
     low-rank algebra reduces with augmented TSQR + psum.
  4. Non-Gaussian GPA on the SAME sharded dense covariance: the whitened
     latent map f = L v differentiates THROUGH the distributed
     factorization (custom VJP — parallel/cholesky.py
     distributed_unwhiten_build), so HMC over [v; hypers] composes
     observation sharding with sampling.

On a real pod the only change is the mesh: build it from
`jax.devices()` after `initialize_distributed()` (parallel/mesh.py).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# force a virtual 8-device CPU mesh when running on a single-device host
# (must happen before anything initializes the JAX backend — even
# jax.default_backend() would lock in a 1-device CPU client)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

if os.environ["JAX_PLATFORMS"].lower() == "cpu":
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    except RuntimeError:
        pass  # backend already initialized (e.g. under pytest) — use as-is

import jax.numpy as jnp

import gaussianprocesses_jl_tpu as gp
from gaussianprocesses_jl_tpu.inference.diagnostics import (
    effective_sample_size,
    split_rhat,
)
from gaussianprocesses_jl_tpu.parallel.chains import sharded_hmc
from gaussianprocesses_jl_tpu.parallel.fitc import (
    fitc_mll_sharded_fn,
    shard_data,
)
from gaussianprocesses_jl_tpu.parallel.mesh import make_mesh


def distributed_dense():
    """Exact GPE on a gram matrix sharded over the 'j' tile-column axis."""
    P = len(jax.devices())
    n, d = 64 * P, 3
    rng = np.random.RandomState(0)
    X = rng.randn(n, d)
    y = np.sin(X[:, 0]) + 0.5 * np.cos(X[:, 1]) + 0.1 * rng.randn(n)

    mesh = make_mesh({"j": P})
    m = gp.GPE(X, y, kernel=gp.SE(0.0, 0.0), lognoise=-1.0,
               covstrat=gp.DistributedFullCovariance(mesh=mesh))
    mll0 = float(m.mll)
    m.optimize(maxiter=20)
    Xs = rng.randn(16, d)
    mu, var = m.predict_f(Xs)
    print(f"[dense/{P}-mesh] n={n}: mll {mll0:.2f} -> {float(m.mll):.2f}, "
          f"pred var range [{float(jnp.min(var)):.4f}, "
          f"{float(jnp.max(var)):.4f}]")


def sharded_chains():
    """HMC chains sharded over the 'chains' axis with collective
    (psum) step-size + mass-matrix warmup adaptation."""
    P = len(jax.devices())
    rng = np.random.RandomState(1)
    x = rng.randn(32, 2)
    y = np.sin(x[:, 0]) + 0.1 * rng.randn(32)
    m = gp.GPE(x, y, kernel=gp.SE(0.0, 0.0), lognoise=-1.0)
    logprob, x0, _, _ = m.make_logprob()

    C = 2 * P  # chains (2 per device)
    mesh = make_mesh({"chains": P})
    theta0 = jnp.tile(x0[None, :], (C, 1)) + 0.1 * jax.random.normal(
        jax.random.PRNGKey(2), (C, x0.shape[0]), dtype=x0.dtype)
    res = sharded_hmc(logprob, theta0, jax.random.PRNGKey(3), mesh,
                      n_iter=300, n_warmup=100, eps0=0.1, Lmin=4, Lmax=8)
    ess = np.asarray(effective_sample_size(res.samples))
    rhat = np.asarray(split_rhat(res.samples))
    print(f"[chains/{P}-mesh] {C} chains x 300 iters: "
          f"accept={float(np.mean(np.asarray(res.accept_rate))):.2f}, "
          f"eps*={float(res.eps_final):.3f}, "
          f"min ESS={ess.min():.0f}, max split-Rhat={rhat.max():.3f}")


def sharded_fitc():
    """FITC marginal likelihood with the observation axis sharded."""
    P = len(jax.devices())
    n, m_ind = 256 * P, 16
    rng = np.random.RandomState(4)
    X = 2 * np.pi * rng.rand(n, 1)
    y = np.sin(X[:, 0]) + 0.3 * rng.randn(n)
    Xu = np.linspace(0, 2 * np.pi, m_ind)

    fitc = gp.FITC(X, Xu, y, kernel=gp.SE(0.0, 0.0), lognoise=-0.5)
    mesh = make_mesh({"data": P})
    mll_fn = fitc_mll_sharded_fn(fitc.params.kernel, mesh)
    Xs, ys = shard_data(jnp.asarray(X), jnp.asarray(y), mesh)
    Xu_j = fitc.covstrat.inducing

    val, grads = jax.value_and_grad(
        lambda p: mll_fn(p, Xs, ys, Xu_j))(fitc.params)
    gnorm = float(jnp.linalg.norm(grads.flat_params()))
    print(f"[fitc/{P}-mesh] n={n} sharded over {P} devices: "
          f"mll={float(val):.2f} (replicated check: "
          f"{float(fitc.mll):.2f}), |grad|={gnorm:.2f}")


def distributed_gpa():
    """Bernoulli-likelihood GPA whose dense covariance is tile-column
    sharded: target gradients flow through the distributed Cholesky."""
    P = len(jax.devices())
    n, d = 16 * P, 2
    rng = np.random.RandomState(5)
    X = rng.randn(n, d)
    y = (np.sin(X[:, 0]) + 0.3 * rng.randn(n) > 0).astype(float)
    mesh = make_mesh({"j": P})
    m = gp.GPA(X, y, gp.MeanZero(), gp.Matern(1.5, 0.0, 0.0),
               gp.BernLik(),
               covstrat=gp.DistributedFullCovariance(mesh=mesh))
    t, g = m.target_and_dtarget()
    from gaussianprocesses_jl_tpu.inference.hmc import hmc

    logprob, x0, _, _ = m.make_logprob()
    res = hmc(logprob, x0, jax.random.PRNGKey(6), n_iter=50, eps=0.02)
    print(f"[gpa/{P}-mesh] n={n}: target={float(t):.2f}, "
          f"|dtarget|={float(jnp.linalg.norm(g)):.2f}, "
          f"50 HMC iters accept={float(res.accept_rate):.2f}")


def chains_x_j():
    """The 2-D composition: sharded HMC OVER the distributed dense
    target on a ('chains', 'j') pod mesh — chain groups on the outer
    (DCN) axis, each factorizing its tile-columns on the inner (ICI)
    axis via the ambient-axis covariance strategy."""
    from gaussianprocesses_jl_tpu.parallel.dense import (
        AmbientFullCovariance,
    )
    from gaussianprocesses_jl_tpu.parallel.mesh import make_pod_mesh

    n_dev = len(jax.devices())
    if n_dev < 2:
        print("[chains x j] skipped (needs >= 2 devices)")
        return
    pj = min(4, n_dev)
    pod = make_pod_mesh({"j": pj})
    n = 8 * pj
    rng = np.random.RandomState(7)
    X = rng.randn(n, 2)
    y = np.sin(X[:, 0]) + 0.3 * rng.randn(n)
    m = gp.GPE(X, y, kernel=gp.SE(0.0, 0.0), lognoise=-1.0,
               covstrat=AmbientFullCovariance(axis="j", P_=pj, B=4))
    logprob, x0, _, _ = m.make_logprob()
    C = 2 * pod.shape["chains"]
    th = jnp.tile(x0[None, :], (C, 1))
    res = sharded_hmc(logprob, th, jax.random.PRNGKey(8), pod,
                      n_iter=30, n_warmup=10, eps0=0.05)
    print(f"[chains x j/{pod.shape}] {C} chains over a distributed "
          f"dense GP: accept={float(jnp.mean(res.accept_rate)):.2f}, "
          f"eps*={float(res.eps_final):.4f}")


def sharded_split():
    """Chain-sharded factor-cached split sampler with collective
    per-block adaptation (the 10x GPA sampler at mesh scale)."""
    from gaussianprocesses_jl_tpu.parallel.chains import sharded_split_hmc

    P = len(jax.devices())
    rng = np.random.RandomState(9)
    n, d = 24, 2
    X = rng.randn(n, d)
    y = (np.sin(X[:, 0]) + 0.3 * rng.randn(n) > 0).astype(float)
    m = gp.GPA(X, y, gp.MeanZero(), gp.SE(0.0, 0.0), gp.BernLik())
    pc, la, lb, a0, b0 = m.make_split_logprob()
    mesh = make_mesh({"chains": P})
    C = 2 * P
    th = jnp.tile(jnp.concatenate([a0, b0])[None, :], (C, 1))
    res = sharded_split_hmc(pc, la, lb, th, jax.random.PRNGKey(10), mesh,
                            a0.shape[0], n_iter=40, a_iters=4,
                            n_warmup=20, eps_a0=0.3, eps_b0=0.1)
    print(f"[split/{P}-mesh] {C} chains: accept_a="
          f"{float(jnp.mean(res.accept_rate_a)):.2f}, accept_b="
          f"{float(jnp.mean(res.accept_rate_b)):.2f}, adapted eps=("
          f"{float(res.eps_a_final):.3f}, {float(res.eps_b_final):.3f})")


def main():
    print(f"devices: {len(jax.devices())} x {jax.default_backend()}")
    distributed_dense()
    sharded_chains()
    sharded_fitc()
    distributed_gpa()
    chains_x_j()
    sharded_split()


if __name__ == "__main__":
    main()
