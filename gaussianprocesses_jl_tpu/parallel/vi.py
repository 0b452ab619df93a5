"""Sharded variational inference (BASELINE north star: "VI particle
batches sharded over hosts"; scales ref src/vi.jl:50-81, which runs one
full-batch Fminbox loop on one process).

Two independent axes of scale, composable with the rest of parallel/:

  * `sharded_vi` — a VMAPPED MULTI-RESTART front end sharded over a mesh
    axis: R jittered initializations of the mean-field family optimize in
    parallel (Adam on [m; rho], lax.scan inside one jitted shard_map);
    the best restart by final ELBO wins. VI's objective is non-convex in
    general (non-log-concave likelihoods), so restarts buy robustness at
    zero wall cost on idle chips.

  * `sharded_elbo_fn` — an OBSERVATION-SHARDED ELBO: the per-observation
    terms (the Gauss-Hermite / closed-form variational expectations and
    the elementwise KL pieces) are computed on disjoint observation
    shards and psum-reduced over the axis; the coupled Gaussian terms
    (logdet K, the K^-1 quadratic form) stay replicated against the
    factor. Gradients flow through the shard_map boundary, which psums
    the per-shard contributions into the replicated [m; v] cotangent.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..inference.vi import Approx, make_neg_elbo, _prior_pieces

__all__ = ["sharded_vi", "ShardedVIResult", "sharded_elbo_fn",
           "sharded_elbo", "sharded_vi_train", "ShardedVITrainResult"]


@dataclass
class ShardedVIResult:
    approx: Approx  # best restart's Q = N(m, diag v)
    elbo: float  # its final ELBO
    elbos: jnp.ndarray  # (R,) final ELBO per restart
    best: int  # index of the winning restart


def sharded_vi(gp, mesh: Mesh, *, axis: str = "chains",
               restarts: int | None = None, nits: int = 200,
               lr: float = 0.05, jitter: float = 0.3,
               key=None) -> ShardedVIResult:
    """Multi-restart mean-field VI sharded over `mesh[axis]`.

    Restart 0 starts at the prior initialization (exactly vi()'s start);
    the rest jitter [m; rho] by `jitter` * N(0, I). Each restart runs
    `nits` Adam steps inside one jitted shard_map; returns the best
    restart by final ELBO. R must be divisible by the axis size.

    This scales the RESTART axis (each device optimizes the replicated
    full-batch objective for its own starts); to scale the OBSERVATION
    axis instead — every device computing only its shard of the
    per-observation work, forward and backward — use
    `sharded_vi_train`."""
    import optax

    neg_elbo, theta0, n = make_neg_elbo(gp)
    P_ = mesh.shape[axis]
    R = restarts if restarts is not None else P_
    if R % P_:
        raise ValueError(f"{R} restarts not divisible by {P_} devices")
    key = key if key is not None else jax.random.PRNGKey(0)

    keys = jax.random.split(key, R)
    noise = jax.vmap(
        lambda k: jax.random.normal(k, theta0.shape, theta0.dtype))(keys)
    scale = jnp.asarray([0.0] + [jitter] * (R - 1),
                        theta0.dtype)[:, None]
    starts = theta0[None, :] + scale * noise  # (R, 2n)

    opt = optax.adam(lr)

    def run_one(theta):
        state = opt.init(theta)

        def step(carry, _):
            th, st = carry
            val, g = jax.value_and_grad(neg_elbo)(th)
            updates, st = opt.update(g, st, th)
            return (optax.apply_updates(th, updates), st), val

        (theta, _), _ = jax.lax.scan(step, (theta, state), None,
                                     length=nits)
        return theta, -neg_elbo(theta)

    def local_run(starts_loc):
        return jax.vmap(run_one)(starts_loc)

    fn = jax.jit(shard_map(
        local_run, mesh=mesh, in_specs=(P(axis),),
        out_specs=(P(axis), P(axis)), check_vma=False))
    thetas, elbos = fn(starts)

    best = int(jnp.argmax(elbos))
    th = thetas[best]
    approx = Approx(m=th[:n], v=jnp.exp(2.0 * th[n:]))
    return ShardedVIResult(approx=approx, elbo=float(elbos[best]),
                           elbos=elbos, best=best)


def _make_sharded_elbo(gp, mesh: Mesh, axis: str = "data"):
    """Unjitted observation-sharded `elbo(m, v)` (see sharded_elbo_fn);
    composable inside larger jitted programs (sharded_vi_train's Adam
    scan wraps it)."""
    pd, mu, diag_Kinv = _prior_pieces(gp)
    y, lik = gp.y, gp.params.lik
    n = mu.shape[0]
    P_ = mesh.shape[axis]
    if n % P_:
        raise ValueError(
            f"n={n} observations not divisible by {P_} devices on "
            f"axis {axis!r}; pad the data or pick a dividing axis size")
    k = n // P_

    def local(m, v, y_loc, dki_loc):
        i = jax.lax.axis_index(axis)
        m_loc = jax.lax.dynamic_slice(m, (i * k,), (k,))
        v_loc = jax.lax.dynamic_slice(v, (i * k,), (k,))
        ve = lik.var_exp(y_loc, m_loc, v_loc)
        kl_loc = jnp.sum(jnp.log(v_loc)) - jnp.dot(v_loc, dki_loc)
        return jax.lax.psum(ve + 0.5 * kl_loc, axis)

    sharded_part = shard_map(
        local, mesh=mesh, in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=P(), check_vma=False)

    def elbo_fn(m, v):
        r = m - mu
        coupled = 0.5 * (-pd.logdet() - pd.quad(r) + n)
        return coupled + sharded_part(m, v, y, diag_Kinv)

    return elbo_fn, mu, n


def sharded_elbo_fn(gp, mesh: Mesh, axis: str = "data"):
    """Build a jitted observation-sharded `elbo(m, v)` for `gp` at its
    current hyperparameters.

    The per-observation pieces — lik.var_exp on the local shard of
    (y, m, v), sum log v, and v . diag(K^-1) — run on disjoint
    observation shards and psum over `axis`; the coupled pieces
    (logdet K and the K^-1 quadratic form in m - mu) are evaluated
    replicated against the precomputed factor. Equals
    inference.vi.elbo(gp, m, v) to reduction-order round-off, for
    values AND gradients (the shard_map transpose psums the per-shard
    cotangent contributions back into the replicated (m, v) cotangent —
    pinned by tests/test_parallel_vi.py). Requires
    n % mesh.shape[axis] == 0."""
    return jax.jit(_make_sharded_elbo(gp, mesh, axis)[0])


def sharded_elbo(gp, m, v, mesh: Mesh, axis: str = "data"):
    """Observation-sharded ELBO value (see sharded_elbo_fn)."""
    return sharded_elbo_fn(gp, mesh, axis)(jnp.asarray(m), jnp.asarray(v))


@dataclass
class ShardedVITrainResult:
    approx: Approx  # fitted Q = N(m, diag v)
    elbo: float  # final ELBO (sharded objective)
    elbo_trace: jnp.ndarray  # (nits,) ELBO per Adam step


def sharded_vi_train(gp, mesh: Mesh, *, axis: str = "data",
                     nits: int = 200, lr: float = 0.05,
                     theta0=None) -> ShardedVITrainResult:
    """Fit mean-field VI by running Adam ON the observation-sharded ELBO
    (BASELINE north star "VI particle batches sharded over hosts"; the
    training-loop counterpart of ref src/vi.jl:50-81's full-batch Fminbox
    loop, with the per-observation work distributed over `mesh[axis]`).

    Each step evaluates the sharded objective and differentiates through
    the shard_map boundary: the per-shard var_exp / elementwise-KL
    cotangents psum back into the replicated [m; rho] cotangent, so every
    device computes only its observation shard's forward AND backward
    work. The whole nits-step loop is one jitted lax.scan. Starting from
    the same initialization, the result matches the replicated
    vi(method='adam') to reduction-order round-off (tested).

    theta0: optional (2n,) start [m; rho]; defaults to the prior
    initialization (m = mu, v = diag K) as in vi()."""
    import optax

    elbo_fn, mu, n = _make_sharded_elbo(gp, mesh, axis)
    if theta0 is None:
        v0 = jnp.maximum(gp.params.kernel.diag(gp.x), 1e-8)
        theta0 = jnp.concatenate([mu, 0.5 * jnp.log(v0)])
    else:
        theta0 = jnp.asarray(theta0)

    def neg(theta):
        return -elbo_fn(theta[:n], jnp.exp(2.0 * theta[n:]))

    opt = optax.adam(lr)

    @jax.jit
    def run(theta):
        def step(carry, _):
            th, st = carry
            val, g = jax.value_and_grad(neg)(th)
            updates, st = opt.update(g, st, th)
            return (optax.apply_updates(th, updates), st), -val

        (theta, _), trace = jax.lax.scan(step, (theta, opt.init(theta)),
                                         None, length=nits)
        return theta, trace

    theta, trace = run(theta0)
    m = theta[:n]
    v = jnp.exp(2.0 * theta[n:])
    return ShardedVITrainResult(
        approx=Approx(m=m, v=v),
        elbo=float(elbo_fn(m, v)),
        elbo_trace=trace,
    )
