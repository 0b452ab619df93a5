"""Hamiltonian Monte Carlo (ref: mcmc in src/mcmc.jl:7-84).

Reference semantics preserved:
  * vanilla HMC with randomized path length L ~ U{Lmin..Lmax} and fixed
    step size eps (defaults eps=0.1, L in [5,15], nIter=1000);
  * proposals whose target/gradient is non-finite (the reference's
    PosDefException / ArgumentError catch, src/mcmc.jl:19-29) are rejected
    outright, keeping the current state;
  * the sample matrix includes the current state at every iteration
    (the first reference iteration overwrites its seeded post[1,:]).

TPU-first re-design:
  * the whole chain is one `lax.scan`; the leapfrog loop is a fixed-length
    scan of Lmax steps with per-step masking for the randomized L (dynamic
    trip counts don't exist under jit/vmap — SURVEY §7 "hard parts");
  * the sampler is a *pure function* of (logprob_fn, theta0, key), so
    chains vectorize with `vmap` and shard over a device mesh with
    `shard_map` (see parallel/).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["hmc", "HMCResult"]


@dataclass
class HMCResult:
    samples: jnp.ndarray  # (n_iter, D)
    accept_rate: jnp.ndarray  # ()
    final: jnp.ndarray  # (D,)
    final_target: jnp.ndarray  # ()


jax.tree_util.register_dataclass(
    HMCResult,
    data_fields=["samples", "accept_rate", "final", "final_target"],
    meta_fields=[],
)


def _finite(x):
    return jnp.all(jnp.isfinite(x))


def hmc_iteration(vg: Callable, theta, tgt, grad, key, eps, Lmin: int,
                  Lmax: int, minv=None):
    """One HMC transition (the body of the reference's iteration loop,
    src/mcmc.jl:42-76) as a pure reusable function.

    `minv` is the diagonal inverse mass matrix M^-1 (the estimated
    posterior variances; None = identity, the reference's only option):
    momenta are drawn nu ~ N(0, M), positions move by eps * M^-1 * nu,
    and the kinetic energy is nu^T M^-1 nu / 2.

    Returns (theta', tgt', grad', accept_prob, accepted). Fixed-length
    Lmax leapfrog with masking for the randomized L. Non-finite targets:
    the trajectory *glides* through points whose target/gradient is
    non-finite (force treated as 0 there — a pure function of position, so
    the integrator stays reversible and volume-preserving) and the MH test
    uses the true target at the endpoint, so a proposal ending in a -inf
    region still rejects outright (ref src/mcmc.jl:19-29 semantics).
    Freezing the trajectory at the first -inf point instead (the previous
    behavior) permanently traps chains whose start is -inf once the
    adapted step size shrinks — recovery then needs a single-step exit.
    Only non-finite *positions* (overflowed momenta) freeze + reject.

    DELIBERATE deviation from reference semantics: the reference rejects
    any trajectory that *touches* a non-finite point mid-path (its
    PosDefException catch, ref src/mcmc.jl:19-29), while the glide
    integrator can traverse a -inf barrier and accept a finite proposal on
    the far side. Both samplers are statistically exact (the MH test uses
    true endpoint targets); this one can tunnel across forbidden regions
    the reference never crosses, which changes mixing behavior — not the
    stationary distribution."""
    D = theta.shape[0]
    eps = jnp.asarray(eps, dtype=theta.dtype)
    minv = (jnp.ones((D,), theta.dtype) if minv is None
            else jnp.asarray(minv, theta.dtype))
    k_mom, k_len, k_mh = jax.random.split(key, 3)
    nu0 = jax.random.normal(k_mom, (D,), dtype=theta.dtype) / jnp.sqrt(minv)
    L = jax.random.randint(k_len, (), Lmin, Lmax + 1)

    def leap_step(carry, l):
        th, nu, g, t, bad = carry
        active = jnp.logical_and(l < L, jnp.logical_not(bad))
        th_n = th + eps * minv * nu
        t_n, g_n = vg(th_n)
        # force field: the gradient where finite, 0 elsewhere (glide)
        g_eff = jnp.where(jnp.isfinite(g_n), g_n, 0.0)
        bad_n = jnp.where(active, jnp.logical_not(_finite(th_n)), bad)
        use = active & _finite(th_n)
        th = jnp.where(use, th_n, th)
        g = jnp.where(use, g_eff, g)
        # t tracks the TRUE target at the current position (may be -inf /
        # NaN mid-path; the MH test below only sees the endpoint value)
        t = jnp.where(use, t_n, t)
        nu = jnp.where(use, nu + eps * g_eff, nu)
        return (th, nu, g, t, bad_n), None

    nu = nu0 + 0.5 * eps * grad
    # derive the initial reject flag from the state (rather than a literal
    # False) so its vma type matches under shard_map's varying-axis checks
    bad0 = jnp.isnan(jnp.sum(theta))
    (th, nu, g, t, bad), _ = jax.lax.scan(
        leap_step, (theta, nu, grad, tgt, bad0), jnp.arange(Lmax))
    nu = nu - 0.5 * eps * g

    kin = 0.5 * jnp.dot(nu * minv, nu)
    kin0 = 0.5 * jnp.dot(nu0 * minv, nu0)
    log_alpha = t - kin - tgt + kin0
    # an endpoint with non-finite target must never be accepted, and a
    # NaN log_alpha (e.g. -inf - -inf) must not poison the accept-prob
    # statistic that drives collective step-size adaptation
    ok_end = jnp.isfinite(t) & jnp.logical_not(bad)
    accept_prob = jnp.where(ok_end, jnp.exp(jnp.minimum(log_alpha, 0.0)),
                            0.0)
    accept_prob = jnp.where(jnp.isnan(accept_prob), 0.0, accept_prob)
    u = jnp.log(jax.random.uniform(k_mh, (), dtype=theta.dtype))
    accepted = (u < log_alpha) & ok_end
    theta = jnp.where(accepted, th, theta)
    tgt = jnp.where(accepted, t, tgt)
    grad = jnp.where(accepted, g, grad)
    return theta, tgt, grad, accept_prob, accepted


@partial(jax.jit, static_argnames=("logprob_fn", "n_iter", "Lmin", "Lmax"))
def hmc(logprob_fn: Callable, theta0, key, n_iter: int = 1000,
        eps: float = 0.1, Lmin: int = 5, Lmax: int = 15,
        minv=None) -> HMCResult:
    """Run one HMC chain on `logprob_fn` starting at theta0.

    logprob_fn: (D,) -> scalar log target (may be -inf / NaN on bad regions).
    minv: optional diagonal inverse mass matrix (see hmc_iteration).
    Returns all n_iter states (burn/thin are post-hoc slicing, as in the
    reference).
    """
    theta0 = jnp.asarray(theta0)
    vg = jax.value_and_grad(logprob_fn)
    eps = jnp.asarray(eps, dtype=theta0.dtype)

    t0, g0 = vg(theta0)
    # a non-finite starting gradient (e.g. a -inf start from a failed f32
    # Cholesky) would freeze the chain; zero it so finite proposals can be
    # reached and accepted (any finite target beats -inf)
    g0 = jnp.where(jnp.isfinite(g0), g0, 0.0)

    def one_iter(carry, key):
        theta_cur, tgt_cur, grad_cur, acc = carry
        theta_cur, tgt_cur, grad_cur, _, accepted = hmc_iteration(
            vg, theta_cur, tgt_cur, grad_cur, key, eps, Lmin, Lmax,
            minv=minv)
        acc = acc + accepted
        return (theta_cur, tgt_cur, grad_cur, acc), theta_cur

    keys = jax.random.split(key, n_iter)
    (theta_f, tgt_f, _, acc), samples = jax.lax.scan(
        one_iter, (theta0, t0, g0, jnp.zeros((), dtype=jnp.int32)), keys
    )
    return HMCResult(
        samples=samples,
        accept_rate=acc / n_iter,
        final=theta_f,
        final_target=tgt_f,
    )
