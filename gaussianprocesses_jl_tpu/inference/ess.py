"""Elliptical slice sampling (ref: ess in src/mcmc.jl:121-184; Murray,
Adams & MacKay 2010).

Reference semantics preserved: hyperparameters only, all priors must be
Normal (forming the joint MvNormal ellipse — ref get_joint_priors,
src/mcmc.jl:87-109); the likelihood is the marginal log likelihood (mll,
*without* the prior term); non-finite mll counts as -inf.

TPU-first: the angle-bracket shrinkage loop (ref src/mcmc.jl:145-165) is a
`lax.while_loop`, which vmaps across chains with automatic masking of
finished lanes. A safety cap bounds the trip count so a pathological f32
landscape cannot hang a pod (ESS provably terminates in exact arithmetic,
so the cap is virtually never hit)."""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["ess", "ESSResult"]

_MAX_SHRINK = 200


@dataclass
class ESSResult:
    samples: jnp.ndarray  # (n_iter, D)
    mean_proposals: jnp.ndarray  # () average shrinkage proposals per iter
    final: jnp.ndarray  # (D,)
    final_loglik: jnp.ndarray  # () mll at the final state (chain selection)


jax.tree_util.register_dataclass(
    ESSResult,
    data_fields=["samples", "mean_proposals", "final", "final_loglik"],
    meta_fields=[],
)


@partial(jax.jit, static_argnames=("loglik_fn", "n_iter"))
def ess(loglik_fn: Callable, theta0, prior_mu, prior_sigma, key,
        n_iter: int = 1000) -> ESSResult:
    """One ESS chain over `loglik_fn` with independent Normal priors
    N(prior_mu, prior_sigma^2) per coordinate."""
    theta0 = jnp.asarray(theta0)
    prior_mu = jnp.asarray(prior_mu, dtype=theta0.dtype)
    prior_sigma = jnp.asarray(prior_sigma, dtype=theta0.dtype)
    D = theta0.shape[0]

    def safe_ll(th):
        ll = loglik_fn(th)
        return jnp.where(jnp.isfinite(ll), ll, -jnp.inf)

    def one_iter(f, key):
        k_nu, k_u, k_theta, k_shrink = jax.random.split(key, 4)
        nu = prior_sigma * jax.random.normal(k_nu, (D,), dtype=f.dtype)
        logy = safe_ll(f) + jnp.log(
            jax.random.uniform(k_u, (), dtype=f.dtype))
        theta = jax.random.uniform(
            k_theta, (), dtype=f.dtype, minval=0.0, maxval=2.0 * jnp.pi)
        tmin, tmax = theta - 2.0 * jnp.pi, theta

        def propose(theta):
            return (f - prior_mu) * jnp.cos(theta) + nu * jnp.sin(theta) \
                + prior_mu

        fp = propose(theta)
        llp = safe_ll(fp)

        def cond(state):
            theta, tmin, tmax, fp, llp, k, it = state
            return jnp.logical_and(llp <= logy, it < _MAX_SHRINK)

        def body(state):
            theta, tmin, tmax, fp, llp, k, it = state
            tmin = jnp.where(theta < 0, theta, tmin)
            tmax = jnp.where(theta < 0, tmax, theta)
            k, ku = jax.random.split(k)
            theta = jax.random.uniform(
                ku, (), dtype=f.dtype) * (tmax - tmin) + tmin
            fp = propose(theta)
            return (theta, tmin, tmax, fp, safe_ll(fp), k, it + 1)

        theta, tmin, tmax, fp, llp, _, it = jax.lax.while_loop(
            cond, body, (theta, tmin, tmax, fp, llp, k_shrink,
                         jnp.zeros((), jnp.int32)))
        # if the cap was hit (numerically stuck), keep the current state
        fp = jnp.where(it >= _MAX_SHRINK, f, fp)
        return fp, (fp, it + 1)

    keys = jax.random.split(key, n_iter)
    final, (samples, props) = jax.lax.scan(one_iter, theta0, keys)
    return ESSResult(
        samples=samples,
        mean_proposals=jnp.mean(props.astype(jnp.float32)),
        final=final,
        final_loglik=safe_ll(final),
    )
