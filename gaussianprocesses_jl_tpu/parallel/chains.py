"""Chain-parallel MCMC over a device mesh (BASELINE north star / config #5:
"1024 chains sharded over a pod slice with collective adaptation").

The reference runs one sequential chain (ref src/mcmc.jl:42). Here:
  * chains vectorize per-device with `vmap`,
  * devices hold disjoint chain shards under `shard_map` over the 'chains'
    mesh axis,
  * step-size adaptation is *collective*: every iteration the mean
    Metropolis acceptance probability is `psum`-reduced across all chains
    on all devices, and a shared dual-averaging update (Hoffman & Gelman
    2014, Alg. 5) moves a single step size for the whole fleet. This is
    the psum-of-accept-stats pattern from SURVEY §2.9/§5.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..inference.hmc import hmc_iteration

__all__ = ["sharded_hmc", "ShardedHMCResult"]


@dataclass
class ShardedHMCResult:
    samples: jnp.ndarray  # (C, n_keep, D)
    accept_rate: jnp.ndarray  # (C,)
    eps_final: jnp.ndarray  # ()
    final: jnp.ndarray  # (C, D)
    final_target: jnp.ndarray  # (C,)


jax.tree_util.register_dataclass(
    ShardedHMCResult,
    data_fields=["samples", "accept_rate", "eps_final", "final",
                 "final_target"],
    meta_fields=[],
)


def sharded_hmc(logprob_fn, theta0, key, mesh: Mesh, *, axis: str = "chains",
                n_iter: int = 1000, n_warmup: int = 0, eps0: float = 0.1,
                Lmin: int = 5, Lmax: int = 15, target_accept: float = 0.8,
                thin: int = 1) -> ShardedHMCResult:
    """Run C chains of HMC sharded over `mesh` axis `axis`.

    theta0: (C, D) initial states, C divisible by the axis size.
    During the first `n_warmup` iterations the step size adapts by
    collective dual averaging; afterwards it is frozen at the averaged
    value. Warmup draws are discarded. Keeps every `thin`-th draw."""
    C, D = theta0.shape
    n_dev = mesh.shape[axis]
    if C % n_dev:
        raise ValueError(f"{C} chains not divisible by {n_dev} devices")
    total = n_warmup + n_iter
    n_keep = n_iter // thin
    vg = jax.value_and_grad(logprob_fn)

    mu = jnp.log(10.0 * eps0)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def local_run(theta_loc, keys_loc):
        # theta_loc: (c, D); keys_loc: (c,) base keys per local chain
        c = theta_loc.shape[0]
        t_init, g_init = jax.vmap(vg)(theta_loc)
        g_init = jnp.where(jnp.isfinite(g_init), g_init, 0.0)

        def one_iter(carry, it):
            theta, tgt, grad, keys, acc, eps, log_eps_bar, hbar = carry
            keys = jax.vmap(jax.random.fold_in)(keys, jnp.full((c,), it))
            step = jax.vmap(
                lambda th, t, g, k: hmc_iteration(vg, th, t, g, k, eps,
                                                  Lmin, Lmax)
            )
            theta, tgt, grad, aprob, accepted = step(theta, tgt, grad, keys)

            # collective mean acceptance across every chain on every device
            global_asum = jax.lax.psum(jnp.sum(aprob), axis)
            global_c = jax.lax.psum(jnp.asarray(c, aprob.dtype), axis)
            a_mean = global_asum / global_c

            # dual averaging (shared step size)
            in_warmup = it < n_warmup
            t_adapt = jnp.asarray(it + 1, theta.dtype)
            hbar_n = ((1.0 - 1.0 / (t_adapt + t0)) * hbar
                      + (target_accept - a_mean) / (t_adapt + t0))
            log_eps = mu - jnp.sqrt(t_adapt) / gamma * hbar_n
            w = t_adapt ** (-kappa)
            log_eps_bar_n = w * log_eps + (1.0 - w) * log_eps_bar
            hbar = jnp.where(in_warmup, hbar_n, hbar)
            log_eps_bar = jnp.where(in_warmup, log_eps_bar_n, log_eps_bar)
            eps = jnp.where(in_warmup, jnp.exp(log_eps),
                            jnp.exp(log_eps_bar))

            acc = acc + jnp.where(it >= n_warmup, accepted.astype(acc.dtype),
                                  0.0)
            return ((theta, tgt, grad, keys, acc, eps, log_eps_bar, hbar),
                    theta)

        init = (theta_loc, t_init, g_init, keys_loc,
                theta_loc[:, 0] * 0.0,  # per-chain accept counter (varying)
                jnp.asarray(eps0, theta_loc.dtype),
                jnp.asarray(jnp.log(eps0), theta_loc.dtype),
                jnp.zeros((), theta_loc.dtype))
        (theta, tgt, _, _, acc, eps, _, _), samples = jax.lax.scan(
            one_iter, init, jnp.arange(total))
        # samples: (total, c, D) -> keep post-warmup, thinned
        kept = samples[n_warmup:][::thin]
        kept = jnp.moveaxis(kept, 0, 1)  # (c, n_keep, D)
        return kept, acc / n_iter, eps, theta, tgt

    keys = jax.random.split(key, C)
    fn = shard_map(
        local_run, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(), P(axis), P(axis)),
        check_vma=False,
    )
    kept, acc, eps, theta_f, tgt_f = jax.jit(fn)(theta0, keys)
    return ShardedHMCResult(samples=kept, accept_rate=acc, eps_final=eps,
                            final=theta_f, final_target=tgt_f)
