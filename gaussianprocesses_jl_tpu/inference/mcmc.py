"""User-facing MCMC drivers: `mcmc` (HMC) and `ess` (elliptical slice),
matching the reference's entry points (ref: src/mcmc.jl).

API differences vs. the reference (documented, deliberate):
  * an explicit PRNG key replaces global RNG state;
  * samples are returned as (n_kept, D) (row per draw) instead of the
    Julia (D, n) transpose;
  * `burn` is 0-based (number of dropped leading draws);
  * `chains=k` vmaps k independent chains in one jitted program — the
    single-chip form of the chain parallelism that parallel/ shards over a
    device mesh.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..utils.priors import Normal
from .ess import ess as _ess_kernel
from .hmc import hmc as _hmc_kernel

__all__ = ["mcmc", "ess", "MCMCResult"]


@dataclass
class MCMCResult:
    samples: jnp.ndarray  # (n_kept, D) or (chains, n_kept, D)
    accept_rate: float | jnp.ndarray | None  # HMC only; None for ess()
    final: jnp.ndarray
    # ess() diagnostic: mean shrinkage proposals per iteration (ESS has no
    # Metropolis accept step — every iteration accepts after shrinking)
    mean_proposals: float | jnp.ndarray | None = None

    @property
    def posterior(self):
        """Julia-style (D, n) layout (ref returns post')."""
        return jnp.swapaxes(self.samples, -1, -2)


def _flags_for(gp, kwargs):
    names = gp.block_flag_names()
    return {n: bool(kwargs.pop(n, True)) for n in names}


def mcmc(gp, key=None, n_iter: int = 1000, burn: int = 0, thin: int = 1,
         eps: float = 0.1, Lmin: int = 5, Lmax: int = 15,
         chains: int | None = None, verbose: bool = True,
         sampler: str = "joint", a_iters: int = 8,
         eps_a: float | None = None, eps_b: float | None = None,
         n_warmup: int = 0, **flag_kwargs) -> MCMCResult:
    """HMC over the model's sampled parameter vector (ref mcmc,
    src/mcmc.jl:7-84): GPE -> [logNoise; mean; kernel], GPA ->
    [v; lik; mean; kernel]. Block flags (noise/lik/domean/kern) select
    hyperparameter blocks as in the reference.

    sampler="split" (GPA only): factor-cached Metropolis-within-Gibbs
    (inference/split.py) — `a_iters` updates of [v; lik; mean] against
    the cached Cholesky factor per kernel-block update, with per-block
    step sizes eps_a (default eps) / eps_b (default eps), optionally
    adapted by per-block dual averaging over `n_warmup` ADDITIONAL
    warmup outer iterations (n_warmup + n_iter run in total). ~10x the
    joint sampler's ESS/sec on classification-sized problems (see
    perf/README.md §5b). All parameter blocks are sampled (block flags
    are not supported with the split sampler). Draws are recorded per
    A-update, so `n_iter` outer iterations yield n_iter * a_iters rows;
    warmup draws are already excluded (split_hmc returns them
    separately), so `burn` only needs to cover post-warmup
    equilibration."""
    key = key if key is not None else jax.random.PRNGKey(0)
    if sampler == "split":
        return _mcmc_split(gp, key, n_iter=n_iter, burn=burn, thin=thin,
                           a_iters=a_iters,
                           eps_a=eps if eps_a is None else eps_a,
                           eps_b=eps if eps_b is None else eps_b,
                           Lmin=Lmin, Lmax=Lmax, chains=chains,
                           verbose=verbose, flag_kwargs=flag_kwargs,
                           n_warmup=n_warmup)
    if sampler != "joint":
        raise ValueError(f"unknown sampler {sampler!r} "
                         "(expected 'joint' or 'split')")
    flags = _flags_for(gp, flag_kwargs)
    if flag_kwargs:
        raise TypeError(f"unknown mcmc() arguments: {sorted(flag_kwargs)}")
    logprob, x0, embed, _ = gp.make_logprob(**flags)

    if chains is None:
        res = _hmc_kernel(logprob, x0, key, n_iter=n_iter, eps=eps,
                          Lmin=Lmin, Lmax=Lmax)
        samples = res.samples[burn::thin]
        gp.set_params(res.final, **flags)
        accept = float(res.accept_rate)
        final = res.final
    else:
        keys = jax.random.split(key, chains + 1)
        init_keys = jax.random.split(keys[0], chains)
        # jitter chain starts around the current state
        x0s = x0[None, :] + 0.01 * jax.vmap(
            lambda k: jax.random.normal(k, x0.shape, dtype=x0.dtype)
        )(init_keys)
        run = jax.vmap(
            lambda th, k: _hmc_kernel(logprob, th, k, n_iter=n_iter,
                                      eps=eps, Lmin=Lmin, Lmax=Lmax)
        )
        res = run(x0s, keys[1:])
        samples = res.samples[:, burn::thin]
        best = int(jnp.argmax(res.final_target))
        gp.set_params(res.final[best], **flags)
        accept = res.accept_rate
        final = res.final

    if verbose:
        n_kept = samples.shape[-2]
        print(f"HMC: iterations={n_iter} burn={burn} thin={thin} "
              f"kept={n_kept} eps={eps} L=[{Lmin},{Lmax}] "
              f"accept_rate={jnp.round(jnp.mean(jnp.asarray(accept)), 4)}")
    return MCMCResult(samples=samples, accept_rate=accept, final=final)


def _mcmc_split(gp, key, *, n_iter, burn, thin, a_iters, eps_a, eps_b,
                Lmin, Lmax, chains, verbose, flag_kwargs, n_warmup=0):
    from ..models.gpa import GPA as _GPA
    from .split import split_hmc as _split_kernel

    if not isinstance(gp, _GPA):
        raise TypeError("sampler='split' requires a GPA model (the split "
                        "is [v; lik; mean] vs [kern])")
    if flag_kwargs:
        # reject EVERY extra kwarg, truthy or not: block flags are
        # unsupported here regardless of value, and a typo'd name (e.g.
        # noize=True) must not be silently ignored (ADVICE r4)
        raise ValueError(
            "block flags are not supported with sampler='split' (all "
            f"blocks are sampled); got {sorted(flag_kwargs)}")
    precompute, lp_a, lp_b, a0, b0 = gp.make_split_logprob()
    na = a0.shape[0]

    if chains is None:
        res = _split_kernel(precompute, lp_a, lp_b, a0, b0, key,
                            n_iter=n_iter, a_iters=a_iters, eps_a=eps_a,
                            eps_b=eps_b, Lmin=Lmin, Lmax=Lmax,
                            n_warmup=n_warmup)
        samples = res.samples[burn::thin]
        gp.set_params(res.final)
        accept = jnp.stack([res.accept_rate_a, res.accept_rate_b])
        final = res.final
    else:
        keys = jax.random.split(key, chains + 1)
        init_keys = jax.random.split(keys[0], chains)
        x0 = jnp.concatenate([a0, b0])
        x0s = x0[None, :] + 0.01 * jax.vmap(
            lambda k: jax.random.normal(k, x0.shape, dtype=x0.dtype)
        )(init_keys)
        run = jax.vmap(
            lambda th, k: _split_kernel(
                precompute, lp_a, lp_b, th[:na], th[na:], k,
                n_iter=n_iter, a_iters=a_iters, eps_a=eps_a, eps_b=eps_b,
                Lmin=Lmin, Lmax=Lmax, n_warmup=n_warmup))
        res = run(x0s, keys[1:])
        samples = res.samples[:, burn::thin]
        best = int(jnp.argmax(res.final_target))
        gp.set_params(res.final[best])
        accept = jnp.stack([res.accept_rate_a, res.accept_rate_b], -1)
        final = res.final

    if verbose:
        acc = jnp.round(jnp.mean(jnp.asarray(accept), axis=0), 4)
        print(f"split-HMC: outer={n_iter} a_iters={a_iters} burn={burn} "
              f"thin={thin} kept={samples.shape[-2]} "
              f"eps=[{eps_a},{eps_b}] L=[{Lmin},{Lmax}] "
              f"accept[a,b]={acc}")
    # accept_rate holds [accept_a, accept_b] (per chain when chains=k)
    return MCMCResult(samples=samples, accept_rate=accept, final=final)


def ess(gp, key=None, n_iter: int = 1000, burn: int = 0, thin: int = 1,
        chains: int | None = None, verbose: bool = True,
        **flag_kwargs) -> MCMCResult:
    """Elliptical slice sampling of GPE hyperparameters (ref ess,
    src/mcmc.jl:121-184). Requires every selected parameter to carry a
    Normal prior; the slice likelihood is the mll (priors enter through
    the ellipse)."""
    from ..models.gpe import GPE as _GPE

    if not isinstance(gp, _GPE):
        raise TypeError("ess operates on GPE hyperparameters only "
                        "(ref ess(gp::GPE), src/mcmc.jl:131)")
    key = key if key is not None else jax.random.PRNGKey(0)
    flags = _flags_for(gp, flag_kwargs)
    if flag_kwargs:
        raise TypeError(f"unknown ess() arguments: {sorted(flag_kwargs)}")

    # joint Normal prior over the active blocks (ref get_joint_priors)
    sls = gp.params.block_slices()
    names = gp.block_flag_names()
    priors_all = _model_priors_flat(gp)
    mus, sigmas = [], []
    for n, s in zip(names, sls):
        if not flags[n]:
            continue
        for i in range(s.start, s.stop):
            pr = priors_all[i]
            if not isinstance(pr, Normal):
                raise ValueError(
                    "ess requires all active parameters to have Normal "
                    f"priors; parameter {i} has {pr!r}")
            mus.append(pr.mu)
            sigmas.append(pr.sigma)
    prior_mu = jnp.asarray(mus)
    prior_sigma = jnp.asarray(sigmas)

    loglik, x0, embed, _ = gp.make_logprob(include_priors=False, **flags)

    if chains is None:
        res = _ess_kernel(loglik, x0, prior_mu, prior_sigma, key,
                          n_iter=n_iter)
        samples = res.samples[burn::thin]
        gp.set_params(res.final, **flags)
        props = float(res.mean_proposals)
        final = res.final
    else:
        keys = jax.random.split(key, chains + 1)
        init_keys = jax.random.split(keys[0], chains)
        # jitter chain starts (as mcmc() does) — identical starts make
        # split-R-hat blind to multimodality
        x0s = x0[None, :] + 0.01 * jax.vmap(
            lambda k: jax.random.normal(k, x0.shape, dtype=x0.dtype)
        )(init_keys)
        run = jax.vmap(
            lambda th, k: _ess_kernel(loglik, th, prior_mu, prior_sigma, k,
                                      n_iter=n_iter)
        )
        res = run(x0s, keys[1:])
        samples = res.samples[:, burn::thin]
        # pick the best chain by final mll (mirrors mcmc()'s best-target
        # selection rather than arbitrarily trusting chain 0)
        best = int(jnp.argmax(res.final_loglik))
        gp.set_params(res.final[best], **flags)
        props = res.mean_proposals
        final = res.final

    if verbose:
        print(f"ESS: iterations={n_iter} burn={burn} thin={thin} "
              f"mean_proposals_per_iter="
              f"{jnp.round(jnp.mean(jnp.asarray(props)), 3)}")
    # ESS has no Metropolis accept step (accept_rate=None); the sampler
    # diagnostic is the mean shrinkage-proposal count per iteration
    return MCMCResult(samples=samples, accept_rate=None, final=final,
                      mean_proposals=props)


def _model_priors_flat(gp):
    """Priors aligned with the model's full flat parameter vector."""
    from ..models.gpe import GPE as _GPE

    p = gp.params
    out = []
    if isinstance(gp, _GPE):
        out.extend(p.lognoise.priors_flat())
        out.extend(p.mean.priors_flat())
        out.extend(p.kernel.priors_flat())
    else:  # GPA: [v; lik; mean; kern] — v has implicit N(0,1)
        out.extend([Normal(0.0, 1.0)] * int(jnp.size(p.v)))
        out.extend(p.lik.priors_flat())
        out.extend(p.mean.priors_flat())
        out.extend(p.kernel.priors_flat())
    return out
