"""Chain-parallel MCMC over a device mesh (BASELINE north star / config #5:
"1024 chains sharded over a pod slice with collective adaptation").

The reference runs one sequential chain (ref src/mcmc.jl:42). Here:
  * chains vectorize per-device with `vmap`,
  * devices hold disjoint chain shards under `shard_map` over the 'chains'
    mesh axis,
  * adaptation is *collective*: every iteration the mean Metropolis
    acceptance probability is `psum`-reduced across all chains on all
    devices and a shared dual-averaging update (Hoffman & Gelman 2014,
    Alg. 5) moves a single step size for the whole fleet; during warmup a
    shared **diagonal mass matrix** is estimated from psum'd cross-chain
    + within-window moments of theta (the many-chain ensemble gives a far
    lower-variance estimate than any single-chain window), with Stan-style
    shrinkage and a dual-averaging restart at each mass update. This is
    the psum-of-accept-stats pattern from SURVEY §2.9/§5.
  * runs are **restartable**: the sampler executes in jitted segments of
    `checkpoint_every` iterations; between segments the full sampler state
    (chain positions, targets, gradients, per-chain RNG keys, adaptation
    state, accumulated draws) is written atomically with
    utils.checkpoint. A killed run resumed from its checkpoint reproduces
    the uninterrupted chain bit-exactly, because per-iteration randomness
    is keyed by fold_in(key, global_iteration) carried in the state.

Also provides `sharded_ess`: the elliptical-slice sampler (ref
src/mcmc.jl:121-184) vmapped per device and sharded over the same axis.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..inference.ess import ess
from ..inference.hmc import hmc_iteration
from ..utils.checkpoint import load_checkpoint, save_checkpoint

__all__ = ["sharded_hmc", "ShardedHMCResult", "sharded_split_hmc",
           "ShardedSplitHMCResult", "sharded_ess", "ShardedESSResult"]


@dataclass
class ShardedHMCResult:
    samples: jnp.ndarray  # (C, n_keep, D)
    accept_rate: jnp.ndarray  # (C,)
    eps_final: jnp.ndarray  # ()
    minv_final: jnp.ndarray  # (D,) shared diagonal inverse mass
    final: jnp.ndarray  # (C, D)
    final_target: jnp.ndarray  # (C,)


jax.tree_util.register_dataclass(
    ShardedHMCResult,
    data_fields=["samples", "accept_rate", "eps_final", "minv_final",
                 "final", "final_target"],
    meta_fields=[],
)


def sharded_hmc(logprob_fn, theta0, key, mesh: Mesh, *, axis: str = "chains",
                n_iter: int = 1000, n_warmup: int = 0, eps0: float = 0.1,
                Lmin: int = 5, Lmax: int = 15, target_accept: float = 0.8,
                thin: int = 1, adapt_mass: bool = True,
                checkpoint_every: int | None = None,
                checkpoint_path: str | None = None,
                segment_iters: int | None = None) -> ShardedHMCResult:
    """Run C chains of HMC sharded over `mesh` axis `axis`.

    theta0: (C, D) initial states, C divisible by the axis size.
    During the first `n_warmup` iterations the step size adapts by
    collective dual averaging, and (when `adapt_mass` and n_warmup >= 20)
    a shared diagonal inverse mass matrix is re-estimated twice — at
    n_warmup/2 from the moment window [n_warmup/4, n_warmup/2) and at
    3 n_warmup/4 from [n_warmup/2, 3 n_warmup/4) — pooling moments across
    every chain on every device with psum. Each mass update restarts the
    step-size dual averaging at the current eps. Warmup draws are
    discarded; keeps every `thin`-th draw.

    checkpoint_every/checkpoint_path: persist the full sampler state every
    k iterations; if `checkpoint_path` exists the run RESUMES from it and
    reproduces the uninterrupted chain bit-exactly.

    segment_iters: run the scan in jitted segments of this many iterations
    WITHOUT persisting anything — bit-identical to one long scan. Use to
    bound single device executions (some runtimes kill multi-minute
    executions; e.g. the remote-TPU tunnel restarts the worker at ~2 min)."""
    C, D = theta0.shape
    n_dev = mesh.shape[axis]
    if C % n_dev:
        raise ValueError(f"{C} chains not divisible by {n_dev} devices")
    if (checkpoint_every is None) != (checkpoint_path is None):
        raise ValueError(
            "checkpoint_every and checkpoint_path must be given together")
    total = n_warmup + n_iter
    vg = jax.value_and_grad(logprob_fn)

    gamma, t0, kappa = 0.05, 10.0, 0.75
    do_mass = bool(adapt_mass) and n_warmup >= 20
    # mass-update iterations and their moment-window starts
    w2, w34 = n_warmup // 2, (3 * n_warmup) // 4
    win_starts = (n_warmup // 4, w2)
    dt = theta0.dtype

    def one_iter(carry, it):
        (theta, tgt, grad, keys, acc, eps, mu, log_eps_bar, hbar,
         t_adapt, minv, s1, s2, cnt) = carry
        c = theta.shape[0]
        keys = jax.vmap(jax.random.fold_in)(keys, jnp.full((c,), it))
        step = jax.vmap(
            lambda th, t, g, k: hmc_iteration(vg, th, t, g, k, eps,
                                              Lmin, Lmax, minv=minv[0])
        )
        theta, tgt, grad, aprob, accepted = step(theta, tgt, grad, keys)

        # collective mean acceptance across every chain on every device
        global_asum = jax.lax.psum(jnp.sum(aprob), axis)
        global_c = jax.lax.psum(jnp.asarray(c, aprob.dtype), axis)
        a_mean = global_asum / global_c

        # dual averaging (shared step size); t_adapt restarts after each
        # mass update
        in_warmup = it < n_warmup
        t_adapt = t_adapt + 1.0
        hbar_n = ((1.0 - 1.0 / (t_adapt + t0)) * hbar
                  + (target_accept - a_mean) / (t_adapt + t0))
        log_eps = mu - jnp.sqrt(t_adapt) / gamma * hbar_n
        w = t_adapt ** (-kappa)
        log_eps_bar_n = w * log_eps + (1.0 - w) * log_eps_bar
        hbar = jnp.where(in_warmup, hbar_n, hbar)
        log_eps_bar = jnp.where(in_warmup, log_eps_bar_n, log_eps_bar)
        eps = jnp.where(in_warmup, jnp.exp(log_eps), jnp.exp(log_eps_bar))

        if do_mass:
            # accumulate local moments inside the active window
            in_win = ((it >= win_starts[0]) & (it < w2)) | \
                     ((it >= win_starts[1]) & (it < w34))
            s1 = s1 + jnp.where(in_win, jnp.sum(theta, axis=0), 0.0)[None]
            s2 = s2 + jnp.where(in_win, jnp.sum(theta * theta, axis=0),
                                0.0)[None]
            cnt = cnt + jnp.where(in_win, jnp.asarray(c, dt), 0.0)[None]

            at_update = (it == w2 - 1) | (it == w34 - 1)
            s1_tot = jax.lax.psum(s1[0], axis)
            s2_tot = jax.lax.psum(s2[0], axis)
            cnt_tot = jax.lax.psum(cnt[0], axis)
            m = s1_tot / jnp.maximum(cnt_tot, 1.0)
            var = s2_tot / jnp.maximum(cnt_tot, 1.0) - m * m
            # Stan-style shrinkage toward unit scale for small windows
            var = (cnt_tot / (cnt_tot + 5.0)) * var \
                + (5.0 / (cnt_tot + 5.0)) * 1e-3
            minv_new = jnp.maximum(var, 1e-10)
            minv = jnp.where(at_update, minv_new[None], minv)
            # restart dual averaging at the current step size
            mu = jnp.where(at_update, jnp.log(10.0 * eps), mu)
            log_eps_bar = jnp.where(at_update, jnp.log(eps), log_eps_bar)
            hbar = jnp.where(at_update, 0.0, hbar)
            t_adapt = jnp.where(at_update, 0.0, t_adapt)
            # reset the window accumulators
            s1 = jnp.where(at_update, 0.0, s1)
            s2 = jnp.where(at_update, 0.0, s2)
            cnt = jnp.where(at_update, 0.0, cnt)

        acc = acc + jnp.where(it >= n_warmup, accepted.astype(acc.dtype),
                              0.0)
        return ((theta, tgt, grad, keys, acc, eps, mu, log_eps_bar,
                 hbar, t_adapt, minv, s1, s2, cnt), theta)

    def local_init(theta_loc, keys_loc):
        t_init, g_init = jax.vmap(vg)(theta_loc)
        g_init = jnp.where(jnp.isfinite(g_init), g_init, 0.0)
        # device-local accumulators (s1/s2/cnt and the replicated adaptation
        # scalars) carry a leading singleton so they round-trip through
        # shard_map out_specs as (n_dev, ...)-sharded arrays
        return (theta_loc, t_init, g_init, keys_loc,
                theta_loc[:, 0] * 0.0,  # per-chain accept counter
                jnp.asarray(eps0, dt),
                jnp.asarray(jnp.log(10.0 * eps0), dt),  # mu
                jnp.asarray(jnp.log(eps0), dt),
                jnp.zeros((), dt),  # hbar
                jnp.zeros((), dt),  # t_adapt
                jnp.ones((1, D), dt),  # minv (shared; stored per device)
                jnp.zeros((1, D), dt), jnp.zeros((1, D), dt),  # s1, s2
                jnp.zeros((1,), dt))  # cnt

    def local_segment(carry, its):
        return jax.lax.scan(one_iter, carry, its)

    # carry sharding: per-chain leaves over `axis`, adaptation scalars
    # replicated, per-device accumulators sharded by their singleton axis
    carry_specs = (P(axis), P(axis), P(axis), P(axis), P(axis),
                   P(), P(), P(), P(), P(),
                   P(axis), P(axis), P(axis), P(axis))

    init_fn = shard_map(
        local_init, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=carry_specs, check_vma=False)
    seg_fn = jax.jit(shard_map(
        local_segment, mesh=mesh, in_specs=(carry_specs, P()),
        out_specs=(carry_specs, P(None, axis)), check_vma=False))

    keys = jax.random.split(key, C)
    carry = jax.jit(init_fn)(theta0, keys)

    seg = checkpoint_every if checkpoint_every is not None else (
        segment_iters if segment_iters is not None else total)
    sample_chunks = []
    it_done = 0
    if checkpoint_path is not None and os.path.exists(checkpoint_path):
        like = {"carry": carry, "it_done": jnp.zeros((), jnp.int32),
                "samples": jnp.zeros((total, C, D), dt)}
        st = load_checkpoint(checkpoint_path, like)
        carry = st["carry"]
        it_done = int(st["it_done"])
        if it_done:
            sample_chunks.append(st["samples"][:it_done])

    while it_done < total:
        n_step = min(seg, total - it_done)
        its = jnp.arange(it_done, it_done + n_step)
        carry, chunk = seg_fn(carry, its)  # chunk: (n_step, C, D)
        sample_chunks.append(chunk)
        it_done += n_step
        if checkpoint_path is not None and it_done < total:
            samples_so_far = jnp.concatenate(sample_chunks, axis=0)
            pad = jnp.zeros((total - it_done, C, D), dt)
            save_checkpoint(checkpoint_path, {
                "carry": carry,
                "it_done": jnp.asarray(it_done, jnp.int32),
                "samples": jnp.concatenate([samples_so_far, pad], axis=0),
            })

    samples = jnp.concatenate(sample_chunks, axis=0)  # (total, C, D)
    (theta_f, tgt_f, _, _, acc, eps, _, _, _, _, minv, _, _, _) = carry
    kept = samples[n_warmup:][::thin]
    kept = jnp.moveaxis(kept, 0, 1)  # (C, n_keep, D)
    return ShardedHMCResult(samples=kept, accept_rate=acc / n_iter,
                            eps_final=eps, minv_final=minv[0],
                            final=theta_f, final_target=tgt_f)


@dataclass
class ShardedSplitHMCResult:
    samples: jnp.ndarray  # (C, n_iter * a_iters, Da + Db) post-warmup
    warmup_samples: jnp.ndarray  # (C, n_warmup * a_iters, Da + Db)
    accept_rate_a: jnp.ndarray  # (C,) post-warmup acceptance
    accept_rate_b: jnp.ndarray  # (C,)
    eps_a_final: jnp.ndarray  # () shared adapted step sizes
    eps_b_final: jnp.ndarray  # ()
    final: jnp.ndarray  # (C, Da + Db)
    final_target: jnp.ndarray  # (C,)


jax.tree_util.register_dataclass(
    ShardedSplitHMCResult,
    data_fields=["samples", "warmup_samples", "accept_rate_a",
                 "accept_rate_b", "eps_a_final", "eps_b_final", "final",
                 "final_target"],
    meta_fields=[],
)


def sharded_split_hmc(precompute, logprob_a, logprob_b, theta0, key,
                      mesh: Mesh, na: int, *, axis: str = "chains",
                      n_iter: int = 1000, a_iters: int = 8,
                      n_warmup: int = 0, eps_a0: float = 0.2,
                      eps_b0: float = 0.05, Lmin: int = 5, Lmax: int = 15,
                      Lmin_b: int | None = None, Lmax_b: int | None = None,
                      target_accept: float = 0.8,
                      segment_iters: int | None = None
                      ) -> ShardedSplitHMCResult:
    """Chain-sharded factor-cached split-block HMC with COLLECTIVE
    per-block step-size adaptation — the composition of
    inference/split.py's sampler (a_iters cheap [v; lik; mean] updates
    against a cached factor per kernel-block refactorization; ~10x the
    joint sampler's ESS/sec, perf/README.md 5b) with this module's
    psum'd dual averaging: during the first `n_warmup` outer iterations
    eps_a adapts on the fleet-mean accept probability of the A sweeps
    and eps_b on the B updates', each toward `target_accept`, shared by
    every chain on every device.

    theta0: (C, na + nb) initial states ([a; b] per chain), C divisible
    by the axis size. n_warmup is ADDITIVE (n_warmup + n_iter outer
    iterations run in total, the same convention as sharded_hmc and
    split_hmc). Draws are recorded per A-update; `samples` holds the
    n_iter * a_iters post-warmup rows per chain and `warmup_samples`
    the n_warmup * a_iters warmup rows, so ESS over warmup draws can't
    happen by accident. segment_iters bounds single device executions
    as in sharded_hmc.

    Lmin_b/Lmax_b give the B (kernel) block its own leapfrog path length
    (default: the shared Lmin/Lmax, matching split_hmc): slow continuum
    directions like a weakly-identified log-lengthscale need long B
    trajectories (tau scales ~ 1/(L*eps)^2 across a posterior ridge)
    while the well-conditioned whitened latents do not."""
    C, D = theta0.shape
    Lmin_b = Lmin if Lmin_b is None else Lmin_b
    Lmax_b = Lmax if Lmax_b is None else Lmax_b
    n_dev = mesh.shape[axis]
    if C % n_dev:
        raise ValueError(f"{C} chains not divisible by {n_dev} devices")
    total = n_warmup + n_iter
    dt = theta0.dtype
    gamma, t0c, kappa = 0.05, 10.0, 0.75

    def da_update(a_mean, st):
        eps, mu, leb, hbar, t = st
        t = t + 1.0
        hbar = ((1.0 - 1.0 / (t + t0c)) * hbar
                + (target_accept - a_mean) / (t + t0c))
        log_eps = mu - jnp.sqrt(t) / gamma * hbar
        w = t ** (-kappa)
        leb = w * log_eps + (1.0 - w) * leb
        return (jnp.exp(log_eps), mu, leb, hbar, t)

    def da_init(eps0):
        e = jnp.asarray(eps0, dt)
        return (e, jnp.log(10.0 * e), jnp.log(e), jnp.zeros((), dt),
                jnp.zeros((), dt))

    def one_iter(carry, it):
        a, b, keys, acc_a, acc_b, st_a, st_b = carry
        c = a.shape[0]
        keys = jax.vmap(jax.random.fold_in)(keys, jnp.full((c,), it))
        in_warm = it < n_warmup
        eps_a = jnp.where(in_warm, st_a[0], jnp.exp(st_a[2]))
        eps_b = jnp.where(in_warm, st_b[0], jnp.exp(st_b[2]))

        # --- A sweeps against per-chain cached factors ------------------
        aux = jax.vmap(precompute)(b)

        def chain_a_sweep(a_i, b_i, aux_i, k_i):
            vg = jax.value_and_grad(
                lambda x: logprob_a(x, aux_i, b_i))
            t_i, g_i = vg(a_i)
            g_i = jnp.where(jnp.isfinite(g_i), g_i, 0.0)

            def step(cst, k):
                a_, t_, g_, acc_, ap_ = cst
                a_, t_, g_, aprob, accd = hmc_iteration(
                    vg, a_, t_, g_, k, eps_a, Lmin, Lmax)
                return (a_, t_, g_, acc_ + accd, ap_ + aprob), a_

            ks = jax.random.split(k_i, a_iters + 1)
            (a_i, _, _, accs, apsum), draws = jax.lax.scan(
                step, (a_i, t_i, g_i, jnp.zeros((), jnp.int32),
                       jnp.zeros((), dt)), ks[1:])
            return a_i, draws, accs, apsum / a_iters, ks[0]

        a, a_draws, accs_a, ap_a, keys_b = jax.vmap(chain_a_sweep)(
            a, b, aux, keys)

        # each recorded draw pairs a_i with the b IN FORCE during the A
        # sweep — the chunk must be built BEFORE the B update below, or
        # (a_i, b_new) records joint states the chain never occupied and
        # cross-block statistics are biased (matches inference/split.py's
        # ordering; ADVICE r4 high)
        chunk = jnp.concatenate(
            [a_draws, jnp.broadcast_to(b[:, None, :],
                                       (c, a_iters, D - na))], axis=-1)

        # --- B updates (refactorize per leapfrog step) ------------------
        def chain_b(b_i, a_i, k_i):
            vg = jax.value_and_grad(lambda x: logprob_b(x, a_i))
            t_i, g_i = vg(b_i)
            g_i = jnp.where(jnp.isfinite(g_i), g_i, 0.0)
            return hmc_iteration(vg, b_i, t_i, g_i, k_i, eps_b, Lmin_b,
                                 Lmax_b)

        b, t_b, _, ap_b, acc_b_d = jax.vmap(chain_b)(b, a, keys_b)

        # --- collective per-block dual averaging ------------------------
        n_tot = jax.lax.psum(jnp.asarray(c, dt), axis)
        ap_a_mean = jax.lax.psum(jnp.sum(ap_a), axis) / n_tot
        ap_b_mean = jax.lax.psum(jnp.sum(ap_b), axis) / n_tot
        st_a_n = da_update(ap_a_mean, st_a)
        st_b_n = da_update(ap_b_mean, st_b)
        st_a = jax.tree_util.tree_map(
            lambda new, old: jnp.where(in_warm, new, old), st_a_n, st_a)
        st_b = jax.tree_util.tree_map(
            lambda new, old: jnp.where(in_warm, new, old), st_b_n, st_b)

        # acceptance counts post-warmup proposals only (the reported
        # rates describe the sampling phase, not the adapting one)
        post = it >= n_warmup
        acc_a = acc_a + jnp.where(post, accs_a, 0)
        acc_b = acc_b + jnp.where(post, acc_b_d.astype(acc_b.dtype), 0)
        out = (jnp.moveaxis(chunk, 1, 0), t_b)
        return (a, b, keys, acc_a, acc_b, st_a, st_b), out

    def local_init(theta_loc, keys_loc):
        c = theta_loc.shape[0]
        # the (1, ...) singletons let the replicated adaptation tuples
        # round-trip through shard_map out_specs (same trick as
        # sharded_hmc's local_init)
        return (theta_loc[:, :na], theta_loc[:, na:], keys_loc,
                jnp.zeros((c,), jnp.int32), jnp.zeros((c,), jnp.int32),
                da_init(eps_a0), da_init(eps_b0))

    def local_segment(carry, its):
        return jax.lax.scan(one_iter, carry, its)

    da_specs = (P(), P(), P(), P(), P())
    carry_specs = (P(axis), P(axis), P(axis), P(axis), P(axis),
                   da_specs, da_specs)
    init_fn = jax.jit(shard_map(
        local_init, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=carry_specs, check_vma=False))
    seg_fn = jax.jit(shard_map(
        local_segment, mesh=mesh, in_specs=(carry_specs, P()),
        out_specs=(carry_specs, (P(None, None, axis), P(None, axis))),
        check_vma=False))

    keys = jax.random.split(key, C)
    carry = init_fn(theta0, keys)
    seg = segment_iters if segment_iters is not None else total
    chunks, t_last = [], None
    it_done = 0
    while it_done < total:
        n_step = min(seg, total - it_done)
        its = jnp.arange(it_done, it_done + n_step)
        carry, (chunk, t_b) = seg_fn(carry, its)
        chunks.append(chunk.reshape(-1, C, D))  # (n_step*a_iters, C, D)
        t_last = t_b[-1]
        it_done += n_step

    samples_all = jnp.moveaxis(jnp.concatenate(chunks, axis=0), 0, 1)
    a_f, b_f, _, acc_a, acc_b, st_a, st_b = carry
    return ShardedSplitHMCResult(
        samples=samples_all[:, n_warmup * a_iters:],
        warmup_samples=samples_all[:, : n_warmup * a_iters],
        accept_rate_a=acc_a / (n_iter * a_iters),
        accept_rate_b=acc_b / n_iter,
        eps_a_final=jnp.exp(st_a[2]),
        eps_b_final=jnp.exp(st_b[2]),
        final=jnp.concatenate([a_f, b_f], axis=1),
        final_target=t_last,
    )


@dataclass
class ShardedESSResult:
    samples: jnp.ndarray  # (C, n_iter, D)
    mean_proposals: jnp.ndarray  # () fleet-wide mean shrinkage proposals
    final: jnp.ndarray  # (C, D)
    final_loglik: jnp.ndarray  # (C,)


jax.tree_util.register_dataclass(
    ShardedESSResult,
    data_fields=["samples", "mean_proposals", "final", "final_loglik"],
    meta_fields=[],
)


def sharded_ess(loglik_fn, theta0, prior_mu, prior_sigma, key, mesh: Mesh,
                *, axis: str = "chains",
                n_iter: int = 1000) -> ShardedESSResult:
    """Run C elliptical-slice chains (ref ess, src/mcmc.jl:121-184) sharded
    over `mesh` axis `axis`: vmapped per device, disjoint chain shards
    across devices, with the mean shrinkage-proposal count psum-pooled as
    the fleet diagnostic. theta0: (C, D), C divisible by the axis size."""
    C, D = theta0.shape
    n_dev = mesh.shape[axis]
    if C % n_dev:
        raise ValueError(f"{C} chains not divisible by {n_dev} devices")

    def local_run(theta_loc, keys_loc):
        c = theta_loc.shape[0]
        res = jax.vmap(
            lambda th, k: ess(loglik_fn, th, prior_mu, prior_sigma, k,
                              n_iter=n_iter))(theta_loc, keys_loc)
        psum_props = jax.lax.psum(jnp.sum(res.mean_proposals), axis)
        n_tot = jax.lax.psum(jnp.asarray(c, psum_props.dtype), axis)
        return (res.samples, psum_props / n_tot, res.final,
                res.final_loglik)

    keys = jax.random.split(key, C)
    fn = shard_map(
        local_run, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(), P(axis), P(axis)),
        check_vma=False,
    )
    samples, props, theta_f, ll_f = jax.jit(fn)(theta0, keys)
    return ShardedESSResult(samples=samples, mean_proposals=props,
                            final=theta_f, final_loglik=ll_f)
