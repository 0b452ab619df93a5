"""Sampler diagnostics: multi-chain effective sample size and
rank-normalized split-R-hat.

The reference prints only acceptance rates (ref src/mcmc.jl:79-82). The
BASELINE metric for this package is *effective samples per second per
chip*, so the diagnostics are first-class and follow the modern
multi-chain estimators (Vehtari, Gelman, Simpson, Carpenter, Buerkner
2021, "Rank-normalization, folding, and localization: an improved R-hat
for assessing convergence of MCMC"; the same estimators Stan reports):

  * `effective_sample_size` combines WITHIN-chain autocorrelation with
    BETWEEN-chain variance: rho_t = 1 - (W - s_t) / var_plus, where s_t
    is the chain-averaged lag-t autocovariance, W the mean within-chain
    variance and var_plus the overestimating pooled variance. An ensemble
    of chains stuck in different modes — each locally well-mixed — gets
    rho_t ~= 1 at every lag and ESS ~= O(1), not O(C * n). (The r4
    estimator averaged per-chain autocorrelations only and reported
    7,302 "effective samples" under R-hat 1.54 — exactly the failure
    this estimator exists to catch.)
  * `split_rhat` is rank-normalized AND folded: max of the bulk R-hat on
    rank-normal scores and the tail R-hat on folded |x - median| scores,
    so heavy-tailed posteriors (Student-t, config #5) cannot slip through
    on raw-scale means alone.

Everything is vectorized over chains and dimensions with the FFT
autocovariance, with bounded-workspace chunking over dimensions for long
many-chain runs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["effective_sample_size", "split_rhat", "rank_normalize"]


def _autocov(x):
    """Biased (divide-by-n) autocovariance of a 1-D series via FFT —
    the estimator the Vehtari et al. rho_t formula expects."""
    n = x.shape[0]
    x = x - jnp.mean(x)
    nfft = 2 * n
    f = jnp.fft.rfft(x, nfft)
    return jnp.fft.irfft(f * jnp.conj(f), nfft)[:n].real / n


def _split_chains(samples):
    """(C, n, D) -> (2C, n//2, D): split every chain in half (a chain
    whose first and second halves disagree is its own convergence
    witness). Drops the last draw when n is odd."""
    C, n, D = samples.shape
    half = n // 2
    return jnp.concatenate(
        [samples[:, :half], samples[:, half: 2 * half]], axis=0)


def rank_normalize(samples):
    """Pooled-rank normal scores (Vehtari et al. 2021, eq. 14).

    samples: (C, n, D). Ranks are computed over the POOLED C*n draws per
    dimension (ordinal ranks; ties are measure-zero for continuous
    samplers) and mapped through the normal quantile function with the
    Blom offset z = ndtri((r - 3/8) / (S + 1/4)).

    A numpy input takes a HOST fast path (np.argsort +
    put_along_axis + scipy ndtri, returning np.ndarray): jax-CPU sorts
    of pooled 1024-chain runs measured ~10x slower and the original
    scatter formulation effectively hung (observed r5). Traced/jnp
    inputs use the jit-able double-argsort form."""
    C, n, D = samples.shape
    if isinstance(samples, np.ndarray):
        from scipy.special import ndtri as _ndtri

        flat = samples.reshape(C * n, D)
        order = np.argsort(flat, axis=0, kind="stable")
        ranks = np.empty((C * n, D), np.int64)
        np.put_along_axis(
            ranks, order, np.arange(C * n, dtype=np.int64)[:, None],
            axis=0)
        z = _ndtri((ranks + (1.0 - 0.375)) / (C * n + 0.25))
        return z.reshape(C, n, D).astype(samples.dtype)
    flat = samples.reshape(C * n, D)
    # rank via double argsort (argsort of the permutation is its
    # inverse) — no scatter buffers on device
    ranks = jnp.argsort(jnp.argsort(flat, axis=0), axis=0)
    z = jax.scipy.special.ndtri(
        (ranks.astype(flat.dtype) + (1.0 - 0.375)) / (C * n + 0.25))
    return z.reshape(C, n, D)


def _ess_core(s):
    """Vehtari/Stan multi-chain ESS on already-split chains s: (m, n, D).
    Returns (D,)."""
    m, n, D = s.shape
    dt = s.dtype
    chain_var = jnp.var(s, axis=1, ddof=1)  # (m, D)
    W = jnp.mean(chain_var, axis=0)  # (D,)
    chain_mean = jnp.mean(s, axis=1)  # (m, D)
    B_over_n = jnp.var(chain_mean, axis=0, ddof=1)  # B / n
    var_plus = (n - 1) / n * W + B_over_n  # (D,)

    acov = jax.vmap(jax.vmap(_autocov, in_axes=1, out_axes=1))(s)
    s_t = jnp.mean(acov, axis=0)  # (n, D) chain-averaged autocovariance

    ok = var_plus > 0.0
    vp = jnp.where(ok, var_plus, 1.0)
    rho = 1.0 - (W[None, :] - s_t) / vp[None, :]  # (n, D)
    # a degenerate ensemble (every chain constant at the same value) has
    # no information: treat as perfectly correlated
    rho = jnp.where(ok[None, :], rho, jnp.ones_like(rho))

    # Geyer initial positive sequence + initial monotone sequence
    n_pairs = n // 2
    pair = rho[0: 2 * n_pairs: 2] + rho[1: 2 * n_pairs: 2]  # (n_pairs, D)
    keep = jnp.cumprod(pair > 0.0, axis=0).astype(dt)
    pair_mono = jax.lax.cummin(
        jnp.where(keep > 0, pair, jnp.inf), axis=0)
    pair_mono = jnp.where(jnp.isfinite(pair_mono), pair_mono, 0.0)
    tau = -1.0 + 2.0 * jnp.sum(pair_mono * keep, axis=0)
    tau = jnp.maximum(tau, 1.0 / n)
    ess = m * n / tau
    # antithetic chains can legitimately exceed m*n; cap as Stan does
    total = jnp.asarray(m * n, dt)
    return jnp.minimum(ess, total * jnp.log10(jnp.maximum(total, 10.0)))


def effective_sample_size(samples, max_workspace_elems: int = 1 << 25,
                          rank_normalized: bool = False):
    """Multi-chain ESS per dimension (Vehtari et al. 2021 / Stan).

    samples: (n_draws, D) single chain or (C, n_draws, D) multi-chain.
    Chains are split in half; lag-t correlation is
    rho_t = 1 - (W - s_t)/var_plus, combining within-chain
    autocorrelation with between-chain variance, then summed with
    Geyer's initial-monotone-positive rule. Non-mixing chains (each
    stuck in its own mode) report ESS ~= O(1), not O(C * n).
    Returns (D,) effective sample sizes.

    rank_normalized=True computes Stan's "bulk-ESS": the same estimator
    on pooled-rank normal scores, robust to heavy tails and
    nonexistent moments.

    The FFT autocovariance needs a (2C, D, 2n) complex workspace, which
    OOMs HBM for long many-chain runs (observed: 16 GB at C=128,
    n=38400, D=206); dimensions are processed in sequential chunks sized
    so the workspace stays under `max_workspace_elems` complex entries
    (default ~256 MB of complex64)."""
    if not isinstance(samples, np.ndarray):
        samples = jnp.asarray(samples)
    if samples.ndim == 2:
        samples = samples[None]
    if rank_normalized:
        samples = rank_normalize(samples)  # host fast path for np input
    samples = jnp.asarray(samples)
    s = _split_chains(samples)  # (2C, n//2, D)
    m, n, D = s.shape

    chunk = max(1, min(D, int(max_workspace_elems) // max(1, m * 2 * n)))
    if chunk >= D:
        return _ess_core(s)
    pad = (-D) % chunk
    sp = jnp.pad(s, ((0, 0), (0, 0), (0, pad)))
    sp = jnp.moveaxis(sp.reshape(m, n, -1, chunk), 2, 0)  # (nc, m, n, ch)
    out = jax.lax.map(_ess_core, sp)  # (nc, chunk) sequential
    return out.reshape(-1)[:D]


def _split_rhat_raw(samples):
    """Classic split-R-hat on the given scale. samples: (C, n, D) ->
    (D,)."""
    s = _split_chains(jnp.asarray(samples))
    m, half, D = s.shape
    chain_mean = jnp.mean(s, axis=1)  # (m, D)
    chain_var = jnp.var(s, axis=1, ddof=1)
    W = jnp.mean(chain_var, axis=0)
    B = half * jnp.var(chain_mean, axis=0, ddof=1)
    var_plus = (half - 1) / half * W + B / half
    return jnp.sqrt(var_plus / jnp.maximum(W, 1e-30))


def split_rhat(samples):
    """Rank-normalized folded split-R-hat (Vehtari et al. 2021): the max
    of the BULK R-hat (classic split-R-hat on pooled-rank normal scores)
    and the TAIL R-hat (the same on rank-normalized folded scores
    |x - median(x)|, which sees scale/tail disagreement that means
    can't). Heavy-tailed targets — e.g. the Student-t robust-regression
    posterior (config #5) — under-trigger the raw-scale diagnostic; this
    is the form every published metric is gated on (R-hat < 1.01).

    samples: (n, D) or (C, n, D). Returns (D,). A numpy input keeps the
    rank computation on the host fast path (see rank_normalize)."""
    xp = np if isinstance(samples, np.ndarray) else jnp
    if not isinstance(samples, np.ndarray):
        samples = jnp.asarray(samples)
    if samples.ndim == 2:
        samples = samples[None]
    bulk = _split_rhat_raw(rank_normalize(samples))
    med = xp.median(samples, axis=(0, 1), keepdims=True)
    tail = _split_rhat_raw(rank_normalize(xp.abs(samples - med)))
    return jnp.maximum(bulk, tail)
