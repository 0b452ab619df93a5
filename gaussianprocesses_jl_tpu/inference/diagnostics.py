"""Sampler diagnostics: effective sample size and split-R-hat.

The reference prints only acceptance rates (ref src/mcmc.jl:79-82). The
BASELINE metric for this package is *effective samples per second per
chip*, so ESS is first-class: Geyer initial-monotone-sequence estimator
computed via FFT autocorrelation, vectorized over chains and dimensions."""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["effective_sample_size", "split_rhat"]


def _autocorr(x):
    """Autocorrelation function of a 1-D series via FFT.

    A zero-variance (stuck/constant) chain has acov[0] = 0; treat it as
    perfectly correlated (rho = 1 at every lag) so it contributes the
    CONSERVATIVE tau -> ESS ~ 0 rather than a 0/0 NaN that poisons the
    chain-pooled estimate (observed at 1024 vmapped chains when one chain
    rejects through an entire measurement window)."""
    n = x.shape[0]
    x = x - jnp.mean(x)
    nfft = 2 * n
    f = jnp.fft.rfft(x, nfft)
    acov = jnp.fft.irfft(f * jnp.conj(f), nfft)[:n].real
    ok = acov[0] > 0.0
    safe = jnp.where(ok, acov[0], 1.0)
    return jnp.where(ok, acov / safe, jnp.ones_like(acov))


def effective_sample_size(samples, max_workspace_elems: int = 1 << 25):
    """ESS per dimension.

    samples: (n_draws, D) single chain or (C, n_draws, D) multi-chain
    (chains pooled by averaging autocorrelations, as in Stan).
    Returns (D,) effective sample sizes.

    The FFT autocorrelation needs a (C, D, 2n) complex workspace, which
    OOMs HBM for long many-chain runs (observed: 16 GB at C=128,
    n=38400, D=206); dimensions are processed in sequential chunks sized
    so the workspace stays under `max_workspace_elems` complex entries
    (default ~256 MB of complex64)."""
    samples = jnp.asarray(samples)
    if samples.ndim == 2:
        samples = samples[None]
    C, n, D = samples.shape

    def rho_chunk(chunk):  # (C, n, Dc) -> chain-averaged (n, Dc)
        r = jax.vmap(jax.vmap(_autocorr, in_axes=1, out_axes=1))(chunk)
        return jnp.mean(r, axis=0)

    chunk = max(1, min(D, int(max_workspace_elems) // max(1, C * 2 * n)))
    if chunk >= D:
        rho = rho_chunk(samples)  # (n, D)
    else:
        pad = (-D) % chunk
        sp = jnp.pad(samples, ((0, 0), (0, 0), (0, pad)))
        sp = jnp.moveaxis(
            sp.reshape(C, n, -1, chunk), 2, 0)  # (nc, C, n, chunk)
        rho = jax.lax.map(rho_chunk, sp)  # (nc, n, chunk) sequential
        rho = jnp.moveaxis(rho, 0, 1).reshape(n, -1)[:, :D]

    # Geyer: sum consecutive pairs while they stay positive
    n_pairs = n // 2
    pair = rho[0 : 2 * n_pairs : 2] + rho[1 : 2 * n_pairs : 2]  # (n_pairs, D)
    pos = pair > 0
    # keep pairs up to the first non-positive one
    keep = jnp.cumprod(pos, axis=0).astype(rho.dtype)
    tau = -1.0 + 2.0 * jnp.sum(pair * keep, axis=0)
    tau = jnp.maximum(tau, 1.0 / n)
    return C * n / tau


def split_rhat(samples):
    """Split-R-hat convergence diagnostic.

    samples: (C, n_draws, D). Returns (D,)."""
    samples = jnp.asarray(samples)
    if samples.ndim == 2:
        samples = samples[None]
    C, n, D = samples.shape
    half = n // 2
    s = jnp.concatenate(
        [samples[:, :half], samples[:, half : 2 * half]], axis=0
    )  # (2C, half, D)
    m = s.shape[0]
    chain_mean = jnp.mean(s, axis=1)  # (2C, D)
    chain_var = jnp.var(s, axis=1, ddof=1)
    W = jnp.mean(chain_var, axis=0)
    B = half * jnp.var(chain_mean, axis=0, ddof=1)
    var_plus = (half - 1) / half * W + B / half
    return jnp.sqrt(var_plus / jnp.maximum(W, 1e-30))
