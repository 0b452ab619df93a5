"""Analytic cross-validation for GPE (ref: src/crossvalidation.jl, 341 LoC).

LOO via Rasmussen & Williams eq. 5.12 (sigma_i^2 = 1/[K^-1]_ii,
mu_i = y_i - alpha_i sigma_i^2) and arbitrary-fold CV via the
inverse-submatrix identity (ref predict_CVfold, crossvalidation.jl:180-217).

The reference's ~200 LoC of hand-derived gradient code (R&W eq. 5.13,
ref dlogpdθ_LOO_kern! / dlogpdσ2_LOO / gradient_fold) is replaced by
`jax.grad` of the criterion; folds are padded to a uniform width with
masking for XLA static shapes and evaluated with one batched vmap instead
of a per-fold loop."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.gpe import GPEParams, gpe_factorize
from ..ops.linalg import solve_lower

__all__ = [
    "predict_LOO",
    "logp_LOO",
    "dlogp_LOO",
    "predict_CVfold",
    "logp_CVfold",
    "dlogp_CVfold",
]

_LOG_2PI = jnp.log(2.0 * jnp.pi)


def _loo_parts(params: GPEParams, X, y, covstrat):
    pd = gpe_factorize(params, X, covstrat)
    r = y - params.mean.mean(X)
    alpha = pd.solve(r)
    Linv = solve_lower(pd.L, jnp.eye(pd.L.shape[0], dtype=pd.L.dtype))
    diag_inv = jnp.sum(Linv * Linv, axis=0)  # diag(Sigma^-1)
    sigma2 = 1.0 / diag_inv
    mu = y - alpha * sigma2
    return mu, sigma2, pd, alpha


def predict_LOO(gp):
    """(mu_i, sigma_i^2) of y_i | y_-i for every i (ref predict_LOO,
    crossvalidation.jl:8-37)."""
    return jax.jit(
        lambda p, X, y, cs: _loo_parts(p, X, y, cs)[:2]
    )(gp.params, gp.x, gp.y, gp.covstrat)


def _logp_loo(params, X, y, covstrat):
    mu, sigma2, _, _ = _loo_parts(params, X, y, covstrat)
    return jnp.sum(
        -0.5 * (_LOG_2PI + jnp.log(sigma2) + (y - mu) ** 2 / sigma2)
    )


def logp_LOO(gp):
    """Sum of LOO predictive log-pdfs (ref logp_LOO,
    crossvalidation.jl:50-57)."""
    return jax.jit(_logp_loo)(gp.params, gp.x, gp.y, gp.covstrat)


def dlogp_LOO(gp, noise=True, domean=True, kern=True):
    """Gradient of the LOO criterion over the selected blocks — autodiff
    replacement for R&W eq. 5.13 (ref dlogpdθ_LOO, crossvalidation.jl)."""
    embed, x0, _ = gp._block_plumbing((noise, domean, kern))
    base, X, y, cs = gp.params, gp.x, gp.y, gp.covstrat

    def f(sub):
        return _logp_loo(base.with_flat_params(embed(sub)), X, y, cs)

    return jax.jit(jax.grad(f))(x0)


def _pad_folds(folds, n):
    fmax = max(len(f) for f in folds)
    idx = tuple(tuple(f) + (0,) * (fmax - len(f)) for f in folds)
    mask = tuple((1.0,) * len(f) + (0.0,) * (fmax - len(f)) for f in folds)
    return idx, mask


def _cvfold_mvns(params, X, y, covstrat, idx, mask):
    """Per-fold (mu_V, Sigma_V) via the inverse-submatrix identity:
    Sigma_V = inv([K^-1]_VV), mu_V = y_V - Sigma_V alpha_V. Padded lanes
    become independent unit-variance dimensions centered on y (zero
    contribution to the criterion)."""
    pd = gpe_factorize(params, X, covstrat)
    r = y - params.mean.mean(X)
    alpha = pd.solve(r)
    L = pd.L
    n = X.shape[0]
    Linv = solve_lower(L, jnp.eye(n, dtype=L.dtype))
    Kinv = Linv.T @ Linv
    idx_a = jnp.asarray(idx, dtype=int)  # (nf, fmax)
    mask_a = jnp.asarray(mask, dtype=X.dtype)

    def one_fold(V, m):
        KVV = Kinv[jnp.ix_(V, V)]
        KVV = KVV * (m[:, None] * m[None, :])
        KVV = KVV + jnp.diag(1.0 - m)  # identity padding
        SigmaV = jnp.linalg.inv(KVV)
        muV = y[V] - SigmaV @ (alpha[V] * m)
        return muV, SigmaV

    return jax.vmap(one_fold)(idx_a, mask_a), alpha


def predict_CVfold(gp, folds):
    """Cross-validated fold predictions (ref predict_CVfold,
    crossvalidation.jl:180-217). Returns a list of (mu_V, Sigma_V)."""
    idx, mask = _pad_folds([list(f) for f in folds], gp.nobs)
    (mus, Sigmas), _ = jax.jit(
        _cvfold_mvns, static_argnames=("idx", "mask")
    )(gp.params, gp.x, gp.y, gp.covstrat, idx, mask)
    out = []
    for i, f in enumerate(folds):
        k = len(f)
        out.append((mus[i, :k], Sigmas[i, :k, :k]))
    return out


def _logp_cvfold(params, X, y, covstrat, idx, mask):
    (mus, Sigmas), _ = _cvfold_mvns(params, X, y, covstrat, idx, mask)
    idx_a = jnp.asarray(idx, dtype=int)
    mask_a = jnp.asarray(mask, dtype=X.dtype)

    def one(muV, SigmaV, V, m):
        yV = y[V] * m + muV * (1.0 - m)  # padded lanes contribute 0
        L = jnp.linalg.cholesky(SigmaV)
        w = solve_lower(L, yV - muV)
        k = jnp.sum(m)
        return -0.5 * (jnp.sum(w * w) + k * _LOG_2PI) - jnp.sum(
            jnp.log(jnp.diagonal(L)) * m
        )

    return jnp.sum(jax.vmap(one)(mus, Sigmas, idx_a, mask_a))


def logp_CVfold(gp, folds):
    """CV criterion for arbitrary folds (ref logp_CVfold,
    crossvalidation.jl:226-237)."""
    idx, mask = _pad_folds([list(f) for f in folds], gp.nobs)
    return jax.jit(_logp_cvfold, static_argnames=("idx", "mask"))(
        gp.params, gp.x, gp.y, gp.covstrat, idx, mask
    )


def dlogp_CVfold(gp, folds, noise=True, domean=True, kern=True):
    """Gradient of the fold-CV criterion (autodiff replacement for
    ref gradient_fold / dlogpdθ_CVfold, crossvalidation.jl:250-341)."""
    idx, mask = _pad_folds([list(f) for f in folds], gp.nobs)
    embed, x0, _ = gp._block_plumbing((noise, domean, kern))
    base, X, y, cs = gp.params, gp.x, gp.y, gp.covstrat

    def f(sub):
        return _logp_cvfold(base.with_flat_params(embed(sub)), X, y, cs,
                            idx, mask)

    return jax.jit(jax.grad(f))(x0)
