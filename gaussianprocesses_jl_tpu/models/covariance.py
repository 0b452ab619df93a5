"""Covariance strategies — the L5 layer (ref: CovarianceStrategy in
src/GP.jl:10-20 and the sparse strategies under src/sparse/).

The reference's key architectural idea is kept: a GP model holds a
covariance *strategy*, and all likelihood/gradient/prediction code is
generic over it. Here a strategy is a pytree module exposing

  build(kernel, noise_var, X) -> PD        factorized train covariance
  pd.solve(B) / pd.logdet() / pd.quad(y)   the PDMat protocol subset
  predict_mvn(pd, kernel, X, r, alpha, Xs, full_cov) -> (mu_adj, cov/var)

`FullCovariance` (dense, exact — ref src/GP.jl:22) lives here; the
inducing-point strategies (SoR/DTC/FITC/FSA — ref src/sparse/*.jl) implement
the same interface in models/sparse.py as low-rank-plus-diagonal structures.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ..ops.linalg import (
    add_diag,
    chol_logdet,
    chol_solve,
    dense_quad_logdet,
    safe_cholesky,
    solve_lower,
)
from ..utils.modules import Module, module

__all__ = ["DensePD", "FullCovariance"]


@module(static=())
class DensePD(Module):
    """Dense PD matrix represented by its lower Cholesky factor.

    `ok` flags factorization success; on failure the factor is the identity
    and downstream targets must be rejected (ref PosDefException handling,
    src/optimize.jl:47-62)."""

    L: Any  # (n, n) lower triangular
    ok: Any  # () bool

    def solve(self, B):
        return chol_solve(self.L, B)

    def whiten(self, B):
        """L^-1 B (ref PDMats whiten!)."""
        return solve_lower(self.L, B)

    def unwhiten(self, v):
        """L v (ref PDMats unwhiten): maps whitened latents to f-space."""
        return self.L @ v

    def logdet(self):
        return chol_logdet(self.L)

    def quad(self, y):
        """y^T K^-1 y via the whitened vector."""
        w = solve_lower(self.L, y)
        return jnp.sum(w * w)


@module(static=())
class FullCovariance(Module):
    """Exact dense covariance strategy (ref: FullCovariance, src/GP.jl:22)."""

    # the built PD exposes unwhiten(), so GPA's whitened-latent
    # parameterization (f = mu + L v) is available
    supports_whitened_latents = True

    def build(self, kernel, noise_var, X) -> DensePD:
        """K(X, X) + diag(noise_var); noise_var scalar or (n,) vector
        (heteroscedastic, ref src/GPE.jl:177-186)."""
        K = kernel.gram(X)
        L, ok = safe_cholesky(add_diag(K, noise_var))
        return DensePD(L=L, ok=ok)

    def quad_logdet(self, kernel, noise_var, X, r):
        """Fused (r^T K^-1 r, logdet K, ok) for the mll hot path, with the
        MXU-friendly custom VJP (see ops.linalg.dense_quad_logdet) in place
        of the Cholesky-VJP triangular solves."""
        K = add_diag(kernel.gram(X), noise_var)
        return dense_quad_logdet(K, r)

    def predict_mvn(self, pd: DensePD, kernel, X, r, alpha, Xs,
                    full_cov: bool):
        """Batched posterior MVN at test points (ref predictMVN,
        src/GP.jl:25-55) — returns (crossterm_mu, cov_or_var) where
        crossterm_mu = K(Xs,X) alpha and the caller adds the prior mean.
        `r = y - mean` is unused here but needed by the sparse strategies
        (their predictive works through alpha_u = SigmaQR^-1 Kuf Lam^-1 r).

        Unlike the reference's pointwise loop for diagonal prediction
        (ref src/GP.jl:69-77), the diagonal path here is one batched
        whiten + columnwise reduction."""
        Kxs = kernel.gram(X, Xs)  # (n, ns)
        mu_cross = Kxs.T @ alpha
        V = pd.whiten(Kxs)  # (n, ns)
        if full_cov:
            Kss = kernel.gram(Xs)
            cov = Kss - V.T @ V
            return mu_cross, cov
        var = kernel.diag(Xs) - jnp.sum(V * V, axis=0)
        return mu_cross, jnp.maximum(var, 0.0)
