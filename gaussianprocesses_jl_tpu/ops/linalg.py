"""Dense linear algebra for GP inference — the L0 layer
(ref: src/chol_utils.jl, src/utils.jl, make_posdef! in src/GP.jl:101-116).

TPU-first notes:
  * `jnp.linalg.cholesky` lowers to XLA's blocked Cholesky which maps the
    SYRK/GEMM updates onto the MXU; there is no need to port the
    reference's unblocked reverse-mode `chol_unblocked_rev!`
    (ref src/chol_utils.jl:15-39) — JAX ships a Cholesky VJP, and
    `jax.grad` through `cholesky` reproduces the same L-bar algebra.
  * XLA's Cholesky returns NaNs instead of throwing on an indefinite input;
    `safe_cholesky` converts that into an `ok` flag so samplers/optimizers
    can implement the reference's PosDefException -> reject/Inf semantics
    (ref src/optimize.jl:47-62, src/mcmc.jl:19-29) with `lax.cond`/`where`
    inside jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

__all__ = [
    "add_diag",
    "safe_cholesky",
    "solve_lower",
    "solve_upper",
    "chol_solve",
    "chol_logdet",
    "symmetrize",
    "default_jitter",
]


def default_jitter(dtype) -> float:
    """Stabilizing nugget matched to the working precision.

    The reference uses an absolute 1e-10 everywhere (f64 CPU; e.g.
    src/sparse update_cK! nuggets). In f32 on TPU that is below the
    rounding noise of a smooth gram matrix, so scale it up."""
    return 1e-10 if jnp.dtype(dtype) == jnp.float64 else 1e-5


def add_diag(K: jnp.ndarray, v) -> jnp.ndarray:
    """K + diag(v) (v scalar or vector) without materializing an identity."""
    n = K.shape[-1]
    idx = jnp.arange(n)
    return K.at[..., idx, idx].add(v)


def symmetrize(K: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (K + jnp.swapaxes(K, -1, -2))


def safe_cholesky(K: jnp.ndarray):
    """Lower Cholesky factor plus a finite-success flag.

    Returns (L, ok). When the factorization fails (NaNs), L is replaced by
    the identity so downstream solves stay finite; callers must gate on
    `ok` (the reference's numerical-failure rejection pattern)."""
    L = jnp.linalg.cholesky(K)
    ok = jnp.all(jnp.isfinite(L))
    eye = jnp.eye(K.shape[-1], dtype=K.dtype)
    L = jnp.where(ok, L, eye)
    return L, ok


def solve_lower(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """L^-1 B (a.k.a. whiten; ref PDMats whiten!)."""
    return solve_triangular(L, B, lower=True)


def solve_upper(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """L^-T B."""
    return solve_triangular(L, B, lower=True, trans=1)


def chol_solve(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """(L L^T)^-1 B via two triangular solves (ref PDMat `\\`)."""
    return solve_upper(L, solve_lower(L, B))


def chol_logdet(L: jnp.ndarray) -> jnp.ndarray:
    """log det(L L^T) = 2 sum log diag(L)."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
