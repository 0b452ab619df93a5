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
    "tri_inv_lower",
    "dense_quad_logdet",
    "set_grad_gemm_precision",
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


# ---------------------------------------------------------------------------
# TPU-fast gradient core for the dense marginal likelihood
# ---------------------------------------------------------------------------
#
# XLA's triangular solve on TPU is the slowest op in the exact-GP hot path:
# its row-recurrence serializes, so the Cholesky VJP (two n-rhs TRSMs)
# dominates one mll+gradient step. The reference instead forms the dense
# inverse once per gradient (`get_ααinvcKI!`, ref src/GPE.jl:151-164) —
# the right call on TPU too, provided the inverse is built out of *matmuls*:
# a blocked-recursive lower-triangular inversion keeps everything on the MXU
# (one small batched base solve; all combination work is GEMMs), and
# K^-1 = Linv^T Linv is a single rank-n GEMM.

_HIGH = jax.lax.Precision.HIGHEST


def tri_inv_lower(L: jnp.ndarray, block: int = 256) -> jnp.ndarray:
    """Inverse of a lower-triangular matrix by blocked recursive doubling.

    inv([[A, 0], [B, C]]) = [[inv(A), 0], [-inv(C) B inv(A), inv(C)]] —
    the off-diagonal work is pure GEMM (MXU-bound), unlike a TRSM whose
    row recurrence serializes on TPU. All `block`-sized diagonal blocks are
    inverted up front in ONE batched (vmapped) triangular solve, so the
    only serial chain left is the log2(n/block) GEMM combine levels."""
    n = L.shape[-1]
    if n <= block:
        return solve_triangular(L, jnp.eye(n, dtype=L.dtype), lower=True)
    nb = -(-n // block)
    npad = nb * block
    Lp = L
    if npad != n:
        # pad with an identity tail: its inverse is itself and the padded
        # rows/cols never couple back into the leading n x n block
        Lp = jnp.zeros((npad, npad), dtype=L.dtype)
        Lp = Lp.at[:n, :n].set(L)
        Lp = Lp.at[jnp.arange(n, npad), jnp.arange(n, npad)].set(1.0)
    # batched base case: one vmapped TRSM over all diagonal blocks
    diag_blocks = jnp.stack(
        [Lp[i * block:(i + 1) * block, i * block:(i + 1) * block]
         for i in range(nb)])
    eye_b = jnp.eye(block, dtype=L.dtype)
    Dinv = jax.vmap(lambda b: solve_triangular(b, eye_b, lower=True))(
        diag_blocks)

    def rec(i0: int, m: int) -> jnp.ndarray:
        if m == block:
            return Dinv[i0 // block]
        k = max(block, ((m // 2) // block) * block)
        iA = rec(i0, k)
        iC = rec(i0 + k, m - k)
        B = Lp[i0 + k:i0 + m, i0:i0 + k]
        X = -jnp.matmul(iC, jnp.matmul(B, iA, precision=_HIGH),
                        precision=_HIGH)
        top = jnp.concatenate(
            [iA, jnp.zeros((k, m - k), dtype=L.dtype)], axis=1)
        return jnp.concatenate(
            [top, jnp.concatenate([X, iC], axis=1)], axis=0)

    return rec(0, npad)[:n, :n]


@jax.custom_vjp
def dense_quad_logdet(K: jnp.ndarray, r: jnp.ndarray):
    """(r^T K^-1 r, logdet K, ok) for a dense PSD K, with a custom VJP that
    replaces the Cholesky-VJP triangular solves by an explicit MXU-built
    inverse (the reference's ααᵀ − K⁻¹ precompute, ref src/GPE.jl:151-164,
    re-derived for TPU)."""
    L = jnp.linalg.cholesky(K)
    w = solve_triangular(L, r, lower=True)
    quad = jnp.sum(w * w)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    ok = jnp.all(jnp.isfinite(L))
    return quad, logdet, ok


# Precision of the gradient-only K^-1 GEMM in the backward pass. HIGHEST
# (the default) makes grads match the f32 forward to rounding error;
# Precision.HIGH (3-pass bf16) saves ~35% of the dominant GEMM at ~5e-5
# relative error on K^-1 — amplified by cond(K), so it is an explicit
# opt-in via set_grad_gemm_precision() for well-conditioned models.
_GRAD_GEMM_PRECISION = _HIGH


def set_grad_gemm_precision(precision) -> None:
    """Set the matmul precision of the gradient-only K^-1 build in
    dense_quad_logdet's backward pass (default jax.lax.Precision.HIGHEST)."""
    global _GRAD_GEMM_PRECISION
    _GRAD_GEMM_PRECISION = precision


def _dql_fwd(K, r):
    L = jnp.linalg.cholesky(K)
    Linv = tri_inv_lower(L)
    # the primal w comes from the same triangular solve as the no-grad path,
    # so gp.mll and target_and_dtarget()[0] agree bit-for-bit; the explicit
    # inverse is only used for gradient quantities
    w = solve_triangular(L, r, lower=True)
    quad = jnp.sum(w * w)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    ok = jnp.all(jnp.isfinite(L))
    return (quad, logdet, ok), (Linv, w)


def _dql_bwd(res, cots):
    Linv, w = res
    quad_bar, logdet_bar, _ = cots
    alpha = jnp.matmul(Linv.T, w, precision=_HIGH)  # K^-1 r
    Kinv = jnp.matmul(Linv.T, Linv, precision=_GRAD_GEMM_PRECISION)
    # d quad / dK = -αα^T ; d logdet / dK = K^-1  (both symmetric)
    K_bar = logdet_bar * Kinv - quad_bar * jnp.outer(alpha, alpha)
    r_bar = (2.0 * quad_bar) * alpha
    return K_bar, r_bar


dense_quad_logdet.defvjp(_dql_fwd, _dql_bwd)
