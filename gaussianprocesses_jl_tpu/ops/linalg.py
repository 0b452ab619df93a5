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
    "tri_syrk_lower",
    "blocked_cholesky",
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
    `ok` (the reference's numerical-failure rejection pattern).

    Large f32 factorizations on TPU route through `blocked_cholesky`
    (measured 1.25x over XLA's kernel at n=10000 — see perf/README.md).
    The blocked path's HIGH-precision cross-panel GEMMs can push a
    NEAR-SINGULAR K indefinite where exact-f32 arithmetic succeeds
    (observed r5: masked 1-D SE gram at n=16384 with noise var 0.135 —
    the bf16-3pass correction error ~1e-3 * ||K|| exceeds the noise
    floor), so on failure the factorization retries once with XLA's
    kernel before reporting not-PD."""
    L = _chol(K)
    ok = jnp.all(jnp.isfinite(L))
    if _use_blocked(K):
        L, ok = _retry_chol_xla(ok, L, K)
    eye = jnp.eye(K.shape[-1], dtype=K.dtype)
    L = jnp.where(ok, L, eye)
    return L, ok


def _retry_chol_xla(ok, L, K):
    """Fall back to jnp.linalg.cholesky when the first factorization
    produced NaNs (lax.cond: the retry only executes on failure)."""
    L2 = jax.lax.cond(ok, lambda: L, lambda: jnp.linalg.cholesky(K))
    return L2, jnp.all(jnp.isfinite(L2))


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
# Blocked left-looking Cholesky — beats XLA's kernel for large f32 K
# ---------------------------------------------------------------------------
#
# XLA's cholesky on TPU serializes over ~n/128 panel factorizations; at
# n=10000/f32 it reaches 12.4 TFLOP/s against a measured ~35 TFLOP/s GEMM
# ceiling. A left-looking blocked reformulation keeps the same panel
# latency chain but (a) uses wide panels so only n/block sequential
# units remain, (b) turns every cross-panel update into one large GEMM,
# and (c) replaces the panel TRSM with a GEMM against the panel inverse
# (tri_inv_lower). Measured FRESH at n=10000 f32 on TPU v5e (r3, with the
# true-size trailing panel and forced-readback timing): 21.4 ms /
# 15.6 TFLOP/s at block=512 vs 26.8 ms / 12.4 TFLOP/s for
# jnp.linalg.cholesky — 1.25x, 44% of the measured GEMM peak. The r3
# block sweep at n=10000: 512 -> 15.6, 640 -> 15.3, 1024 -> 14.2,
# 2048 -> 13.0 TFLOP/s (wider panels push more FLOPs into the serial
# HIGHEST-precision panel GEMMs). A fused Pallas panel kernel was built
# and measured slower (0.6 ms/launch overhead); the full study is
# perf/pallas_cholesky_study.py + perf/README.md.

# cross-panel GEMM precision: HIGH = 3-pass bf16, which measured the same
# factor error as 6-pass at n=10240 (the panel factorizations and solves
# always run at HIGHEST)
_BLOCKED_CHOL_PRECISION = jax.lax.Precision.HIGH
# measured crossover vs XLA's kernel with block=512 (r3): 0.90x at
# n<=3000, 1.02x at 4096, 1.22x at 6144, 1.25x at 10000
_BLOCKED_CHOL_MIN_N = 6000


def blocked_cholesky(K: jnp.ndarray, block: int = 512,
                     precision=None, panel_solve_precision=None) -> tuple:
    """Left-looking blocked Cholesky with fused log-det: (L, logdet).

    Panels are factorized by `jnp.linalg.cholesky` and solved via their
    MXU-built triangular inverse; all cross-panel work is GEMMs at
    `precision` (default HIGH — see _BLOCKED_CHOL_PRECISION). Equals the
    XLA factorization to rounding; NaNs propagate on indefinite input
    (gate with safe_cholesky).

    When n is not a multiple of `block`, the trailing panel is factorized
    at its TRUE size instead of padding to the next block multiple —
    padding 10000 -> 10240 cost ~7% wasted FLOPs plus pad assembly on the
    shipped n=10k benchmark shape (VERDICT r2)."""
    precision = _BLOCKED_CHOL_PRECISION if precision is None else precision
    psp = (jax.lax.Precision.HIGHEST if panel_solve_precision is None
           else panel_solve_precision)
    n = K.shape[-1]
    B = block
    if n <= B:
        L = jnp.linalg.cholesky(K)
        return L, chol_logdet(L)
    nb = -(-n // B)
    # panel widths: nb-1 full blocks + a true-size remainder (== B if exact)
    sizes = [B] * (nb - 1) + [n - (nb - 1) * B]
    cols = []
    for k in range(nb):
        bk = sizes[k]
        off = k * B
        Acol = K[off:, off:off + bk]
        if k > 0:
            # subtract the contribution of every finished panel in ONE
            # GEMM: A[off:, off:off+bk] -= L[off:, :off] L[off:off+bk, :off]^T
            P = jnp.concatenate(
                [cols[j][(k - j) * B:, :] for j in range(k)], axis=1)
            Acol = Acol - jnp.matmul(P, P[:bk, :].T, precision=precision)
        lkk = jnp.linalg.cholesky(Acol[:bk, :bk])
        if k + 1 < nb:
            linvT = tri_inv_lower(lkk).T
            Lpan = jnp.matmul(Acol[bk:, :], linvT, precision=psp)
            cols.append(jnp.concatenate([jnp.tril(lkk), Lpan], axis=0))
        else:
            cols.append(jnp.tril(lkk))
    rows = []
    for i in range(nb):
        bi = sizes[i]
        parts = [cols[j][(i - j) * B:(i - j) * B + bi, :]
                 for j in range(i + 1)]
        pad = n - (i * B + bi)
        if pad:
            parts.append(jnp.zeros((bi, pad), K.dtype))
        rows.append(jnp.concatenate(parts, axis=1))
    L = jnp.concatenate(rows, axis=0)
    return L, chol_logdet(L)


def _use_blocked(K) -> bool:
    """Route to blocked_cholesky only where it measured faster: one big
    f32 matrix on the TPU backend (trace-time static decision)."""
    return (K.ndim == 2 and K.shape[-1] >= _BLOCKED_CHOL_MIN_N
            and K.dtype == jnp.float32
            and jax.default_backend() == "tpu")


def _chol(K: jnp.ndarray) -> jnp.ndarray:
    if _use_blocked(K):
        return blocked_cholesky(K)[0]
    return jnp.linalg.cholesky(K)


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
    L = _chol(K)
    w = solve_triangular(L, r, lower=True)
    quad = jnp.sum(w * w)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    ok = jnp.all(jnp.isfinite(L))
    return quad, logdet, ok


def tri_syrk_lower(Linv: jnp.ndarray, block: int = 2048,
                   precision=None) -> jnp.ndarray:
    """Linv^T @ Linv for LOWER-TRIANGULAR Linv, exploiting the triangle.

    The full GEMM cannot see the zeros above the diagonal, so it spends
    2 n^3 FLOPs; block (i, j) of the product only needs rows >= i*block
    of Linv (everything above is zero in block-column i), and the upper
    triangle is the mirror of the lower — ~3x fewer FLOPs. At n=16384
    this is the dominant term of the dense-mll gradient (the K^-1 build
    in dense_quad_logdet's backward), where the full product measured
    ~3x this blocked form's GEMM time."""
    precision = _HIGH if precision is None else precision
    n = Linv.shape[-1]
    if n <= block:
        return jnp.matmul(Linv.T, Linv, precision=precision)
    nb = -(-n // block)
    # compute the lower block triangle once, then assemble rows mirroring
    # the upper blocks from their transposes — assembling from the small
    # blocks keeps peak memory at ~1.5x the output (a whole-matrix
    # where(upper, Kl.T, Kl) mirror held 3 full n^2 buffers live and
    # OOM'd the n=16384 Matern gradient on a 16 GB chip)
    blocks = {}
    for i in range(nb):
        i0, i1 = i * block, min((i + 1) * block, n)
        Li = Linv[i0:, i0:i1]  # nonzero rows of block-column i
        for j in range(i + 1):
            j0, j1 = j * block, min((j + 1) * block, n)
            blocks[(i, j)] = jnp.matmul(Li.T, Linv[i0:, j0:j1],
                                        precision=precision)
    rows = []
    for i in range(nb):
        row = [blocks[(i, j)] if j <= i else blocks[(j, i)].T
               for j in range(nb)]
        rows.append(jnp.concatenate(row, axis=1))
    return jnp.concatenate(rows, axis=0)


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
    L = _chol(K)
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
    Kinv = tri_syrk_lower(Linv, precision=_GRAD_GEMM_PRECISION)
    # d quad / dK = -αα^T ; d logdet / dK = K^-1  (both symmetric)
    K_bar = logdet_bar * Kinv - quad_bar * jnp.outer(alpha, alpha)
    r_bar = (2.0 * quad_bar) * alpha
    return K_bar, r_bar


dense_quad_logdet.defvjp(_dql_fwd, _dql_bwd)
