"""Sparse inducing-point approximations — SoR / DTC / FITC / FSA
(ref: src/sparse/*.jl, ~1,300 LoC; Quinonero-Candela & Rasmussen 2005).

All four strategies share the low-rank-plus-residual structure

    Sigma ~= Kfu Kuu^-1 Kuf + Lambda

with Lambda = sigma^2 I (SoR/DTC), sigma^2 I + diag(Kff - Qff) (FITC), or
block-diagonal residuals (FSA). The Woodbury solve, determinant-lemma
logdet, and trinvAB identities are kept from the reference (they are math,
not Julia — ref fully_indep_train_conditional.jl:18-77); what changes:

  * everything is a pure pytree; `jax.grad` through the Woodbury algebra
    replaces ~700 LoC of hand-derived O(nm^2) gradient code
    (ref subsetofregressors.jl:118-253, fully_indep...jl:160-276,
    full_scale...jl:240-326);
  * the m x n cross-covariance and the n-dim Lambda work are batched
    MXU-friendly matmuls; on a device mesh the n axis shards column-wise
    with psum-reduced Kuf Lam^-1 Kfu (see parallel/);
  * FSA's ragged block partition becomes a *padded uniform* block tensor
    with masking (XLA needs static shapes — SURVEY §7 hard parts).

All strategies plug into the same GPE/GPA code paths via the
CovarianceStrategy interface (build / solve / logdet / predict_mvn).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from jax.scipy.linalg import solve_triangular

from ..ops.linalg import (add_diag, chol_logdet, default_jitter,
                          safe_cholesky, solve_lower, solve_upper)
from ..utils.modules import Module, module

__all__ = [
    "SubsetOfRegsStrategy",
    "DeterminTrainCondStrat",
    "FullyIndepStrat",
    "FullScaleApproxStrat",
    "SoR",
    "DTC",
    "FITC",
    "FSA",
    "LowRankPD",
    "pad_pred_blocks",
]

# ref: nugget=1e-10 in all sparse update_cK! paths (f64); scaled up for f32
_JITTER = 1e-10


def _jit_of(X):
    return default_jitter(X.dtype)


# ---------------------------------------------------------------------------
# Residual (Lambda) representations
# ---------------------------------------------------------------------------


@module(static=())
class _DiagLambda(Module):
    """Lambda = diag(d) (covers the SoR/DTC scalar case with d = sigma^2 1)."""

    d: Any  # (n,)

    def solve(self, B):
        return B / self.d if B.ndim == 1 else B / self.d[:, None]

    def logdet(self):
        return jnp.sum(jnp.log(self.d))

    def matvec(self, B):
        return B * self.d if B.ndim == 1 else B * self.d[:, None]

    def whiten_rows(self, B):
        """Lambda^-1/2 B (rows may be permuted/padded — consumers treat the
        row layout as opaque and only pair whiten_rows with whiten_rows_T)."""
        return B / jnp.sqrt(self.d)[:, None]

    def whiten_rows_T(self, Z):
        """Adjoint of whiten_rows: maps whitened-row layout back to (n, k)."""
        return Z / jnp.sqrt(self.d)[:, None]

    def trace(self):
        return jnp.sum(self.d)


@module(static=("block_idx", "block_mask"))
class _BlockDiagLambda(Module):
    """Block-diagonal Lambda over a padded uniform partition.

    chols: (nb, bmax, bmax) lower Cholesky factors of the padded blocks
    (identity rows/cols on padding, so padded lanes contribute nothing to
    logdet and solve exactly).
    block_idx / block_mask: static tuples encoding the padded partition.
    """

    chols: Any  # (nb, bmax, bmax)
    ok: Any
    block_idx: tuple = ()  # tuple of tuples, padded with 0
    block_mask: tuple = ()  # tuple of tuples of 0/1

    def _idx(self):
        return jnp.asarray(self.block_idx, dtype=int)  # (nb, bmax)

    def _mask(self):
        return jnp.asarray(self.block_mask)  # (nb, bmax)

    def solve(self, B):
        vec = B.ndim == 1
        if vec:
            B = B[:, None]
        idx, mask = self._idx(), self._mask()
        Bb = B[idx.reshape(-1)].reshape(idx.shape + (B.shape[1],))
        Bb = Bb * mask[..., None]

        def block_solve(L, rhs):
            return solve_upper(L, solve_lower(L, rhs))

        Xb = jax.vmap(block_solve)(self.chols, Bb)  # (nb, bmax, k)
        Xb = Xb * mask[..., None]
        out = jnp.zeros_like(B)
        out = out.at[idx.reshape(-1)].add(
            Xb.reshape(-1, B.shape[1])
            * mask.reshape(-1)[:, None]
        )
        return out[:, 0] if vec else out

    def logdet(self):
        # padded diagonal entries are 1 -> log contribution 0
        d = jnp.diagonal(self.chols, axis1=-2, axis2=-1)
        return 2.0 * jnp.sum(jnp.log(d))

    def whiten_rows(self, B):
        """Blockwise L_b^-1 B rows in padded (nb*bmax, k) layout, padded
        lanes zeroed. Consumers treat the layout as opaque and only pair
        whiten_rows with whiten_rows_T (their composition is Lambda^-1)."""
        idx, mask = self._idx(), self._mask()
        Bb = B[idx.reshape(-1)].reshape(idx.shape + (B.shape[1],))
        Bb = Bb * mask[..., None]
        Wb = jax.vmap(lambda L, rhs: solve_lower(L, rhs))(self.chols, Bb)
        Wb = Wb * mask[..., None]
        return Wb.reshape(-1, B.shape[1])

    def whiten_rows_T(self, Z):
        """Adjoint: blockwise L_b^-T on padded rows, scattered back to
        (n, k)."""
        idx, mask = self._idx(), self._mask()
        k = Z.shape[1]
        Zb = Z.reshape(idx.shape + (k,)) * mask[..., None]
        Tb = jax.vmap(lambda L, rhs: solve_upper(L, rhs))(self.chols, Zb)
        Tb = Tb * mask[..., None]
        # scatter back (each index appears once among unmasked lanes)
        flat_idx = idx.reshape(-1)
        out = jnp.zeros((self._n(), k), dtype=Z.dtype)
        out = out.at[flat_idx].add(
            Tb.reshape(-1, k) * mask.reshape(-1)[:, None])
        return out

    def _n(self):
        return sum(int(m) for row in self.block_mask for m in row)

    def trace(self):
        """tr(Lambda) = sum of squared rows of the block factors over the
        unmasked lanes (padded lanes are identity rows — excluded by the
        mask)."""
        return jnp.sum((self.chols ** 2) * self._mask()[:, :, None])


# ---------------------------------------------------------------------------
# Shared low-rank PD matrix
# ---------------------------------------------------------------------------


@module(static=())
class LowRankPD(Module):
    """Sigma = Kfu Kuu^-1 Kuf + Lambda, factorized for O(n m^2) algebra
    (ref SubsetOfRegsPDMat / FullyIndepPDMat / FullScalePDMat).

    Factorization: reduced QR of A = [Lam^-1/2 Kfu; Luu^T] gives R^T R =
    SigmaQR = Kuu + Kuf Lam^-1 Kfu *and* the orthogonal rows Qw (the first
    n' rows of Q), from which

        Sigma^-1 = Lam^-1/2 (I - Qw Qw^T) Lam^-1/2.

    This replaces the reference's normal-equations Cholesky + Woodbury
    triangular solves (ref subsetofregressors.jl:50-52, 107-112): the f32
    error of the naive path is eps * cond(SigmaQR), which for smooth
    kernels produced negative quadratic forms on TPU; the projector form
    is backward stable (no n-side triangular solves at all)."""

    Luu: Any  # (m, m) chol of Kuu + jitter
    Kuf: Any  # (m, n)
    Qw: Any  # (n', m) data rows of Q from qr([Lam^-1/2 Kfu; Luu^T])
    R: Any  # (m, m) upper, R^T R = SigmaQR
    lam: Any  # _DiagLambda or _BlockDiagLambda
    ok: Any  # () bool

    @property
    def Lqr(self):
        """Lower Cholesky factor of SigmaQR (for m-side solves)."""
        return self.R.T

    # PDMat protocol ------------------------------------------------------
    def solve(self, B):
        """Sigma^-1 B = Lam^-1/2 (I - Qw Qw^T) Lam^-1/2 B."""
        vec = B.ndim == 1
        Bm = B[:, None] if vec else B
        w = self.lam.whiten_rows(Bm)
        z = w - self.Qw @ (self.Qw.T @ w)
        out = self.lam.whiten_rows_T(z)
        return out[:, 0] if vec else out

    def logdet(self):
        """Determinant lemma (ref fully_indep...jl:70-77)."""
        return (2.0 * jnp.sum(jnp.log(jnp.diagonal(self.R)))
                - chol_logdet(self.Luu) + self.lam.logdet())

    def quad(self, y):
        """y^T Sigma^-1 y = ||w||^2 - ||Qw^T w||^2, w = Lam^-1/2 y."""
        w = self.lam.whiten_rows(y[:, None])
        t = self.Qw.T @ w
        return jnp.sum(w * w) - jnp.sum(t * t)

    def trace(self):
        """tr(Sigma) = |whiten(Kuu, Kuf)|_F^2 + tr(Lambda)
        (ref fully_indep...jl:97-108)."""
        Lk = solve_lower(self.Luu, self.Kuf)
        return jnp.sum(Lk * Lk) + self.lam.trace()

    def dense(self):
        """Densify (test/debug only; ref Base.Matrix)."""
        Lk = solve_lower(self.Luu, self.Kuf)
        Q = Lk.T @ Lk
        if isinstance(self.lam, _DiagLambda):
            return add_diag(Q, self.lam.d)
        idx = self.lam._idx()
        mask = self.lam._mask()
        n = self.Kuf.shape[1]
        Lam = jnp.zeros((n, n), dtype=Q.dtype)
        blocks = jax.vmap(lambda L: L @ L.T)(self.lam.chols)
        for b in range(idx.shape[0]):
            ib = idx[b]
            mb = mask[b]
            Lam = Lam.at[jnp.ix_(ib, ib)].add(
                blocks[b] * (mb[:, None] * mb[None, :])
            )
            # subtract the identity padding contribution
            Lam = Lam.at[ib, ib].add(-(1.0 - mb))
        return Q + Lam

    def alpha_u(self, r):
        """SigmaQR^-1 Kuf Lam^-1 r = R^-1 Qw^T Lam^-1/2 r
        (ref get_alpha_u, subsetofregressors.jl:260-268)."""
        w = self.lam.whiten_rows(r[:, None])
        t = self.Qw.T @ w  # (m, 1)
        return solve_triangular(self.R, t, lower=False)[:, 0]


# ---------------------------------------------------------------------------
# Strategies
# ---------------------------------------------------------------------------


def _common_pieces(kernel, Xu, X):
    Kuu = kernel.gram(Xu)
    # Kuu of smooth kernels is severely ill-conditioned; in f32 the whiten
    # path needs cond(Luu) <~ 1e4 for the FITC/FSA residuals to stay
    # accurate, so jitter relative to the diagonal scale (f64 keeps the
    # reference's effectively-absolute 1e-10).
    rel = 1e-10 if jnp.dtype(X.dtype) == jnp.float64 else 1e-4
    scale = jnp.maximum(jnp.max(jnp.diagonal(Kuu)), 1.0)
    Luu, ok_uu = safe_cholesky(add_diag(Kuu, rel * scale))
    Kuf = kernel.gram(Xu, X)
    return Kuu, Luu, ok_uu, Kuf


def _finish(Kuu, Luu, ok_uu, Kuf, lam):
    """Factorize SigmaQR = Kuu + Kuf Lam^-1 Kfu.

    Instead of forming the normal equations and Cholesky-ing (ref
    subsetofregressors.jl:107-112 — which in f32 loses PSD to rounding of
    the big n-term matmul), take the QR of the stacked matrix
    [Lam^-1/2 Kfu; Luu^T]: R^T R = SigmaQR exactly, with backward-stable
    accuracy and no jitter."""
    W = lam.whiten_rows(Kuf.T)  # (n', m)
    A = jnp.vstack([W, Luu.T])  # (n'+m, m)
    Q, R = jnp.linalg.qr(A, mode="reduced")  # (n'+m, m), (m, m)
    s = jnp.sign(jnp.diagonal(R))
    s = jnp.where(s == 0, 1.0, s)
    R = s[:, None] * R
    Qw = Q[: W.shape[0]] * s[None, :]
    ok_qr = jnp.all(jnp.isfinite(R)) & jnp.all(jnp.diagonal(R) > 0)
    ok = ok_uu & ok_qr & getattr(lam, "ok", jnp.asarray(True))
    return LowRankPD(Luu=Luu, Kuf=Kuf, Qw=Qw, R=R, lam=lam, ok=ok)


@module(static=())
class SubsetOfRegsStrategy(Module):
    """SoR: Lambda = sigma^2 I (ref src/sparse/subsetofregressors.jl)."""

    inducing: Any  # (m, d)

    def build(self, kernel, noise_var, X) -> LowRankPD:
        Kuu, Luu, ok_uu, Kuf = _common_pieces(kernel, self.inducing, X)
        n = X.shape[0]
        d = jnp.broadcast_to(jnp.asarray(noise_var, dtype=Kuf.dtype), (n,))
        return _finish(Kuu, Luu, ok_uu, Kuf, _DiagLambda(d=d))

    def predict_mvn(self, pd: LowRankPD, kernel, X, r, alpha, Xs,
                    full_cov: bool):
        """QR05 eq. 16b (ref subsetofregressors.jl:302-321):
        mu = Kxu alpha_u, Sigma = Kxu SigmaQR^-1 Kux."""
        Kux = kernel.gram(self.inducing, Xs)  # (m, ns)
        mu_cross = Kux.T @ pd.alpha_u(r)
        Lck = solve_lower(pd.Lqr, Kux)
        if full_cov:
            return mu_cross, Lck.T @ Lck
        return mu_cross, jnp.maximum(jnp.sum(Lck * Lck, axis=0), 0.0)


@module(static=())
class DeterminTrainCondStrat(Module):
    """DTC: same train covariance as SoR; predictive variance corrected to
    Sigma_xx - Q_xx + Sigma_SoR (QR05 eq. 20b;
    ref src/sparse/determ_train_conditional.jl)."""

    inducing: Any

    def build(self, kernel, noise_var, X) -> LowRankPD:
        return SubsetOfRegsStrategy(inducing=self.inducing).build(
            kernel, noise_var, X)

    def predict_mvn(self, pd, kernel, X, r, alpha, Xs, full_cov):
        Kux = kernel.gram(self.inducing, Xs)
        mu_cross = Kux.T @ pd.alpha_u(r)
        Lck = solve_lower(pd.Lqr, Kux)  # SigmaQR^-1/2 Kux
        Lq = solve_lower(pd.Luu, Kux)  # Kuu^-1/2 Kux  (-> Qxx)
        if full_cov:
            Kss = kernel.gram(Xs)
            return mu_cross, Kss - Lq.T @ Lq + Lck.T @ Lck
        var = (kernel.diag(Xs) - jnp.sum(Lq * Lq, axis=0)
               + jnp.sum(Lck * Lck, axis=0))
        return mu_cross, jnp.maximum(var, 0.0)


@module(static=())
class FullyIndepStrat(Module):
    """FITC: Lambda = sigma^2 I + diag(Kff - Qff)
    (ref src/sparse/fully_indep_train_conditional.jl); prediction = DTC's
    (QR05 eq. 24b)."""

    inducing: Any

    def build(self, kernel, noise_var, X) -> LowRankPD:
        Kuu, Luu, ok_uu, Kuf = _common_pieces(kernel, self.inducing, X)
        Lk = solve_lower(Luu, Kuf)
        qdiag = jnp.sum(Lk * Lk, axis=0)
        # clamp the residual (Kff - Qff >= 0 in exact arithmetic) BEFORE
        # adding the noise, so f32 overshoot of qdiag past kdiag can never
        # collapse Lambda below the noise floor (w = r/sqrt(d) would explode)
        d = noise_var + jnp.maximum(kernel.diag(X) - qdiag, 0.0)
        d = jnp.maximum(d, _jit_of(X))
        return _finish(Kuu, Luu, ok_uu, Kuf, _DiagLambda(d=d))

    def predict_mvn(self, pd, kernel, X, r, alpha, Xs, full_cov):
        return DeterminTrainCondStrat(inducing=self.inducing).predict_mvn(
            pd, kernel, X, r, alpha, Xs, full_cov)


def _pad_blocks(blocks, n):
    """Validate a partition of range(n) and pad to uniform width."""
    seen = sorted(i for b in blocks for i in b)
    if seen != list(range(n)):
        raise ValueError("blockindices must partition all observation indices")
    bmax = max(len(b) for b in blocks)
    idx = tuple(tuple(b) + (0,) * (bmax - len(b)) for b in blocks)
    mask = tuple((1.0,) * len(b) + (0.0,) * (bmax - len(b)) for b in blocks)
    return idx, mask


def pad_pred_blocks(blockindpred, ns, nb):
    """Normalize per-training-block prediction-point assignments (ref
    blockindpred, full_scale_approximation.jl:456-477) into padded static
    tuples (idx, mask) for the jitted FSA predictive.

    blockindpred: one sequence of prediction-point indices per training
    block (len == nb). Indices must be disjoint and in range(ns); test
    points not assigned anywhere get no cross-Lambda correction (they are
    treated as their own blocks, the blockindpred=None semantics)."""
    blocks = [list(b) for b in blockindpred]
    if len(blocks) != nb:
        raise ValueError(
            f"blockindpred must have one entry per training block "
            f"({nb}), got {len(blocks)}")
    flat = [i for b in blocks for i in b]
    if len(set(flat)) != len(flat):
        raise ValueError("blockindpred assigns a test point twice")
    if flat and (min(flat) < 0 or max(flat) >= ns):
        raise ValueError("blockindpred index out of range")
    bmax = max((len(b) for b in blocks), default=0)
    if bmax == 0:
        raise ValueError("blockindpred assigns no test points")
    idx = tuple(tuple(b) + (0,) * (bmax - len(b)) for b in blocks)
    mask = tuple((1.0,) * len(b) + (0.0,) * (bmax - len(b)) for b in blocks)
    return idx, mask


@module(static=("block_idx", "block_mask"))
class FullScaleApproxStrat(Module):
    """FSA: Lambda block-diagonal with blocks
    K(Xb,Xb) - Q(Xb,Xb) + sigma^2 I over a user partition
    (ref src/sparse/full_scale_approximation.jl). Ragged partitions are
    padded to a uniform block width with masking (XLA static shapes)."""

    inducing: Any
    block_idx: tuple = ()
    block_mask: tuple = ()

    def build(self, kernel, noise_var, X) -> LowRankPD:
        Kuu, Luu, ok_uu, Kuf = _common_pieces(kernel, self.inducing, X)
        idx = jnp.asarray(self.block_idx, dtype=int)  # (nb, bmax)
        mask = jnp.asarray(self.block_mask, dtype=X.dtype)
        Xb = X[idx.reshape(-1)].reshape(idx.shape + (X.shape[1],))

        Kuf_b = Kuf.T[idx.reshape(-1)].reshape(idx.shape + (Kuf.shape[0],))

        def block_residual(Xblk, Kub_T, mblk):
            Kblk = kernel.gram(Xblk)
            Lq = solve_lower(Luu, Kub_T.T)  # (m, bmax)
            R = Kblk - Lq.T @ Lq
            R = R * (mblk[:, None] * mblk[None, :])
            R = add_diag(R, mblk * noise_var + (1.0 - mblk))
            # masked rows/cols collapse to the identity
            return jnp.linalg.cholesky(add_diag(R, mblk * _jit_of(X)))

        chols = jax.vmap(block_residual)(Xb, Kuf_b, mask)
        ok_lam = jnp.all(jnp.isfinite(chols))
        eye = jnp.eye(chols.shape[-1], dtype=chols.dtype)
        chols = jnp.where(ok_lam, chols, eye[None])
        lam = _BlockDiagLambda(
            chols=chols, ok=ok_lam, block_idx=self.block_idx,
            block_mask=self.block_mask,
        )
        return _finish(Kuu, Luu, ok_uu, Kuf, lam)

    def predict_mvn(self, pd, kernel, X, r, alpha, Xs, full_cov,
                    blockindpred=None):
        """FSA prediction (ref full_scale_approximation.jl:413-477):
        mu = Kxu alpha_u + Lam_xf alpha,
        Sigma = Sigma_xx - (Qxf + Lam_xf) Sigma^-1 (Qxf + Lam_xf)^T.
        Without prediction blocks (blockindpred=None) Lam_xf = 0, i.e. test
        points are treated as their own blocks.

        blockindpred: padded static (idx, mask) tuples from pad_pred_blocks
        assigning test points to training blocks; the cross-residual
        Lam_xf[i, j] = K(x*_i, x_j) - Q(x*_i, x_j) is nonzero exactly where
        test point i shares a block with training point j. The build is one
        batched (vmapped) per-block gram + gather + masked scatter-add —
        no Python loop over blocks."""
        Kux = kernel.gram(self.inducing, Xs)  # (m, ns)
        mu_cross = Kux.T @ pd.alpha_u(r)

        # Qxf = Kxu Kuu^-1 Kuf
        Lq_x = solve_lower(pd.Luu, Kux)  # (m, ns)
        Lq_f = solve_lower(pd.Luu, pd.Kuf)  # (m, n)
        Qxf = Lq_x.T @ Lq_f  # (ns, n)

        Lam_xf = jnp.zeros_like(Qxf)
        if blockindpred is not None:
            pidx_t, pmask_t = blockindpred
            pidx = jnp.asarray(pidx_t, dtype=int)  # (nb, pmax)
            pmask = jnp.asarray(pmask_t, dtype=Qxf.dtype)
            fidx = jnp.asarray(self.block_idx, dtype=int)  # (nb, fmax)
            fmask = jnp.asarray(self.block_mask, dtype=Qxf.dtype)
            Xs_b = Xs[pidx.reshape(-1)].reshape(pidx.shape + (Xs.shape[1],))
            X_b = X[fidx.reshape(-1)].reshape(fidx.shape + (X.shape[1],))
            Kb = jax.vmap(kernel.gram)(Xs_b, X_b)  # (nb, pmax, fmax)
            Qb = Qxf[pidx[:, :, None], fidx[:, None, :]]
            w = pmask[:, :, None] * fmask[:, None, :]
            Lam_xf = Lam_xf.at[pidx[:, :, None], fidx[:, None, :]].add(
                (Kb - Qb) * w)
            mu_cross = mu_cross + Lam_xf @ alpha

        QL = Qxf + Lam_xf
        SinvQL = pd.solve(QL.T)  # (n, ns)
        if full_cov:
            Kss = kernel.gram(Xs)
            return mu_cross, Kss - QL @ SinvQL
        var = kernel.diag(Xs) - jnp.sum(QL.T * SinvQL, axis=0)
        return mu_cross, jnp.maximum(var, 0.0)


# ---------------------------------------------------------------------------
# Reference-style constructors (ref SoR()/DTC()/FITC()/FSA())
# ---------------------------------------------------------------------------


def _as_inducing(Xu):
    Xu = jnp.asarray(Xu, dtype=float)
    return Xu[:, None] if Xu.ndim == 1 else Xu


def SoR(x, inducing, y, mean=None, kernel=None, lognoise=-2.0):
    from .gpe import GPE

    return GPE(x, y, mean, kernel, lognoise,
               covstrat=SubsetOfRegsStrategy(inducing=_as_inducing(inducing)))


def DTC(x, inducing, y, mean=None, kernel=None, lognoise=-2.0):
    from .gpe import GPE

    return GPE(x, y, mean, kernel, lognoise,
               covstrat=DeterminTrainCondStrat(
                   inducing=_as_inducing(inducing)))


def FITC(x, inducing, y, mean=None, kernel=None, lognoise=-2.0):
    from .gpe import GPE

    return GPE(x, y, mean, kernel, lognoise,
               covstrat=FullyIndepStrat(inducing=_as_inducing(inducing)))


def FSA(x, inducing, blockindices, y, mean=None, kernel=None, lognoise=-2.0):
    from .gpe import GPE

    x = jnp.asarray(x, dtype=float)
    n = x.shape[0] if x.ndim > 1 else x.shape[0]
    idx, mask = _pad_blocks([list(b) for b in blockindices], n)
    return GPE(x, y, mean, kernel, lognoise,
               covstrat=FullScaleApproxStrat(
                   inducing=_as_inducing(inducing),
                   block_idx=idx, block_mask=mask))
