"""Covariance kernels, TPU-native.

Capability parity with the reference kernel layer (ref: src/kernels/*.jl,
~1,900 LoC): SE / Matern(1/2, 3/2, 5/2) / RQ / Periodic / Linear / Poly /
Const / Noise, each in isotropic and (where the reference has it) ARD form,
plus Sum / Prod / Masked / Fixed composition.

Architecture differences vs. the reference (deliberate, TPU-first):
  * Kernels are pure pytree modules; `gram` builds the whole covariance
    matrix with MXU matmuls + fused element-wise profiles instead of
    per-entry `cov_ij` scalar loops (ref: src/kernels/kernels.jl:31-84).
  * There are no hand-written hyperparameter gradients (`dKij_dθp`,
    `grad_slice!`, `grad_stack!` — ref src/kernels/kernels.jl:89-147):
    `jax.grad` through `gram` supplies all of them. This also removes the
    need for the reference's ForwardDiff `ADkernel` wrapper
    (ref: src/kernels/autodiff.jl) — *every* kernel here is "autodiff".
  * Hyperparameters are stored on log scale as the pytree leaves, so the
    flat parameter vector equals the reference's `get_params` convention
    (e.g. SEIso -> [ll, lsigma]; ref src/kernels/se_iso.jl).
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from ..utils.modules import Module, module, replace
from .distance import safe_dist, sqdist

__all__ = [
    "Kernel",
    "SEIso",
    "SEArd",
    "SE",
    "Mat12Iso",
    "Mat32Iso",
    "Mat52Iso",
    "Mat12Ard",
    "Mat32Ard",
    "Mat52Ard",
    "Matern",
    "RQIso",
    "RQArd",
    "RQ",
    "Periodic",
    "LinIso",
    "LinArd",
    "Lin",
    "Poly",
    "Noise",
    "Const",
    "SumKernel",
    "ProdKernel",
    "Masked",
    "FixedKernel",
    "fix",
    "free",
]


def _as(x):
    return jnp.asarray(x, dtype=float)


class Kernel(Module):
    """Base covariance kernel.

    Interface (replacing ref src/kernels/kernels.jl protocol):
      gram(X1, X2=None) -> (n1, n2) covariance matrix (X2=None: symmetric)
      diag(X)           -> (n,) diagonal of gram(X, X)
      k(x1, x2)         -> scalar covariance of one pair
    """

    # -- evaluation --------------------------------------------------------
    def gram(self, X1, X2=None):
        raise NotImplementedError

    def diag(self, X):
        return jax.vmap(self)(X, X)

    def __call__(self, x1, x2):
        x1 = jnp.atleast_1d(x1)
        x2 = jnp.atleast_1d(x2)
        return self.gram(x1[None, :], x2[None, :])[0, 0]

    # -- composition -------------------------------------------------------
    def __add__(self, other):
        return SumKernel(self, other)

    def __mul__(self, other):
        return ProdKernel(self, other)


# ---------------------------------------------------------------------------
# Stationary bases
# ---------------------------------------------------------------------------


def _stationary_gram(kern, X1, X2):
    """profile(sqdist(X1, X2)) — large symmetric f32 grams on TPU route
    through the tiled Pallas kernel (measured 1.16-1.27x over XLA from
    n=8192 up; perf/README.md §2), everything else through the XLA
    expansion. Both paths share the module's own _r2profile; gradients of
    the Pallas path are the XLA path's (custom_vjp)."""
    from .pallas_gram import pallas_gram_supported, stationary_gram_pallas

    if pallas_gram_supported(kern, X1, X2):
        return stationary_gram_pallas(kern, X1, X2)
    return kern._r2profile(sqdist(X1, X2))


class _IsoSq(Kernel):
    """Isotropic kernel over squared Euclidean distance (unscaled r2)."""

    def _r2profile(self, r2):
        raise NotImplementedError

    def gram(self, X1, X2=None):
        return _stationary_gram(self, X1, X2)


class _IsoR(Kernel):
    """Isotropic kernel over Euclidean distance r."""

    def _rprofile(self, r):
        raise NotImplementedError

    def _r2profile(self, r2):
        return self._rprofile(safe_dist(r2))

    def gram(self, X1, X2=None):
        return _stationary_gram(self, X1, X2)


class _ArdSq(Kernel):
    """ARD kernel over weighted squared distance sum_d (dx_d / l_d)^2."""

    def _r2profile(self, r2):
        raise NotImplementedError

    def _scale(self, X):
        return X * jnp.exp(-self.ll)[None, :]

    def gram(self, X1, X2=None):
        return _stationary_gram(
            self, self._scale(X1), None if X2 is None else self._scale(X2)
        )


class _ArdR(_ArdSq):
    """ARD kernel over weighted Euclidean distance."""

    def _rprofile(self, r):
        raise NotImplementedError

    def _r2profile(self, r2):
        return self._rprofile(safe_dist(r2))


# ---------------------------------------------------------------------------
# Squared exponential
# ---------------------------------------------------------------------------


@module(static=("priors",))
class SEIso(_IsoSq):
    """k(x,x') = sigma^2 exp(-r2 / (2 l^2))  (ref: src/kernels/se_iso.jl)."""

    ll: Any  # log length scale
    lsigma: Any  # log signal std
    priors: tuple = ()

    def _r2profile(self, r2):
        return jnp.exp(2.0 * self.lsigma - 0.5 * r2 * jnp.exp(-2.0 * self.ll))

    def param_names(self):
        return ["ll", "lsigma"]


@module(static=("priors",))
class SEArd(_ArdSq):
    """ARD squared exponential (ref: src/kernels/se_ard.jl); params
    [ll_1..ll_d, lsigma]."""

    ll: Any  # (d,) log length scales
    lsigma: Any
    priors: tuple = ()

    def _r2profile(self, r2):
        return jnp.exp(2.0 * self.lsigma - 0.5 * r2)


def SE(ll, lsigma):
    """Factory matching the reference's `SE(ll, lσ)` (iso when ll is scalar,
    ARD when ll is a vector; ref src/kernels/se.jl)."""
    ll = _as(ll)
    if ll.ndim == 0:
        return SEIso(ll=ll, lsigma=_as(lsigma))
    return SEArd(ll=ll, lsigma=_as(lsigma))


# ---------------------------------------------------------------------------
# Matern family
# ---------------------------------------------------------------------------


@module(static=("priors",))
class Mat12Iso(_IsoR):
    """k = sigma^2 exp(-r / l)  (ref: src/kernels/mat12_iso.jl)."""

    ll: Any
    lsigma: Any
    priors: tuple = ()

    def _rprofile(self, r):
        return jnp.exp(2.0 * self.lsigma - r * jnp.exp(-self.ll))


@module(static=("priors",))
class Mat32Iso(_IsoR):
    """k = sigma^2 (1+s) exp(-s), s = sqrt(3) r / l (ref: src/kernels/mat32_iso.jl)."""

    ll: Any
    lsigma: Any
    priors: tuple = ()

    def _rprofile(self, r):
        s = math.sqrt(3.0) * r * jnp.exp(-self.ll)
        return jnp.exp(2.0 * self.lsigma) * (1.0 + s) * jnp.exp(-s)


@module(static=("priors",))
class Mat52Iso(_IsoR):
    """k = sigma^2 (1+s+s^2/3) exp(-s), s = sqrt(5) r / l
    (ref: src/kernels/mat52_iso.jl)."""

    ll: Any
    lsigma: Any
    priors: tuple = ()

    def _rprofile(self, r):
        s = math.sqrt(5.0) * r * jnp.exp(-self.ll)
        return jnp.exp(2.0 * self.lsigma) * (1.0 + s + s * s / 3.0) * jnp.exp(-s)


@module(static=("priors",))
class Mat12Ard(_ArdR):
    """ARD exponential kernel (ref: src/kernels/mat12_ard.jl)."""

    ll: Any  # (d,)
    lsigma: Any
    priors: tuple = ()

    def _rprofile(self, r):
        return jnp.exp(2.0 * self.lsigma - r)


@module(static=("priors",))
class Mat32Ard(_ArdR):
    """ARD Matern 3/2 (ref: src/kernels/mat32_ard.jl)."""

    ll: Any
    lsigma: Any
    priors: tuple = ()

    def _rprofile(self, r):
        s = math.sqrt(3.0) * r
        return jnp.exp(2.0 * self.lsigma) * (1.0 + s) * jnp.exp(-s)


@module(static=("priors",))
class Mat52Ard(_ArdR):
    """ARD Matern 5/2 (ref: src/kernels/mat52_ard.jl)."""

    ll: Any
    lsigma: Any
    priors: tuple = ()

    def _rprofile(self, r):
        s = math.sqrt(5.0) * r
        return jnp.exp(2.0 * self.lsigma) * (1.0 + s + s * s / 3.0) * jnp.exp(-s)


def Matern(nu, ll, lsigma):
    """Matern factory by order nu in {1/2, 3/2, 5/2}; iso for scalar ll, ARD
    for vector ll (ref: src/kernels/mat.jl:52-74)."""
    ll = _as(ll)
    lsigma = _as(lsigma)
    table = {
        0.5: (Mat12Iso, Mat12Ard),
        1.5: (Mat32Iso, Mat32Ard),
        2.5: (Mat52Iso, Mat52Ard),
    }
    if float(nu) not in table:
        raise ValueError("Only Matern 1/2, 3/2 and 5/2 are implemented")
    iso_cls, ard_cls = table[float(nu)]
    cls = iso_cls if ll.ndim == 0 else ard_cls
    return cls(ll=ll, lsigma=lsigma)


# ---------------------------------------------------------------------------
# Rational quadratic
# ---------------------------------------------------------------------------


@module(static=("priors",))
class RQIso(_IsoSq):
    """k = sigma^2 (1 + r2/(2 alpha l^2))^-alpha (ref: src/kernels/rq_iso.jl);
    params [ll, lsigma, lalpha]."""

    ll: Any
    lsigma: Any
    lalpha: Any
    priors: tuple = ()

    def _r2profile(self, r2):
        alpha = jnp.exp(self.lalpha)
        z = r2 * jnp.exp(-2.0 * self.ll) / (2.0 * alpha)
        return jnp.exp(2.0 * self.lsigma - alpha * jnp.log1p(z))


@module(static=("priors",))
class RQArd(_ArdSq):
    """ARD rational quadratic (ref: src/kernels/rq_ard.jl); params
    [ll_1..ll_d, lsigma, lalpha]."""

    ll: Any
    lsigma: Any
    lalpha: Any
    priors: tuple = ()

    def _r2profile(self, r2):
        alpha = jnp.exp(self.lalpha)
        return jnp.exp(2.0 * self.lsigma - alpha * jnp.log1p(r2 / (2.0 * alpha)))


def RQ(ll, lsigma, lalpha):
    """RQ factory (iso / ARD by ll shape; ref src/kernels/rq.jl)."""
    ll = _as(ll)
    if ll.ndim == 0:
        return RQIso(ll=ll, lsigma=_as(lsigma), lalpha=_as(lalpha))
    return RQArd(ll=ll, lsigma=_as(lsigma), lalpha=_as(lalpha))


# ---------------------------------------------------------------------------
# Periodic
# ---------------------------------------------------------------------------


@module(static=("priors",))
class Periodic(_IsoR):
    """k = sigma^2 exp(-2 sin^2(pi r / p) / l^2) (ref: src/kernels/periodic.jl);
    params [ll, lsigma, lp]."""

    ll: Any
    lsigma: Any
    lp: Any
    priors: tuple = ()

    def _rprofile(self, r):
        s = jnp.sin(jnp.pi * r * jnp.exp(-self.lp))
        return jnp.exp(2.0 * self.lsigma - 2.0 * s * s * jnp.exp(-2.0 * self.ll))


# ---------------------------------------------------------------------------
# Dot-product family
# ---------------------------------------------------------------------------


@module(static=("priors",))
class LinIso(Kernel):
    """k = x.y / l^2 (ref: src/kernels/lin_iso.jl); params [ll]."""

    ll: Any
    priors: tuple = ()

    def gram(self, X1, X2=None):
        X2 = X1 if X2 is None else X2
        return jnp.exp(-2.0 * self.ll) * jnp.dot(
            X1, X2.T, preferred_element_type=X1.dtype
        )


@module(static=("priors",))
class LinArd(Kernel):
    """k = (x/l).(y/l) (ref: src/kernels/lin_ard.jl); params [ll_1..ll_d]."""

    ll: Any  # (d,)
    priors: tuple = ()

    def gram(self, X1, X2=None):
        w = jnp.exp(-self.ll)[None, :]
        X1w = X1 * w
        X2w = X1w if X2 is None else X2 * w
        return jnp.dot(X1w, X2w.T, preferred_element_type=X1.dtype)


def Lin(ll):
    """Linear kernel factory (iso / ARD by ll shape; ref src/kernels/lin.jl)."""
    ll = _as(ll)
    return LinIso(ll=ll) if ll.ndim == 0 else LinArd(ll=ll)


@module(static=("deg", "priors"))
class Poly(Kernel):
    """k = sigma^2 (c + x.y)^deg with integer degree fixed
    (ref: src/kernels/poly.jl); params [lc, lsigma]."""

    lc: Any
    lsigma: Any
    deg: int = 2
    priors: tuple = ()

    def gram(self, X1, X2=None):
        X2 = X1 if X2 is None else X2
        xy = jnp.dot(X1, X2.T, preferred_element_type=X1.dtype)
        return jnp.exp(2.0 * self.lsigma) * (jnp.exp(self.lc) + xy) ** self.deg


# ---------------------------------------------------------------------------
# Noise / Const
# ---------------------------------------------------------------------------


@module(static=("priors",))
class Noise(Kernel):
    """White noise: sigma^2 * delta(x ~= x') (ref: src/kernels/noise.jl).

    The reference tests approximate equality per coordinate with Julia's
    relative `isapprox` (default rtol = sqrt(eps); ref
    src/kernels/noise.jl:31-39). The squared-distance analog used here:
    points coincide when d2(x, x') <= eps * max(|x|^2, |x'|^2, 1) — note
    rtol^2 = eps, so this is the same relative scale as the reference's
    per-coordinate test (worst-coordinate sense), with an absolute floor
    near the origin. Relative (not absolute) tolerance matters in f32:
    duplicated points with coordinates ~1e3 round d2 at exactly the
    eps * |x|^2 scale through the MXU gram expansion.

    Known divergence from the reference NEAR THE ORIGIN: the absolute
    floor (scale clamped to >= 1) merges distinct points within ~sqrt(eps)
    absolute distance of each other when both lie near 0 — e.g. (0,) and
    (1e-10,) — where the reference's per-coordinate relative isapprox
    keeps them distinct. Accepted tradeoff: without the floor, (0,) vs
    (0,) itself would fail the test under f32 gram round-off."""

    lsigma: Any
    priors: tuple = ()

    def gram(self, X1, X2=None):
        d2 = sqdist(X1, X2)
        eps = jnp.finfo(jnp.asarray(X1).dtype).eps
        s1 = jnp.sum(X1 * X1, axis=-1)
        s2 = s1 if X2 is None else jnp.sum(X2 * X2, axis=-1)
        scale = jnp.maximum(jnp.maximum(s1[:, None], s2[None, :]), 1.0)
        return jnp.where(d2 <= eps * scale, jnp.exp(2.0 * self.lsigma), 0.0)


@module(static=("priors",))
class Const(Kernel):
    """Constant covariance sigma^2 (ref: src/kernels/const.jl)."""

    lsigma: Any
    priors: tuple = ()

    def gram(self, X1, X2=None):
        n1 = X1.shape[0]
        n2 = n1 if X2 is None else X2.shape[0]
        return jnp.full((n1, n2), jnp.exp(2.0 * self.lsigma))


# ---------------------------------------------------------------------------
# Composition
# ---------------------------------------------------------------------------


@module(static=())
class SumKernel(Kernel):
    """k1 + k2 (ref: src/kernels/sum_kernel.jl); params [k1; k2]."""

    k1: Kernel
    k2: Kernel

    def gram(self, X1, X2=None):
        return self.k1.gram(X1, X2) + self.k2.gram(X1, X2)

    def diag(self, X):
        return self.k1.diag(X) + self.k2.diag(X)


@module(static=())
class ProdKernel(Kernel):
    """k1 * k2 (ref: src/kernels/prod_kernel.jl); params [k1; k2]."""

    k1: Kernel
    k2: Kernel

    def gram(self, X1, X2=None):
        return self.k1.gram(X1, X2) * self.k2.gram(X1, X2)

    def diag(self, X):
        return self.k1.diag(X) * self.k2.diag(X)


@module(static=("active_dims",))
class Masked(Kernel):
    """Apply `kern` to a subset of input dimensions
    (ref: src/kernels/masked_kernel.jl)."""

    kern: Kernel
    active_dims: tuple = ()

    def _sel(self, X):
        return X[:, jnp.array(self.active_dims, dtype=int)]

    def gram(self, X1, X2=None):
        return self.kern.gram(self._sel(X1), None if X2 is None else self._sel(X2))

    def diag(self, X):
        return self.kern.diag(self._sel(X))


@module(static=("free_idx",))
class FixedKernel(Kernel):
    """Freeze a subset of hyperparameters: only `free_idx` (0-based, into the
    wrapped kernel's flat params) are exposed (ref: src/kernels/fixed_kernel.jl).

    Matching the reference, the prior contribution of a FixedKernel is zero
    (ref fixed_kernel.jl:92-98)."""

    kern: Kernel
    free_idx: tuple = ()

    def gram(self, X1, X2=None):
        return self.kern.gram(X1, X2)

    def diag(self, X):
        return self.kern.diag(X)

    def flat_params(self):
        inner = self.kern.flat_params()
        idx = jnp.array(self.free_idx, dtype=int)
        return inner[idx] if self.free_idx else jnp.zeros((0,), dtype=inner.dtype)

    def with_flat_params(self, vec):
        inner = self.kern.flat_params()
        if self.free_idx:
            inner = inner.at[jnp.array(self.free_idx, dtype=int)].set(
                jnp.asarray(vec)
            )
        return replace(self, kern=self.kern.with_flat_params(inner))

    @property
    def n_params(self):
        return len(self.free_idx)

    def param_names(self):
        names = self.kern.param_names()
        return [names[i] for i in self.free_idx]

    def priors_flat(self):
        inner = self.kern.priors_flat()
        return [inner[i] for i in self.free_idx]

    def prior_logpdf(self):
        return jnp.zeros(())


def fix(kern: Kernel, par: str | None = None) -> FixedKernel:
    """fix(k) freezes all params; fix(k, 'lsigma') freezes one by name
    (ref: src/kernels/fixed_kernel.jl:26-43)."""
    if isinstance(kern, FixedKernel):
        if par is None:
            return replace(kern, free_idx=())
        names = kern.kern.param_names()
        return replace(
            kern, free_idx=tuple(i for i in kern.free_idx if names[i] != par)
        )
    if par is None:
        return FixedKernel(kern=kern, free_idx=())
    names = kern.param_names()
    free_i = tuple(i for i, n in enumerate(names) if n != par)
    return FixedKernel(kern=kern, free_idx=free_i)


def free(kern: FixedKernel, par: str | None = None):
    """Unfreeze (ref: src/kernels/fixed_kernel.jl:46-59)."""
    if par is None:
        return kern.kern
    names = kern.kern.param_names()
    try:
        ipar = names.index(par)
    except ValueError:
        return kern
    if ipar in kern.free_idx:
        return kern
    return replace(kern, free_idx=tuple(sorted(set(kern.free_idx) | {ipar})))
