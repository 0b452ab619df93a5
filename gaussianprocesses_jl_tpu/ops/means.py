"""Mean functions (ref: src/means/*.jl, ~280 LoC).

Pure pytree modules; `mean(X) -> (n,)` is vectorized over observations
instead of the reference's per-column loop (ref: src/means/means.jl:3-23).
`grad_stack` (the n x p Jacobian used by dmll_mean!) is supplied by
`jax.jacfwd` for free; no hand gradients."""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..utils.modules import Module, module

__all__ = [
    "Mean",
    "MeanZero",
    "MeanConst",
    "MeanLin",
    "MeanPoly",
    "MeanPeriodic",
    "SumMean",
    "ProdMean",
]


class Mean(Module):
    def mean(self, X):
        """X: (n, d) -> (n,)"""
        raise NotImplementedError

    def __call__(self, X):
        return self.mean(X)

    def __add__(self, other):
        return SumMean(self, other)

    def __mul__(self, other):
        return ProdMean(self, other)

    def grad_stack(self, X):
        """(n, p) Jacobian of the mean vector w.r.t. flat params
        (ref: src/means/means.jl grad_stack)."""

        def f(vec):
            return self.with_flat_params(vec).mean(X)

        return jax.jacfwd(f)(self.flat_params())


@module(static=())
class MeanZero(Mean):
    """m(x) = 0 (ref: src/means/mZero.jl)."""

    def mean(self, X):
        return jnp.zeros(X.shape[0], dtype=X.dtype)


@module(static=("priors",))
class MeanConst(Mean):
    """m(x) = beta (ref: src/means/mConst.jl)."""

    beta: Any
    priors: tuple = ()

    def mean(self, X):
        return jnp.full(X.shape[0], self.beta)


@module(static=("priors",))
class MeanLin(Mean):
    """m(x) = x . beta (ref: src/means/mLin.jl)."""

    beta: Any  # (d,)
    priors: tuple = ()

    def mean(self, X):
        return X @ self.beta


@module(static=("priors",))
class MeanPoly(Mean):
    """m(x) = sum_ij beta_ij x_i^j  (ref: src/means/mPoly.jl).

    beta is stored as (deg, d) so that the C-order flat parameter vector
    matches the reference's column-major `vec(β)` of its (d, deg) matrix."""

    beta: Any  # (deg, d)
    priors: tuple = ()

    def mean(self, X):
        deg = self.beta.shape[0]
        # powers: (deg, n, d); contraction over (deg, d)
        powers = X[None, :, :] ** jnp.arange(1, deg + 1, dtype=X.dtype)[:, None, None]
        return jnp.einsum("jnd,jd->n", powers, self.beta)


@module(static=("priors",))
class MeanPeriodic(Mean):
    """m(x) = a'cos(2 pi x / p) + b'sin(2 pi x / p) (ref: src/means/mPeriodic.jl);
    params [a; b; lp]."""

    a: Any  # (d,)
    b: Any  # (d,)
    lp: Any  # (d,) log period

    priors: tuple = ()

    def mean(self, X):
        ang = 2.0 * jnp.pi * X * jnp.exp(-self.lp)[None, :]
        return jnp.cos(ang) @ self.a + jnp.sin(ang) @ self.b


@module(static=())
class SumMean(Mean):
    """m1 + m2 (ref: src/means/sum_mean.jl)."""

    m1: Mean
    m2: Mean

    def mean(self, X):
        return self.m1.mean(X) + self.m2.mean(X)


@module(static=())
class ProdMean(Mean):
    """m1 * m2 (ref: src/means/prod_mean.jl)."""

    m1: Mean
    m2: Mean

    def mean(self, X):
        return self.m1.mean(X) * self.m2.mean(X)
