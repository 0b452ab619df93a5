"""Observation likelihoods for non-Gaussian GP models
(ref: src/likelihoods/*.jl, ~300 LoC).

Protocol (replacing ref src/likelihoods/likelihoods.jl):
  log_dens(f, y)      elementwise log p(y_i | f_i)          -> (n,)
  dlog_dens_df(f, y)  d/df log p (supplied by jax.grad)      -> (n,)
  mean_lik / var_lik  moments of y | f                       -> (n,)
  predict_obs(mu, var) predictive moments of y given
                      f ~ N(mu, var); default 20-point Gauss-Hermite
                      (ref likelihoods.jl:16-31), closed forms where the
                      reference has them (Bernoulli, Gaussian)
  var_exp(y, m, v)    E_{f~N(m,v)}[log p(y|f)] summed — the VI objective
                      term (ref: var_exp in poisson.jl / gaussian.jl).
                      Closed form for Poisson/Gaussian; quadrature fallback
                      for the rest (an extension over the reference, which
                      only supports VI for Poisson/Gaussian).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln, log_ndtr, ndtr

from ..utils.modules import Module, module
from ..utils.quadrature import hermgauss_expectation

__all__ = [
    "Likelihood",
    "GaussLik",
    "BernLik",
    "PoisLik",
    "StuTLik",
    "ExpLik",
    "BinLik",
]

_HALF_LOG_2PI = 0.5 * jnp.log(2.0 * jnp.pi)


class Likelihood(Module):
    def log_dens(self, f, y):
        raise NotImplementedError

    def dlog_dens_df(self, f, y):
        """Derivative of log density w.r.t. the latent f — autodiff replaces
        the reference's hand formulas (e.g. bernoulli.jl dlog_dens_df)."""
        return jax.vmap(jax.grad(lambda fi, yi: self.log_dens(fi, yi).sum()))(f, y)

    def mean_lik(self, f):
        raise NotImplementedError

    def var_lik(self, f):
        raise NotImplementedError

    def predict_obs(self, fmean, fvar):
        """Predictive mean/variance of y when f ~ N(fmean, fvar), by
        Gauss-Hermite quadrature (ref likelihoods.jl:16-31)."""
        m = hermgauss_expectation(lambda f: self.mean_lik(f), fmean, fvar)
        second = hermgauss_expectation(
            lambda f: self.var_lik(f) + self.mean_lik(f) ** 2, fmean, fvar
        )
        return m, second - m**2

    def var_exp(self, y, m, v):
        """sum_i E_{f_i~N(m_i, v_i)}[log p(y_i | f_i)] (VI objective)."""
        return jnp.sum(
            hermgauss_expectation(lambda f: self.log_dens(f, y[..., None]), m, v)
        )

    def dv_var_exp(self, y, m, v):
        """d var_exp / d v elementwise (ref: dv_var_exp)."""
        return jax.grad(lambda vv: self.var_exp(y, m, vv))(v)


@module(static=("priors",))
class GaussLik(Likelihood):
    """Gaussian likelihood with std sigma = exp(lsigma)
    (ref: src/likelihoods/gaussian.jl); params [lsigma].

    Note: the closed-form `var_exp` here is the mathematically correct
    -0.5 log(2 pi) - log sigma - ((y-m)^2 + v) / (2 sigma^2); the reference's
    gaussian.jl divides by sigma (not sigma^2) and uses -0.5 log sigma, which
    we treat as a reference bug rather than behavior to replicate."""

    lsigma: Any
    priors: tuple = ()

    def log_dens(self, f, y):
        s2 = jnp.exp(2.0 * self.lsigma)
        return -_HALF_LOG_2PI - self.lsigma - 0.5 * (y - f) ** 2 / s2

    def mean_lik(self, f):
        return f

    def var_lik(self, f):
        return jnp.full_like(f, jnp.exp(2.0 * self.lsigma))

    def predict_obs(self, fmean, fvar):
        return fmean, fvar + jnp.exp(2.0 * self.lsigma)

    def var_exp(self, y, m, v):
        s2 = jnp.exp(2.0 * self.lsigma)
        return jnp.sum(-_HALF_LOG_2PI - self.lsigma - 0.5 * ((y - m) ** 2 + v) / s2)


@module(static=())
class BernLik(Likelihood):
    """Bernoulli with probit link theta = Phi(f)
    (ref: src/likelihoods/bernoulli.jl); y in {0, 1}."""

    def log_dens(self, f, y):
        y = jnp.asarray(y, dtype=f.dtype)
        return y * log_ndtr(f) + (1.0 - y) * log_ndtr(-f)

    def mean_lik(self, f):
        return ndtr(f)

    def var_lik(self, f):
        p = ndtr(f)
        return p * (1.0 - p)

    def predict_obs(self, fmean, fvar):
        # closed form: p = Phi(mu / sqrt(1 + var)) (ref bernoulli.jl:29-32)
        p = ndtr(fmean / jnp.sqrt(1.0 + fvar))
        return p, p - p * p


@module(static=())
class PoisLik(Likelihood):
    """Poisson with log link theta = exp(f) (ref: src/likelihoods/poisson.jl)."""

    def log_dens(self, f, y):
        y = jnp.asarray(y, dtype=f.dtype)
        return y * f - jnp.exp(f) - gammaln(1.0 + y)

    def mean_lik(self, f):
        return jnp.exp(f)

    def var_lik(self, f):
        return jnp.exp(f)

    def var_exp(self, y, m, v):
        # closed form (ref poisson.jl var_exp): sum y m - exp(m + v/2) - log y!
        y = jnp.asarray(y, dtype=m.dtype)
        return jnp.sum(y * m - jnp.exp(m + 0.5 * v) - gammaln(1.0 + y))


@module(static=("nu", "priors"))
class StuTLik(Likelihood):
    """Student-t with fixed integer df nu and scale sigma = exp(lsigma)
    (ref: src/likelihoods/studentT.jl); params [lsigma]."""

    lsigma: Any
    nu: int = 3
    priors: tuple = ()

    def log_dens(self, f, y):
        nu = float(self.nu)
        sigma = jnp.exp(self.lsigma)
        c = (
            gammaln(0.5 * (nu + 1.0))
            - gammaln(0.5 * nu)
            - 0.5 * jnp.log(jnp.pi * nu)
            - self.lsigma
        )
        z = (y - f) / sigma
        return c - 0.5 * (nu + 1.0) * jnp.log1p(z * z / nu)

    def mean_lik(self, f):
        return f

    def var_lik(self, f):
        nu = float(self.nu)
        return jnp.full_like(f, jnp.exp(2.0 * self.lsigma) * nu / (nu - 2.0))


@module(static=())
class ExpLik(Likelihood):
    """Exponential with rate theta = exp(-f) (ref: src/likelihoods/exponential.jl)."""

    def log_dens(self, f, y):
        return -f - jnp.exp(-f) * y

    def mean_lik(self, f):
        return jnp.exp(f)

    def var_lik(self, f):
        return jnp.exp(2.0 * f)


@module(static=("n",))
class BinLik(Likelihood):
    """Binomial with fixed trial count n, logistic link
    (ref: src/likelihoods/binomial.jl)."""

    n: int = 1

    def log_dens(self, f, y):
        y = jnp.asarray(y, dtype=f.dtype)
        n = float(self.n)
        logp = jax.nn.log_sigmoid(f)
        log1mp = jax.nn.log_sigmoid(-f)
        return (
            gammaln(n + 1.0)
            - gammaln(y + 1.0)
            - gammaln(n - y + 1.0)
            + y * logp
            + (n - y) * log1mp
        )

    def mean_lik(self, f):
        return float(self.n) * jax.nn.sigmoid(f)

    def var_lik(self, f):
        p = jax.nn.sigmoid(f)
        return float(self.n) * p * (1.0 - p)
