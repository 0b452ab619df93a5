"""Prior distributions for hyperparameters.

The reference attaches Distributions.jl objects to each component
(ref: src/common.jl:123-167 — `set_priors!`, `prior_logpdf`,
`prior_gradlogpdf`). Here priors are small frozen dataclasses (hashable, so
they can live in pytree aux data) exposing `logpdf(x)` (traceable) and
`sample(key)`. Gradients of the log-prior come for free from `jax.grad` of the
target, replacing `prior_gradlogpdf`.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.scipy import stats as jstats
from jax.scipy.special import gammaln

__all__ = [
    "Prior",
    "Normal",
    "LogNormal",
    "Uniform",
    "Gamma",
    "Exponential",
    "Beta",
    "StudentT",
]


@dataclass(frozen=True)
class Prior:
    def logpdf(self, x):
        raise NotImplementedError

    def sample(self, key):
        raise NotImplementedError

    def gradlogpdf(self, x):
        return jax.grad(self.logpdf)(jnp.asarray(x, dtype=float))


@dataclass(frozen=True)
class Normal(Prior):
    mu: float = 0.0
    sigma: float = 1.0

    def logpdf(self, x):
        return jstats.norm.logpdf(x, self.mu, self.sigma)

    def sample(self, key):
        return self.mu + self.sigma * jax.random.normal(key)


@dataclass(frozen=True)
class LogNormal(Prior):
    mu: float = 0.0
    sigma: float = 1.0

    def logpdf(self, x):
        safe = jnp.where(x > 0, x, 1.0)
        lp = (
            -jnp.log(safe)
            - jnp.log(self.sigma)
            - 0.5 * jnp.log(2 * jnp.pi)
            - 0.5 * ((jnp.log(safe) - self.mu) / self.sigma) ** 2
        )
        return jnp.where(x > 0, lp, -jnp.inf)

    def sample(self, key):
        return jnp.exp(self.mu + self.sigma * jax.random.normal(key))


@dataclass(frozen=True)
class Uniform(Prior):
    a: float = 0.0
    b: float = 1.0

    def logpdf(self, x):
        inside = (x >= self.a) & (x <= self.b)
        return jnp.where(inside, -jnp.log(self.b - self.a), -jnp.inf)

    def sample(self, key):
        return jax.random.uniform(key, (), minval=self.a, maxval=self.b)


@dataclass(frozen=True)
class Gamma(Prior):
    """Shape/rate parameterization: p(x) = rate^shape x^{shape-1} e^{-rate x} / Γ(shape)."""

    shape: float = 1.0
    rate: float = 1.0

    def logpdf(self, x):
        safe = jnp.where(x > 0, x, 1.0)
        lp = (
            self.shape * jnp.log(self.rate)
            - gammaln(self.shape)
            + (self.shape - 1) * jnp.log(safe)
            - self.rate * safe
        )
        return jnp.where(x > 0, lp, -jnp.inf)

    def sample(self, key):
        return jax.random.gamma(key, self.shape) / self.rate


@dataclass(frozen=True)
class Exponential(Prior):
    rate: float = 1.0

    def logpdf(self, x):
        return jnp.where(x >= 0, jnp.log(self.rate) - self.rate * x, -jnp.inf)

    def sample(self, key):
        return jax.random.exponential(key) / self.rate


@dataclass(frozen=True)
class Beta(Prior):
    a: float = 1.0
    b: float = 1.0

    def logpdf(self, x):
        return jstats.beta.logpdf(x, self.a, self.b)

    def sample(self, key):
        return jax.random.beta(key, self.a, self.b)


@dataclass(frozen=True)
class StudentT(Prior):
    """Non-standardized Student-t prior with df nu, location mu, scale sigma."""

    nu: float = 3.0
    mu: float = 0.0
    sigma: float = 1.0

    def logpdf(self, x):
        z = (x - self.mu) / self.sigma
        nu = self.nu
        return (
            gammaln((nu + 1) / 2)
            - gammaln(nu / 2)
            - 0.5 * jnp.log(jnp.pi * nu)
            - jnp.log(self.sigma)
            - (nu + 1) / 2 * jnp.log1p(z * z / nu)
        )

    def sample(self, key):
        return self.mu + self.sigma * jax.random.t(key, self.nu)
