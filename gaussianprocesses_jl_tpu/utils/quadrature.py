"""Gauss-Hermite quadrature (ref: predict_obs in src/likelihoods/likelihoods.jl:16-31,
which uses FastGaussQuadrature.gausshermite with 20 nodes).

Nodes/weights are computed once with numpy (physicists' convention,
weight e^{-x^2}) and baked into the jitted graph as constants."""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

__all__ = ["gauss_hermite", "hermgauss_expectation"]


@lru_cache(maxsize=None)
def _hermgauss(n: int):
    x, w = np.polynomial.hermite.hermgauss(n)
    return x, w


def gauss_hermite(n: int = 20):
    """Return (nodes, weights) with weights already normalized by 1/sqrt(pi),
    so that E_{z~N(0,1)}[g(z)] ~= sum_i w_i g(sqrt(2) x_i)."""
    x, w = _hermgauss(n)
    return jnp.asarray(x), jnp.asarray(w / np.sqrt(np.pi))


def hermgauss_expectation(g, mu, var, n: int = 20):
    """E_{f ~ N(mu, var)}[g(f)] elementwise over (mu, var) arrays.

    g must map an array of f-values to an array of the same shape."""
    x, w = gauss_hermite(n)
    f = mu[..., None] + jnp.sqrt(2.0 * var)[..., None] * x  # (..., n)
    return jnp.sum(g(f) * w, axis=-1)
