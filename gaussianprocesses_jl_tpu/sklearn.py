"""Scikit-learn style estimator adapter (ref: src/ScikitLearn.jl, 95 LoC).

The reference bridges to ScikitLearnBase (`fit!`, `predict`, `score`,
`get_params`, `clone` — ref ScikitLearn.jl:7-16, transposing to its
column-major layout at the boundary). This package is row-major already,
so the adapter is a thin sklearn-compatible estimator usable in sklearn
pipelines/model-selection (duck-typed; no sklearn import required)."""
from __future__ import annotations

import copy

import jax.numpy as jnp
import numpy as np

from .models.gpe import GPE
from .ops.kernels import SEIso
from .ops.means import MeanZero

__all__ = ["GPRegressor"]


class GPRegressor:
    """Exact-GP regressor with the sklearn estimator protocol.

    Parameters mirror the GPE constructor; `fit` optimizes the marginal
    likelihood (type-II ML) unless optimize=False."""

    def __init__(self, kernel=None, mean=None, lognoise=-2.0,
                 optimize=True, maxiter=200):
        self.kernel = kernel
        self.mean = mean
        self.lognoise = lognoise
        self.optimize = optimize
        self.maxiter = maxiter

    # -- sklearn protocol --------------------------------------------------
    def get_params(self, deep=True):
        return {
            "kernel": self.kernel,
            "mean": self.mean,
            "lognoise": self.lognoise,
            "optimize": self.optimize,
            "maxiter": self.maxiter,
        }

    def set_params(self, **params):
        for k, v in params.items():
            if k not in self.get_params():
                raise ValueError(f"invalid parameter {k!r}")
            setattr(self, k, v)
        return self

    def clone(self):
        return GPRegressor(**copy.deepcopy(self.get_params()))

    def fit(self, X, y):
        kernel = self.kernel if self.kernel is not None else SEIso(
            ll=jnp.zeros(()), lsigma=jnp.zeros(()))
        mean = self.mean if self.mean is not None else MeanZero()
        self.gp_ = GPE(np.asarray(X, dtype=float), np.asarray(y, dtype=float),
                       mean, kernel, lognoise=self.lognoise)
        if self.optimize:
            self.gp_.optimize(maxiter=self.maxiter)
        return self

    def predict(self, X, return_std=False):
        if not hasattr(self, "gp_"):
            raise RuntimeError("fit() must be called before predict()")
        mu, var = self.gp_.predict_y(np.asarray(X, dtype=float))
        if return_std:
            return np.asarray(mu), np.sqrt(np.asarray(var))
        return np.asarray(mu)

    def score(self, X, y):
        """R^2 coefficient of determination (sklearn convention)."""
        y = np.asarray(y, dtype=float)
        pred = self.predict(X)
        ss_res = float(np.sum((y - pred) ** 2))
        ss_tot = float(np.sum((y - np.mean(y)) ** 2))
        return 1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0

    def log_marginal_likelihood(self):
        return float(self.gp_.mll)
