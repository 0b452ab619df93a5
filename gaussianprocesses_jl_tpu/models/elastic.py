"""ElasticGPE — growable exact GP with incremental Cholesky extension
(ref: src/GPEelastic.jl, 181 LoC backed by ElasticPDMats).

The reference grows Julia ElasticPDMat buffers in place with O(n^2)
Cholesky row appends (ref GPEelastic.jl:13-22, 68-181). XLA needs static
shapes, so the TPU-native design uses the reference's own capacity /
stepsize growth policy (ref prepareappend!, GPEelastic.jl:54-62) as
*compilation buckets*:

  * buffers (X, y, L) are padded to `capacity`; the active count n is a
    traced scalar, so appends within a bucket reuse one compiled
    executable (`lax.dynamic_update_slice` at row n — no recompilation);
  * the Cholesky factor is extended incrementally:
        L_new = [[L, 0], [B^T, chol(D - B^T B)]],  B = L^-1 C
    with inactive rows/cols held at identity so the padded factor is
    well-formed — O(capacity^2 k) per append instead of an O(n^3) refit;
  * crossing `capacity` re-pads by `stepsize` blocks (one recompile per
    bucket, amortized exactly like the reference's buffer growth).

Changing hyperparameters invalidates the factor; the next access rebuilds
it in full (the reference's optimize! path refits too)."""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.kernels import Kernel
from ..ops.linalg import solve_lower
from ..ops.means import Mean, MeanZero
from ..utils.params import wrap_param
from .gpe import GPE, GPEParams, _as_X

__all__ = ["ElasticGPE", "extend_cholesky"]

_LOG_2PI = jnp.log(2.0 * jnp.pi)


@partial(jax.jit, static_argnames=("k",))
def extend_cholesky(L, C, D, n, k: int):
    """Extend a padded Cholesky factor by k rows at position n.

    L: (cap, cap) lower factor, identity on rows/cols >= n.
    C: (cap, k) cross-covariance K(X_old, x_new), rows >= n zeroed.
    D: (k, k) K(x_new, x_new) (+noise).
    Returns the (cap, cap) factor with the new block installed at
    [n:n+k, :n+k]."""
    B = solve_lower(L, C)  # (cap, k); rows >= n are zero
    S = D - B.T @ B
    L_S = jnp.linalg.cholesky(S)
    cap = L.shape[0]
    row_block = B.T  # (k, cap); already zero beyond column n
    row_block = jax.lax.dynamic_update_slice(row_block, L_S, (0, n))
    return jax.lax.dynamic_update_slice(L, row_block, (n, 0))


class ElasticGPE(GPE):
    """GPE with O(n^2 k) incremental `append` (ref ElasticGPE,
    src/GPEelastic.jl)."""

    def __init__(self, dim: int, mean: Mean | None = None,
                 kernel: Kernel | None = None, lognoise=-2.0,
                 capacity: int = 1024, stepsize: int = 1024):
        from ..ops.kernels import SEIso

        kernel = kernel if kernel is not None else SEIso(
            ll=jnp.zeros(()), lsigma=jnp.zeros(()))
        mean = mean if mean is not None else MeanZero()
        self.params = GPEParams(lognoise=wrap_param(lognoise), mean=mean,
                                kernel=kernel)
        from .covariance import FullCovariance

        self.covstrat = FullCovariance()
        self.capacity = int(capacity)
        self.stepsize = int(stepsize)
        self._dim = int(dim)
        self._n = 0
        self._X = jnp.zeros((self.capacity, dim))
        self._y = jnp.zeros((self.capacity,))
        self._L = jnp.eye(self.capacity)
        self._fresh = True  # L matches current params & data

    # -- GPE-compatible views ---------------------------------------------
    @property
    def x(self):
        return self._X[: self._n]

    @x.setter
    def x(self, value):  # GPE.__init__ compatibility not used
        raise AttributeError("use append() to add data to an ElasticGPE")

    @property
    def y(self):
        return self._y[: self._n]

    @y.setter
    def y(self, value):
        raise AttributeError("use append() to add data to an ElasticGPE")

    @property
    def nobs(self):
        return self._n

    @property
    def dim(self):
        return self._dim

    # -- growth ------------------------------------------------------------
    def _grow(self, needed):
        while self.capacity < needed:
            self.capacity += self.stepsize
        X = jnp.zeros((self.capacity, self._dim), dtype=self._X.dtype)
        y = jnp.zeros((self.capacity,), dtype=self._y.dtype)
        self._X = X.at[: self._n].set(self._X[: self._n])
        self._y = y.at[: self._n].set(self._y[: self._n])
        self._fresh = False

    def append(self, x_new, y_new):
        """Append k observations, extending the Cholesky incrementally
        (ref append!, GPEelastic.jl:13-22)."""
        x_new = _as_X(x_new)
        y_new = jnp.atleast_1d(jnp.asarray(y_new, dtype=float))
        k = x_new.shape[0]
        if x_new.shape[1] != self._dim:
            raise ValueError("inconsistent input dimension")
        if self._n + k > self.capacity:
            self._grow(self._n + k)
        n = self._n
        self._X = jax.lax.dynamic_update_slice(self._X, x_new, (n, 0))
        self._y = jax.lax.dynamic_update_slice(self._y, y_new, (n,))
        if self._fresh and n > 0:
            kern = self.params.kernel
            nv = jnp.exp(2.0 * self.params.lognoise.value)
            mask = (jnp.arange(self.capacity) < n).astype(self._X.dtype)
            C = kern.gram(self._X, x_new) * mask[:, None]
            D = kern.gram(x_new) + nv * jnp.eye(k, dtype=self._X.dtype)
            self._L = extend_cholesky(self._L, C, D, n, k)
            self._n = n + k
        else:
            self._n = n + k
            self._rebuild()
        return self

    def _rebuild(self):
        n = self._n
        kern = self.params.kernel
        nv = jnp.exp(2.0 * self.params.lognoise.value)
        K = kern.gram(self._X[:n]) + nv * jnp.eye(n, dtype=self._X.dtype)
        Ln = jnp.linalg.cholesky(K)
        L = jnp.eye(self.capacity, dtype=self._X.dtype)
        self._L = L.at[:n, :n].set(Ln)
        self._fresh = True

    def set_params(self, hyp, **flags):
        # mark stale only: the O(n^3) factor is rebuilt lazily on next
        # access (`chol` / `mll` / `append`), so a hyperparameter sweep
        # pays one refit per *use*, not per set_params call
        out = super().set_params(hyp, **flags)
        self._fresh = False
        return out

    # -- fast paths using the maintained factor ----------------------------
    @property
    def chol(self):
        """Active-block Cholesky factor of K + noise."""
        if not self._fresh:
            self._rebuild()
        return self._L[: self._n, : self._n]

    @property
    def alpha(self):
        L = self.chol
        r = self.y - self.params.mean.mean(self.x)
        from ..ops.linalg import chol_solve

        return chol_solve(L, r)

    @property
    def mll(self):
        """mll from the incrementally-maintained factor (O(n^2))."""
        L = self.chol
        r = self.y - self.params.mean.mean(self.x)
        w = solve_lower(L, r)
        n = self._n
        return -0.5 * (jnp.sum(w * w)
                       + 2.0 * jnp.sum(jnp.log(jnp.diag(L)))
                       + n * _LOG_2PI)
