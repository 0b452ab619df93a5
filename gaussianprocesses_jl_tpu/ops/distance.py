"""Pairwise distance builders — the TPU replacement for the reference's
KernelData / distance layer (ref: src/kernels/distance.jl:1-106).

Design notes (TPU-first):
  * Squared Euclidean distances are computed with the Gram-expansion
    ||x||^2 + ||y||^2 - 2 x.y — one big matmul that lands on the MXU —
    instead of the reference's per-entry `distij` scalar loops.
  * ARD (per-dimension weighted) distances are obtained by *rescaling the
    inputs* by 1/lengthscale before the same matmul, not by caching an
    n x n x d per-dimension distance stack like StationaryARDData
    (ref: src/kernels/stationary.jl:72-88). On TPU, recomputing an
    (n x d)-scaled matmul is far cheaper than streaming an n^2 d cache
    through HBM; the gradient w.r.t. the lengthscales comes from `jax.grad`
    through the rescaling rather than from the cached stack.
  * The expansion loses relative accuracy for nearly-coincident points; we
    clamp negatives to zero and offer an exact broadcast path for small
    problems (used by f64 gradient-check tests).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["sqdist", "safe_dist", "cross_dot"]

# below this many pairwise cells x dims, the exact O(n^2 d) broadcast
# difference is cheap and numerically preferable
_EXACT_BROADCAST_BUDGET = 4_000_000


def sqdist(X1: jnp.ndarray, X2: jnp.ndarray | None = None) -> jnp.ndarray:
    """Pairwise squared Euclidean distances.

    X1: (n1, d), X2: (n2, d) or None for the symmetric case.
    Returns (n1, n2), non-negative.
    """
    sym = X2 is None
    if sym:
        X2 = X1
    n1, d = X1.shape
    n2 = X2.shape[0]
    if n1 * n2 * max(d, 1) <= _EXACT_BROADCAST_BUDGET:
        diff = X1[:, None, :] - X2[None, :, :]
        d2 = jnp.sum(diff * diff, axis=-1)
    else:
        s1 = jnp.sum(X1 * X1, axis=1)
        s2 = s1 if sym else jnp.sum(X2 * X2, axis=1)
        d2 = s1[:, None] + s2[None, :] - 2.0 * cross_dot(X1, X2)
        d2 = jnp.maximum(d2, 0.0)
    if sym:
        # exact zeros on the diagonal regardless of rounding
        n = X1.shape[0]
        d2 = jnp.where(jnp.eye(n, dtype=bool), 0.0, d2)
    return d2


def safe_dist(d2: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """sqrt of a squared distance with a NaN-free gradient at zero.

    d sqrt(u)/du -> inf as u -> 0; the double-where trick pins both the value
    and the gradient to 0 there, which matches the reference's explicit
    `r == 0 ? 0 : dk_dll(...)` guards (ref: src/kernels/mat.jl:25-31).
    """
    pos = d2 > eps
    safe = jnp.where(pos, d2, 1.0)
    return jnp.where(pos, jnp.sqrt(safe), 0.0)


def cross_dot(X1: jnp.ndarray, X2: jnp.ndarray) -> jnp.ndarray:
    """X1 @ X2.T with f32 accumulation forced on the MXU."""
    return jnp.dot(X1, X2.T, preferred_element_type=X1.dtype)
