"""Pallas TPU kernel for large stationary gram matrices (SURVEY §7 M4).

One tiled pass over the (n1, n2) output: each (TILE, TILE) block computes
its squared-distance tile on the MXU via the ||x||^2 + ||y||^2 - 2 x.y
expansion and applies the kernel's own `_r2profile` in VMEM before the
single HBM write. Measured on TPU v5e vs the XLA gram build (which also
fuses to one pass): parity below n~8k (both dispatch/HBM-bound), 1.16x at
n=8192 and 1.27x at n=16384 — full table in perf/README.md §2.

Wiring (see ops/kernels.py `_stationary_gram`): symmetric f32 grams with
n >= _PALLAS_GRAM_MIN_N on the TPU backend route here; everything else
takes the XLA path. Gradients come from a `custom_vjp` whose backward
pass is `jax.vjp` of the exact XLA implementation, so hyperparameter and
input cotangents are bit-identical to the non-Pallas path.

The kernel body is *generic over the kernel class*: the module's leaves
are packed into one parameter vector, and the module is rebuilt from the
(static) treedef inside the kernel so its own `_r2profile` runs in VMEM —
no per-kernel math is duplicated here. The symmetric diagonal is pinned
to r2 = 0 in-kernel, matching ops/distance.py's `where(eye)` exactness
fix.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["stationary_gram_pallas", "pallas_gram_supported",
           "PALLAS_GRAM_MIN_N"]

TILE = 256
# measured crossover vs the XLA gram (perf/README.md §2): parity at 3k,
# wins from 8k up
PALLAS_GRAM_MIN_N = 8192


def _pack(kern):
    """Flatten a kernel module's leaves into one f32 vector + static spec."""
    leaves, treedef = jax.tree_util.tree_flatten(kern)
    arrs = [jnp.asarray(l) for l in leaves]
    specs = tuple((tuple(a.shape), int(a.size)) for a in arrs)
    if arrs:
        flat = jnp.concatenate([jnp.ravel(a).astype(jnp.float32)
                                for a in arrs])
    else:
        flat = jnp.zeros((1,), jnp.float32)
    return flat, treedef, specs


def _unpack(treedef, specs, flat):
    leaves = []
    off = 0
    for shape, size in specs:
        leaves.append(flat[off:off + size].reshape(shape))
        off += size
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _gram_kernel(treedef, specs, sym,
                 x1_ref, x2_ref, s1_ref, s2_ref, p_ref, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    cross = jnp.dot(x1_ref[:], x2_ref[:].T,
                    preferred_element_type=jnp.float32)
    r2 = jnp.maximum(s1_ref[:].T + s2_ref[:] - 2.0 * cross, 0.0)
    if sym:
        rows = i * TILE + jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
        cols = j * TILE + jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
        r2 = jnp.where(rows == cols, 0.0, r2)
    kern = _unpack(treedef, specs, p_ref[0])
    out_ref[:] = kern._r2profile(r2)


def _pallas_forward(static, flat, X1, X2):
    treedef, specs, sym = static
    n1, d = X1.shape
    n2 = X2.shape[0]
    # pad rows to the tile boundary (padded rows produce values we slice
    # off) and the feature dim to the 128-lane boundary with zeros (the
    # cross matmul needs exact zero fill)
    n1p = -(-n1 // TILE) * TILE
    n2p = -(-n2 // TILE) * TILE
    dp = -(-d // 128) * 128
    X1 = jnp.pad(X1.astype(jnp.float32), ((0, n1p - n1), (0, dp - d)))
    X2 = jnp.pad(X2.astype(jnp.float32), ((0, n2p - n2), (0, dp - d)))
    s1 = jnp.sum(X1 * X1, axis=1)[None, :]
    s2 = jnp.sum(X2 * X2, axis=1)[None, :]
    p = flat[None, :]
    K = pl.pallas_call(
        functools.partial(_gram_kernel, treedef, specs, sym),
        out_shape=jax.ShapeDtypeStruct((n1p, n2p), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(n1p // TILE, n2p // TILE),
            in_specs=[
                pl.BlockSpec((TILE, dp), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, dp), lambda i, j: (j, 0),
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
            flops=2 * n1p * n2p * dp + 8 * n1p * n2p,
            bytes_accessed=4 * (n1p * dp + n2p * dp + n1p * n2p),
            transcendentals=n1p * n2p,
        ),
        interpret=jax.default_backend() != "tpu",
    )(X1, X2, s1, s2, p)
    return K[:n1, :n2]


def _xla_reference(static, flat, X1, X2):
    """The exact math the Pallas kernel computes, in plain XLA — used as
    the gradient rule (and for equivalence tests)."""
    from .distance import sqdist

    treedef, specs, sym = static
    kern = _unpack(treedef, specs, flat)
    return kern._r2profile(sqdist(X1, None if sym else X2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gram_cv(static, flat, X1, X2):
    return _pallas_forward(static, flat, X1, X2)


def _gram_cv_fwd(static, flat, X1, X2):
    return _pallas_forward(static, flat, X1, X2), (flat, X1, X2)


def _gram_cv_bwd(static, res, g):
    flat, X1, X2 = res
    _, vjp = jax.vjp(lambda f, a, b: _xla_reference(static, f, a, b),
                     flat, X1, X2)
    return vjp(g)


_gram_cv.defvjp(_gram_cv_fwd, _gram_cv_bwd)


def pallas_gram_supported(kern, X1, X2) -> bool:
    """Trace-time static gate: symmetric large f32 gram on the TPU
    backend, kernel leaves all castable to the f32 parameter vector."""
    if jax.default_backend() != "tpu":
        return False
    if X2 is not None:
        return False  # the win is the big symmetric training gram
    if X1.ndim != 2 or X1.shape[0] < PALLAS_GRAM_MIN_N:
        return False
    if X1.dtype != jnp.float32:
        return False
    leaves = jax.tree_util.tree_leaves(kern)
    return all(jnp.asarray(l).dtype in (jnp.float32, jnp.float64)
               for l in leaves)


def stationary_gram_pallas(kern, X1, X2=None):
    """K = kern._r2profile(sqdist(X1, X2)) via the tiled Pallas kernel.

    Callers must have checked `pallas_gram_supported`. Differentiable in
    the kernel hyperparameters and the inputs (custom_vjp -> XLA path).
    """
    sym = X2 is None
    flat, treedef, specs = _pack(kern)
    static = (treedef, specs, sym)
    return _gram_cv(static, flat, X1, X1 if sym else X2)
