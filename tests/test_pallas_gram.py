"""Tiled Pallas gram kernel (ops/pallas_gram.py) vs the XLA path.

On the CPU test backend the kernel runs in interpret mode (the gate
`pallas_gram_supported` routes production traffic only on TPU at
n >= 8192); these tests call the kernel directly to pin value and
gradient equivalence with the XLA gram for several stationary families,
including the padded non-multiple-of-TILE shapes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussianprocesses_jl_tpu as gp
from gaussianprocesses_jl_tpu.ops.pallas_gram import (
    _pack,
    pallas_gram_supported,
    stationary_gram_pallas,
)


def _X(n, d, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(n, d),
                       dtype=jnp.float32)


KERNELS = [
    ("se_iso", gp.SEIso(ll=jnp.float32(0.3), lsigma=jnp.float32(0.2))),
    ("mat32_iso", gp.Mat32Iso(ll=jnp.float32(-0.1), lsigma=jnp.float32(0.1))),
    ("rq_iso", gp.RQIso(ll=jnp.float32(0.2), lsigma=jnp.float32(0.0),
                        lalpha=jnp.float32(0.1))),
]


@pytest.mark.parametrize("name,kern", KERNELS, ids=[k[0] for k in KERNELS])
@pytest.mark.parametrize("n", [256, 300])  # 300 exercises the pad+slice
def test_pallas_gram_matches_xla(name, kern, n):
    X = _X(n, 3)
    K_pl = stationary_gram_pallas(kern, X)
    from gaussianprocesses_jl_tpu.ops.distance import sqdist

    K_xla = kern._r2profile(sqdist(X.astype(jnp.float32)))
    assert K_pl.shape == (n, n)
    assert np.allclose(np.asarray(K_pl), np.asarray(K_xla), atol=1e-5)
    # symmetric diagonal pinned to profile(0) exactly
    d0 = float(kern._r2profile(jnp.zeros(())))
    assert np.allclose(np.asarray(jnp.diagonal(K_pl)), d0, atol=1e-6)


def test_pallas_gram_gradients_are_xla_gradients():
    n = 256
    X = _X(n, 2, seed=1)
    kern = gp.SEIso(ll=jnp.float32(0.1), lsigma=jnp.float32(-0.2))
    w = jnp.asarray(np.random.RandomState(2).randn(n, n), jnp.float32)

    def f_pl(flat, X):
        k = kern.with_flat_params(flat)
        return jnp.sum(w * stationary_gram_pallas(k, X))

    def f_xla(flat, X):
        from gaussianprocesses_jl_tpu.ops.distance import sqdist

        k = kern.with_flat_params(flat)
        return jnp.sum(w * k._r2profile(sqdist(X)))

    flat = kern.flat_params().astype(jnp.float32)
    gp_, gx_ = jax.grad(f_pl, argnums=(0, 1))(flat, X)
    g0, g1 = jax.grad(f_xla, argnums=(0, 1))(flat, X)
    assert np.allclose(np.asarray(gp_), np.asarray(g0), rtol=1e-4, atol=1e-4)
    assert np.allclose(np.asarray(gx_), np.asarray(g1), rtol=1e-4, atol=1e-4)


def test_gate_is_off_everywhere_but_big_tpu_f32():
    kern = gp.SEIso(ll=jnp.zeros(()), lsigma=jnp.zeros(()))
    X = _X(64, 2)
    # CPU backend in tests -> always off; the size/dtype/symmetry clauses
    # are exercised on TPU by the f32 lane drive
    assert not pallas_gram_supported(kern, X, None)
    assert not pallas_gram_supported(kern, X, X)


def test_pack_roundtrip_preserves_module():
    kern = gp.SEArd(ll=jnp.asarray([0.1, 0.2, 0.3], jnp.float32),
                    lsigma=jnp.float32(0.5))
    flat, treedef, specs = _pack(kern)
    from gaussianprocesses_jl_tpu.ops.pallas_gram import _unpack

    k2 = _unpack(treedef, specs, flat)
    assert np.allclose(np.asarray(k2.ll), np.asarray(kern.ll))
    assert np.allclose(float(k2.lsigma), float(kern.lsigma))
