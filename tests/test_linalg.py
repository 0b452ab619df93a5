"""Dense linalg layer: blocked Cholesky, triangular inverse, quad/logdet."""
import jax
import jax.numpy as jnp
import numpy as np

from gaussianprocesses_jl_tpu.ops.linalg import (
    blocked_cholesky,
    dense_quad_logdet,
    safe_cholesky,
    tri_inv_lower,
)


def _psd(n, d=40, seed=0):
    rng = np.random.RandomState(seed)
    W = rng.randn(n, d)
    return jnp.asarray(W @ W.T + n * np.eye(n))


def test_blocked_cholesky_matches_lapack_multi_panel():
    for n in (300, 512, 777):  # non-multiples exercise the identity pad
        K = _psd(n)
        L, ld = blocked_cholesky(K, block=128)
        L0 = np.linalg.cholesky(np.asarray(K))
        assert np.allclose(np.asarray(L), L0, atol=1e-10 * n)
        assert np.allclose(float(ld), 2 * np.log(np.diag(L0)).sum(),
                           rtol=1e-12)
        assert np.abs(np.triu(np.asarray(L), 1)).max() == 0.0


def test_blocked_cholesky_single_panel_path():
    K = _psd(64)
    L, ld = blocked_cholesky(K, block=128)
    assert np.allclose(np.asarray(L), np.linalg.cholesky(np.asarray(K)))


def test_blocked_cholesky_differentiable():
    K = _psd(260)

    def f_blocked(K):
        return blocked_cholesky(0.5 * (K + K.T), block=128)[1]

    def f_ref(K):
        L = jnp.linalg.cholesky(0.5 * (K + K.T))
        return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))

    g1 = jax.grad(f_blocked)(K)
    g2 = jax.grad(f_ref)(K)
    assert np.allclose(np.asarray(g1), np.asarray(g2), atol=1e-10)


def test_blocked_cholesky_nan_propagates_to_safe_flag():
    K = _psd(300) - 1e6 * jnp.eye(300)  # indefinite
    L, ld = blocked_cholesky(K, block=128)
    assert not bool(jnp.all(jnp.isfinite(L)))
    _, ok = safe_cholesky(K)
    assert not bool(ok)


def test_tri_inv_lower_blocked_vs_dense():
    K = _psd(500, seed=3)
    L = jnp.linalg.cholesky(K)
    Linv = tri_inv_lower(L, block=128)
    assert np.allclose(np.asarray(Linv @ L), np.eye(500), atol=1e-8)


def test_dense_quad_logdet_value_and_grad_consistency():
    n = 200
    K = _psd(n, seed=5)
    r = jnp.asarray(np.random.RandomState(6).randn(n))

    def f(K, r):
        q, ld, ok = dense_quad_logdet(0.5 * (K + K.T), r)
        return 0.7 * q + 0.3 * ld

    def f_ref(K, r):
        Ks = 0.5 * (K + K.T)
        L = jnp.linalg.cholesky(Ks)
        w = jax.scipy.linalg.solve_triangular(L, r, lower=True)
        return 0.7 * jnp.sum(w * w) + 2.0 * 0.3 * jnp.sum(
            jnp.log(jnp.diagonal(L)))

    assert np.allclose(float(f(K, r)), float(f_ref(K, r)), rtol=1e-12)
    gK, gr = jax.grad(f, argnums=(0, 1))(K, r)
    gK0, gr0 = jax.grad(f_ref, argnums=(0, 1))(K, r)
    assert np.allclose(np.asarray(gK), np.asarray(gK0), atol=1e-9)
    assert np.allclose(np.asarray(gr), np.asarray(gr0), atol=1e-9)


def test_tri_syrk_lower_matches_full_product():
    from gaussianprocesses_jl_tpu.ops.linalg import tri_syrk_lower

    for n, block in ((500, 128), (512, 128), (300, 512), (700, 256)):
        K = _psd(n, seed=7)
        Linv = tri_inv_lower(jnp.linalg.cholesky(K))
        full = np.asarray(Linv.T @ Linv)
        blocked = np.asarray(tri_syrk_lower(Linv, block=block))
        assert np.allclose(blocked, full, atol=1e-10), (n, block)
        # exactly symmetric by construction (mirrored blocks)
        assert np.allclose(blocked, blocked.T, atol=0)


def test_safe_cholesky_retry_helper():
    """The blocked path's HIGH-precision GEMMs can NaN on near-singular K
    where exact f32 succeeds; the retry helper must recover with XLA's
    kernel (the TPU route is exercised end-to-end by the n=16384 masked
    kernel bench row)."""
    from gaussianprocesses_jl_tpu.ops.linalg import _retry_chol_xla

    K = _psd(64, seed=8)
    bad_L = jnp.full((64, 64), jnp.nan, K.dtype)
    L, ok = _retry_chol_xla(jnp.asarray(False), bad_L, K)
    assert bool(ok)
    assert np.allclose(np.asarray(L @ L.T), np.asarray(K), rtol=1e-10)
    # when the first attempt was fine, it is returned untouched
    L0 = jnp.linalg.cholesky(K)
    L, ok = _retry_chol_xla(jnp.asarray(True), L0, K)
    assert bool(ok) and np.array_equal(np.asarray(L), np.asarray(L0))
