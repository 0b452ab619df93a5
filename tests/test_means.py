"""Mean function tests (mirror of reference test/means.jl): evaluation,
composites, and autodiff grad_stack vs finite differences."""
import jax.numpy as jnp
import numpy as np
import pytest

import gaussianprocesses_jl_tpu as gp

D = 3
N = 6


def mean_zoo():
    mconst = gp.MeanConst(beta=jnp.asarray(1.5))
    mlin = gp.MeanLin(beta=jnp.asarray([0.5, -1.0, 2.0]))
    mpoly = gp.MeanPoly(beta=jnp.asarray(np.random.RandomState(1).randn(2, D)))
    mper = gp.MeanPeriodic(
        a=jnp.asarray([0.5, -0.2, 0.1]),
        b=jnp.asarray([0.1, 0.3, -0.4]),
        lp=jnp.asarray([0.0, 0.2, -0.1]),
    )
    return [
        ("zero", gp.MeanZero()),
        ("const", mconst),
        ("lin", mlin),
        ("poly", mpoly),
        ("periodic", mper),
        ("sum", mconst + mlin),
        ("prod", mlin * mconst),
        ("sumprod", (mconst + mlin) * mconst),
    ]


ZOO = mean_zoo()


@pytest.fixture(scope="module")
def X():
    return jnp.asarray(np.random.RandomState(7).randn(N, D))


@pytest.mark.parametrize("m", [m for _, m in ZOO], ids=[n for n, _ in ZOO])
def test_mean_shapes_and_roundtrip(m, X):
    mu = m.mean(X)
    assert mu.shape == (N,)
    vec = m.flat_params()
    m2 = m.with_flat_params(vec)
    assert np.allclose(np.asarray(m2.mean(X)), np.asarray(mu))


@pytest.mark.parametrize("m", [m for _, m in ZOO], ids=[n for n, _ in ZOO])
def test_grad_stack_vs_fd(m, X):
    vec = m.flat_params()
    if vec.shape[0] == 0:
        return
    J = m.grad_stack(X)
    assert J.shape == (N, vec.shape[0])
    eps = 1e-6
    for p in range(vec.shape[0]):
        fp = m.with_flat_params(vec.at[p].add(eps)).mean(X)
        fm = m.with_flat_params(vec.at[p].add(-eps)).mean(X)
        fd = (fp - fm) / (2 * eps)
        assert np.allclose(np.asarray(J[:, p]), np.asarray(fd), rtol=1e-5,
                           atol=1e-7)


def test_mean_values(X):
    assert np.allclose(np.asarray(gp.MeanZero().mean(X)), 0.0)
    assert np.allclose(np.asarray(gp.MeanConst(beta=jnp.asarray(2.0)).mean(X)), 2.0)
    b = jnp.asarray([1.0, 2.0, 3.0])
    assert np.allclose(np.asarray(gp.MeanLin(beta=b).mean(X)),
                       np.asarray(X @ b))
    # poly degree 1 with beta row == linear
    mp = gp.MeanPoly(beta=b[None, :])
    assert np.allclose(np.asarray(mp.mean(X)), np.asarray(X @ b))
    # composite
    ms = gp.MeanConst(beta=jnp.asarray(1.0)) + gp.MeanLin(beta=b)
    assert np.allclose(np.asarray(ms.mean(X)), np.asarray(1.0 + X @ b))
