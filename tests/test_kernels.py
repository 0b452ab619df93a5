"""Kernel layer tests, mirroring the reference's test/kernels.jl strategy:
param round-trips, matrix-vs-pairwise consistency, and analytic (autodiff)
gradients vs central finite differences, for every kernel incl. composites,
masked and fixed wrappers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussianprocesses_jl_tpu as gp

D = 3
N1, N2 = 7, 5


def kernel_zoo():
    se = gp.SE(0.3, 0.2)
    rq = gp.RQ(0.2, 0.1, -0.3)
    lin = gp.Lin(0.4)
    mat12 = gp.Matern(0.5, 0.2, 0.1)
    seard = gp.SE(jnp.array([0.1, 0.2, 0.3]), 0.2)
    rqard = gp.RQ(jnp.array([0.3, -0.2, 0.1]), 0.1, -0.1)
    linard = gp.Lin(jnp.array([0.1, -0.3, 0.2]))
    zoo = [
        ("seiso", se),
        ("rqiso", rq),
        ("liniso", lin),
        ("mat12iso", mat12),
        ("mat32iso", gp.Matern(1.5, 0.3, 0.1)),
        ("mat52iso", gp.Matern(2.5, -0.2, 0.2)),
        ("periodic", gp.Periodic(0.2, 0.1, 0.5)),
        ("poly", gp.Poly(0.1, 0.2, deg=2)),
        ("noise", gp.Noise(0.2)),
        ("const", gp.Const(0.3)),
        ("seard", seard),
        ("rqard", rqard),
        ("linard", linard),
        ("mat12ard", gp.Matern(0.5, jnp.array([0.1, 0.2, 0.3]), 0.1)),
        ("mat32ard", gp.Matern(1.5, jnp.array([-0.1, 0.2, 0.1]), 0.2)),
        ("mat52ard", gp.Matern(2.5, jnp.array([0.2, 0.1, -0.2]), 0.1)),
        ("sum", se + mat12),
        ("prod", se * rq),
        ("sum3", se + rq + lin),
        ("prodsum", (se + rq) * mat12),
        ("masked", gp.Masked(gp.SE(0.2, 0.1), active_dims=(0,))),
        ("masked_sum", gp.Masked(gp.SE(0.2, 0.1), (0,))
         + gp.Masked(gp.RQ(0.1, 0.2, -0.1), (1, 2))),
        ("fixed", gp.fix(gp.SE(0.3, 0.2), "lsigma")),
    ]
    return zoo


ZOO = kernel_zoo()
IDS = [name for name, _ in ZOO]
KERNS = [k for _, k in ZOO]


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(42)
    X1 = jnp.asarray(rng.randn(N1, D))
    X2 = jnp.asarray(rng.randn(N2, D))
    return X1, X2


@pytest.mark.parametrize("kern", KERNS, ids=IDS)
def test_param_roundtrip(kern):
    vec = kern.flat_params()
    assert vec.shape == (kern.n_params,)
    k2 = kern.with_flat_params(vec + 0.25)
    assert np.allclose(np.asarray(k2.flat_params()), np.asarray(vec) + 0.25)
    k3 = k2.with_flat_params(vec)
    assert np.allclose(np.asarray(k3.flat_params()), np.asarray(vec))


@pytest.mark.parametrize("kern", KERNS, ids=IDS)
def test_gram_consistency(kern, data):
    X1, X2 = data
    Kx = kern.gram(X1, X2)
    assert Kx.shape == (N1, N2)
    # matrix vs pairwise scalar evaluation
    for i in [0, 3]:
        for j in [1, 4]:
            kij = kern(X1[i], X2[j])
            assert np.allclose(float(Kx[i, j]), float(kij), atol=1e-10), (
                i, j, float(Kx[i, j]), float(kij))
    # symmetric path
    Ks = kern.gram(X1)
    assert np.allclose(np.asarray(Ks), np.asarray(Ks.T), atol=1e-12)
    assert np.allclose(np.asarray(Ks), np.asarray(kern.gram(X1, X1)), atol=1e-10)
    # diag
    dg = kern.diag(X1)
    assert np.allclose(np.asarray(dg), np.asarray(jnp.diag(Ks)), atol=1e-10)
    # PSD of symmetric gram (up to jitter). The periodic kernel applied to a
    # multi-dim Euclidean norm is not a valid PSD kernel for d > 1 (same in
    # the reference, which uses the identical formula) — skip it there.
    if not isinstance(kern, gp.Periodic):
        eigmin = float(jnp.linalg.eigvalsh(Ks)[0])
        assert eigmin > -1e-8


@pytest.mark.parametrize("kern", KERNS, ids=IDS)
def test_grad_vs_finite_difference(kern, data):
    """autodiff d(sum weighted gram)/dtheta vs central differences —
    the reference's master kernel-gradient check (test/kernels.jl:63-94)."""
    X1, X2 = data
    rng = np.random.RandomState(0)
    W = jnp.asarray(rng.randn(N1, N1))
    vec = kern.flat_params()
    if vec.shape[0] == 0:
        return

    def f(v):
        return jnp.sum(W * kern.with_flat_params(v).gram(X1))

    g = jax.grad(f)(vec)
    eps = 1e-6
    for p in range(vec.shape[0]):
        vp = vec.at[p].add(eps)
        vm = vec.at[p].add(-eps)
        fd = (f(vp) - f(vm)) / (2 * eps)
        assert np.allclose(float(g[p]), float(fd), rtol=1e-5, atol=1e-7), (
            IDS[KERNS.index(kern)] if kern in KERNS else "?", p, float(g[p]), float(fd))


def test_sum_prod_values(data):
    X1, _ = data
    se, rq = gp.SE(0.3, 0.2), gp.RQ(0.2, 0.1, -0.3)
    assert np.allclose(
        np.asarray((se + rq).gram(X1)),
        np.asarray(se.gram(X1) + rq.gram(X1)),
    )
    assert np.allclose(
        np.asarray((se * rq).gram(X1)),
        np.asarray(se.gram(X1) * rq.gram(X1)),
    )


def test_masked_values(data):
    X1, X2 = data
    inner = gp.SE(0.2, 0.1)
    mk = gp.Masked(inner, active_dims=(1, 2))
    assert np.allclose(
        np.asarray(mk.gram(X1, X2)),
        np.asarray(inner.gram(X1[:, 1:3], X2[:, 1:3])),
    )


def test_fixed_kernel(data):
    X1, _ = data
    base = gp.SE(0.3, 0.2)
    fk = gp.fix(base, "lsigma")
    assert fk.n_params == 1
    assert fk.param_names() == ["ll"]
    # gram identical to wrapped kernel
    assert np.allclose(np.asarray(fk.gram(X1)), np.asarray(base.gram(X1)))
    # with_flat_params only moves ll
    fk2 = fk.with_flat_params(jnp.array([1.5]))
    assert np.allclose(float(fk2.kern.ll), 1.5)
    assert np.allclose(float(fk2.kern.lsigma), 0.2)
    # fix all / free
    fall = gp.fix(base)
    assert fall.n_params == 0
    assert gp.free(fall).n_params == 2
    # gradient only flows to free params
    g = jax.grad(lambda v: jnp.sum(fk.with_flat_params(v).gram(X1)))(
        fk.flat_params())
    assert g.shape == (1,)


def test_noise_kernel_semantics(data):
    X1, _ = data
    k = gp.Noise(0.3)
    K = k.gram(X1)
    s2 = float(jnp.exp(2 * k.lsigma))
    assert np.allclose(np.asarray(jnp.diag(K)), s2)
    off = np.asarray(K)[~np.eye(N1, dtype=bool)]
    assert np.allclose(off, 0.0)
    # duplicated point across two sets
    Kx = k.gram(X1, X1[:3])
    assert np.allclose(np.asarray(jnp.diag(Kx[:3])), s2)


def test_priors_attach_and_logpdf():
    from gaussianprocesses_jl_tpu.utils.priors import Normal

    k = gp.SE(0.3, 0.2).set_priors([Normal(0.0, 1.0), Normal(0.0, 2.0)])
    lp = float(k.prior_logpdf())
    expected = float(Normal(0, 1).logpdf(0.3) + Normal(0, 2.0).logpdf(0.2))
    assert np.allclose(lp, expected)
    # composite distribution of priors
    ks = (gp.SE(0.3, 0.2) + gp.RQ(0.1, 0.1, 0.0)).set_priors(
        [Normal()] * 5)
    assert len(ks.priors_flat()) == 5
    # fixed kernel contributes zero prior (ref fixed_kernel.jl:92-98)
    fk = gp.fix(k, "lsigma")
    assert float(fk.prior_logpdf()) == 0.0


def test_param_names():
    assert gp.SE(0.1, 0.2).param_names() == ["ll", "lsigma"]
    assert gp.RQ(0.1, 0.2, 0.3).param_names() == ["ll", "lsigma", "lalpha"]
    names = gp.SE(jnp.zeros(2), 0.0).param_names()
    assert names == ["ll_1", "ll_2", "lsigma"]


def test_noise_kernel_relative_tolerance():
    """Duplicate detection must be relative to the data scale (ref
    src/kernels/noise.jl:31-39 uses relative isapprox): duplicated points
    with large coordinates still match; distinct points never do."""
    k = gp.Noise(0.0)
    big = jnp.asarray([[1e3, -2e3], [1e3, -2e3], [1e3, -2e3 + 1.0]])
    K = np.asarray(k.gram(big))
    assert np.allclose(K[0, 1], 1.0)  # exact duplicate at scale 1e3
    assert np.allclose(K[0, 2], 0.0)  # 1.0 apart is not a duplicate
    # cross-gram duplicate at large scale
    Kx = np.asarray(k.gram(big, big[:1]))
    assert np.allclose(Kx[:, 0], [1.0, 1.0, 0.0])
    # near-origin points: absolute floor keeps tiny offsets distinct
    small = jnp.asarray([[0.0, 0.0], [1e-2, 0.0]])
    Ks = np.asarray(k.gram(small))
    assert np.allclose(np.diag(Ks), 1.0)
    assert np.allclose(Ks[0, 1], 0.0)
