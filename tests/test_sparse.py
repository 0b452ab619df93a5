"""Sparse approximation tests, mirroring reference test/test_sparse.jl:
N=1000 1-D regression with 12 inducing points; for each of SoR/DTC/FITC/FSA
the approximate mll is within 10 of the exact GP; PD-matrix ops (solve,
logdet, densify) agree with the densified matrix; analytic (autodiff) dmll
matches finite differences; and predictions match brute-force QR05 Q-matrix
reference implementations."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussianprocesses_jl_tpu as gp
from gaussianprocesses_jl_tpu.models.gpe import gpe_mll, gpe_target

N = 1000
M = 12


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(1)
    x = 2 * np.pi * rng.rand(N)
    y = np.sin(x) + 0.3 * rng.randn(N)
    inducing = np.linspace(0, 2 * np.pi, M)
    kern = gp.SE(0.3, 0.1)
    lognoise = -0.6
    exact = gp.GPE(x, y, kernel=kern, lognoise=lognoise)
    blocks = [list(range(i, min(i + 100, N))) for i in range(0, N, 100)]
    models = {
        "sor": gp.SoR(x, inducing, y, kernel=kern, lognoise=lognoise),
        "dtc": gp.DTC(x, inducing, y, kernel=kern, lognoise=lognoise),
        "fitc": gp.FITC(x, inducing, y, kernel=kern, lognoise=lognoise),
        "fsa": gp.FSA(x, inducing, blocks, y, kernel=kern,
                      lognoise=lognoise),
    }
    return exact, models


def _dense_sigma(model):
    """Densified approximate covariance via the PD object."""
    from gaussianprocesses_jl_tpu.models.gpe import gpe_factorize

    pd = gpe_factorize(model.params, model.x, model.covstrat)
    return pd, np.asarray(pd.dense())


@pytest.mark.parametrize("name", ["sor", "dtc", "fitc", "fsa"])
def test_mll_close_to_exact(name, setup):
    exact, models = setup
    m = models[name]
    assert np.isfinite(float(m.mll))
    assert abs(float(m.mll) - float(exact.mll)) < 10.0  # ref tol


@pytest.mark.parametrize("name", ["sor", "fitc", "fsa"])
def test_pd_ops_vs_densified(name, setup):
    _, models = setup
    m = models[name]
    pd, S = _dense_sigma(m)
    # logdet
    sign, ld = np.linalg.slogdet(S)
    assert sign > 0
    assert np.allclose(float(pd.logdet()), ld, rtol=1e-6)
    # solve
    rng = np.random.RandomState(0)
    b = rng.randn(N)
    x_pd = np.asarray(pd.solve(jnp.asarray(b)))
    x_np = np.linalg.solve(S, b)
    assert np.allclose(x_pd, x_np, atol=1e-6 * np.abs(x_np).max())


@pytest.mark.parametrize("name", ["sor", "fitc", "fsa"])
def test_trace_vs_densified(name, setup):
    """tr(Sigma) through the factorized identities matches the densified
    matrix for both the diagonal and block-diagonal Lambda cases
    (ref fully_indep...jl:97-108 / full_scale...jl trinv path)."""
    _, models = setup
    pd, S = _dense_sigma(models[name])
    assert np.allclose(float(pd.trace()), np.trace(S), rtol=1e-6)


@pytest.mark.parametrize("name", ["sor", "dtc", "fitc", "fsa"])
def test_dmll_vs_dense_rebuild(name, setup):
    """Gradient through the O(nm^2) Woodbury path vs. autodiff through an
    independently-written dense O(n^3) rebuild of the same approximate
    covariance. (Central finite differences are too noisy here: Kuu of 12
    smooth-SE inducing points is ill-conditioned, so FD plateaus at ~5e-4
    relative error while the two autodiff paths agree to ~1e-5.)"""
    _, models = setup
    m = models[name]
    t, g = m.target_and_dtarget()
    X, Y, Xu = m.x, m.y, m.covstrat.inducing
    n = X.shape[0]

    def dense_mll(vec):
        p = m.params.with_flat_params(vec)
        kern = p.kernel
        s2 = jnp.exp(2 * p.lognoise.value)
        Kuu = kern.gram(Xu) + 1e-10 * jnp.eye(M)
        Kuf = kern.gram(Xu, X)
        Q = Kuf.T @ jnp.linalg.solve(Kuu, Kuf)
        if name in ("sor", "dtc"):
            S = Q + s2 * jnp.eye(n)
        elif name == "fitc":
            d = s2 + kern.diag(X) - jnp.diag(Q)
            S = Q + jnp.diag(d)
        else:  # fsa: block residuals
            S = Q
            for b in m.covstrat.block_idx:
                ib = jnp.asarray(b, dtype=int)
                Kb = kern.gram(X[ib])
                Qb = Q[jnp.ix_(ib, ib)]
                S = S.at[jnp.ix_(ib, ib)].add(Kb - Qb)
            S = S + s2 * jnp.eye(n)
        L = jnp.linalg.cholesky(S)
        a = jnp.linalg.solve(S, Y)
        return -0.5 * (Y @ a + 2 * jnp.sum(jnp.log(jnp.diag(L)))
                       + n * jnp.log(2 * jnp.pi))

    vec = m.params.flat_params()
    td = float(dense_mll(vec))
    gd = jax.grad(dense_mll)(vec)
    assert np.allclose(float(t), td, rtol=1e-8), (name, float(t), td)
    assert np.allclose(np.asarray(g), np.asarray(gd), rtol=5e-4,
                       atol=1e-6), (name, np.asarray(g), np.asarray(gd))


def _brute_force_predict(name, m, xs):
    """QR05 reference predictions computed densely in numpy
    (the role of test_pred overloads in ref test_sparse.jl:37-114)."""
    kern = m.params.kernel
    Xu = m.covstrat.inducing
    X = m.x
    s2 = float(np.exp(2 * np.asarray(m.lognoise)))
    Kuu = np.asarray(kern.gram(Xu)) + 1e-10 * np.eye(M)
    Kuf = np.asarray(kern.gram(Xu, X))
    Kux = np.asarray(kern.gram(Xu, xs))
    Kxx = np.asarray(kern.gram(xs))
    Qff = Kuf.T @ np.linalg.solve(Kuu, Kuf)
    Qxf = Kux.T @ np.linalg.solve(Kuu, Kuf)
    Qxx = Kux.T @ np.linalg.solve(Kuu, Kux)
    y = np.asarray(m.y)
    if name in ("sor", "dtc"):
        Lam = s2 * np.eye(N)
    elif name == "fitc":
        Kdiag = np.asarray(kern.diag(X))
        Lam = np.diag(s2 + Kdiag - np.diag(Qff))
    else:
        raise ValueError(name)
    A = np.linalg.solve(Qff + Lam, y)
    mu = Qxf @ A
    if name == "sor":
        cov = Qxx - Qxf @ np.linalg.solve(Qff + Lam, Qxf.T)
    else:  # dtc / fitc correct the prior variance term
        cov = Kxx - Qxf @ np.linalg.solve(Qff + Lam, Qxf.T)
    return mu, cov


@pytest.mark.parametrize("name", ["sor", "dtc", "fitc"])
def test_predictions_vs_brute_force(name, setup):
    _, models = setup
    m = models[name]
    xs = jnp.linspace(-0.5, 2 * jnp.pi + 0.5, 9)[:, None]
    mu, cov = m.predict_f(xs, full_cov=True)
    mu_b, cov_b = _brute_force_predict(name, m, xs)
    assert np.allclose(np.asarray(mu), mu_b, atol=1e-6)
    assert np.allclose(np.asarray(cov), cov_b, atol=1e-5)
    # diagonal path consistent
    mu_d, var = m.predict_f(xs)
    assert np.allclose(np.asarray(mu_d), mu_b, atol=1e-6)
    assert np.allclose(np.asarray(var), np.diag(cov_b), atol=1e-5)


def test_fsa_prediction_with_blocks(setup):
    """FSA with per-point prediction blocks stays finite and near the exact
    GP inside the data range."""
    exact, models = setup
    m = models["fsa"]
    xs = jnp.linspace(0.5, 5.5, 8)[:, None]
    mu, var = m.predict_f(xs)
    mu_e, var_e = exact.predict_f(xs)
    assert np.all(np.isfinite(np.asarray(mu)))
    assert np.allclose(np.asarray(mu), np.asarray(mu_e), atol=0.2)
    assert np.all(np.asarray(var) >= 0)


def test_fsa_close_to_exact(setup):
    """FSA's block-residual correction makes the mll nearly exact here
    (100-point blocks on 1-D data): within 1e-2 of the dense GP, far
    tighter than the generic tol of 10."""
    exact, models = setup
    err_fsa = abs(float(models["fsa"].mll) - float(exact.mll))
    assert err_fsa < 1e-2


def test_sparse_optimize(setup):
    _, models = setup
    m = models["fitc"]
    t0 = float(m.target)
    m.optimize(maxiter=25)
    assert float(m.target) >= t0


def test_fsa_partition_validation():
    x = np.random.randn(10, 1)
    y = np.random.randn(10)
    with pytest.raises(ValueError):
        gp.FSA(x, x[:3], [[0, 1, 2]], y, kernel=gp.SE(0.0, 0.0))


def test_fsa_blocked_prediction_vs_brute_force(setup):
    """FSA prediction WITH per-block test-point assignments (the Lam_xf != 0
    branch, ref full_scale_approximation.jl:413-477) through the public
    GPE.predict_f API, against a dense QR05 construction: with
    Sigma = Qff + Lambda and cross = Qxf + Lam_xf,
    mu = cross Sigma^-1 y and cov = Kxx - cross Sigma^-1 cross^T."""
    _, models = setup
    m = models["fsa"]
    kern = m.params.kernel
    Xu = m.covstrat.inducing
    X = m.x
    y = np.asarray(m.y)
    ns = 9
    xs = jnp.linspace(-0.5, 2 * jnp.pi + 0.5, ns)[:, None]
    nb = len(m.covstrat.block_idx)
    # arbitrary assignment covering padding edge cases: ragged blocks, an
    # empty block, and one unassigned test point (index 8)
    blockindpred = [[] for _ in range(nb)]
    blockindpred[0] = [0, 3]
    blockindpred[1] = [1]
    blockindpred[4] = [2, 5, 7]
    blockindpred[7] = [4, 6]

    mu, cov = m.predict_f(xs, full_cov=True, blockindpred=blockindpred)
    mu_d, var = m.predict_f(xs, blockindpred=blockindpred)

    # dense brute force
    Kuu = np.asarray(kern.gram(Xu)) + 1e-10 * np.eye(M)
    Kuf = np.asarray(kern.gram(Xu, X))
    Kux = np.asarray(kern.gram(Xu, xs))
    Kxx = np.asarray(kern.gram(xs))
    Qff = Kuf.T @ np.linalg.solve(Kuu, Kuf)
    Qxf = Kux.T @ np.linalg.solve(Kuu, Kuf)
    Kxf = np.asarray(kern.gram(xs, X))
    s2 = float(np.exp(2 * np.asarray(m.lognoise)))
    Sig = Qff.copy()
    for b in m.covstrat.block_idx:
        ib = np.asarray(b, dtype=int)
        Sig[np.ix_(ib, ib)] += np.asarray(kern.gram(X[ib])) - Qff[
            np.ix_(ib, ib)]
    Sig += s2 * np.eye(N)
    cross = Qxf.copy()
    for bp, bf in zip(blockindpred, m.covstrat.block_idx):
        if not bp:
            continue
        ip = np.asarray(bp, dtype=int)
        jf = np.asarray(bf, dtype=int)
        cross[np.ix_(ip, jf)] += Kxf[np.ix_(ip, jf)] - Qxf[np.ix_(ip, jf)]
    mu_b = cross @ np.linalg.solve(Sig, y)
    cov_b = Kxx - cross @ np.linalg.solve(Sig, cross.T)

    assert np.allclose(np.asarray(mu), mu_b, atol=1e-6)
    assert np.allclose(np.asarray(cov), cov_b, atol=1e-5)
    assert np.allclose(np.asarray(mu_d), mu_b, atol=1e-6)
    assert np.allclose(np.asarray(var), np.diag(cov_b), atol=1e-5)
    # the correction changed the unblocked prediction (branch is live)
    mu0, _ = m.predict_f(xs)
    assert not np.allclose(np.asarray(mu0), mu_b, atol=1e-6)


def test_fsa_blockindpred_validation():
    x = np.random.RandomState(0).randn(12, 1)
    y = np.random.RandomState(1).randn(12)
    blocks = [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11]]
    m = gp.FSA(x, x[:4], blocks, y, kernel=gp.SE(0.0, 0.0))
    xs = np.linspace(-1, 1, 5)[:, None]
    with pytest.raises(ValueError, match="one entry per training block"):
        m.predict_f(xs, blockindpred=[[0], [1]])
    with pytest.raises(ValueError, match="twice"):
        m.predict_f(xs, blockindpred=[[0], [0], [1]])
    with pytest.raises(ValueError, match="out of range"):
        m.predict_f(xs, blockindpred=[[0], [5], [1]])
    with pytest.raises(ValueError, match="assigns no test points"):
        m.predict_f(xs, blockindpred=[[], [], []])
    # non-FSA strategy rejects blockindpred
    me = gp.GPE(x, y, kernel=gp.SE(0.0, 0.0))
    with pytest.raises(TypeError, match="FSA"):
        me.predict_f(xs, blockindpred=[[0], [1], [2]])


# fixed-seed f64 golden mll anchors (self-golden regression pins,
# mirroring the reference's golden values at test/test_sparse.jl:147-160;
# exact cross-language parity is impossible — Julia RNG data — so these
# pin THIS framework's numerics on the module fixture's seed). A drift
# of 1e-3 in any sparse mll fails.
GOLDEN_MLL_F64 = {
    "exact": -492.5982769852,
    "sor": -492.5982425163,
    "dtc": -492.5982425163,
    "fitc": -492.5983466590,
    "fsa": -492.5983604624,
}


def test_sparse_mll_golden_pins():
    # fresh models (NOT the module fixture: test_sparse_optimize mutates
    # the fixture's FITC hyperparameters) at the fixture's exact config
    rng = np.random.RandomState(1)
    x = 2 * np.pi * rng.rand(N)
    y = np.sin(x) + 0.3 * rng.randn(N)
    inducing = np.linspace(0, 2 * np.pi, M)
    kern = gp.SE(0.3, 0.1)
    blocks = [list(range(i, min(i + 100, N))) for i in range(0, N, 100)]
    exact = gp.GPE(x, y, kernel=kern, lognoise=-0.6)
    models = {
        "sor": gp.SoR(x, inducing, y, kernel=kern, lognoise=-0.6),
        "dtc": gp.DTC(x, inducing, y, kernel=kern, lognoise=-0.6),
        "fitc": gp.FITC(x, inducing, y, kernel=kern, lognoise=-0.6),
        "fsa": gp.FSA(x, inducing, blocks, y, kernel=kern, lognoise=-0.6),
    }
    assert float(exact.mll) == pytest.approx(GOLDEN_MLL_F64["exact"],
                                             abs=1e-3)
    for name, m in models.items():
        assert float(m.mll) == pytest.approx(GOLDEN_MLL_F64[name],
                                             abs=1e-3), name
    # the quartet's ORDERING is part of the pinned behavior: SoR == DTC
    # exactly (same train covariance), FITC and FSA perturb it
    assert float(models["sor"].mll) == pytest.approx(
        float(models["dtc"].mll), abs=1e-9)
