"""f32 precision lane (VERDICT round-1 item 8): core correctness under the
TPU's working precision, runnable on CPU-f32 (here) and on the chip via
the verify drive. Golden anchors are f64 values from this framework;
tolerances are TPU-realistic (f32 Cholesky at n=200 keeps ~4-5 digits).

Run just this lane with `pytest -m f32`."""
import jax
import numpy as np
import pytest

import gaussianprocesses_jl_tpu as gp
from gaussianprocesses_jl_tpu.models.gpe import gpe_target

pytestmark = pytest.mark.f32

# f64 goldens (computed once on the CPU/f64 backend)
MLL_F64 = -18.135323875830608
GRAD_F64 = np.array([-174.54571740438703, 2.5990248002566703,
                     -2.6747737164806153, 10.589853452879268,
                     -7.520406239885901, 9.06129815336065])
FITC_MLL_F64 = -6.88151343394145


@pytest.fixture(autouse=True)
def f32_mode():
    jax.config.update("jax_enable_x64", False)
    yield
    jax.config.update("jax_enable_x64", True)


def _data():
    rng = np.random.RandomState(0)
    n = 200
    x = (2 * np.pi * rng.rand(n)).astype(np.float32)
    f = np.sin(x)
    y = (f + 0.1 * rng.randn(n)).astype(np.float32)
    return x, y, f


def test_f32_mll_matches_f64_golden():
    x, y, _ = _data()
    kern = gp.SE(0.3, 0.1) + gp.Periodic(0.0, 0.0, 1.0)
    m = gp.GPE(x, y, kernel=kern, lognoise=-1.0)
    assert m.mll.dtype == np.float32
    assert float(m.mll) == pytest.approx(MLL_F64, rel=1e-4)


def test_f32_gradient_matches_f64_golden():
    x, y, _ = _data()
    kern = gp.SE(0.3, 0.1) + gp.Periodic(0.0, 0.0, 1.0)
    m = gp.GPE(x, y, kernel=kern, lognoise=-1.0)
    t, g = m.target_and_dtarget()
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    # relative per-component with an absolute floor for the tiny entries
    assert np.allclose(g, GRAD_F64, rtol=5e-3,
                       atol=5e-3 * np.abs(GRAD_F64).max())


def test_f32_optimize_predict_sample():
    """The verify-drive core: fit, predict (rmse + PSD variances), sample
    (catches f32 PSD issues the f64 lane cannot)."""
    x, y, f = _data()
    kern = gp.SE(0.0, 0.0) + gp.Periodic(0.0, 0.0, 1.0)
    m = gp.GPE(x, y, kernel=kern, lognoise=-1.0)
    mll0 = float(m.mll)
    m.optimize(maxiter=40)
    assert float(m.mll) > mll0

    xs = np.linspace(0, 2 * np.pi, 101, dtype=np.float32)
    mu, var = m.predict_y(xs)
    assert np.all(np.isfinite(np.asarray(mu)))
    assert np.all(np.asarray(var) >= 0)
    rmse = float(np.sqrt(np.mean((np.asarray(mu) - np.sin(xs)) ** 2)))
    assert rmse < 0.15, rmse

    s = m.rand(jax.random.PRNGKey(0), xs, n_samples=3)
    assert np.all(np.isfinite(np.asarray(s)))


def test_f32_sparse_qr_projector_psd():
    """The QR-projector sparse path must stay PSD in f32: finite mll near
    the f64 golden, nonnegative predictive variances."""
    x, y, _ = _data()
    ind = np.linspace(0, 2 * np.pi, 16, dtype=np.float32)
    for ctor in (gp.SoR, gp.DTC, gp.FITC):
        m = ctor(x, ind, y, kernel=gp.SE(0.3, 0.1), lognoise=-1.0)
        mll = float(m.mll)
        assert np.isfinite(mll)
        if ctor is gp.FITC:
            # the f32 path deliberately uses a larger Kuu jitter
            # (1e-4*scale vs 1e-10 in f64 — ops/linalg.py default_jitter),
            # so the mll differs by the regularization, not by error
            assert mll == pytest.approx(FITC_MLL_F64, rel=1e-2)
        xs = np.linspace(0, 2 * np.pi, 64, dtype=np.float32)
        mu, var = m.predict_f(xs)
        assert np.all(np.isfinite(np.asarray(mu)))
        assert np.all(np.asarray(var) >= 0)


def test_f32_near_singular_is_rejected_not_nan():
    x, y, _ = _data()
    params = gp.GPEParams(
        lognoise=gp.Param(value=jax.numpy.asarray(-60.0, jax.numpy.float32)),
        mean=gp.MeanZero(), kernel=gp.Const(15.0))
    t = gpe_target(params, jax.numpy.asarray(x)[:, None],
                   jax.numpy.asarray(y), gp.FullCovariance())[0]
    assert not np.isnan(float(t))


def test_f32_gpa_hmc_smoke():
    rng = np.random.RandomState(1)
    n, d = 40, 2
    X = rng.randn(n, d).astype(np.float32)
    yb = (X[:, 0] > 0).astype(np.float32)
    m = gp.GPA(X, yb, gp.MeanZero(), gp.SE(0.0, 0.0), gp.BernLik())
    res = gp.mcmc(m, jax.random.PRNGKey(0), n_iter=60, burn=10)
    assert np.all(np.isfinite(np.asarray(res.samples)))
    p, _ = m.predict_y(X)
    assert np.all((np.asarray(p) >= 0) & (np.asarray(p) <= 1))


# f64 goldens for the sparse quartet on the test_sparse fixture config
# (N=1000, M=12, seed 1 — see tests/test_sparse.py GOLDEN_MLL_F64)
SPARSE_GOLDEN_F64 = {
    "sor": -492.5982425163,
    "dtc": -492.5982425163,
    "fitc": -492.5983466590,
    "fsa": -492.5983604624,
}


def test_f32_sparse_mll_matches_f64_golden():
    """f32-lane tier of the sparse golden pins (VERDICT r4 item 6)."""
    rng = np.random.RandomState(1)
    N, M = 1000, 12
    x = (2 * np.pi * rng.rand(N)).astype(np.float32)
    y = (np.sin(x) + 0.3 * rng.randn(N)).astype(np.float32)
    inducing = np.linspace(0, 2 * np.pi, M).astype(np.float32)
    kern = gp.SE(0.3, 0.1)
    blocks = [list(range(i, min(i + 100, N))) for i in range(0, N, 100)]
    models = {
        "sor": gp.SoR(x, inducing, y, kernel=kern, lognoise=-0.6),
        "dtc": gp.DTC(x, inducing, y, kernel=kern, lognoise=-0.6),
        "fitc": gp.FITC(x, inducing, y, kernel=kern, lognoise=-0.6),
        "fsa": gp.FSA(x, inducing, blocks, y, kernel=kern, lognoise=-0.6),
    }
    for name, m in models.items():
        mll = float(m.mll)
        assert np.isfinite(mll), name
        # f32 keeps ~4 digits of the f64 golden at N=1000
        assert mll == pytest.approx(SPARSE_GOLDEN_F64[name], abs=0.5), name
