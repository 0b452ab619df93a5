"""Notebook-parity regression tests (VERDICT round-1 item 5).

The reference's 5 notebook models are its behavioral spec (SURVEY §2.8) and
its sparse test pins golden mll values to 1e-3 (ref
test/test_sparse.jl:147-160). These tests run the repo's examples/ end to
end and pin their numeric anchors, so CI catches regressions in the full
optimize/sample/predict stacks. Golden values were produced by this
framework on the CPU/f64 test backend and act as self-regression anchors
(the reference's own golden values depend on its Julia RNG streams and are
not reproducible bit-for-bit; parity is asserted through the behavioral
anchors the notebooks publish — rmse, accuracy, approximation gaps)."""
import os
import sys

import numpy as np
import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")
if EXAMPLES not in sys.path:
    sys.path.insert(0, EXAMPLES)

pytestmark = pytest.mark.slow


def test_mauna_loa_composite_kernel_fit():
    """Config #1: CO2 series, SE + Periodic*SE + RQ + SE composite.
    Anchors: optimized mll -111.74 (golden), 2004+ forecast rmse 2.77 ppm
    (reference notebook reports ~2-3 ppm on this horizon)."""
    import mauna_loa

    rmse = mauna_loa.main()
    assert rmse < 3.5, f"Mauna Loa forecast degraded: rmse {rmse:.3f} ppm"


def test_mauna_loa_optimized_mll_pinned():
    import mauna_loa

    import gaussianprocesses_jl_tpu as gp

    year, co2 = mauna_loa.load_data()
    train = year < 2004
    ytrain = co2[train]
    kernel = (gp.SE(4.0, 4.0)
              + gp.Periodic(0.0, 1.0, 0.0) * gp.SE(4.0, 0.0)
              + gp.RQ(0.0, 0.0, -1.0)
              + gp.SE(-2.0, -2.0))
    m = gp.GPE(year[train], ytrain - ytrain.mean(), gp.MeanZero(), kernel,
               lognoise=-2.0)
    m.optimize(maxiter=200)
    # golden value from this framework (f64); tolerance covers optimizer
    # path wobble, not regressions
    assert float(m.mll) == pytest.approx(-111.74, abs=2.0)


def test_classification_crabs_shaped():
    """Config #2: Bernoulli GPA + HMC over latents+hypers; train accuracy
    anchor 0.80 (golden)."""
    import classification

    acc = classification.main(n_iter=1000)
    assert acc >= 0.75, f"classification accuracy degraded: {acc:.3f}"


def test_poisson_mcmc_vs_vi_agreement():
    """Config #3: Poisson GPA — MCMC and VI must agree on the rate field
    (golden corr: mcmc 0.646, vi 0.696 with the counts)."""
    import poisson_regression

    c_m, c_v = poisson_regression.main(n_iter=500, vi_iters=300)
    assert c_m > 0.5 and c_v > 0.5, (c_m, c_v)
    assert abs(c_m - c_v) < 0.15, f"mcmc/vi disagree: {c_m:.3f} vs {c_v:.3f}"


def test_robust_regression_student_t_beats_gaussian():
    """Student-t GPA under outliers (golden: rmse 0.087 vs GPE 0.323)."""
    import robust_regression

    rmse_g, rmse_t = robust_regression.main(n_iter=500)
    assert rmse_t < rmse_g, (rmse_t, rmse_g)
    assert rmse_t < 0.15, f"student-t fit degraded: rmse {rmse_t:.3f}"


def test_sparse_mll_golden_values():
    """Sparse strategies at N=1000, 12 inducing points: mll pinned to the
    framework's golden values at 1e-3 (the reference's pinning pattern,
    test/test_sparse.jl:147-160) and within 10 of the exact GP."""
    import gaussianprocesses_jl_tpu as gp

    rng = np.random.RandomState(1)
    n = 1000
    x = 2 * np.pi * rng.rand(n)
    y = np.sin(x) + 0.5 * rng.randn(n)
    inducing = np.linspace(0, 2 * np.pi, 12)
    blocks = [list(range(i, min(i + 100, n))) for i in range(0, n, 100)]
    kern = gp.SE(0.3, 0.1)

    golden = {
        "exact": -871.2615224318861,
        "SoR": -871.2615035337278,
        "DTC": -871.2615035337278,
        "FITC": -871.2615489920295,
        "FSA": -871.2615636292248,
    }
    exact = gp.GPE(x, y, kernel=kern, lognoise=-0.3)
    assert float(exact.mll) == pytest.approx(golden["exact"], abs=1e-3)
    models = {
        "SoR": gp.SoR(x, inducing, y, kernel=kern, lognoise=-0.3),
        "DTC": gp.DTC(x, inducing, y, kernel=kern, lognoise=-0.3),
        "FITC": gp.FITC(x, inducing, y, kernel=kern, lognoise=-0.3),
        "FSA": gp.FSA(x, inducing, blocks, y, kernel=kern, lognoise=-0.3),
    }
    for name, m in models.items():
        mll = float(m.mll)
        assert mll == pytest.approx(golden[name], abs=1e-3), name
        assert abs(mll - float(exact.mll)) < 10.0, name


def test_regression_quickstart_runs():
    """Regression.ipynb model: ML fit + HMC + ESS all execute with finite
    results (smoke parity with the first reference notebook)."""
    import regression

    regression.main(n_iter=200)
