"""sklearn adapter + plotting smoke tests (ref test gp.jl ScikitLearn
round-trip; plot recipe)."""
import numpy as np
import pytest

from gaussianprocesses_jl_tpu.sklearn import GPRegressor


def test_sklearn_roundtrip():
    rng = np.random.RandomState(0)
    X = rng.randn(30, 2)
    y = np.sin(X[:, 0]) + 0.1 * rng.randn(30)
    est = GPRegressor(lognoise=-1.0, maxiter=60)
    assert est.get_params()["lognoise"] == -1.0
    est2 = est.clone().set_params(maxiter=40)
    assert est2.get_params()["maxiter"] == 40
    est.fit(X, y)
    pred, sd = est.predict(X, return_std=True)
    assert pred.shape == (30,) and sd.shape == (30,)
    assert est.score(X, y) > 0.8
    assert np.isfinite(est.log_marginal_likelihood())


def test_sklearn_errors_before_fit():
    est = GPRegressor()
    with pytest.raises(RuntimeError):
        est.predict(np.zeros((2, 1)))
    with pytest.raises(ValueError):
        est.set_params(bogus=1)


def test_plot_helpers():
    mpl = pytest.importorskip("matplotlib")
    mpl.use("Agg")
    import gaussianprocesses_jl_tpu as gp
    from gaussianprocesses_jl_tpu.plot import plot_gp, plot_gp_2d

    rng = np.random.RandomState(0)
    x = rng.rand(15)
    y = np.sin(4 * x)
    m = gp.GPE(x, y, kernel=gp.SE(0.0, 0.0), lognoise=-2.0)
    ax = plot_gp(m)
    assert ax is not None
    X2 = rng.randn(20, 2)
    y2 = X2[:, 0] * X2[:, 1]
    m2 = gp.GPE(X2, y2, kernel=gp.SE(0.0, 0.0), lognoise=-2.0)
    ax2, im = plot_gp_2d(m2, n_grid=10)
    assert im is not None
