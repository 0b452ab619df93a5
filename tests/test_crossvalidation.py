"""Cross-validation tests (mirror of reference test_crossvalidation.jl):
analytic LOO/CVfold predictions vs brute-force refit-without-fold, and
criterion gradients vs finite differences."""
import jax.numpy as jnp
import numpy as np

import gaussianprocesses_jl_tpu as gp
from gaussianprocesses_jl_tpu.inference.crossvalidation import (
    dlogp_CVfold,
    dlogp_LOO,
    logp_CVfold,
    logp_LOO,
    predict_CVfold,
    predict_LOO,
)

N = 20


def _model():
    rng = np.random.RandomState(4)
    x = rng.randn(N, 1)
    y = np.sin(2 * x[:, 0]) + 0.3 * rng.randn(N)
    return gp.GPE(x, y, kernel=gp.SE(0.2, 0.1), lognoise=-0.7)


def test_loo_vs_brute_force():
    m = _model()
    mu, s2 = predict_LOO(m)
    for i in [0, 5, 13]:
        keep = [j for j in range(N) if j != i]
        sub = gp.GPE(m.x[np.asarray(keep)], m.y[np.asarray(keep)],
                     kernel=m.params.kernel,
                     lognoise=float(np.asarray(m.lognoise)))
        mu_b, var_b = sub.predict_y(m.x[i : i + 1])
        assert np.allclose(float(mu[i]), float(mu_b[0]), atol=1e-8)
        assert np.allclose(float(s2[i]), float(var_b[0]), atol=1e-8)


def test_cvfold_vs_brute_force():
    m = _model()
    folds = [list(range(0, 7)), list(range(7, 14)), list(range(14, N))]
    preds = predict_CVfold(m, folds)
    for (muV, SigmaV), V in zip(preds, folds):
        keep = [j for j in range(N) if j not in V]
        sub = gp.GPE(m.x[np.asarray(keep)], m.y[np.asarray(keep)],
                     kernel=m.params.kernel,
                     lognoise=float(np.asarray(m.lognoise)))
        mu_b, cov_b = sub.predict_y(m.x[np.asarray(V)], full_cov=True)
        assert np.allclose(np.asarray(muV), np.asarray(mu_b), atol=1e-8)
        assert np.allclose(np.asarray(SigmaV), np.asarray(cov_b), atol=1e-8)


def test_cvfold_ragged_matches_loo():
    """Singleton folds == LOO."""
    m = _model()
    folds = [[i] for i in range(N)]
    assert np.allclose(float(logp_CVfold(m, folds)), float(logp_LOO(m)),
                       rtol=1e-10)
    # ragged folds work
    folds = [list(range(0, 3)), list(range(3, 10)), list(range(10, N))]
    assert np.isfinite(float(logp_CVfold(m, folds)))


def test_loo_gradient_vs_fd():
    m = _model()
    g = dlogp_LOO(m)
    vec = m.params.flat_params()
    eps = 1e-6
    for p in range(vec.shape[0]):
        mp = gp.GPE(m.x, m.y, kernel=m.params.kernel, lognoise=0.0)
        mp.params = m.params.with_flat_params(vec.at[p].add(eps))
        mm = gp.GPE(m.x, m.y, kernel=m.params.kernel, lognoise=0.0)
        mm.params = m.params.with_flat_params(vec.at[p].add(-eps))
        fd = (float(logp_LOO(mp)) - float(logp_LOO(mm))) / (2 * eps)
        assert np.allclose(float(g[p]), fd, rtol=1e-4, atol=1e-6), (p,)


def test_cvfold_gradient_vs_fd():
    m = _model()
    folds = [list(range(0, 10)), list(range(10, N))]
    g = dlogp_CVfold(m, folds)
    vec = m.params.flat_params()
    eps = 1e-6
    for p in range(vec.shape[0]):
        mp = gp.GPE(m.x, m.y, kernel=m.params.kernel, lognoise=0.0)
        mp.params = m.params.with_flat_params(vec.at[p].add(eps))
        mm = gp.GPE(m.x, m.y, kernel=m.params.kernel, lognoise=0.0)
        mm.params = m.params.with_flat_params(vec.at[p].add(-eps))
        fd = (float(logp_CVfold(mp, folds))
              - float(logp_CVfold(mm, folds))) / (2 * eps)
        assert np.allclose(float(g[p]), fd, rtol=1e-4, atol=1e-6), (p,)
