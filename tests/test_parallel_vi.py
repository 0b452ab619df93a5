"""Sharded VI (parallel/vi.py) — BASELINE north star "VI particle batches
sharded over hosts" (scales ref src/vi.jl:50-81)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussianprocesses_jl_tpu as gp
from gaussianprocesses_jl_tpu.inference.vi import elbo, make_neg_elbo, vi
from gaussianprocesses_jl_tpu.parallel.mesh import make_mesh
from gaussianprocesses_jl_tpu.parallel.vi import (
    sharded_elbo,
    sharded_elbo_fn,
    sharded_vi,
)


@pytest.fixture(scope="module")
def poisson_model():
    rng = np.random.RandomState(3)
    n = 48
    t = np.linspace(0, 10, n)
    f = 1.0 + 0.7 * np.sin(t)
    y = rng.poisson(np.exp(f)).astype(float)
    return gp.GPA(t[:, None], y, gp.MeanZero(), gp.Matern(1.5, 0.0, 0.0),
                  gp.PoisLik())


def test_sharded_elbo_matches_single_device(poisson_model):
    """The observation-sharded ELBO must equal the single-device ELBO to
    reduction round-off (VERDICT r4 item 4: rtol 1e-6 on the 8-mesh)."""
    m_ = poisson_model
    mesh = make_mesh({"data": 8})
    rng = np.random.RandomState(0)
    mvec = jnp.asarray(0.5 + 0.3 * rng.randn(48))
    vvec = jnp.asarray(np.exp(0.5 * rng.randn(48)))

    e_s = float(sharded_elbo(m_, mvec, vvec, mesh))
    e_d = float(elbo(m_, mvec, vvec))
    assert np.allclose(e_s, e_d, rtol=1e-6), (e_s, e_d)

    # gradients through the shard_map boundary match too
    fn = sharded_elbo_fn(m_, mesh)
    g_s = jax.grad(lambda m, v: fn(m, v), argnums=(0, 1))(mvec, vvec)
    g_d = jax.grad(lambda m, v: elbo(m_, m, v), argnums=(0, 1))(mvec, vvec)
    for gs, gd in zip(g_s, g_d):
        assert np.allclose(np.asarray(gs), np.asarray(gd), rtol=1e-6,
                           atol=1e-10)


def test_sharded_elbo_rejects_indivisible(poisson_model):
    mesh = make_mesh({"data": 5}, devices=jax.devices()[:5])
    with pytest.raises(ValueError, match="divisible"):
        sharded_elbo_fn(poisson_model, mesh)


def test_sharded_vi_multi_restart(poisson_model):
    """8 restarts sharded over 8 devices: the winner's ELBO must be at
    least as good as the single-device Adam run it includes (restart 0
    starts unjittered), and the returned Approx is the argmax."""
    m_ = poisson_model
    mesh = make_mesh({"chains": 8})
    res = sharded_vi(m_, mesh, restarts=8, nits=150, lr=0.05,
                     key=jax.random.PRNGKey(1))
    assert res.elbos.shape == (8,)
    assert res.best == int(jnp.argmax(res.elbos))
    assert np.allclose(res.elbo, float(res.elbos[res.best]))

    q_single = vi(m_, nits=150, method="adam", lr=0.05)
    e_single = float(elbo(m_, q_single.m, q_single.v))
    assert res.elbo >= e_single - 1e-6
    # the fitted approximation is usable downstream
    mu, var = gp.vi_predict_y(m_, res.approx, m_.x)
    assert np.all(np.isfinite(np.asarray(mu)))
    assert np.all(np.asarray(var) >= 0)


def test_sharded_vi_validates_restarts(poisson_model):
    mesh = make_mesh({"chains": 8})
    with pytest.raises(ValueError, match="divisible"):
        sharded_vi(poisson_model, mesh, restarts=6, nits=5)


def test_sharded_vi_train_matches_replicated_adam(poisson_model):
    """Adam ON the observation-sharded objective (VERDICT r4 item 4: an
    optimizer must actually drive the sharded ELBO, with gradients
    flowing through the shard_map psum). From the same start, the
    sharded training loop must reproduce the replicated vi(method='adam')
    trajectory to reduction-order round-off."""
    from gaussianprocesses_jl_tpu.parallel.vi import sharded_vi_train

    m_ = poisson_model
    mesh = make_mesh({"data": 8})
    res = sharded_vi_train(m_, mesh, nits=150, lr=0.05)

    q_rep = vi(m_, nits=150, method="adam", lr=0.05)
    assert np.allclose(np.asarray(res.approx.m), np.asarray(q_rep.m),
                       rtol=1e-6, atol=1e-8)
    assert np.allclose(np.asarray(res.approx.v), np.asarray(q_rep.v),
                       rtol=1e-6, atol=1e-8)
    # the trace is the (increasing-to-converged) sharded ELBO per step
    tr = np.asarray(res.elbo_trace)
    assert tr.shape == (150,)
    assert tr[-1] > tr[0]
    assert np.allclose(res.elbo, float(elbo(m_, res.approx.m,
                                            res.approx.v)), rtol=1e-6)


def test_sharded_vi_train_custom_start(poisson_model):
    from gaussianprocesses_jl_tpu.parallel.vi import sharded_vi_train

    m_ = poisson_model
    mesh = make_mesh({"data": 8})
    _, theta0, n = make_neg_elbo(m_)
    rng = np.random.RandomState(1)
    th = theta0 + 0.1 * jnp.asarray(rng.randn(theta0.shape[0]))
    res = sharded_vi_train(m_, mesh, nits=40, lr=0.05, theta0=th)
    assert np.all(np.isfinite(np.asarray(res.approx.m)))
    assert np.all(np.asarray(res.approx.v) > 0)
