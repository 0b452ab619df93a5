"""Hot-path hygiene guards — the JAX analog of the reference's
zero-allocation regression tests (ref: test/memory.jl:20-23, which asserts
`update_mll_and_dmll!` allocates <0.1 matrix-equivalents per call).

On TPU the failure mode is not allocation but *silent recompilation*: a
hot loop that retraces per step (shape drift, weak-type flips, python
scalars promoted differently, a non-hashable static) is 1000x slower and
nothing crashes. These tests pin the jit cache size of every module-level
hot entry point across repeated calls with updated parameters/data, so a
recompile regression fails CI instead of burning pod time.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussianprocesses_jl_tpu as gp
from gaussianprocesses_jl_tpu.models import gpa as gpa_mod
from gaussianprocesses_jl_tpu.models import gpe as gpe_mod
from gaussianprocesses_jl_tpu.models.elastic import extend_cholesky
from gaussianprocesses_jl_tpu.inference.hmc import hmc


def _data(n=24, d=2, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, d)
    y = np.sin(X[:, 0]) + 0.1 * rng.randn(n)
    return X, y


def test_gpe_target_and_dtarget_no_recompile():
    X, y = _data()
    m = gp.GPE(X, y, kernel=gp.SE(0.1, 0.2), lognoise=-1.0)
    m.target_and_dtarget()  # warm the cache for this (shape, strategy)
    c0 = gpe_mod._target_and_grad_flat._cache_size()
    for i in range(5):
        # optimizer-style parameter updates at fixed shapes
        m.set_params(m.get_params() + 0.01 * (i + 1))
        m.target_and_dtarget()
    assert gpe_mod._target_and_grad_flat._cache_size() == c0, (
        "GPE target_and_dtarget recompiled on a pure parameter update")


def test_gpe_same_shape_new_model_no_recompile():
    X, y = _data(seed=1)
    gp.GPE(X, y, kernel=gp.SE(0.0, 0.0), lognoise=-1.0).target_and_dtarget()
    c0 = gpe_mod._target_and_grad_flat._cache_size()
    X2, y2 = _data(seed=2)
    m2 = gp.GPE(X2, y2, kernel=gp.SE(0.3, -0.1), lognoise=-0.5)
    m2.target_and_dtarget()
    m2.mll
    assert gpe_mod._target_and_grad_flat._cache_size() == c0, (
        "new data of the same shape must hit the existing executable")


def test_gpe_mll_and_predict_no_recompile():
    X, y = _data()
    m = gp.GPE(X, y, kernel=gp.SE(0.0, 0.0), lognoise=-1.0)
    Xs = np.linspace(-2, 2, 7)[:, None]
    m.mll
    m.predict_f(Xs)
    c_mll = gpe_mod._mll_jit._cache_size()
    c_pred = gpe_mod._predict_f_jit._cache_size()
    for i in range(4):
        m.set_params(m.get_params() + 0.02)
        m.mll
        m.predict_f(Xs)
    assert gpe_mod._mll_jit._cache_size() == c_mll
    assert gpe_mod._predict_f_jit._cache_size() == c_pred


def test_gpa_target_no_recompile():
    X, y = _data(n=16)
    yb = (y > 0).astype(float)
    m = gp.GPA(X, yb, gp.MeanZero(), gp.SE(0.0, 0.0), gp.BernLik())
    m.target_and_dtarget()
    c0 = gpa_mod._target_and_grad_flat._cache_size()
    for i in range(4):
        m.set_params(m.get_params() + 0.01)
        m.target_and_dtarget()
    assert gpa_mod._target_and_grad_flat._cache_size() == c0, (
        "GPA target_and_dtarget recompiled on a pure parameter update")


def test_hmc_no_recompile_across_calls():
    X, y = _data(n=12)
    m = gp.GPE(X, y, kernel=gp.SE(0.0, 0.0), lognoise=-1.0)
    logprob, x0, _, _ = m.make_logprob()
    hmc(logprob, x0, jax.random.PRNGKey(0), n_iter=3, eps=0.05)
    c0 = hmc._cache_size()
    for s in range(3):
        hmc(logprob, x0 + 0.1 * s, jax.random.PRNGKey(s), n_iter=3, eps=0.05)
    assert hmc._cache_size() == c0, (
        "hmc recompiled for a repeat call with the same logprob/config")


def test_elastic_append_one_executable_per_bucket():
    m = gp.ElasticGPE(1, kernel=gp.SE(0.0, 0.0), lognoise=-1.0,
                      capacity=32, stepsize=32)
    rng = np.random.RandomState(3)
    m.append(rng.randn(1, 1), rng.randn(1))
    m.append(rng.randn(1, 1), rng.randn(1))  # warm the k=1 executable
    c0 = extend_cholesky._cache_size()
    for _ in range(6):
        m.append(rng.randn(1, 1), rng.randn(1))
    assert extend_cholesky._cache_size() == c0, (
        "elastic append recompiled within a capacity bucket")


def test_weak_type_stability_of_param_updates():
    """set_params round-trips through numpy/python floats must produce the
    same avals (dtype + weak-type) as the originals, or every optimizer
    step would recompile."""
    X, y = _data()
    m = gp.GPE(X, y, kernel=gp.SE(0.0, 0.0), lognoise=-1.0)
    before = jax.tree_util.tree_map(
        lambda l: jax.api_util.shaped_abstractify(l),
        jax.tree_util.tree_leaves(m.params))
    m.set_params(np.asarray(m.get_params()))  # numpy round-trip
    m.set_params([float(v) for v in np.asarray(m.get_params())])  # py floats
    after = jax.tree_util.tree_map(
        lambda l: jax.api_util.shaped_abstractify(l),
        jax.tree_util.tree_leaves(m.params))
    assert before == after, f"param avals drifted: {before} -> {after}"
