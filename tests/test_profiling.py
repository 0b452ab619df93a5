"""Profiling utilities (utils/profiling.py)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

import gaussianprocesses_jl_tpu as gp
from gaussianprocesses_jl_tpu.utils import profiling


def test_step_timer_records_and_summarizes():
    timer = profiling.StepTimer(warmup=1)

    @jax.jit
    def f(x):
        return jnp.sum(x * x)

    x = jnp.arange(64.0)
    for _ in range(4):
        with timer.step() as s:
            out = f(x)
            s.block_on(out)
    summ = timer.summary()
    assert summ["steps"] == 3  # warmup discarded
    assert summ["min_ms"] > 0
    assert summ["compile_ms"] > 0
    assert summ["min_ms"] <= summ["median_ms"] <= summ["p95_ms"] + 1e-9


def test_device_time_returns_positive_and_consistent():
    X = jnp.asarray(np.random.RandomState(0).randn(64, 3))
    kern = gp.SE(0.0, 0.0)
    t = profiling.device_time(lambda X: kern.gram(X), [X], reps=4, trials=2)
    assert np.isfinite(t) and t > 0


def test_trace_writes_profile(tmp_path):
    d = str(tmp_path / "trace")
    with profiling.trace(d):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    found = []
    for root, _, files in os.walk(d):
        found.extend(files)
    assert found, "jax.profiler trace produced no files"


def test_live_device_bytes_nonnegative():
    x = jnp.ones((128, 128))
    jax.block_until_ready(x)
    assert profiling.live_device_bytes() >= 0
