"""Tracing / profiling utilities (SURVEY §5: the reference's profiling
story is its BenchmarkTools suites — perf/kernels.jl,
perf/benchmarks/benchmark_julia.jl:27-46 — which time internal functions
directly; here the same role is played by first-class helpers around
`jax.profiler` and dispatch-free device timing).

Three tools:
  * `trace(dir)`            — context manager writing a TensorBoard-viewable
                              XLA trace of everything inside the block.
  * `StepTimer`             — wall-clock per-step timing with warmup
                              discard; for sampler/optimizer loops.
  * `device_time(fn, *args)`— amortized *device* time of one evaluation of
                              a jittable fn, measured by scanning `reps`
                              perturbed evaluations inside one executable so
                              dispatch latency (27 ms through a remote-TPU
                              tunnel) and compile time are excluded. This is
                              the measurement bench.py publishes.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["trace", "StepTimer", "device_time", "live_device_bytes"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed block.

    View with TensorBoard (`tensorboard --logdir <log_dir>`) or Perfetto.
    Usage:
        with profiling.trace("/tmp/gp-trace"):
            gp_model.optimize(iters=50)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step wall-clock stats for training/sampling loops.

    Blocks on the step's outputs, so each recorded interval is a true
    end-to-end step time (dispatch + device). The first `warmup` steps
    (compilation) are recorded separately.

        timer = StepTimer(warmup=1)
        for _ in range(steps):
            with timer.step() as s:
                loss, state = train_step(state)
                s.block_on(loss)
        print(timer.summary())
    """

    class _Step:
        def __init__(self):
            self._outputs = []

        def block_on(self, *outputs):
            self._outputs.extend(outputs)

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: list[float] = []
        self.warmup_times: list[float] = []

    @contextlib.contextmanager
    def step(self):
        s = StepTimer._Step()
        t0 = time.perf_counter()
        yield s
        for out in s._outputs:
            jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        if len(self.warmup_times) < self.warmup:
            self.warmup_times.append(dt)
        else:
            self.times.append(dt)

    def summary(self) -> dict:
        ts = np.asarray(self.times) if self.times else np.asarray([np.nan])
        return {
            "steps": len(self.times),
            "mean_ms": float(np.mean(ts) * 1e3),
            "median_ms": float(np.median(ts) * 1e3),
            "min_ms": float(np.min(ts) * 1e3),
            "p95_ms": float(np.percentile(ts, 95) * 1e3),
            "compile_ms": float(np.sum(self.warmup_times) * 1e3),
        }


def device_time(fn: Callable, args: Sequence, reps: int = 10,
                trials: int = 4, perturb_arg: int = 0) -> float:
    """Amortized per-evaluation device seconds of `fn(*args)`.

    Scans `reps` evaluations inside ONE jitted executable, perturbing
    argument `perturb_arg` by 1e-6*i per rep (so XLA cannot CSE the
    evaluations) and reducing every output into the carry (so nothing is
    dead code). Returns the best-of-`trials` per-evaluation time — the
    same protocol as the reference's `@belapsed` min-of-20
    (ref perf/benchmarks/benchmark_julia.jl:40-46), minus dispatch.
    """
    args = list(args)
    x0 = jnp.asarray(args[perturb_arg])

    @jax.jit
    def many(x0):
        def body(carry, i):
            a = list(args)
            a[perturb_arg] = x0 + jnp.asarray(1e-6 * i, x0.dtype)
            out = fn(*a)
            leaves = jax.tree_util.tree_leaves(out)
            acc = carry
            for leaf in leaves:
                leaf = jnp.asarray(leaf)
                acc = acc + jnp.sum(leaf.astype(jnp.float32)).astype(
                    carry.dtype)
            return acc, None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32),
            jnp.arange(reps, dtype=jnp.float32))
        return acc

    out = many(x0)  # compile + warmup
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(trials):
        t0 = time.perf_counter()
        out = many(x0)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def live_device_bytes() -> int:
    """Total bytes of live buffers on the default backend's devices (the
    HBM-footprint observability hook; 0 if the backend has no stats)."""
    total = 0
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
        except (RuntimeError, AttributeError):
            stats = None
        if stats:
            total += int(stats.get("bytes_in_use", 0))
    return total
