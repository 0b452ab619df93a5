"""Benchmark suite.

Default run (what the driver records) measures three things and prints ONE
JSON line:

  * headline: one marginal-likelihood + gradient evaluation
    (`update_mll_and_dmll!`) on the reference's published configuration —
    d=10, n=3000, SE kernel, min over trials
    (ref: perf/README.md:1-8, perf/benchmarks/benchmark_julia.jl:27-46;
    reference Julia CPU: 800 ms, BASELINE.md);
  * the BASELINE.json metric "Cholesky TFLOP/s at N=10k": f32 Cholesky
    throughput at n=10000 on the chip, with a measured GEMM roofline anchor
    (a large f32 matmul at default precision) so the achieved fraction of
    practical peak is reported, not asserted;
  * the BASELINE.json metric "effective samples/sec/chip on GPA
    classification": vmapped multi-chain HMC over [latents; hypers] of a
    Bernoulli-likelihood GPA (crabs-shaped: n=200, d=5, Matern-3/2 ARD —
    ref notebooks/Classification.ipynb), ESS via the FFT-Geyer estimator
    (inference/diagnostics.py), reported as min/median-across-parameters
    effective samples per wall second on one chip.

Flags:
  --full             also run the whole kernel table from BASELINE.md
  --kernels          per-kernel micro suite mirroring ref perf/kernels.jl:
                     gram build and mll+gradient timings at (n=100,d=10)
                     and (n=3000,d=10); writes perf_kernels.json
  --fitc100k         config #4: sharded-FITC mll+grad+Adam steps at N=100k
                     on the chip (wall time per step, decreasing losses)
  --chains-scaling   GPA ESS/sec/chip vs vmapped chain count
                     (16/64/256/1024); writes gpa_chains_scaling.json
"""
import json
import os
import sys
import time

import numpy as np

# Per-process random salt folded into every *timed* trial's input
# perturbation. The remote-TPU tunnel caches (executable, args) executions
# persistently across processes, so fixed perturbation constants let a
# re-run of the same bench return instantly with nonsense timings
# (observed: "6400 TFLOP/s Cholesky" on a repeat run). The salt keeps the
# compiled executable identical (it is a runtime argument) while making
# the argument values unique to this process.
_SALT = float(np.frombuffer(os.urandom(4), dtype=np.uint32)[0]) / 2.0**32


def _sync(out) -> float:
    """Force completion of `out` through the remote-TPU tunnel.

    `jax.block_until_ready` alone can return before the remote compute
    finishes (root-caused r3: an isolated bench_cholesky process with no
    host readback timed pure dispatch latency — 0.03 "ms" per 22 ms
    factorization; one scalar readback makes every subsequent wait real).
    Every timed region must end with a host readback, not just
    block_until_ready. Returns the scalar it read so callers can also use
    the value."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.ravel(leaf)[0])


REF_MS = {  # BASELINE.md published times (ms)
    "fix(se)": 730.0,
    "mask(se)": 819.0,
    "se": 800.0,
    "mat12": 836.0,
    "rq": 1252.0,
    "se+rq": 1351.0,
    "mask(se)+mask(rq)": 1562.0,
    "se*rq": 1614.0,
    "se+se2+rq": 1682.0,
    "(se+se2)*rq": 1977.0,
}


def kernels(gp, jnp):
    d = 10
    se = gp.SE(0.0, 0.0)
    se2 = gp.SE(0.5, 0.2)
    rq = gp.RQ(0.0, 0.0, 0.0)
    return {
        "fix(se)": gp.fix(gp.SE(0.0, 0.0), "lsigma"),
        "mask(se)": gp.Masked(gp.SE(0.0, 0.0), active_dims=(0,)),
        "se": se,
        "mat12": gp.Matern(0.5, 0.0, 0.0),
        "rq": rq,
        "se+rq": se + rq,
        "mask(se)+mask(rq)": gp.Masked(gp.SE(0.0, 0.0), (0,))
        + gp.Masked(gp.RQ(0.0, 0.0, 0.0), tuple(range(1, d))),
        "se*rq": se * rq,
        "se+se2+rq": se + se2 + rq,
        "(se+se2)*rq": (se + se2) * rq,
    }


def bench_one(name, kern, X, y, n_trials=5, reps=20):
    """Per-evaluation device time, amortized over `reps` evaluations inside
    one compiled scan. (A single dispatch through the remote-TPU tunnel
    costs ~27 ms of pure latency, which would swamp the ~ms-scale compute;
    the reference's CPU benchmark has no dispatch cost, so amortized device
    time is the apples-to-apples number. Each rep perturbs the
    hyperparameters so XLA cannot CSE the evaluations away.)"""
    import jax
    import jax.numpy as jnp

    import gaussianprocesses_jl_tpu as gp
    from gaussianprocesses_jl_tpu.models.covariance import FullCovariance
    from gaussianprocesses_jl_tpu.models.gpe import GPEParams, gpe_mll
    from gaussianprocesses_jl_tpu.utils.params import wrap_param

    params = GPEParams(lognoise=wrap_param(-1.0), mean=gp.MeanZero(),
                       kernel=kern)
    cs = FullCovariance()
    vec = params.flat_params()

    def mll_and_grad(v):
        def f(v):
            return gpe_mll(params.with_flat_params(v), X, y, cs)[0]

        return jax.value_and_grad(f)(v)

    @jax.jit
    def many(v0, t):
        def body(carry, i):
            val, g = mll_and_grad(v0 + 1e-6 * i + t)
            return carry + val + (jnp.sum(g) if g.size else 0.0), val

        acc, vals = jax.lax.scan(
            body, jnp.zeros((), X.dtype),
            jnp.arange(reps, dtype=X.dtype))
        return acc, vals[0]

    # each trial perturbs the input: the remote-TPU tunnel can cache
    # identical (executable, args) executions
    out = many(vec, jnp.zeros((), X.dtype))  # compile + warmup
    _sync(out)
    best = np.inf
    for t in range(n_trials):
        t0 = time.perf_counter()
        out = many(vec, jnp.asarray(1e-7 * (t + 1 + _SALT), X.dtype))
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3, float(out[1])


def bench_gram_one(kern, X, n_trials=5, reps=20):
    """Amortized device time of one gram-matrix build (ref perf/kernels.jl
    `cov!` row)."""
    import jax
    import jax.numpy as jnp

    vec = kern.flat_params()

    @jax.jit
    def many(v0, t):
        def body(carry, i):
            K = kern.with_flat_params(v0 + 1e-6 * i + t).gram(X)
            return carry + K[0, 0] + K[-1, -1], None

        acc, _ = jax.lax.scan(body, jnp.zeros((), X.dtype),
                              jnp.arange(reps, dtype=X.dtype))
        return acc

    out = many(vec, jnp.zeros((), X.dtype))
    _sync(out)
    best = np.inf
    for t in range(n_trials):
        t0 = time.perf_counter()
        out = many(vec, jnp.asarray(1e-7 * (t + 1 + _SALT), X.dtype))
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


def bench_cholesky(n=10000, reps=8, n_trials=4):
    """f32 Cholesky TFLOP/s at N=n on the chip (BASELINE.json metric):
    the library's left-looking blocked MXU Cholesky (ops/linalg.py
    blocked_cholesky — what safe_cholesky/dense_quad_logdet use at this
    size) and XLA's jnp.linalg.cholesky for reference, with a measured
    large-GEMM roofline anchor for the fraction-of-peak claim.

    The PD input is W W^T + n I (W n x 256) built on device; each rep
    perturbs the diagonal so the scan's factorizations cannot be CSE'd;
    each trial perturbs the input (the remote-TPU tunnel can cache
    identical executions); the log-det is accumulated so nothing is dead
    code."""
    import jax
    import jax.numpy as jnp

    from gaussianprocesses_jl_tpu.ops.linalg import blocked_cholesky

    key = jax.random.PRNGKey(0)
    W = jax.random.normal(key, (n, 256), dtype=jnp.float32)
    K = W @ W.T + n * jnp.eye(n, dtype=jnp.float32)

    def time_chol(chol_fn):
        @jax.jit
        def many_chol(K, t):
            idx = jnp.arange(n)

            def body(carry, i):
                Ki = K.at[idx, idx].add(1e-3 * (i + 1.0) + t)
                L = chol_fn(Ki)
                return carry + 2.0 * jnp.sum(jnp.log(jnp.diagonal(L))), None

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                  jnp.arange(reps, dtype=jnp.float32))
            return acc

        out = many_chol(K, jnp.float32(0.0))
        _sync(out)
        best = np.inf
        for t in range(n_trials):
            t0 = time.perf_counter()
            out = many_chol(K, jnp.float32(1e-4 * (t + 1 + _SALT)))
            _sync(out)
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    blocked_s = time_chol(lambda Ki: blocked_cholesky(Ki)[0])
    xla_s = time_chol(jnp.linalg.cholesky)
    chol_tflops = (n**3 / 3.0) / blocked_s / 1e12

    # measured practical GEMM peak (f32 inputs, default TPU precision)
    m = 4096
    A = jax.random.normal(key, (m, m), dtype=jnp.float32)

    @jax.jit
    def many_mm(A, t):
        def body(C, i):
            return C + jnp.dot(A + 1e-6 * i + t, A), None

        C, _ = jax.lax.scan(body, jnp.zeros_like(A),
                            jnp.arange(reps, dtype=jnp.float32))
        return C[0, 0]

    out = many_mm(A, jnp.float32(0.0))
    _sync(out)
    best_mm = np.inf
    for t in range(n_trials):
        t0 = time.perf_counter()
        out = many_mm(A, jnp.float32(1e-6 * (t + 1 + _SALT)))
        _sync(out)
        best_mm = min(best_mm, (time.perf_counter() - t0) / reps)
    gemm_tflops = (2.0 * m**3) / best_mm / 1e12

    return {
        "n": n,
        "ms": round(blocked_s * 1e3, 3),
        "tflops": round(chol_tflops, 3),
        "xla_ms": round(xla_s * 1e3, 3),
        "xla_tflops": round((n**3 / 3.0) / xla_s / 1e12, 3),
        "vs_xla": round(xla_s / blocked_s, 3),
        "gemm_peak_tflops": round(gemm_tflops, 2),
        "frac_gemm_peak": round(chol_tflops / gemm_tflops, 4),
    }


def bench_gpa_ess(n=200, d=5, chains=128, n_iter=400, warmup=100,
                  eps=0.05, sampler="split", a_iters=16, eps_a=0.06,
                  eps_b=0.08):
    # Joint-sampler eps picked by on-chip sweep: 0.02 -> accept .96, med
    # 16 eff/s; 0.05 -> accept .72, med 40 eff/s; 0.08 diverges. Collective
    # dual-averaging adaptation (parallel/chains.sharded_hmc, r3) converges
    # to the same eps* ~ 0.046 — parity, not a win, on this target.
    #
    # sampler="split" (default, r4): factor-cached Metropolis-within-Gibbs
    # (inference/split.py) — `a_iters` cheap updates of [v; lik; mean]
    # against the cached Cholesky factor (no factorization in the leapfrog)
    # alternate with one kernel-block update that refactorizes; each block
    # gets its own step size (eps_a for the well-conditioned whitened
    # latents, eps_b for the kernel hypers). The TPU analog of the
    # reference's "recompute K only if kern moved" check
    # (ref src/GPA.jl:118-128).
    """Effective samples/sec/chip on GPA Bernoulli classification
    (BASELINE.json metric; config #2). Crabs-shaped synthetic data
    (n=200, d=5, Matern-3/2 ARD kernel + probit likelihood — ref
    notebooks/Classification.ipynb), `chains` vmapped HMC chains over
    [v (n latents); kernel hypers] on one chip, ESS via the FFT-Geyer
    estimator pooled across chains."""
    import jax
    import jax.numpy as jnp

    import gaussianprocesses_jl_tpu as gp
    from gaussianprocesses_jl_tpu.inference.diagnostics import (
        effective_sample_size,
    )
    from gaussianprocesses_jl_tpu.inference.hmc import hmc

    rng = np.random.RandomState(7)
    X = rng.randn(n, d).astype(np.float32)
    f_true = np.sin(X[:, 0]) + 0.5 * X[:, 1]
    y = (f_true + 0.3 * rng.randn(n) > 0).astype(np.float32)

    m = gp.GPA(X, y, gp.MeanZero(),
               gp.Matern(1.5, np.zeros(d, np.float32), np.float32(0.0)),
               gp.BernLik())
    # Normal(0, 2) priors on all kernel hypers, matching the reference
    # notebook config (ref notebooks/Classification.ipynb:
    # set_priors!(gp.kernel, [Normal(0.0, 2.0) for i in 1:6])) — without
    # them the unidentified ARD directions wander and R-hat never
    # converges
    from gaussianprocesses_jl_tpu.utils.priors import Normal as _N

    m.set_priors(kern=[_N(0.0, 2.0)] * (d + 1))

    keys = jax.random.split(jax.random.PRNGKey(11), chains)

    # SEGMENTED execution: a single 600-iteration scan at 256+ chains is
    # a ~150 s device execution, which crashes/restarts the remote TPU
    # worker (observed r3; <~40 s executions run fine). Split the chain
    # into fixed-size jitted segments, threading (state, fresh keys)
    # between them. Measured sec/iter ~= chains/1000 on this config.
    seg = max(25, min(n_iter, int(40_000 / max(chains, 1))))
    n_seg = -(-n_iter // seg)
    total_iters = n_seg * seg

    if sampler == "split":
        precompute, lp_a, lp_b, a0, b0 = m.make_split_logprob()
        na, D = a0.shape[0], a0.shape[0] + b0.shape[0]
        x0 = jnp.concatenate([a0, b0])
        draws_per_iter = a_iters
    else:
        logprob, x0, _, _ = m.make_logprob()
        na, D = None, x0.shape[0]
        draws_per_iter = 1

    starts = x0[None, :] + 0.01 * jax.vmap(
        lambda k: jax.random.normal(k, x0.shape, dtype=x0.dtype))(keys)

    if sampler == "split":
        def one(th, k):
            res = gp.split_hmc(precompute, lp_a, lp_b, th[:na], th[na:],
                               k, n_iter=seg, a_iters=a_iters,
                               eps_a=eps_a, eps_b=eps_b, Lmin=5, Lmax=15)
            acc = jnp.stack([res.accept_rate_a, res.accept_rate_b])
            return res.samples, acc, res.final, res.final_target
    else:
        def one(th, k):
            res = hmc(logprob, th, k, n_iter=seg, eps=eps, Lmin=5, Lmax=15)
            acc = jnp.stack([res.accept_rate, res.accept_rate])
            return res.samples, acc, res.final, res.final_target

    run = jax.vmap(one)

    def run_segmented(salt):
        chunks, accs = [], []
        th = starts
        for s in range(n_seg):
            # the fold constant must be a RUNTIME argument: baking the
            # python int into the closure makes every segment a distinct
            # executable (~60 s recompile each through the tunnel)
            ks = jax.vmap(jax.random.fold_in)(
                keys, jnp.full((chains,), 7919 * salt + s, jnp.uint32))
            samples_s, acc_s, th, ft = run(th, ks)
            _sync(ft)
            chunks.append(samples_s)  # (C, seg*draws_per_iter, D)
            accs.append(np.mean(np.asarray(acc_s), axis=0))  # (2,)
        return jnp.concatenate(chunks, axis=1), np.mean(accs, axis=0)

    out0 = run(starts, keys)  # compile + warmup (one segment)
    _sync(out0[3])
    t0 = time.perf_counter()
    samples, acc = run_segmented(salt=1)
    wall = time.perf_counter() - t0

    post = samples[:, warmup * draws_per_iter:, :]  # (C, n_kept, D)
    # the rank-normalized diagnostics argsort pooled draws — run on the
    # host CPU backend beyond ~20M elements (TPU sort workspace
    # RESOURCE_EXHAUSTs at 1024-chain sizes; r5)
    if post.size > 20_000_000:
        post = np.asarray(post)
        del samples
        ess, rhat = _diag_host(post)
    else:
        from gaussianprocesses_jl_tpu.inference.diagnostics import (
            split_rhat,
        )

        ess = np.asarray(effective_sample_size(post))
        rhat = np.asarray(split_rhat(post))
    out = {
        "n_obs": n,
        "dim_theta": int(D),
        "sampler": sampler,
        "chains": chains,
        "iters_post_warmup": int(total_iters - warmup),
        "draws_per_iter": draws_per_iter,
        "segments": int(n_seg),
        "wall_s": round(wall, 3),
        "accept_rate": round(float(np.mean(acc)), 3),
        "ess_min": round(float(ess.min()), 1),
        "ess_median": round(float(np.median(ess)), 1),
        "ess_per_sec_min": round(float(ess.min()) / wall, 1),
        "ess_per_sec_median": round(float(np.median(ess)) / wall, 1),
        "rhat_max": round(float(np.nanmax(rhat)), 4),
        # every published eff/s is gated on the rank-normalized folded
        # R-hat (inference/diagnostics.py, Vehtari et al. 2021); the ESS
        # estimator itself is between-chain-aware, so non-mixing chains
        # cannot inflate the count (VERDICT r4 item 2)
        "valid": bool(np.nanmax(rhat) < 1.01),
        "iters_per_sec_per_chain": round(total_iters / wall, 1),
    }
    if sampler == "split":
        out["a_iters"] = a_iters
        out["eps_a"] = eps_a
        out["eps_b"] = eps_b
        out["accept_a"] = round(float(acc[0]), 3)
        out["accept_b"] = round(float(acc[1]), 3)
    return out


def bench_gpa_chains_scaling(chain_counts=(16, 64, 256, 1024)):
    """Chain-count scaling curve for the GPA classification sampler on one
    chip (VERDICT r3 item 2): how ESS/sec/chip grows as vmapped chains
    amortize per-iteration overhead. Writes gpa_chains_scaling.json."""
    table = {}
    for c in chain_counts:
        r = bench_gpa_ess(chains=c)
        table[str(c)] = r
        print(f"# chains={c:5d}: {r['ess_per_sec_median']:8.1f} median "
              f"eff/s/chip ({r['ess_per_sec_min']} min), wall "
              f"{r['wall_s']} s, accept={r['accept_rate']}",
              file=sys.stderr)
        # write after EVERY count: a late-count crash must not discard
        # the measured rows (r4: the 1024-row OOM lost a 20-minute run)
        with open("gpa_chains_scaling.json", "w") as f:
            json.dump(table, f, indent=1)
    print("# wrote gpa_chains_scaling.json", file=sys.stderr)
    return table


def _diag_host(post):
    """(ess, rhat) computed on the host CPU backend. The rank-normalized
    diagnostics argsort the pooled (C*n, D) draws; at 1024-chain sizes
    the TPU sort workspace RESOURCE_EXHAUSTs the chip (observed r5), and
    the host sort of ~100M floats costs seconds."""
    import jax

    from gaussianprocesses_jl_tpu.inference.diagnostics import (
        effective_sample_size,
        split_rhat,
    )

    post = np.asarray(post)
    with jax.default_device(jax.devices("cpu")[0]):
        return (np.asarray(effective_sample_size(post)),
                np.asarray(split_rhat(post)))


def _mode_analysis(post, rhat):
    """Decompose an apparently non-mixing ensemble into modes along the
    worst-R-hat coordinate (VERDICT r4 item 3: the config-#5
    multimodality claim needs evidence, not prose).

    post: (C, n, D) host array. Chains are assigned to 2 clusters by the
    largest gap in per-chain means of the offending coordinate; reports
    per-mode occupancy, per-mode rank-normalized R-hat and
    between-chain-aware ESS, and the fraction of chains whose draws
    visit both sides (actual mode switching, not just spread)."""
    d = int(np.nanargmax(rhat))
    x = post[:, :, d]
    cm = np.sort(x.mean(axis=1))
    gaps = np.diff(cm)
    g = int(np.argmax(gaps))
    thr = float((cm[g] + cm[g + 1]) / 2)
    assign = (post[:, :, d].mean(axis=1) > thr).astype(int)
    out = {"coord": d, "threshold": round(thr, 4),
           "gap_width": round(float(gaps[g]), 4),
           "chain_mean_spread": round(float(cm[-1] - cm[0]), 4)}
    both = np.mean([(x[c] > thr).any() and (x[c] <= thr).any()
                    for c in range(x.shape[0])])
    out["chains_visiting_both"] = round(float(both), 4)
    for mode in (0, 1):
        sel = post[assign == mode]
        entry = {"chains": int((assign == mode).sum())}
        if entry["chains"] >= 2:
            es, rh = _diag_host(sel)
            entry.update({"rhat_max": round(float(np.nanmax(rh)), 4),
                          "ess_min": round(float(es.min()), 1),
                          "ess_median": round(float(np.median(es)), 1)})
        out[f"mode{mode}"] = entry
    return out


def bench_student_t_1024(chains=1024, n_iter=1000, warmup=400,
                         ess_iters=300, split_iter=2000, split_warmup=200,
                         a_iters=4):
    # Iteration counts sized by the r5 mode analysis: the slow direction
    # is the kernel log-lengthscale (integrated autocorrelation ~100s of
    # outer iterations — a continuum ridge, not discrete modes: 15-35%
    # of chains cross the fitted threshold), so the split run spends its
    # budget on MANY outer (B-block) updates with a_iters=4 rather than
    # deep latent sweeps.
    """BASELINE config #5 as specified: multi-chain sampling + ESS on
    Student-t robust regression (ref notebooks "Regression with
    outliers.ipynb", src/likelihoods/studentT.jl) at 1024 chains with
    COLLECTIVE adaptation. Three samplers:

      * `hmc`: parallel/chains.sharded_hmc — psum'd dual-averaging step
        size + cross-chain mass-matrix estimation on the joint target;
      * `split`: parallel/chains.sharded_split_hmc — the factor-cached
        split-block sampler ([v; lsigma] against the cached factor /
        [kern] refactorizing) with collective per-block adaptation — the
        sampler that actually mixes the latents at the outlier points
        (VERDICT r4 item 3);
      * `ess_sampler`: sharded_ess on the Gaussian-noise GPE
        counterpart with the fleet-pooled proposal diagnostic.

    All ESS/R-hat numbers use the between-chain-aware estimators
    (inference/diagnostics.py); each section carries a `valid` gate
    (rank-normalized folded R-hat < 1.01) and, when the gate fails, a
    `mode_analysis` block decomposing the ensemble along the offending
    coordinate. On one chip the mesh axis is size 1 (chains vmapped);
    the same code shards over hosts (dryrun_multichip covers the
    multi-device path)."""
    import jax
    import jax.numpy as jnp

    import gaussianprocesses_jl_tpu as gp
    from gaussianprocesses_jl_tpu.inference.diagnostics import (
        effective_sample_size,
        split_rhat,
    )
    from gaussianprocesses_jl_tpu.parallel.chains import (
        sharded_hmc,
        sharded_ess,
    )
    from gaussianprocesses_jl_tpu.parallel.mesh import make_mesh
    from gaussianprocesses_jl_tpu.utils.priors import Normal as _N

    # data exactly as examples/robust_regression.py (outliers every 8th)
    rng = np.random.RandomState(1)
    n = 60
    x = np.sort(2 * np.pi * rng.rand(n)).astype(np.float32)
    f = np.sin(x)
    y = (f + 0.15 * rng.randn(n)).astype(np.float32)
    y[::8] += rng.choice([-4.0, 4.0], size=len(y[::8])).astype(np.float32)

    m = gp.GPA(x, y, gp.MeanZero(), gp.SE(0.0, 0.0),
               gp.StuTLik(lsigma=jnp.asarray(-1.0, jnp.float32), nu=3))
    m.set_priors(kern=[_N(0.0, 2.0)] * 2, lik=[_N(-1.0, 1.0)])
    logprob, x0, _, _ = m.make_logprob()
    D = x0.shape[0]

    mesh = make_mesh({"chains": len(jax.devices())})
    key = jax.random.PRNGKey(17)
    starts = x0[None, :] + 0.05 * jax.random.normal(
        key, (chains, D), dtype=x0.dtype)

    total = warmup + n_iter
    seg = max(25, min(total, int(40_000 / max(chains, 1))))

    # warmup-compile one tiny run, then time the real one
    r0 = sharded_hmc(logprob, starts, key, mesh, n_iter=1,
                     n_warmup=seg - 1, eps0=0.02, segment_iters=seg)
    _sync(r0.final_target)
    t0 = time.perf_counter()
    res = sharded_hmc(logprob, starts, jax.random.fold_in(key, 1), mesh,
                      n_iter=n_iter, n_warmup=warmup, eps0=0.02,
                      target_accept=0.8, segment_iters=seg)
    _sync(res.final_target)
    wall = time.perf_counter() - t0

    post = np.asarray(res.samples)  # (C, n_iter, D)
    ess, rhat = _diag_host(post)

    # --- factor-cached split-block sampler with collective per-block
    # --- adaptation: [v; lsigma] against the cached factor / [kern]
    from gaussianprocesses_jl_tpu.parallel.chains import sharded_split_hmc

    precompute, lp_a, lp_b, a0, b0 = m.make_split_logprob()
    na = a0.shape[0]
    x0s = jnp.concatenate([a0, b0])
    k_s = jax.random.fold_in(key, 3)
    starts_s = x0s[None, :] + 0.05 * jax.random.normal(
        k_s, (chains, D), dtype=x0s.dtype)
    seg_s = max(10, min(split_warmup + split_iter,
                        int(30_000 / max(chains, 1))))
    # short B trajectories: long ones (Lmax_b=40) were measured NOT to
    # reduce R-hat (1.2442 vs 1.2427 at equal iterations) while costing
    # 2.5x the wall — the binding constraint is the latent/kernel Gibbs
    # coupling, not path length (perf/README.md 5c)
    r0s = sharded_split_hmc(precompute, lp_a, lp_b, starts_s, k_s, mesh,
                            na, n_iter=1, a_iters=a_iters, n_warmup=1,
                            eps_a0=0.2, eps_b0=0.05,
                            segment_iters=seg_s)
    _sync(r0s.final_target)
    t0s = time.perf_counter()
    res_s = sharded_split_hmc(precompute, lp_a, lp_b, starts_s,
                              jax.random.fold_in(k_s, 1), mesh, na,
                              n_iter=split_iter, n_warmup=split_warmup,
                              a_iters=a_iters, eps_a0=0.2, eps_b0=0.05,
                              target_accept=0.8, segment_iters=seg_s)
    _sync(res_s.final_target)
    wall_s = time.perf_counter() - t0s
    post_s = np.asarray(res_s.samples)  # (C, split_iter * a_iters, D)
    ess_s, rhat_s = _diag_host(post_s)
    split_out = {
        "iters_post_warmup": split_iter,
        "warmup": split_warmup,
        "a_iters": a_iters,
        "wall_s": round(wall_s, 3),
        "accept_a": round(float(np.mean(np.asarray(
            res_s.accept_rate_a))), 3),
        "accept_b": round(float(np.mean(np.asarray(
            res_s.accept_rate_b))), 3),
        "eps_a_adapted": round(float(res_s.eps_a_final), 5),
        "eps_b_adapted": round(float(res_s.eps_b_final), 5),
        "ess_min": round(float(ess_s.min()), 1),
        "ess_median": round(float(np.median(ess_s)), 1),
        "ess_per_sec_min": round(float(ess_s.min()) / wall_s, 1),
        "ess_per_sec_median": round(float(np.median(ess_s)) / wall_s, 1),
        "rhat_max": round(float(np.nanmax(rhat_s)), 4),
        "valid": bool(np.nanmax(rhat_s) < 1.01),
    }
    if not split_out["valid"]:
        split_out["mode_analysis"] = _mode_analysis(post_s, rhat_s)

    # sharded elliptical slice on the Gaussian-noise GPE counterpart
    # (ess() is GPE-only — ref ess(gp::GPE), src/mcmc.jl:131)
    mg = gp.GPE(x, y, kernel=gp.SE(0.0, 0.0), lognoise=-1.0)
    mg.set_priors(noise=[_N(-1.0, 1.0)], kern=[_N(0.0, 2.0)] * 2)
    loglik, xg0, _, _ = mg.make_logprob(include_priors=False)
    prior_mu = jnp.asarray([-1.0, 0.0, 0.0], x0.dtype)
    prior_sigma = jnp.asarray([1.0, 2.0, 2.0], x0.dtype)
    keys_e = jax.random.fold_in(key, 2)
    starts_e = xg0[None, :] + 0.05 * jax.random.normal(
        keys_e, (chains, xg0.shape[0]), dtype=xg0.dtype)
    re0 = sharded_ess(loglik, starts_e, prior_mu, prior_sigma, keys_e,
                      mesh, n_iter=2)
    _sync(re0.final_loglik)
    t1 = time.perf_counter()
    res_e = sharded_ess(loglik, starts_e, prior_mu, prior_sigma,
                        jax.random.fold_in(keys_e, 1), mesh,
                        n_iter=ess_iters)
    _sync(res_e.final_loglik)
    wall_e = time.perf_counter() - t1
    post_e = np.asarray(res_e.samples)[:, ess_iters // 3:, :]
    ess_e, _ = _diag_host(post_e)

    hmc_out = {
        "iters_post_warmup": n_iter,
        "warmup": warmup,
        "wall_s": round(wall, 3),
        "accept_rate": round(
            float(np.mean(np.asarray(res.accept_rate))), 3),
        "eps_adapted": round(float(res.eps_final), 5),
        "ess_min": round(float(ess.min()), 1),
        "ess_median": round(float(np.median(ess)), 1),
        "ess_per_sec_min": round(float(ess.min()) / wall, 1),
        "ess_per_sec_median": round(float(np.median(ess)) / wall, 1),
        "rhat_max": round(float(np.nanmax(rhat)), 4),
        "valid": bool(np.nanmax(rhat) < 1.01),
    }
    if not hmc_out["valid"]:
        hmc_out["mode_analysis"] = _mode_analysis(post, rhat)
    return {
        "n_obs": n,
        "dim_theta": int(D),
        "chains": chains,
        "hmc": hmc_out,
        "split": split_out,
        "ess_sampler": {
            "iters": ess_iters,
            "wall_s": round(wall_e, 3),
            "mean_proposals": round(float(res_e.mean_proposals), 3),
            "ess_median": round(float(np.median(ess_e)), 1),
            "ess_per_sec_median": round(float(np.median(ess_e)) / wall_e,
                                        1),
        },
    }


def bench_kernel_micro():
    """Per-kernel micro suite (ref perf/kernels.jl:6-43): gram build and
    mll+gradient amortized device times at (n=100, d=10) and
    (n=3000, d=10). Writes perf_kernels.json and prints the table."""
    import jax.numpy as jnp

    import gaussianprocesses_jl_tpu as gp

    rng = np.random.RandomState(42)
    d = 10
    table = {}
    for n in (100, 3000):
        X = jnp.asarray(rng.randn(n, d), dtype=jnp.float32)
        y = jnp.asarray(rng.randn(n), dtype=jnp.float32)
        for name, kern in kernels(gp, jnp).items():
            gram_ms = bench_gram_one(kern, X)
            mll_ms, _ = bench_one(name, kern, X, y)
            table.setdefault(name, {})[f"n={n}"] = {
                "gram_ms": round(gram_ms, 4),
                "mll_grad_ms": round(mll_ms, 4),
            }
            print(f"# n={n:5d} {name:22s} gram {gram_ms:8.3f} ms   "
                  f"mll+grad {mll_ms:8.3f} ms", file=sys.stderr)
    with open("perf_kernels.json", "w") as f:
        json.dump(table, f, indent=1)
    print("# wrote perf_kernels.json", file=sys.stderr)
    return table


def bench_kernel_table_16k(n=16384, d=10, reps=4, n_trials=3):
    """The BASELINE kernel table re-run at TPU-relevant scale (VERDICT r4
    item 7): the same 10 kernel compositions, mll+gradient, at n=16384 —
    where gram+Cholesky dominates the ~6 ms dispatch floor that pins the
    n=3000 table (all 10 rows sat within 6.25-6.65 ms there, so the
    composite-kernel spread the reference shows at 800->1977 ms was
    invisible) and the Pallas fused-gram path engages (ops/pallas_gram.py
    routes symmetric grams at n >= 8192). Returns {name: ms} with "oom"
    for any composition whose gradient working set exceeds HBM."""
    import jax.numpy as jnp

    import gaussianprocesses_jl_tpu as gp

    rng = np.random.RandomState(42)
    X = jnp.asarray(rng.randn(n, d), dtype=jnp.float32)
    y = jnp.asarray(rng.randn(n), dtype=jnp.float32)
    table = {}
    for name, kern in kernels(gp, jnp).items():
        try:
            ms, mll = bench_one(name, kern, X, y, n_trials=n_trials,
                                reps=reps)
        except Exception as e:  # a too-big composite must not kill the run
            print(f"# n={n} {name}: FAILED ({type(e).__name__})",
                  file=sys.stderr)
            table[name] = "oom"
            continue
        table[name] = round(ms, 2)
        print(f"# n={n:5d} {name:22s} mll+grad {ms:9.2f} ms  "
              f"(vs se x{ms / table.get('se', ms):.2f})  mll={mll:.1f}",
              file=sys.stderr)
    return table


def bench_fitc100k(N=100_000, m=512, d=4, steps=6):
    """Config #4: FITC mll value+gradient+Adam-update steps at N=100k on
    the chip (the observation-sharded path on a 1-device mesh — the same
    shard_map code that scales over ICI). Reports per-step wall time and
    the (decreasing) loss trace.

    The r02 version used a raw SGD step p - 1e-3 g; with a sum-over-N
    objective max|grad| ~ 1e5 at N=100k, so the first update moved
    log-hyperparameters by ~100 -> exp overflow -> -inf forever (the -inf
    target zeroes all gradients). Now: Adam on the log-params (bounded
    per-coordinate step) plus a reject-don't-commit guard — a step whose
    loss comes back non-finite rolls back to the last good params instead
    of freezing the run."""
    import jax
    import jax.numpy as jnp
    import optax

    import gaussianprocesses_jl_tpu as gp
    from gaussianprocesses_jl_tpu.parallel.fitc import (
        fitc_mll_sharded_fn,
        shard_data,
    )
    from gaussianprocesses_jl_tpu.parallel.mesh import make_mesh

    rng = np.random.RandomState(0)
    X = rng.randn(N, d).astype(np.float32)
    y = (np.sin(X[:, 0]) + 0.5 * np.cos(X[:, 1])
         + 0.1 * rng.randn(N)).astype(np.float32)
    Xu = X[rng.choice(N, m, replace=False)].copy()

    fitc = gp.FITC(X, Xu, y, kernel=gp.SE(0.0, 0.0), lognoise=-1.0)
    mesh = make_mesh({"data": 1})
    mll_fn = fitc_mll_sharded_fn(fitc.params.kernel, mesh)
    Xs, ys = shard_data(jnp.asarray(X), jnp.asarray(y), mesh)
    Xu_j = fitc.covstrat.inducing

    opt = optax.adam(0.05)

    @jax.jit
    def step(params, last_good, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: -mll_fn(p, Xs, ys, Xu_j))(params)
        gleaves = jax.tree_util.tree_leaves(grads)
        ok = jnp.isfinite(loss)
        for g in gleaves:
            ok = ok & jnp.all(jnp.isfinite(g))
        # reject-don't-commit: from a bad point, roll back instead of
        # stepping (a -inf target's where()-gradient is all zeros, which
        # would otherwise freeze the run at -inf permanently)
        base = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), params, last_good)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
        updates, opt_state = opt.update(grads, opt_state, base)
        new_params = optax.apply_updates(base, updates)
        return loss, new_params, base, opt_state

    params = fitc.params
    opt_state = opt.init(params)
    loss, params, last_good, opt_state = step(params, params, opt_state)
    losses = [_sync(loss)]  # compile + warmup (one committed step)
    # second warmup in loop form: the first loop call retraces (the
    # freshly-init'ed opt_state and aliased params/last_good differ in
    # weak types from the step outputs — measured 15.8 s retrace vs 77 ms
    # steady state)
    loss, params, last_good, opt_state = step(params, last_good, opt_state)
    losses.append(_sync(loss))
    t0 = time.perf_counter()
    for _ in range(steps):
        loss, params, last_good, opt_state = step(params, last_good,
                                                  opt_state)
        losses.append(float(loss))  # per-step readback: real step timing
    wall = (time.perf_counter() - t0) / steps
    assert all(np.isfinite(losses)), f"non-finite FITC loss: {losses}"
    assert losses[-1] < losses[0], f"FITC loss not decreasing: {losses}"
    return {
        "N": N,
        "m": m,
        "step_ms": round(wall * 1e3, 2),
        "losses": [round(x, 2) for x in losses],
    }


HEADLINE = "mll+grad wall time (se kernel, d=10, n=3000, min of 20)"
SUB_KEYS = ("cholesky_n10k", "fitc_100k", "gpa_classification_ess")

# The driver records the LAST JSON line this process prints, parsed from a
# ~2000-char tail of captured output. Printing the full detail dict made
# the line ~3.1 KB, so its head was cut off mid-JSON and the parse failed
# (VERDICT r4: three rounds without a driver-readable perf record). The
# emitted line therefore carries ONLY the headline + small scalar
# summaries; everything else stays in BENCH_DETAIL.json.
LINE_CAP_BYTES = 1500


def compact_line(result: dict) -> str:
    """Serialize the driver-facing summary of `result` to one JSON line,
    hard-capped below LINE_CAP_BYTES (the driver tail window is 2000 chars
    and may contain a preceding WARNING line)."""
    line = {"metric": result.get("metric"), "value": result.get("value"),
            "unit": result.get("unit", "ms")}
    if result.get("vs_baseline") is not None:
        line["vs_baseline"] = result["vs_baseline"]
    if result.get("headline_cached"):
        line["headline_cached"] = True

    def pick(src, keys):
        out = {k: src[k] for k in keys if k in src}
        if src.get("cached"):
            out["cached"] = True
        return out

    c = result.get("cholesky_n10k")
    if isinstance(c, dict):
        line["cholesky_n10k"] = pick(c, ("ms", "tflops", "frac_gemm_peak"))
    f = result.get("fitc_100k")
    if isinstance(f, dict):
        line["fitc_100k"] = pick(f, ("N", "step_ms"))
    g = result.get("gpa_classification_ess")
    if isinstance(g, dict):
        line["gpa_classification_ess"] = pick(
            g, ("sampler", "chains", "ess_per_sec_median",
                "ess_per_sec_min", "rhat_max"))
    s = result.get("student_t_1024")
    if isinstance(s, dict):
        sub = pick(s, ("chains",))
        for blk in ("hmc", "split", "ess_sampler"):
            if isinstance(s.get(blk), dict):
                sub[blk] = pick(s[blk],
                                ("ess_per_sec_median", "rhat_max"))
        line["student_t_1024"] = sub
    js = json.dumps(line, separators=(",", ":"))
    assert len(js.encode()) < LINE_CAP_BYTES, (
        f"bench line {len(js.encode())} bytes >= {LINE_CAP_BYTES} cap — "
        "the driver tail window would truncate it; trim compact_line()")
    return js
# fallback fresh-cost guesses (s), used only until a measured wall cost
# for the sub-bench exists in BENCH_DETAIL.json["_costs"]
GUESS_COST_S = {"cholesky_n10k": 150, "fitc_100k": 120,
                "gpa_classification_ess": 180}


def _now_iso():
    import datetime

    return datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ")


def main():
    full = "--full" in sys.argv
    micro = "--kernels" in sys.argv
    fitc_only = "--fitc100k" in sys.argv
    scaling = "--chains-scaling" in sys.argv
    t_start = time.perf_counter()

    # ------------------------------------------------------------------
    # The driver's ONLY record of this round is the last JSON line this
    # process manages to print before its timeout (r3 failed: rc=124,
    # parsed=null — nothing had been printed when the clock ran out). So:
    #   1. the best-known line (cached BENCH_DETAIL.json) is printed
    #      IMMEDIATELY, before jax is even imported;
    #   2. an updated line is re-printed after the headline and after
    #      every completed sub-bench (the last line wins);
    #   3. SIGTERM/atexit flush the current line one final time.
    # ------------------------------------------------------------------
    prev = {}
    try:
        with open("BENCH_DETAIL.json") as f:
            prev = json.load(f)
    except (OSError, ValueError):
        pass

    result = {"metric": HEADLINE, "value": None, "unit": "ms"}
    if prev:
        result.update({k: v for k, v in prev.items() if k != "_costs"})
        result["metric"] = HEADLINE
        if "value" in prev:
            result["headline_cached"] = True
        for key in SUB_KEYS + ("student_t_1024",):
            v = result.get(key)
            if isinstance(v, dict) and not v.get("cached"):
                v = dict(v)
                v["cached"] = True
                v["measured_at"] = v.get("measured_at") or prev.get(
                    "date", "earlier run")
                result[key] = v

    emitted = {"n": 0}

    def emit():
        print(compact_line(result), flush=True)
        emitted["n"] += 1

    if result.get("value") is not None:
        emit()  # best-known line lands before any jax/tunnel work

    import atexit
    import signal

    final = {"done": False}

    def flush_line(*_args):
        if not final["done"]:
            final["done"] = True
            emit()
        if _args:  # invoked as a signal handler (timeout sends SIGTERM)
            os._exit(0)

    signal.signal(signal.SIGTERM, flush_line)
    atexit.register(flush_line)

    import jax.numpy as jnp

    import gaussianprocesses_jl_tpu as gp

    if micro:
        bench_kernel_micro()
        final["done"] = True
        return
    if scaling:
        bench_gpa_chains_scaling()
        final["done"] = True
        return
    if "--student-t" in sys.argv:
        out = bench_student_t_1024()
        # merge into the committed artifact (a committed measurement, too
        # long for the driver's default window)
        out["measured_at"] = _now_iso()
        result["student_t_1024"] = out
        final["done"] = True
        detail = dict(prev)
        detail["student_t_1024"] = out
        detail["date"] = _now_iso()
        with open("BENCH_DETAIL.json", "w") as fh:
            json.dump(detail, fh, indent=1)
        best = out.get("split", out.get("hmc", {}))
        print(compact_line({
            "metric": "student-t robust regression, 1024 chains, "
                      "collective adaptation",
            "value": best.get("ess_per_sec_median"),
            "unit": "eff samples/s/chip (median)",
            "student_t_1024": out}))
        return
    if "--gpa-validated" in sys.argv:
        # long-chain full-validity run of the headline sampler metric:
        # enough draws that the rank-normalized folded R-hat gate
        # (< 1.01) can actually be met, with the between-chain-aware ESS
        out = bench_gpa_ess(chains=64, n_iter=4800, warmup=800)
        out["measured_at"] = _now_iso()
        final["done"] = True
        detail = dict(prev)
        detail["gpa_classification_ess_validated"] = out
        detail["date"] = _now_iso()
        with open("BENCH_DETAIL.json", "w") as fh:
            json.dump(detail, fh, indent=1)
        print(compact_line({
            "metric": "GPA classification eff samples/s/chip "
                      "(64-chain validity run)",
            "value": out["ess_per_sec_median"],
            "unit": "eff samples/s/chip (median)",
            "gpa_classification_ess": out}))
        return
    if "--kernels16k" in sys.argv:
        table = bench_kernel_table_16k()
        final["done"] = True
        detail = dict(prev)
        detail["kernel_table_n16384_ms"] = table
        detail["kernel_table_n16384_measured_at"] = _now_iso()
        detail["date"] = _now_iso()
        with open("BENCH_DETAIL.json", "w") as fh:
            json.dump(detail, fh, indent=1)
        se_ms = table.get("se")
        print(compact_line({
            "metric": "mll+grad wall time (se kernel, d=10, n=16384)",
            "value": se_ms if isinstance(se_ms, float) else None,
            "unit": "ms"}))
        return
    if fitc_only:
        out = bench_fitc100k()
        final["done"] = True
        print(compact_line({
            "metric": "sharded-FITC mll+grad step at N=100k (m=512, d=4)",
            "value": out["step_ms"], "unit": "ms", "fitc_100k": out}))
        return

    # The default run is TIME-BUDGETED (compile through the remote-TPU
    # tunnel costs ~60-70 s per distinct executable). The headline row
    # always runs; the three BASELINE metrics run cheapest-measured-first
    # while the budget lasts; skipped ones keep their cached values. The
    # budget counts from PROCESS START so import/tunnel time is included.
    # Run with BENCH_BUDGET_S=10000 (or --full) to refresh everything.
    budget_s = float(os.environ.get("BENCH_BUDGET_S",
                                    "100000" if full else "330"))
    costs = dict(prev.get("_costs", {}))

    def left():
        return budget_s - (time.perf_counter() - t_start)

    def est(key):
        # 1.25x headroom over the last measured wall cost of this
        # sub-bench (VERDICT r3: the guessed costs were never reconciled)
        if key in costs:
            return 1.25 * costs[key]
        return GUESS_COST_S[key]

    def save_detail():
        out = dict(result)
        out.pop("headline_cached", None)
        out["_costs"] = costs
        out["date"] = _now_iso()
        with open("BENCH_DETAIL.json", "w") as f:
            json.dump(out, f, indent=1)

    rng = np.random.RandomState(42)
    n, d = 3000, 10
    X = jnp.asarray(rng.randn(n, d), dtype=jnp.float32)
    y = jnp.asarray(rng.randn(n), dtype=jnp.float32)

    ks = kernels(gp, jnp)
    rows = {}
    names = list(ks) if full else ["se"]
    t_head = time.perf_counter()
    for name in names:
        ms, mll = bench_one(name, ks[name], X, y)
        rows[name] = ms
        print(f"# {name:22s} {ms:9.2f} ms   (ref {REF_MS[name]:7.1f} ms, "
              f"speedup {REF_MS[name] / ms:6.1f}x)  mll={mll:.2f}",
              file=sys.stderr)
    costs["headline"] = round(time.perf_counter() - t_head, 1)

    result["value"] = round(rows["se"], 3)
    result["vs_baseline"] = round(REF_MS["se"] / rows["se"], 2)
    result.pop("headline_cached", None)
    # chain-count scaling table (measured by --chains-scaling; committed
    # artifact — too expensive to refresh inside the driver budget)
    try:
        with open("gpa_chains_scaling.json") as f:
            cs = json.load(f)
        result["chains_scaling"] = {
            k: {"ess_per_sec_median": v["ess_per_sec_median"],
                "ess_per_sec_min": v["ess_per_sec_min"],
                "wall_s": v["wall_s"]} for k, v in cs.items()}
    except (OSError, ValueError):
        pass
    if full:
        result["kernel_table_ms"] = {k: round(v, 3)
                                     for k, v in rows.items()}
        result["kernel_table_speedup"] = {
            k: round(REF_MS[k] / v, 1) for k, v in rows.items()}
    save_detail()
    emit()  # fresh headline lands even if every sub-bench is cut off

    next_seq = 1 + max(
        [v.get("seq", 0) for v in prev.values()
         if isinstance(v, dict) and not v.get("cached")], default=0)

    def run_budgeted(key, fn, report):
        nonlocal next_seq
        if left() < est(key):
            print(f"# {key}: skipped (budget: {left():.0f}s left < "
                  f"{est(key):.0f}s est), keeping cached values",
                  file=sys.stderr)
            return False
        t0 = time.perf_counter()
        try:
            out = fn()
        except Exception as e:  # a failed sub-bench must not kill the line
            print(f"# {key}: FAILED ({e!r}), keeping cached values",
                  file=sys.stderr)
            return False
        costs[key] = round(time.perf_counter() - t0, 1)
        out["seq"] = next_seq
        out["measured_at"] = _now_iso()
        next_seq += 1
        report(out)
        result[key] = out
        save_detail()  # the committed artifact comes from the measuring run
        emit()
        return True

    runners = {
        "cholesky_n10k": (bench_cholesky, lambda c: print(
            f"# cholesky n={c['n']}: {c['ms']} ms = {c['tflops']} "
            f"TFLOP/s ({100 * c['frac_gemm_peak']:.1f}% of measured "
            f"{c['gemm_peak_tflops']} TFLOP/s GEMM peak; xla "
            f"{c['xla_ms']} ms)", file=sys.stderr)),
        "fitc_100k": (bench_fitc100k, lambda f_: print(
            f"# fitc N=100k: {f_['step_ms']} ms per mll+grad+Adam step, "
            f"losses {f_['losses'][0]} -> {f_['losses'][-1]}",
            file=sys.stderr)),
        "gpa_classification_ess": (bench_gpa_ess, lambda g: print(
            f"# gpa classification ({g['chains']} chains): "
            f"{g['ess_per_sec_min']} (min) / "
            f"{g['ess_per_sec_median']} (median) eff samples/sec/chip, "
            f"accept={g['accept_rate']}", file=sys.stderr)),
    }
    # cheapest-estimated-first maximizes the number of fresh metrics the
    # driver's window captures; incremental emission makes overruns safe
    for key in sorted(SUB_KEYS, key=est):
        run_budgeted(key, *runners[key])

    final["done"] = True
    emit()


if __name__ == "__main__":
    main()
