"""Pallas TPU kernel study (SURVEY §7 M4): measured evidence for why the
library's hot ops are XLA-composed rather than hand-written Pallas.

Runnable end-to-end on a TPU host:  python perf/pallas_cholesky_study.py
Results from TPU v5e are recorded in perf/README.md.

Three experiments:

1. `gram` — a tiled Pallas squared-distance+profile kernel (one pass over
   the n^2 output) vs the library's XLA gram build (ops/distance.py).
   Outcome: XLA already fuses distance expansion + profile into one
   HBM-bound pass, so the two are at parity below n~8k (dispatch floor),
   but the Pallas tile wins 1.16x at n=8192 and 1.27x at n=16384 — which
   is why the shipped `ops/pallas_gram.py` routes large symmetric f32
   grams through the (generalized, custom-vjp'd) version of this kernel.

2. `panel` — a fused Cholesky + triangular-inverse Pallas kernel for one
   (B, B) panel, fully VMEM-resident (masked rank-1 micro-panel loop on
   the VPU; trailing updates and inverse assembly on the MXU). Outcome:
   correct to f32 rounding, but each pallas_call costs ~0.6 ms of launch
   overhead on this chip and Mosaic loop iterations cost ~1 us each, so
   the kernel lands at 2.0-2.3 ms/panel vs 1.4 ms for XLA's cholesky —
   the sequential column chain is a latency wall, not a bandwidth or
   FLOP problem a kernel can fix.

3. `full` — the complete n=10240 factorization four ways: XLA's
   `jnp.linalg.cholesky`, the library's left-looking blocked Cholesky
   with XLA panels (`ops/linalg.py blocked_cholesky` — the shipped
   winner), the same driver with the Pallas panel kernel, and the raw
   launch-overhead probe that explains the ranking.

Timing protocol: `reps` evaluations scanned inside one executable with
per-rep input perturbation (dispatch latency through the remote-TPU
tunnel is ~27 ms and the tunnel caches identical (executable, args)
executions, so every trial also varies its input).
"""
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from gaussianprocesses_jl_tpu.ops.linalg import (  # noqa: E402
    blocked_cholesky,
    tri_inv_lower,
)

INTERP = jax.default_backend() != "tpu"
HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# timing
# ---------------------------------------------------------------------------


def timed(build, X, reps=8, trials=3, label=""):
    """Best-of-trials amortized device time of build(X') with X' perturbed
    per rep AND per trial (see module docstring)."""

    @jax.jit
    def many(X, t):
        def body(c, i):
            out = build(X + (1e-5 * i + t) * jnp.ones_like(X))
            leaves = jax.tree_util.tree_leaves(out)
            for leaf in leaves:
                c = c + jnp.sum(jnp.asarray(leaf)[..., :1]).astype(c.dtype)
            return c, None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jnp.arange(reps, dtype=jnp.float32))
        return acc

    t0 = time.perf_counter()
    float(many(X, jnp.float32(0.0)))
    compile_s = time.perf_counter() - t0
    best = np.inf
    for t in range(trials):
        t0 = time.perf_counter()
        float(many(X, jnp.float32(1e-4 * (t + 1))))
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{label:34s} {best * 1e3:9.3f} ms   (compile {compile_s:.1f}s)",
          flush=True)
    return best


# ---------------------------------------------------------------------------
# 1. tiled gram kernel (the SE-only study version; the shipped
#    ops/pallas_gram.py generalizes it over kernel classes + custom_vjp)
# ---------------------------------------------------------------------------

TILE = 256


def _gram_kernel(x1_ref, x2_ref, s1_ref, s2_ref, p_ref, out_ref):
    cross = jnp.dot(x1_ref[:], x2_ref[:].T, preferred_element_type=jnp.float32)
    r2 = jnp.maximum(s1_ref[:].T + s2_ref[:] - 2.0 * cross, 0.0)
    p = p_ref[0]
    out_ref[:] = jnp.exp(p[0] - 0.5 * r2 * p[1])  # SE profile


@jax.jit
def pallas_se_gram(X, params):
    n, d = X.shape
    d_pad = -(-d // 128) * 128
    if d_pad != d:
        X = jnp.pad(X, ((0, 0), (0, d_pad - d)))
    s = jnp.sum(X * X, axis=1)[None, :]
    p = jnp.asarray(params, jnp.float32)[None, :]
    grid = (pl.cdiv(n, TILE), pl.cdiv(n, TILE))
    return pl.pallas_call(
        _gram_kernel,
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE, d_pad), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, d_pad), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=INTERP,
    )(X, X, s, s, p)


def study_gram():
    import gaussianprocesses_jl_tpu as gp

    ll, lsig = 0.3, 0.2
    se = gp.SE(ll, lsig)
    params = jnp.asarray([2 * lsig, np.exp(-2 * ll)], jnp.float32)
    for n in (1024, 3072, 8192, 16384):
        X = jnp.asarray(np.random.RandomState(0).randn(n, 10), jnp.float32)
        a = jax.jit(lambda X: se.gram(X))(X)
        b = pallas_se_gram(X, params)
        err = float(jnp.max(jnp.abs(a - b)))
        timed(lambda X: se.gram(X), X, reps=20,
              label=f"gram  xla    n={n}")
        timed(lambda X: pallas_se_gram(X, params), X, reps=20,
              label=f"gram  pallas n={n} (maxerr {err:.1e})")


# ---------------------------------------------------------------------------
# 2. fused Cholesky + triangular-inverse panel kernel
# ---------------------------------------------------------------------------


def _panel_kernel(T, a_ref, l_ref, linv_ref):
    B = a_ref.shape[0]
    nt = B // T
    f32 = jnp.float32
    colT = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    colT2 = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    rowT2 = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    eyeT = jnp.where(rowT2 == colT2, 1.0, 0.0).astype(f32)

    l_ref[:] = jnp.zeros((B, B), f32)
    linv_ref[:] = jnp.zeros((B, B), f32)

    for kt in range(nt):
        j0 = kt * T
        m = B - j0
        rowM = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        P0 = a_ref[j0:, j0:j0 + T]
        if kt > 0:
            Lprev = l_ref[j0:, :j0]
            Lrow = l_ref[j0:j0 + T, :j0]
            P0 = P0 - jnp.dot(Lprev, Lrow.T, preferred_element_type=f32)

        def col_step(j, P):
            cmask = colT == j
            col = jnp.sum(jnp.where(cmask, P, 0.0), axis=1, keepdims=True)
            d2 = jnp.sum(jnp.where(rowM == j, col, 0.0))
            col = jnp.where(rowM >= j, col * jax.lax.rsqrt(d2), 0.0)
            v = jnp.where(colT > j, col[0:T, 0][None, :], 0.0)
            P = P - col * v
            return jnp.where(cmask, col, P)

        P = jax.lax.fori_loop(0, T, col_step, P0)
        l_ref[j0:, j0:j0 + T] = P

        Ld = P[:T, :]

        def fs_step(i, X):
            rmask = rowT2 == i
            ldrow = jnp.sum(jnp.where(rmask, Ld, 0.0), axis=0, keepdims=True)
            ldii = jnp.sum(jnp.where(colT == i, ldrow, 0.0))
            ldrow = jnp.where(colT < i, ldrow, 0.0)
            contrib = jnp.sum(ldrow.T * X, axis=0, keepdims=True)
            ei = jnp.where(colT == i, 1.0, 0.0)
            return jnp.where(rmask, (ei - contrib) / ldii, X)

        X = jax.lax.fori_loop(0, T, fs_step, eyeT)
        linv_ref[j0:j0 + T, j0:j0 + T] = X

    for i in range(1, nt):
        for j in range(i):
            Lij = l_ref[i * T:(i + 1) * T, j * T:i * T]
            Vj = linv_ref[j * T:i * T, j * T:(j + 1) * T]
            S = jnp.dot(Lij, Vj, preferred_element_type=f32)
            Di = linv_ref[i * T:(i + 1) * T, i * T:(i + 1) * T]
            linv_ref[i * T:(i + 1) * T, j * T:(j + 1) * T] = -jnp.dot(
                Di, S, preferred_element_type=f32)


@functools.partial(jax.jit, static_argnames=("T",))
def chol_inv_panel(A, T=128):
    """Fused (L, L^-1) of one PSD panel in one Pallas launch."""
    B = A.shape[0]
    return pl.pallas_call(
        functools.partial(_panel_kernel, T),
        out_shape=(jax.ShapeDtypeStruct((B, B), jnp.float32),
                   jax.ShapeDtypeStruct((B, B), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=INTERP,
    )(A.astype(jnp.float32))


def study_panel():
    for B in (512, 1024):
        rng = np.random.RandomState(0)
        W = rng.randn(B, 64).astype(np.float32)
        A = jnp.asarray(W @ W.T + B * np.eye(B, dtype=np.float32))
        L, Linv = chol_inv_panel(A)
        L0 = np.linalg.cholesky(np.asarray(A, np.float64))
        el = np.abs(np.asarray(L) - L0).max() / np.abs(L0).max()
        ei = np.abs(np.asarray(Linv) @ L0 - np.eye(B)).max()
        timed(lambda A: chol_inv_panel(A), A, reps=20,
              label=f"panel pallas B={B} (Lerr {el:.0e} res {ei:.0e})")
        timed(jnp.linalg.cholesky, A, reps=20, label=f"panel xla    B={B}")
        timed(lambda A: tri_inv_lower(jnp.linalg.cholesky(A)), A, reps=20,
              label=f"panel xla chol+tri_inv B={B}")


def study_launch_overhead():
    """A Pallas kernel whose fori_loop does trivial scalar work: the
    measured time is pure launch + loop overhead."""

    def kern(n_iter, a_ref, o_ref):
        acc = jax.lax.fori_loop(0, n_iter, lambda j, x: x + 1.0,
                                jnp.float32(0.0))
        o_ref[:] = a_ref[0:8, 0:128] + acc

    for n_iter in (512, 4096):
        A = jnp.ones((512, 512), jnp.float32)
        f = pl.pallas_call(
            functools.partial(kern, n_iter),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=INTERP,
        )
        timed(f, A, reps=50, label=f"empty pallas_call ({n_iter} iters)")


# ---------------------------------------------------------------------------
# 2b. single-launch whole-factorization kernel (VERDICT r4 item 4)
#
# The r4 wall analysis: the shipped hybrid's 21.4 ms at n=10240 is ~18.5 ms
# of 40 sequential XLA panel ops, each paying a ~0.5 ms dispatch/latency
# floor, + ~3 ms of MXU trailing updates. One pallas_call costs 0.6 ms and
# in-kernel Mosaic loop iterations ~1 us, so a single launch holding the
# WHOLE left-looking factorization (HBM-resident K, VMEM-tiled panels,
# corrections + below-diagonal applies on the MXU, micro-panel rank-1
# chain on the VPU) pays the launch once and replaces 40 dispatch floors
# with n in-kernel column steps. Expected from the measured numbers:
# serial chain n x ~0.5-1.4 us = 5-14 ms + ~11 ms MXU work, i.e. anywhere
# from a 1.4x win to parity — this experiment settles it.
# ---------------------------------------------------------------------------


def _chol_inv_block_ref(P, ld_ref, linv_ref, T=128):
    """Fused Cholesky + inverse of one (B, B) PSD block written into VMEM
    scratch refs (the _panel_kernel algorithm; Mosaic has no
    dynamic_update_slice on values, so block assembly goes through refs
    with static slices)."""
    B = P.shape[0]
    nt = B // T
    f32 = jnp.float32
    colT = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    colT2 = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    rowT2 = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    eyeT = jnp.where(rowT2 == colT2, 1.0, 0.0).astype(f32)

    ld_ref[:] = jnp.zeros((B, B), f32)
    linv_ref[:] = jnp.zeros((B, B), f32)

    for kt in range(nt):
        j0 = kt * T
        m = B - j0
        rowM = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        P0 = P[j0:, j0:j0 + T]
        if kt > 0:
            P0 = P0 - jnp.dot(ld_ref[j0:, :j0], ld_ref[j0:j0 + T, :j0].T,
                              preferred_element_type=f32)

        def col_step(j, Pv):
            cmask = colT == j
            col = jnp.sum(jnp.where(cmask, Pv, 0.0), axis=1, keepdims=True)
            d2 = jnp.sum(jnp.where(rowM == j, col, 0.0))
            col = jnp.where(rowM >= j, col * jax.lax.rsqrt(d2), 0.0)
            v = jnp.where(colT > j, col[0:T, 0][None, :], 0.0)
            Pv = Pv - col * v
            return jnp.where(cmask, col, Pv)

        Pf = jax.lax.fori_loop(0, T, col_step, P0)
        ld_ref[j0:, j0:j0 + T] = Pf

        Ld = Pf[:T, :]

        def fs_step(i, X):
            rmask = rowT2 == i
            ldrow = jnp.sum(jnp.where(rmask, Ld, 0.0), axis=0,
                            keepdims=True)
            ldii = jnp.sum(jnp.where(colT == i, ldrow, 0.0))
            ldrow = jnp.where(colT < i, ldrow, 0.0)
            contrib = jnp.sum(ldrow.T * X, axis=0, keepdims=True)
            ei = jnp.where(colT == i, 1.0, 0.0)
            return jnp.where(rmask, (ei - contrib) / ldii, X)

        X = jax.lax.fori_loop(0, T, fs_step, eyeT)
        linv_ref[j0:j0 + T, j0:j0 + T] = X

    for i in range(1, nt):
        for j in range(i):
            Lij = ld_ref[i * T:(i + 1) * T, j * T:i * T]
            Vj = linv_ref[j * T:i * T, j * T:(j + 1) * T]
            S = jnp.dot(Lij, Vj, preferred_element_type=jnp.float32)
            Di = linv_ref[i * T:(i + 1) * T, i * T:(i + 1) * T]
            linv_ref[i * T:(i + 1) * T, j * T:(j + 1) * T] = -jnp.dot(
                Di, S, preferred_element_type=jnp.float32)


def _single_launch_kernel(n, B, R, in_ref, out_ref, acc, tbuf, lkj,
                          ld_s, linv_s, sems):
    """One grid step = one panel of the left-looking factorization.

    out_ref aliases the input in HBM; acc holds the current (n, B) panel
    column in VMEM; corrections stream (R, B) tiles of already-computed
    L columns through tbuf/lkj."""
    del in_ref  # aliased with out_ref
    k = pl.program_id(0)
    c = k * B
    nt_rows = n // R
    f32 = jnp.float32

    # 1. panel column k: HBM -> VMEM
    cp = pltpu.make_async_copy(
        out_ref.at[:, pl.ds(c, B)], acc, sems.at[0])
    cp.start()
    cp.wait()

    i0 = jax.lax.div(c, R)  # first row tile touching the panel

    # 2. left-looking correction: acc[r,:] -= L[r, jB:(j+1)B] @ Lkj^T
    def j_body(j, carry):
        cpk = pltpu.make_async_copy(
            out_ref.at[pl.ds(c, B), pl.ds(j * B, B)], lkj, sems.at[1])
        cpk.start()
        cpk.wait()

        def i_body(i, carry2):
            r0 = i * R
            cpt = pltpu.make_async_copy(
                out_ref.at[pl.ds(r0, R), pl.ds(j * B, B)], tbuf,
                sems.at[2])
            cpt.start()
            cpt.wait()
            upd = jnp.dot(tbuf[:], lkj[:].T, preferred_element_type=f32)
            acc[pl.ds(r0, R), :] = acc[pl.ds(r0, R), :] - upd
            return carry2

        return jax.lax.fori_loop(i0, nt_rows, i_body, carry)

    jax.lax.fori_loop(0, k, j_body, 0)

    # 3. diagonal block: fused chol + inverse, fully in VMEM
    D = acc[pl.ds(c, B), :]
    _chol_inv_block_ref(D, ld_s, linv_s)
    Ld, Linv = ld_s[:], linv_s[:]

    # 4. below-diagonal apply + masking, tile by tile
    rowR = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)

    # tiles fully above the panel still hold the DMA'd A column: zero
    # them (they are this column's strictly-upper triangle)
    def zero_body(i, carry):
        acc[pl.ds(i * R, R), :] = jnp.zeros((R, B), f32)
        return carry

    jax.lax.fori_loop(0, i0, zero_body, 0)

    def apply_body(i, carry):
        r0 = i * R
        t = jnp.dot(acc[pl.ds(r0, R), :], Linv.T,
                    preferred_element_type=f32)
        absrow = rowR + r0
        # rows < c+B belong to the diagonal block (stored below) or the
        # strictly-upper part (zeroed)
        t = jnp.where(absrow >= c + B, t, 0.0)
        acc[pl.ds(r0, R), :] = t
        return carry

    jax.lax.fori_loop(i0, nt_rows, apply_body, 0)
    acc[pl.ds(c, B), :] = Ld

    # 5. panel column back to HBM
    cp2 = pltpu.make_async_copy(acc, out_ref.at[:, pl.ds(c, B)],
                                sems.at[0])
    cp2.start()
    cp2.wait()


@functools.partial(jax.jit, static_argnames=("B", "R"))
def single_launch_cholesky(K, B=256, R=1024):
    """Whole left-looking Cholesky factorization in ONE pallas_call:
    sequential grid over panels, K HBM-resident and factorized in place
    (input/output aliased), VMEM-tiled corrections and applies on the
    MXU, micro-panel rank-1 chain on the VPU."""
    n = K.shape[0]
    assert n % B == 0 and n % R == 0 and R % B == 0
    nb = n // B
    return pl.pallas_call(
        functools.partial(_single_launch_kernel, n, B, R),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((n, B), jnp.float32),   # acc: the panel column
            pltpu.VMEM((R, B), jnp.float32),   # tbuf: streamed L tiles
            pltpu.VMEM((B, B), jnp.float32),   # lkj: panel-row block
            pltpu.VMEM((B, B), jnp.float32),   # ld_s: diag-block L
            pltpu.VMEM((B, B), jnp.float32),   # linv_s: its inverse
            pltpu.SemaphoreType.DMA((3,)),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=INTERP,
    )(K.astype(jnp.float32))


def study_single_launch(n=10240):
    """Correctness at small n, then the n=10240 shootout vs the shipped
    hybrid."""
    rng = np.random.RandomState(0)
    # correctness first (small n)
    ns = 2048
    W = rng.randn(ns, 64).astype(np.float32)
    A = jnp.asarray(W @ W.T + ns * np.eye(ns, dtype=np.float32))
    L = single_launch_cholesky(A, B=256, R=512)
    L0 = np.linalg.cholesky(np.asarray(A, np.float64))
    err = np.abs(np.asarray(L) - L0).max() / np.abs(L0).max()
    print(f"single-launch correctness n={ns}: rel err {err:.2e}",
          flush=True)
    assert err < 1e-4, err

    key = jax.random.PRNGKey(0)
    W = jax.random.normal(key, (n, 256), dtype=jnp.float32)
    K = W @ W.T + n * jnp.eye(n, dtype=jnp.float32)
    flops = n**3 / 3.0
    t = timed(lambda K: single_launch_cholesky(K), K, reps=6,
              label=f"full single-launch pallas n={n}")
    print(f"    -> {flops / t / 1e12:.2f} TFLOP/s", flush=True)
    t = timed(lambda K: blocked_cholesky(K, block=1024)[0], K, reps=6,
              label="full blocked (shipped)")
    print(f"    -> {flops / t / 1e12:.2f} TFLOP/s", flush=True)


# ---------------------------------------------------------------------------
# 3. full factorization shootout at n=10240
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("block", "precision", "T"))
def cholesky_blocked_pallas(K, block=1024,
                            precision=jax.lax.Precision.HIGH, T=128):
    """The library's left-looking driver with the Pallas panel kernel in
    place of XLA chol+tri_inv (for comparison only)."""
    n = K.shape[-1]
    B = block
    nb = -(-n // B)
    assert n % B == 0
    A = K
    cols = []
    for k in range(nb):
        Acol = A[k * B:, k * B:(k + 1) * B]
        if k > 0:
            P = jnp.concatenate(
                [cols[j][(k - j) * B:, :] for j in range(k)], axis=1)
            Acol = Acol - jnp.matmul(P, P[:B, :].T, precision=precision)
        lkk, linv = chol_inv_panel(Acol[:B, :B], T=T)
        if k + 1 < nb:
            Lpan = jnp.matmul(Acol[B:, :], linv.T, precision=HI)
            cols.append(jnp.concatenate([lkk, Lpan], axis=0))
        else:
            cols.append(lkk)
    rows = []
    for i in range(nb):
        parts = [cols[j][(i - j) * B:(i - j + 1) * B, :]
                 for j in range(i + 1)]
        if i + 1 < nb:
            parts.append(jnp.zeros((B, (nb - 1 - i) * B), K.dtype))
        rows.append(jnp.concatenate(parts, axis=1))
    return jnp.concatenate(rows, axis=0)


def study_full(n=10240):
    key = jax.random.PRNGKey(0)
    W = jax.random.normal(key, (n, 256), dtype=jnp.float32)
    K = W @ W.T + n * jnp.eye(n, dtype=jnp.float32)
    flops = n**3 / 3.0

    t = timed(jnp.linalg.cholesky, K, reps=6, label="full xla cholesky")
    print(f"    -> {flops / t / 1e12:.2f} TFLOP/s", flush=True)
    t = timed(lambda K: blocked_cholesky(K, block=1024)[0], K, reps=6,
              label="full blocked (shipped, HIGH)")
    print(f"    -> {flops / t / 1e12:.2f} TFLOP/s", flush=True)
    t = timed(lambda K: blocked_cholesky(K, block=1024, precision=HI)[0],
              K, reps=6, label="full blocked (HIGHEST)")
    print(f"    -> {flops / t / 1e12:.2f} TFLOP/s", flush=True)
    t = timed(lambda K: cholesky_blocked_pallas(K), K, reps=6,
              label="full blocked w/ pallas panels")
    print(f"    -> {flops / t / 1e12:.2f} TFLOP/s", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "launch"):
        study_launch_overhead()
    if which in ("all", "gram"):
        study_gram()
    if which in ("all", "panel"):
        study_panel()
    if which in ("all", "single"):
        study_single_launch()
    if which in ("all", "full"):
        study_full()
