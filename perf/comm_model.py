"""Communication-cost model for the multi-host scaling claim (VERDICT r4
item 6 / BASELINE north star ">=80% samples/s scaling efficiency at >=2
hosts").

This environment has ONE physical chip, so scaling efficiency cannot be
measured directly. The honest substitute: (1) MEASURE the per-iteration
collective payloads of every sharded path by compiling it on the
8-device virtual mesh and reading the all-reduce / all-gather /
collective-permute shapes out of the optimized HLO (not asserted from
the source), then (2) combine them with nominal interconnect figures and
the MEASURED single-chip per-iteration compute times (BENCH_DETAIL.json)
into a predicted efficiency curve.

Run:  JAX_PLATFORMS=cpu python perf/comm_model.py
Writes perf/comm_model.json and prints the table that perf/README.md §6
publishes.
"""
import json
import os
import re
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np

import gaussianprocesses_jl_tpu as gp
from gaussianprocesses_jl_tpu.parallel.mesh import make_mesh

# ---------------------------------------------------------------------
# Interconnect assumptions (stated, not measured — no multi-chip here).
# ICI: TPU v5e 2-D torus, ~200 GB/s aggregate per chip, ~1 us collective
# hop latency. DCN: ~25 GB/s per host, ~10 us latency. Sources: public
# TPU v5e system specs; the latency figures are conservative round
# numbers (real ICI collectives of these payloads are latency-bound).
# ---------------------------------------------------------------------
ICI_BW = 200e9  # B/s
ICI_LAT = 2e-6  # s per collective
DCN_BW = 25e9
DCN_LAT = 20e-6

DTYPE_BYTES = {"f32": 4, "f64": 8, "s32": 4, "u32": 4, "pred": 1,
               "bf16": 2, "f16": 2, "s64": 8, "u64": 8, "c64": 8}

COLLECTIVE_RE = re.compile(
    r"(\w[\w.\-]*)\s*=\s*(\([^)]*\)|[a-z0-9\[\],{} ]+)\s*"
    r"(all-reduce|all-gather|collective-permute|all-to-all|"
    r"reduce-scatter)\(", re.I)
SHAPE_RE = re.compile(r"(f32|f64|bf16|f16|s32|u32|s64|u64|pred|c64)"
                      r"\[([0-9,]*)\]")


def collective_bytes(hlo_text, only_loop_body: bool = False):
    """Sum output bytes of every collective op in an HLO module text,
    grouped by op kind.

    A collective inside a while-loop body appears ONCE in the text but
    executes once per loop iteration; only_loop_body=True restricts the
    count to computations whose name marks them as a while body/region,
    giving the true PER-ITERATION payload of a scanned sampler."""
    out = {}
    # split into named computation blocks: "%name ... {" ... "}" at col 0
    blocks = re.split(r"\n(?=[%\w])", hlo_text)
    for blk in blocks:
        header = blk.split("\n", 1)[0].lower()
        in_body = ("body" in header or "region" in header
                   or "while" in header)
        if only_loop_body and not in_body:
            continue
        for m in COLLECTIVE_RE.finditer(blk):
            shapes_blob, kind = m.group(2), m.group(3).lower()
            total = 0
            for sm in SHAPE_RE.finditer(shapes_blob):
                dt, dims = sm.group(1), sm.group(2)
                n = 1
                for d in dims.split(","):
                    if d:
                        n *= int(d)
                total += n * DTYPE_BYTES[dt]
            rec = out.setdefault(kind, {"count": 0, "bytes": 0})
            rec["count"] += 1
            rec["bytes"] += total
    return out


def _compiled_text(fn, *args):
    return jax.jit(fn).lower(*args).compile().as_text()


def measure_paths():
    """Compile each sharded path on the 8-device mesh and extract its
    per-call collective footprint from the optimized HLO."""
    results = {}

    # --- 1. sharded HMC (chain-parallel, collective adaptation) --------
    from gaussianprocesses_jl_tpu.parallel.chains import sharded_hmc

    rng = np.random.RandomState(0)
    n, d, C, D_ = 20, 2, 8, 23
    X = rng.randn(n, d)
    yb = (np.sin(X[:, 0]) > 0).astype(float)
    m = gp.GPA(X, yb, gp.MeanZero(), gp.SE(0.0, 0.0), gp.BernLik())
    logprob, x0, _, _ = m.make_logprob()
    D_ = x0.shape[0]
    mesh = make_mesh({"chains": 8})
    th = jnp.tile(x0[None, :], (C, 1))

    n_it = 4
    # capture the per-segment HLO by compiling the inner jitted segment:
    # easiest faithful route — run once with segment_iters=n_it and grab
    # the jitted seg_fn via lowering the public wrapper is awkward, so
    # compile a 4-iteration run directly and divide by 4.
    import gaussianprocesses_jl_tpu.parallel.chains as chains_mod

    texts = []
    orig_jit = jax.jit

    def capture_jit(f, **kw):
        wrapped = orig_jit(f, **kw)

        class W:
            def __call__(self, *a, **k):
                try:
                    texts.append(wrapped.lower(*a, **k).compile().as_text())
                except Exception:
                    pass
                return wrapped(*a, **k)

        return W()

    # adapt_mass on (the production configuration: mass windows need
    # n_warmup >= 20)
    chains_mod.jax.jit = capture_jit
    try:
        sharded_hmc(logprob, th, jax.random.PRNGKey(0), mesh,
                    n_iter=2, n_warmup=22, eps0=0.1, Lmin=2, Lmax=3)
    finally:
        chains_mod.jax.jit = orig_jit
    seg_text = max(texts, key=len)  # the segment body
    results["sharded_hmc_per_iter"] = collective_bytes(
        seg_text, only_loop_body=True)
    results["sharded_hmc_note"] = (
        f"D={D_} params; XLA merges the accept-stat psums into one "
        "tupled all-reduce and the adapt_mass moment psums "
        "(s1/s2/cnt = 2D+1 floats) into another; both run once per "
        "iteration during warmup")

    # --- 2. sharded split-HMC ------------------------------------------
    from gaussianprocesses_jl_tpu.parallel.chains import sharded_split_hmc

    pc, la, lb, a0, b0 = m.make_split_logprob()
    ths = jnp.tile(jnp.concatenate([a0, b0])[None, :], (C, 1))
    texts.clear()
    chains_mod.jax.jit = capture_jit
    try:
        sharded_split_hmc(pc, la, lb, ths, jax.random.PRNGKey(1), mesh,
                          a0.shape[0], n_iter=4, a_iters=2, n_warmup=4,
                          Lmin=2, Lmax=3)
    finally:
        chains_mod.jax.jit = orig_jit
    seg_text = max(texts, key=len)
    results["sharded_split_hmc_per_outer_iter"] = collective_bytes(
        seg_text, only_loop_body=True)

    # --- 3. distributed Cholesky value+grad (j-axis over ICI) ----------
    from gaussianprocesses_jl_tpu.parallel.dense import (
        DistributedFullCovariance,
    )
    from gaussianprocesses_jl_tpu.models.gpe import gpe_target, GPEParams
    from gaussianprocesses_jl_tpu.utils.params import wrap_param

    nd = 256
    Xd = jnp.asarray(rng.randn(nd, 2), jnp.float32)
    yd = jnp.asarray(np.sin(rng.randn(nd)), jnp.float32)
    cs = DistributedFullCovariance(mesh=make_mesh({"j": 8}), B=32)
    params = GPEParams(lognoise=wrap_param(-1.0), mean=gp.MeanZero(),
                       kernel=gp.SE(0.0, 0.0))
    vec = params.flat_params()

    def vg(v):
        val, g = jax.value_and_grad(
            lambda v_: gpe_target(params.with_flat_params(v_), Xd, yd,
                                  cs)[0])(v)
        return val, g

    txt = _compiled_text(vg, vec)
    cb = collective_bytes(txt)
    npanels = nd // 32
    results["distributed_cholesky_vg_total"] = cb
    results["distributed_cholesky_note"] = (
        f"n={nd}, B=32, {npanels} panels, P=8: panel broadcast is one "
        "B x n-ish psum per panel step (forward), ring K^-1/unwhiten "
        "VJPs ppermute block shards per step (backward); per-panel "
        "payload scales as 4*B*n bytes")

    # --- 4. observation-sharded FITC mll+grad --------------------------
    from gaussianprocesses_jl_tpu.parallel.fitc import (
        fitc_mll_sharded_fn,
        shard_data,
    )

    Nf, mf, df = 1024, 64, 2
    Xf = rng.randn(Nf, df).astype(np.float32)
    yf = np.sin(Xf[:, 0]).astype(np.float32)
    Xu = Xf[rng.choice(Nf, mf, replace=False)].copy()
    fitc = gp.FITC(Xf, Xu, yf, kernel=gp.SE(0.0, 0.0), lognoise=-1.0)
    mesh_d = make_mesh({"data": 8})
    mll_fn = fitc_mll_sharded_fn(fitc.params.kernel, mesh_d)
    Xs, ys = shard_data(jnp.asarray(Xf), jnp.asarray(yf), mesh_d)

    def fvg(p):
        return jax.value_and_grad(
            lambda p_: -mll_fn(p_, Xs, ys, jnp.asarray(Xu)))(p)

    txt = _compiled_text(fvg, fitc.params)
    results["sharded_fitc_mll_grad_total"] = collective_bytes(txt)
    results["sharded_fitc_note"] = (
        f"N={Nf}, m={mf}: dominated by the all-gather of per-device "
        f"(m+1)x(m+1) R factors (TSQR) = P*(m+1)^2*4 bytes, independent "
        "of N")

    # --- 5. observation-sharded ELBO (VI training step) ----------------
    from gaussianprocesses_jl_tpu.parallel.vi import _make_sharded_elbo

    nv = 512
    tv = np.sort(rng.rand(nv) * 10)
    yv = rng.poisson(np.exp(1 + 0.5 * np.sin(tv))).astype(float)
    mv = gp.GPA(tv[:, None], yv, gp.MeanZero(), gp.Matern(1.5, 0.0, 0.0),
                gp.PoisLik())
    elbo_fn, mu, nn = _make_sharded_elbo(mv, mesh_d)

    def evg(m_, v_):
        return jax.value_and_grad(
            lambda a, b: elbo_fn(a, b), argnums=(0, 1))(m_, v_)

    txt = _compiled_text(evg, jnp.asarray(mu), jnp.ones(nv))
    results["sharded_elbo_value_grad_total"] = collective_bytes(txt)

    # --- 6. ring gram ---------------------------------------------------
    from gaussianprocesses_jl_tpu.parallel.gram import ring_gram

    Xr = jnp.asarray(rng.randn(512, 4), jnp.float32)
    kern = gp.SE(0.0, 0.0)

    def rg(X):
        return ring_gram(kern, X, make_mesh({"data": 8}))

    txt = _compiled_text(rg, Xr)
    results["ring_gram_total"] = collective_bytes(txt)
    results["ring_gram_note"] = (
        "n=512, P=8: P-1 ppermute rotations of the (n/P, d) row shard "
        "per full gram = n*d*4*(P-1)/P bytes per device")

    return results


def efficiency_model(results):
    """Predicted samples/s scaling efficiency for 2-8 hosts at the
    shipped configs, combining measured payloads with the interconnect
    assumptions and measured single-chip per-iteration compute times."""
    try:
        with open(os.path.join(os.path.dirname(__file__), "..",
                               "BENCH_DETAIL.json")) as f:
            bd = json.load(f)
    except OSError:
        bd = {}

    rows = []

    # sharded HMC @ 1024 chains (student-t config): per-iteration compute
    # from the measured wall; collectives per iteration from the HLO
    st = bd.get("student_t_1024", {}).get("hmc", {})
    wall = st.get("wall_s", 231.0)
    iters = st.get("iters_post_warmup", 1200) + st.get("warmup", 600)
    t_comp = wall / iters  # s per collective round on the full fleet
    hmc = results.get("sharded_hmc_per_iter", {})
    n_coll = sum(v["count"] for v in hmc.values())
    payload = sum(v["bytes"] for v in hmc.values())
    for name, lat, bw in (("ICI", ICI_LAT, ICI_BW),
                          ("DCN", DCN_LAT, DCN_BW)):
        # collectives in a ring/tree: latency ~ log2(P) hops; payload is
        # tiny (scalars), so latency dominates
        for P in (2, 4, 8):
            t_comm = n_coll * lat * np.log2(P) + payload / bw
            rows.append({
                "path": "sharded_hmc (student-t, 1024 chains)",
                "link": name, "hosts_or_chips": P,
                "t_comp_per_iter_ms": round(t_comp * 1e3, 3),
                "t_comm_per_iter_ms": round(t_comm * 1e3, 6),
                "efficiency_pct": round(
                    100 * t_comp / (t_comp + t_comm), 3)})

    # split sampler at the classification config
    g = bd.get("gpa_classification_ess", {})
    wall = g.get("wall_s", 101.0)
    iters = g.get("iters_post_warmup", 524)
    t_comp = wall / max(iters, 1)
    sp = results.get("sharded_split_hmc_per_outer_iter", {})
    n_coll = sum(v["count"] for v in sp.values())
    payload = sum(v["bytes"] for v in sp.values())
    for name, lat, bw in (("ICI", ICI_LAT, ICI_BW),
                          ("DCN", DCN_LAT, DCN_BW)):
        for P in (2, 4, 8):
            t_comm = n_coll * lat * np.log2(P) + payload / bw
            rows.append({
                "path": "sharded_split_hmc (classification, 128 chains)",
                "link": name, "hosts_or_chips": P,
                "t_comp_per_iter_ms": round(t_comp * 1e3, 3),
                "t_comm_per_iter_ms": round(t_comm * 1e3, 6),
                "efficiency_pct": round(
                    100 * t_comp / (t_comp + t_comm), 3)})

    # distributed Cholesky: per-panel broadcast of a (B, n) panel slice;
    # the r4 latency-wall study measured the single-chip split at n=10k,
    # B=256 as ~18.5 ms serial panel chain (40 sequential XLA ops at the
    # ~0.5-0.6 ms launch/latency floor) + ~3 ms MXU trailing updates.
    # Model: serial chain is invariant to P (it is latency, not FLOPs);
    # trailing FLOPs scale 1/P; comm = per-panel psum of the B x n panel.
    ch = bd.get("cholesky_n10k", {})
    t1 = ch.get("ms", 21.5) / 1e3
    for nch, B, serial_ms in ((10_000, 256, 18.5), (40_960, 512, 40.0)):
        npan = nch // B
        # serial floor ~0.5 ms per panel step (measured at n=10k; scaled
        # by panel count for n=40960 plus the bigger panel's own chol)
        t_serial = serial_ms / 1e3
        flops = nch**3 / 3.0
        t_trail = max(flops / 15.6e12 - t_serial, 0.0)
        t1_est = t_serial + t_trail
        bytes_fwd = npan * 4 * B * nch
        for P in (2, 4, 8):
            t_comp = t_serial + t_trail / P
            t_comm = npan * ICI_LAT * np.log2(P) + bytes_fwd / ICI_BW
            rows.append({
                "path": f"distributed_cholesky n={nch} fwd (j over ICI)",
                "link": "ICI", "hosts_or_chips": P,
                "t_comp_per_iter_ms": round(t_comp * 1e3, 3),
                "t_comm_per_iter_ms": round(t_comm * 1e3, 3),
                "efficiency_pct": round(
                    100 * (t1_est / P) / (t_comp + t_comm), 1),
                "note": "vs ideal t1/P; the serial panel chain "
                        "(launch-latency floor) does not scale — the j "
                        "axis buys HBM capacity + trailing-update "
                        "FLOPs, so efficiency grows with n"})
    return rows


def main():
    results = measure_paths()
    rows = efficiency_model(results)
    out = {"assumptions": {
        "ici_bw_B_per_s": ICI_BW, "ici_latency_s": ICI_LAT,
        "dcn_bw_B_per_s": DCN_BW, "dcn_latency_s": DCN_LAT,
        "method": "collective payloads read from optimized HLO on the "
                  "8-device virtual mesh; compute times from "
                  "BENCH_DETAIL.json single-chip measurements"},
        "payloads": results, "efficiency": rows}
    path = os.path.join(os.path.dirname(__file__), "comm_model.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["payloads"], indent=1))
    print("\n--- predicted scaling efficiency ---")
    for r in rows:
        print(f"{r['path']:48s} {r['link']:3s} P={r['hosts_or_chips']}: "
              f"comp {r['t_comp_per_iter_ms']} ms, comm "
              f"{r['t_comm_per_iter_ms']} ms -> {r['efficiency_pct']}%")
    print(f"\nwrote {path}")


if __name__ == "__main__":
    main()
