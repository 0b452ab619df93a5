"""Error budget for the bf16-trailing (DEFAULT) vs 3-pass (HIGH) blocked
Cholesky on GP-realistic gram matrices, vs an f64 host ground truth.
Charts factorization success + logdet/quad error across noise levels."""
import json
import sys

import numpy as np

sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from gaussianprocesses_jl_tpu.ops.linalg import blocked_cholesky

HI = jax.lax.Precision.HIGHEST
H3 = jax.lax.Precision.HIGH
D1 = jax.lax.Precision.DEFAULT

n = 4096
rng = np.random.RandomState(0)
X64 = rng.uniform(0, 4, (n, 4))
d2 = ((X64[:, None, :] - X64[None, :, :]) ** 2).sum(-1)
K64_base = np.exp(-0.5 * d2)
y64 = rng.randn(n)

out = {}
for nv in (1e-1, 1e-2, 1e-3):
    K64 = K64_base + nv * np.eye(n)
    L64 = np.linalg.cholesky(K64)
    ld64 = 2.0 * np.log(np.diag(L64)).sum()
    w64 = np.linalg.solve(L64, y64)
    quad64 = float(w64 @ w64)
    cond = float(np.linalg.cond(K64)) if n <= 4096 else None

    Kf = jnp.asarray(K64, jnp.float32)
    yf = jnp.asarray(y64, jnp.float32)
    row = {"cond_est": float((1.0 + nv) / nv)}  # lam_max<=trace scale est
    for name, prec, psp in (("h3_hi", H3, HI), ("h3_h3", H3, H3),
                            ("d1_h3", D1, H3)):
        L = blocked_cholesky(Kf, block=512, precision=prec,
                             panel_solve_precision=psp)[0]
        Lh = np.asarray(L, np.float64)
        finite = bool(np.all(np.isfinite(Lh)))
        if finite:
            ld = 2.0 * np.log(np.diag(Lh)).sum()
            w = np.asarray(
                solve_triangular(L, yf, lower=True), np.float64)
            quad = float(w @ w)
            row[name] = {
                "finite": True,
                "max_dL": float(np.max(np.abs(Lh - L64))),
                "logdet_abs_err": float(abs(ld - ld64)),
                "quad_rel_err": float(abs(quad - quad64) / quad64),
            }
        else:
            row[name] = {"finite": False}
        print(nv, name, row[name], flush=True)
    # XLA reference for the same input
    Lx = np.asarray(jnp.linalg.cholesky(Kf), np.float64)
    row["xla_finite"] = bool(np.all(np.isfinite(Lx)))
    if row["xla_finite"]:
        row["xla_max_dL"] = float(np.max(np.abs(Lx - L64)))
    out[f"nugget_{nv:g}"] = row
    del K64, L64
    import gc; gc.collect()

with open("chol_err_budget_out.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
