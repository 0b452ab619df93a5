"""Poisson regression — GPA with exp-link Poisson likelihood, comparing
MCMC and variational inference (reference "Poisson regression.ipynb" /
BASELINE config #3, coal-disasters shaped)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

import gaussianprocesses_jl_tpu as gp

CSV = "/root/reference/notebooks/data/coal.csv"


def load_counts():
    if os.path.exists(CSV):
        # coal.csv rows are (year, disaster count)
        data = np.loadtxt(CSV, delimiter=",")
        return data[:, 0:1], data[:, 1].astype(float)
    rng = np.random.RandomState(3)
    t = np.linspace(0, 10, 50)
    f = 1.2 + 0.8 * np.sin(t)
    return t[:, None], rng.poisson(np.exp(f)).astype(float)


def sharded_train_demo(n=4096, nits=150):
    """Observation-sharded VI TRAINING at an n where sharding matters:
    Adam runs directly on the observation-sharded ELBO
    (gp.sharded_vi_train), so each device computes the variational
    expectations and elementwise KL terms for its own shard of the n
    observations, forward and backward, inside one jitted scan."""
    n_dev = len(jax.devices())
    n -= n % n_dev
    rng = np.random.RandomState(7)
    t = np.sort(rng.rand(n) * 12.0)
    f = 1.0 + 0.6 * np.sin(t) + 0.3 * np.cos(2.3 * t)
    y = rng.poisson(np.exp(f)).astype(float)
    m = gp.GPA(t[:, None], y, gp.MeanZero(),
               gp.Matern(1.5, np.log(0.5), 0.0), gp.PoisLik())
    mesh = gp.make_mesh({"data": n_dev})
    r = gp.sharded_vi_train(m, mesh, nits=nits, lr=0.05)
    tr = np.asarray(r.elbo_trace)
    # rate field at the training points straight from Q (the predict
    # path's n x n triangular solves are f32-fragile at dense n=4096)
    rate = np.exp(np.asarray(r.approx.m) + 0.5 * np.asarray(r.approx.v))
    corr = float(np.corrcoef(rate, y)[0, 1])
    print(f"sharded_vi_train: n={n} over {n_dev} devices, elbo "
          f"{tr[0]:.1f} -> {r.elbo:.1f} in {nits} steps, rate corr "
          f"{corr:.3f}")
    return r.elbo, corr


def main(n_iter=500, vi_iters=300):
    X, y = load_counts()
    X = (X - X.mean()) / X.std()
    kern = gp.Matern(1.5, 0.0, 0.0)
    m = gp.GPA(X, y, gp.MeanZero(), kern, gp.PoisLik())

    res = gp.mcmc(m, jax.random.PRNGKey(0), n_iter=n_iter, eps=0.05,
                  burn=n_iter // 5)
    mu_mcmc, _ = m.predict_y(X)

    n_dev = len(jax.devices())
    if n_dev > 1:
        # multi-restart VI sharded over the device mesh (parallel/vi.py):
        # 2 jittered restarts per device, best final ELBO wins
        mesh = gp.make_mesh({"chains": n_dev})
        r = gp.sharded_vi(m, mesh, restarts=2 * n_dev, nits=vi_iters,
                          key=jax.random.PRNGKey(2))
        Q = r.approx
        print(f"sharded_vi: {len(r.elbos)} restarts on {n_dev} devices, "
              f"best elbo {r.elbo:.2f} (restart {r.best})")
    else:
        Q = gp.vi(m, nits=vi_iters)
    mu_vi, _ = gp.vi_predict_y(m, Q, X)

    c_m = float(np.corrcoef(np.asarray(mu_mcmc), y)[0, 1])
    c_v = float(np.corrcoef(np.asarray(mu_vi), y)[0, 1])
    print(f"rate corr with counts — mcmc: {c_m:.3f}, vi: {c_v:.3f}, "
          f"elbo: {float(gp.elbo(m, Q.m, Q.v)):.2f}")

    if n_dev > 1:
        sharded_train_demo()
    return c_m, c_v


if __name__ == "__main__":
    main()
