"""Robust regression with outliers — Student-t GPA vs Gaussian GPE
(reference "Regression with outliers.ipynb" / BASELINE config #5 model
family)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import gaussianprocesses_jl_tpu as gp


def main(n_iter=500):
    rng = np.random.RandomState(1)
    n = 60
    x = np.sort(2 * np.pi * rng.rand(n))
    f = np.sin(x)
    y = f + 0.15 * rng.randn(n)
    y[::8] += rng.choice([-4.0, 4.0], size=len(y[::8]))  # outliers

    gpe = gp.GPE(x, y, kernel=gp.SE(0.0, 0.0), lognoise=-1.0)
    gpe.optimize(maxiter=100)
    mu_g, _ = gpe.predict_f(x)

    m = gp.GPA(x, y, gp.MeanZero(), gp.SE(0.0, 0.0),
               gp.StuTLik(lsigma=jnp.asarray(-1.0), nu=3))
    gp.mcmc(m, jax.random.PRNGKey(0), n_iter=n_iter, eps=0.03,
            burn=n_iter // 5)
    mu_t, _ = m.predict_f(x)

    rmse_g = float(np.sqrt(np.mean((np.asarray(mu_g) - f) ** 2)))
    rmse_t = float(np.sqrt(np.mean((np.asarray(mu_t) - f) ** 2)))
    print(f"rmse vs truth — gaussian GPE: {rmse_g:.3f}, "
          f"student-t GPA: {rmse_t:.3f}")
    return rmse_g, rmse_t


if __name__ == "__main__":
    main()
