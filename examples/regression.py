"""1-D regression quickstart — exact GPE with SE kernel, ML fit, MCMC and
elliptical slice sampling over hyperparameters (reference
Regression.ipynb)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

import gaussianprocesses_jl_tpu as gp
from gaussianprocesses_jl_tpu.utils.priors import Normal


def main(n_iter=500):
    rng = np.random.RandomState(0)
    n = 40
    x = 2 * np.pi * rng.rand(n)
    y = np.sin(x) + 0.05 * rng.randn(n)

    m = gp.GPE(x, y, gp.MeanZero(), gp.SE(0.0, 0.0), lognoise=-1.0)
    m.optimize()
    print(f"ML fit: mll = {float(m.mll):.2f}, params = "
          f"{np.asarray(m.get_params()).round(3)}")

    m.set_priors(noise=[Normal(-2.0, 2.0)],
                 kern=[Normal(0.0, 2.0), Normal(0.0, 2.0)])
    hmc = gp.mcmc(m, jax.random.PRNGKey(0), n_iter=n_iter,
                  burn=n_iter // 5)
    print(f"HMC posterior mean params: "
          f"{np.asarray(hmc.samples).mean(0).round(3)}")
    ess_res = gp.ess(m, jax.random.PRNGKey(1), n_iter=n_iter,
                     burn=n_iter // 5)
    print(f"ESS posterior mean params: "
          f"{np.asarray(ess_res.samples).mean(0).round(3)}")


if __name__ == "__main__":
    main()
