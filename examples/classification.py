"""Binary GP classification — GPA with Bernoulli (probit) likelihood and
HMC over latents + hyperparameters (reference Classification.ipynb /
BASELINE config #2, crabs-shaped: d=5 ARD Matern 3/2)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import gaussianprocesses_jl_tpu as gp
from gaussianprocesses_jl_tpu.utils.priors import Normal


def main(n_iter=1000):
    rng = np.random.RandomState(0)
    n, d = 80, 5
    X = rng.randn(n, d)
    logit = 1.5 * X[:, 0] - 1.0 * X[:, 1] + 0.5 * X[:, 2] * X[:, 3]
    y = (rng.rand(n) < 1 / (1 + np.exp(-logit))).astype(float)

    kern = gp.Matern(1.5, jnp.zeros(d), 0.0)
    m = gp.GPA(X, y, gp.MeanZero(), kern, gp.BernLik())
    m.set_priors(kern=[Normal(0.0, 2.0)] * (d + 1))

    # factor-cached split-block sampler (~10x the joint sampler's ESS/sec
    # on this config — perf/README.md 5b), per-block step sizes
    res = gp.mcmc(m, jax.random.PRNGKey(0), n_iter=n_iter // 4, a_iters=8,
                  eps_a=0.06, eps_b=0.06, sampler="split",
                  burn=(n_iter // 4) * 8 // 5)
    p, _ = m.predict_y(X)
    acc = float(np.mean((np.asarray(p) > 0.5) == (y > 0.5)))
    print(f"train accuracy: {acc:.3f}  (posterior draws: "
          f"{res.samples.shape[0]})")
    return acc


if __name__ == "__main__":
    main()
