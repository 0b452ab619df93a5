"""Sparse approximations — SoR / DTC / FITC / FSA at N=1000 with 12
inducing points vs the exact GP (reference "Sparse Approximations.ipynb",
N=1000, sigma_y large)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import gaussianprocesses_jl_tpu as gp


def main():
    rng = np.random.RandomState(1)
    n = 1000
    x = 2 * np.pi * rng.rand(n)
    y = np.sin(x) + 0.5 * rng.randn(n)
    inducing = np.linspace(0, 2 * np.pi, 12)
    blocks = [list(range(i, min(i + 100, n))) for i in range(0, n, 100)]
    kern = gp.SE(0.3, 0.1)

    exact = gp.GPE(x, y, kernel=kern, lognoise=-0.3)
    print(f"{'exact':>6s}: mll = {float(exact.mll):10.3f}")
    for name, model in [
        ("SoR", gp.SoR(x, inducing, y, kernel=kern, lognoise=-0.3)),
        ("DTC", gp.DTC(x, inducing, y, kernel=kern, lognoise=-0.3)),
        ("FITC", gp.FITC(x, inducing, y, kernel=kern, lognoise=-0.3)),
        ("FSA", gp.FSA(x, inducing, blocks, y, kernel=kern,
                       lognoise=-0.3)),
    ]:
        xs = np.linspace(0, 2 * np.pi, 100)
        mu, _ = model.predict_f(xs)
        rmse = float(np.sqrt(np.mean((np.asarray(mu) - np.sin(xs)) ** 2)))
        print(f"{name:>6s}: mll = {float(model.mll):10.3f}   "
              f"pred rmse vs sin = {rmse:.4f}")


if __name__ == "__main__":
    main()
