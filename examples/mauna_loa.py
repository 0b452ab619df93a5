"""Mauna Loa CO2 time series — exact GPE with the composite kernel from the
reference's Mauna_Loa_time_series.ipynb (BASELINE config #1):

    SE(4,4) + Periodic(0,1,0) * SE(4,0) + RQ(0,0,-1) + SE(-2,-2)

Loads the CO2 data alongside the reference when available, otherwise
synthesizes a trend+seasonal series with the same shape."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import gaussianprocesses_jl_tpu as gp

CSV = "/root/reference/notebooks/data/CO2_data.csv"


def load_data():
    if os.path.exists(CSV):
        data = np.loadtxt(CSV, delimiter=",")
        return data[:, 0], data[:, 1]
    t = np.arange(1958.2, 2008.0, 1.0 / 12)
    co2 = (315 + 1.5 * (t - 1958) + 0.013 * (t - 1958) ** 2
           + 3 * np.sin(2 * np.pi * t + 0.3)
           + 0.3 * np.random.RandomState(0).randn(len(t)))
    return t, co2


def main():
    year, co2 = load_data()
    train = year < 2004
    xtrain, ytrain = year[train], co2[train]
    xtest, ytest = year[~train], co2[~train]
    # center like a zero-mean GP expects
    ymean = ytrain.mean()

    kernel = (gp.SE(4.0, 4.0)
              + gp.Periodic(0.0, 1.0, 0.0) * gp.SE(4.0, 0.0)
              + gp.RQ(0.0, 0.0, -1.0)
              + gp.SE(-2.0, -2.0))
    m = gp.GPE(xtrain, ytrain - ymean, gp.MeanZero(), kernel, lognoise=-2.0)
    print(f"initial mll: {float(m.mll):.2f}")
    m.optimize(maxiter=200)
    print(f"optimized mll: {float(m.mll):.2f}")

    mu, var = m.predict_y(xtest)
    mu = np.asarray(mu) + ymean
    rmse = float(np.sqrt(np.mean((mu - ytest) ** 2)))
    print(f"forecast 2004+ rmse: {rmse:.3f} ppm "
          f"(data range {ytest.min():.1f}..{ytest.max():.1f})")
    return rmse


if __name__ == "__main__":
    main()
