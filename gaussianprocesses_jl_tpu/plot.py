"""Plotting helpers (ref: src/plot.jl, 51 LoC — a Plots.jl recipe drawing
the 1D mean + beta-credible ribbon + observations, and a 2D 50x50
mean/variance heat grid).

Matplotlib equivalents; imported lazily so the core library has no hard
matplotlib dependency."""
from __future__ import annotations

import numpy as np

__all__ = ["plot_gp", "plot_gp_2d"]


def plot_gp(gp, xlims=None, n_points: int = 200, beta: float = 0.95,
            obsv: bool = True, ax=None, **kwargs):
    """1-D posterior plot: mean line, central `beta` credible ribbon, and
    the observations (ref plot.jl recipe for dim==1)."""
    import matplotlib.pyplot as plt
    from scipy.stats import norm

    if gp.dim != 1:
        raise ValueError("plot_gp draws 1-D GPs; use plot_gp_2d")
    x = np.asarray(gp.x)[:, 0]
    if xlims is None:
        span = x.max() - x.min()
        xlims = (x.min() - 0.05 * span, x.max() + 0.05 * span)
    xs = np.linspace(xlims[0], xlims[1], n_points)
    mu, var = gp.predict_y(xs)
    mu = np.asarray(mu)
    sd = np.sqrt(np.asarray(var))
    z = norm.ppf((1 + beta) / 2)
    ax = ax if ax is not None else plt.gca()
    ax.plot(xs, mu, **kwargs)
    ax.fill_between(xs, mu - z * sd, mu + z * sd, alpha=0.3)
    if obsv:
        ax.scatter(x, np.asarray(gp.y), s=12, zorder=3)
    return ax


def plot_gp_2d(gp, n_grid: int = 50, var: bool = False, ax=None, **kwargs):
    """2-D heat grid of the posterior mean (or variance)
    (ref plot.jl recipe for dim==2, 50x50 grid)."""
    import matplotlib.pyplot as plt

    if gp.dim != 2:
        raise ValueError("plot_gp_2d draws 2-D GPs")
    X = np.asarray(gp.x)
    g1 = np.linspace(X[:, 0].min(), X[:, 0].max(), n_grid)
    g2 = np.linspace(X[:, 1].min(), X[:, 1].max(), n_grid)
    G1, G2 = np.meshgrid(g1, g2)
    pts = np.stack([G1.ravel(), G2.ravel()], axis=1)
    mu, v = gp.predict_y(pts)
    Z = np.asarray(v if var else mu).reshape(n_grid, n_grid)
    ax = ax if ax is not None else plt.gca()
    im = ax.pcolormesh(G1, G2, Z, shading="auto", **kwargs)
    return ax, im
