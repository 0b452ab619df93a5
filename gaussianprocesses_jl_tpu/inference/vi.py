"""Mean-field variational inference for GPA models (ref: src/vi.jl, 136 LoC).

Same variational family as the reference: Q(f) = N(m, diag(V)) over the
latent function values, optimized against the ELBO

  ELBO = 1/2 [ sum log V_i - logdet K - tr(K^-1 diag V)
               - (m-mu)^T K^-1 (m-mu) + n ] + E_Q[log p(y|f)]

Deviations from the reference (all deliberate):
  * the reference objective uses sum log(V_i * Omega_ii) (ref vi.jl:51-58),
    which differs from the ELBO's logdet(V Omega) by a constant — same
    optimum, so we keep the exact form;
  * the reference inverts the full n x n kernel matrix explicitly
    (`initialise_Q`, ref vi.jl:1-9); we factorize once and use solves;
  * `var_exp` exists for every likelihood (closed form Poisson/Gaussian as
    in the reference, Gauss-Hermite quadrature otherwise — the reference
    supports only Poisson/Gaussian);
  * V is parameterized as exp(2 rho) instead of box-constrained to
    [1e-10, inf) (ref vi.jl:70-74), removing the Fminbox dependency;
  * the predictive uses the correct variational conditional
    mu* = m* + A (m - mu), S* = K** - A (K - diag(V)) A^T with
    A = K*x K^-1, instead of the reference's prior-variance placeholder
    (ref predictMVNvi!, vi.jl:131-135).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gpa import gpa_nugget
from ..ops.linalg import solve_lower

__all__ = ["Approx", "elbo", "vi", "make_neg_elbo", "vi_predict_f",
           "vi_predict_y"]


@dataclass
class Approx:
    """Variational posterior Q = N(m, diag(v)) (ref Approx, src/common.jl:169-172)."""

    m: jnp.ndarray  # (n,)
    v: jnp.ndarray  # (n,) marginal variances


jax.tree_util.register_dataclass(Approx, data_fields=["m", "v"], meta_fields=[])


def _prior_pieces(gp):
    """Factorize the latent prior K + nugget at the current kernel params."""
    pd = gp.covstrat.build(gp.params.kernel, gpa_nugget(gp.x.dtype), gp.x)
    mu = gp.params.mean.mean(gp.x)
    Linv = solve_lower(pd.L, jnp.eye(pd.L.shape[0], dtype=pd.L.dtype))
    diag_Kinv = jnp.sum(Linv * Linv, axis=0)
    return pd, mu, diag_Kinv


def elbo(gp, m, v):
    """Evidence lower bound at Q = N(m, diag(v)) (ref elbo, src/vi.jl:18-30)."""
    pd, mu, diag_Kinv = _prior_pieces(gp)
    n = m.shape[0]
    r = m - mu
    kl_terms = (
        jnp.sum(jnp.log(v))
        - pd.logdet()
        - jnp.dot(v, diag_Kinv)
        - pd.quad(r)
        + n
    )
    return 0.5 * kl_terms + gp.params.lik.var_exp(gp.y, m, v)


def make_neg_elbo(gp):
    """Build the VI objective: (neg_elbo(theta), theta0, n) with
    theta = [m; rho], v = exp(2 rho). Shared by vi() and the sharded
    multi-restart driver (parallel/vi.py)."""
    pd, mu, diag_Kinv = _prior_pieces(gp)
    y, lik = gp.y, gp.params.lik
    n = mu.shape[0]

    # initialise at the prior: m = mu, V = diag(K) (ref initialise_Q)
    v0 = jnp.maximum(gp.params.kernel.diag(gp.x), 1e-8)
    theta0 = jnp.concatenate([mu, 0.5 * jnp.log(v0)])

    def neg_elbo(theta):
        m, rho = theta[:n], theta[n:]
        v = jnp.exp(2.0 * rho)
        r = m - mu
        kl_terms = (
            2.0 * jnp.sum(rho)
            - pd.logdet()
            - jnp.dot(v, diag_Kinv)
            - pd.quad(r)
            + n
        )
        return -(0.5 * kl_terms + lik.var_exp(y, m, v))

    return neg_elbo, theta0, n


def vi(gp, nits: int = 100, method: str = "lbfgs", lr: float = 0.05,
       verbose: bool = False) -> Approx:
    """Fit the mean-field approximation (ref vi, src/vi.jl:50-81).

    Returns Approx(m, v) and leaves the model untouched (hyperparameters
    are held fixed, as in the reference)."""
    neg_elbo, theta0, n = make_neg_elbo(gp)
    vg = jax.jit(jax.value_and_grad(neg_elbo))

    if method == "lbfgs":
        from scipy.optimize import minimize

        def fun(x):
            val, g = vg(jnp.asarray(x))
            return (np.float64(val) if np.isfinite(float(val)) else 1e100,
                    np.asarray(g, dtype=np.float64))

        out = minimize(fun, np.asarray(theta0, dtype=np.float64), jac=True,
                       method="L-BFGS-B", options={"maxiter": nits})
        theta = jnp.asarray(out.x)
        if verbose:
            print(f"vi: {out.nit} iterations, elbo={-float(out.fun):.4f}")
    elif method == "adam":
        import optax

        opt = optax.adam(lr)

        @jax.jit
        def step(theta, state):
            val, g = vg(theta)
            updates, state = opt.update(g, state, theta)
            return optax.apply_updates(theta, updates), state, val

        theta, state = theta0, opt.init(theta0)
        val = None
        for i in range(nits):
            theta, state, val = step(theta, state)
        if verbose:
            print(f"vi: {nits} adam steps, elbo={-float(val):.4f}")
    else:
        raise ValueError(f"unknown vi method {method!r}")

    m = theta[:n]
    v = jnp.exp(2.0 * theta[n:])
    return Approx(m=m, v=v)


def vi_predict_f(gp, Q: Approx, xs, full_cov: bool = False):
    """Variational posterior predictive of the latent f at xs:
    mu* = m(xs) + A (Q.m - mu),  S* = K** - A (K - diag(Q.v)) A^T,
    A = K(xs,x) K^-1."""
    from ..models.gpe import _as_X

    xs = _as_X(xs)
    pd, mu, _ = _prior_pieces(gp)
    kern = gp.params.kernel
    Kxs = kern.gram(gp.x, xs)  # (n, ns)
    W = pd.whiten(Kxs)  # L^-1 Kxs
    A_r = pd.solve(Kxs)  # K^-1 Kxs, (n, ns)
    mu_s = gp.params.mean.mean(xs) + Kxs.T @ pd.solve(Q.m - mu)
    # A (K - diag v) A^T = W^T W - A^T diag(v) A
    if full_cov:
        Kss = kern.gram(xs)
        cov = Kss - W.T @ W + A_r.T @ (Q.v[:, None] * A_r)
        return mu_s, cov
    var = (kern.diag(xs) - jnp.sum(W * W, axis=0)
           + jnp.sum(A_r * (Q.v[:, None] * A_r), axis=0))
    return mu_s, jnp.maximum(var, 0.0)


def vi_predict_y(gp, Q: Approx, xs):
    """Observation-space predictive through the likelihood's predict_obs."""
    mu, var = vi_predict_f(gp, Q, xs)
    return gp.params.lik.predict_obs(mu, var)
