"""Type-II ML / MAP hyperparameter optimization (ref: src/optimize.jl, 97 LoC).

The reference builds an Optim.jl `OnceDifferentiable` closure over
`set_params!` + `update_target_and_dtarget!` with an exception->Inf guard
(ref get_optim_target, src/optimize.jl:39-97). Here the objective is one
jitted `value_and_grad` of the pure target over the *selected* parameter
blocks; a non-finite target (failed Cholesky) simply evaluates to +Inf loss,
reproducing the PosDefException guard without exceptions.

Two drivers:
  * 'lbfgs'  (default) — scipy L-BFGS-B on the host driving the jitted
    device objective; supports box bounds (the reference's Fminbox path).
  * 'optax'  — fully on-device optax.lbfgs loop (no bounds), useful when
    the host<->device round-trip dominates.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["optimize", "OptimizeResult"]


@dataclass
class OptimizeResult:
    success: bool
    fun: float  # final -target (minimized)
    target: float  # final target
    x: np.ndarray
    n_iter: int
    message: str = ""


def _assemble_bounds(active_blocks, bounds_per_block):
    lb, ub = [], []
    any_bound = False
    for (name, size), b in zip(active_blocks, bounds_per_block):
        if b is None:
            lb.extend([-np.inf] * size)
            ub.extend([np.inf] * size)
        else:
            any_bound = True
            blo, bhi = b
            blo = np.broadcast_to(np.asarray(blo, dtype=float), (size,))
            bhi = np.broadcast_to(np.asarray(bhi, dtype=float), (size,))
            lb.extend(blo.tolist())
            ub.extend(bhi.tolist())
    if not any_bound:
        return None
    return list(zip(lb, ub))


def optimize(gp, method: str = "lbfgs", maxiter: int = 200, tol: float = 1e-8,
             verbose: bool = False, **kwargs) -> OptimizeResult:
    """Optimize the model's target (mll + log prior) in place
    (ref optimize!, src/optimize.jl:19-37).

    Keyword flags select parameter blocks, matching the reference:
    GPE: noise / domean / kern (+ noisebounds / meanbounds / kernbounds);
    GPA: lik / domean / kern (+ bounds).
    """
    flag_names = gp.block_flag_names()  # e.g. ('noise','domean','kern')
    flags = {n: bool(kwargs.pop(n, True)) for n in flag_names}
    bounds_map = {
        n: kwargs.pop(f"{n.replace('domean', 'mean')}bounds", None)
        for n in flag_names
    }
    if kwargs:
        raise TypeError(f"unknown optimize() arguments: {sorted(kwargs)}")

    vg, x0, embed, active_blocks = gp.make_objective(**flags)
    # blocks not named by a flag (e.g. GPA's always-free 'process' latents)
    # get no bounds
    bounds = _assemble_bounds(
        active_blocks, [bounds_map.get(name) for name, _ in active_blocks]
    )

    if x0.shape[0] == 0:
        return OptimizeResult(True, float(-gp.target), float(gp.target),
                              np.zeros(0), 0, "no free parameters")

    if method in ("lbfgs", "lbfgsb"):
        res = _scipy_lbfgsb(vg, x0, bounds, maxiter, tol, verbose)
    elif method == "optax":
        if bounds is not None:
            raise ValueError("bounds require method='lbfgs'")
        res = _optax_lbfgs(vg, x0, maxiter, tol)
    else:
        raise ValueError(f"unknown method {method!r}")

    gp.set_params(jnp.asarray(res.x), **flags)
    res.target = -res.fun
    return res


def _scipy_lbfgsb(vg, x0, bounds, maxiter, tol, verbose) -> OptimizeResult:
    from scipy.optimize import minimize

    def fun(x):
        v, g = vg(jnp.asarray(x))
        v = float(v)
        g = np.asarray(g, dtype=np.float64)
        if not np.isfinite(v):
            # reference converts non-PD/non-finite proposals to Inf
            # (src/optimize.jl:47-62); L-BFGS-B then backtracks
            return np.float64(1e100), np.zeros_like(g)
        g = np.where(np.isfinite(g), g, 0.0)
        return np.float64(v), g

    options = {"maxiter": maxiter, "ftol": tol, "gtol": 1e-12}
    out = minimize(fun, np.asarray(x0, dtype=np.float64), jac=True,
                   method="L-BFGS-B", bounds=bounds, options=options)
    return OptimizeResult(bool(out.success), float(out.fun), -float(out.fun),
                          np.asarray(out.x), int(out.nit), str(out.message))


def _optax_lbfgs(vg, x0, maxiter, tol) -> OptimizeResult:
    import optax

    def loss(x):
        v, _ = vg(x)
        return v

    opt = optax.lbfgs()

    def value_and_grad_fn(x):
        return vg(x)

    @jax.jit
    def step(carry):
        x, state = carry
        value, grad = value_and_grad_fn(x)
        updates, state = opt.update(
            grad, state, x, value=value, grad=grad, value_fn=loss
        )
        x = optax.apply_updates(x, updates)
        return (x, state), (value, jnp.linalg.norm(grad))

    x = jnp.asarray(x0)
    state = opt.init(x)
    value = jnp.inf
    it = 0
    for it in range(maxiter):
        (x, state), (value, gnorm) = step((x, state))
        if float(gnorm) < tol:
            break
    return OptimizeResult(True, float(value), -float(value),
                          np.asarray(x), it + 1)
