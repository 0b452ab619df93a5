"""GPA — latent-variable GP with non-Gaussian likelihoods
(ref: src/GPA.jl, 422 LoC).

The whitened parameterization carries over exactly: f = m(x) + L v with
v ~ N(0, I) and L L^T = K + 1e-6 I (ref src/GPA.jl:101-109). The joint
log-target is log p(y|f) + log p(v) + log p(theta) (ref src/GPA.jl:245-266).

What disappears on TPU: the entire hand-written gradient machinery — the
Cholesky reverse-mode pass (`get_L_bar!` -> `chol_unblocked_rev!`,
ref src/GPA.jl:130-143 and src/chol_utils.jl:15-39) and the U^T dl/df
latent gradient (ref src/GPA.jl:200) are reproduced by one
`jax.value_and_grad` of the pure target, using JAX's built-in Cholesky VJP.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..ops.kernels import Kernel
from ..ops.likelihoods import Likelihood
from ..ops.means import Mean, MeanZero
from ..utils.modules import Module, module, replace
from .covariance import FullCovariance
from .gpe import _as_X

__all__ = ["GPAParams", "GPA", "gpa_target", "gpa_predict_f"]

_LOG_2PI = jnp.log(2.0 * jnp.pi)

# fixed stabilizing nugget on K for the latent model (ref src/GPA.jl:105
# uses 1e-6; update_cK! uses exp(-40) — we standardize on 1e-6). In f32 a
# 1e-6 nugget cannot stabilize a smooth (near-low-rank) gram matrix, so the
# nugget scales with the working precision.
GPA_NUGGET = 1e-6


def gpa_nugget(dtype):
    return GPA_NUGGET if jnp.dtype(dtype) == jnp.float64 else 1e-4


@module(static=())
class GPAParams(Module):
    """Sampled state of a GPA; flat order [v; lik; mean; kernel] matches
    ref get_params(gp::GPA) (src/GPA.jl:336-349)."""

    v: Any  # (n,) whitened latents
    lik: Likelihood
    mean: Mean
    kernel: Kernel

    def block_slices(self):
        n0 = int(jnp.size(self.v))
        n1 = self.lik.n_params
        n2 = self.mean.n_params
        n3 = self.kernel.n_params
        return (
            slice(0, n0),
            slice(n0, n0 + n1),
            slice(n0 + n1, n0 + n1 + n2),
            slice(n0 + n1 + n2, n0 + n1 + n2 + n3),
        )


def _latent_f(params: GPAParams, X, covstrat):
    pd = covstrat.build(params.kernel, gpa_nugget(X.dtype), X)
    mu = params.mean.mean(X)
    f = pd.unwhiten(params.v) + mu
    return pd, mu, f


def gpa_ll(params: GPAParams, X, y, covstrat=FullCovariance()):
    """log p(y | v, theta) (ref update_ll!, src/GPA.jl:118-128).

    Strategies declaring `supports_fused_latent_f = True` (an explicit
    protocol flag — not duck typing on the attribute name) must expose
    `latent_f(kernel, nugget, X, v) -> (f, ok)` (e.g.
    DistributedFullCovariance, whose gradient goes through a custom VJP on
    the sharded factorization); that path is taken on the sampling hot
    loop, and the aux pd is then None (prediction uses gpa_predict_f,
    which builds the full PD)."""
    if getattr(covstrat, "supports_fused_latent_f", False):
        fused = covstrat.latent_f
        mu = params.mean.mean(X)
        f, ok = fused(params.kernel, gpa_nugget(X.dtype), X, params.v)
        f = f + mu
        ll = jnp.sum(params.lik.log_dens(f, y))
        return jnp.where(ok, ll, -jnp.inf), (None, mu, f)
    pd, mu, f = _latent_f(params, X, covstrat)
    ll = jnp.sum(params.lik.log_dens(f, y))
    return jnp.where(pd.ok, ll, -jnp.inf), (pd, mu, f)


def gpa_target(params: GPAParams, X, y, covstrat=FullCovariance()):
    """log p(theta, v | y) up to a constant: ll + log N(v; 0, I) + log priors
    (ref update_target!, src/GPA.jl:245-266)."""
    ll, aux = gpa_ll(params, X, y, covstrat)
    n = jnp.size(params.v)
    logp_v = -0.5 * (jnp.sum(params.v**2) + n * _LOG_2PI)
    logp_prior = (
        params.lik.prior_logpdf()
        + params.mean.prior_logpdf()
        + params.kernel.prior_logpdf()
    )
    return ll + logp_v + logp_prior, aux


def gpa_predict_f(params: GPAParams, X, y, Xs, covstrat=FullCovariance(),
                  full_cov: bool = False):
    """Latent posterior at Xs: alpha = cK^-1 L v, then the shared predictMVN
    (ref predict_full, src/GPA.jl:294)."""
    pd, mu, f = _latent_f(params, X, covstrat)
    alpha = pd.solve(f - mu)
    mu_cross, cov = covstrat.predict_mvn(pd, params.kernel, X, f - mu, alpha,
                                         Xs, full_cov)
    return params.mean.mean(Xs) + mu_cross, cov


_target_jit = jax.jit(
    lambda params, X, y, covstrat: gpa_target(params, X, y, covstrat)[0]
)
_target_and_grad_flat = jax.jit(
    jax.value_and_grad(
        lambda vec, params, X, y, covstrat: gpa_target(
            params.with_flat_params(vec), X, y, covstrat
        )[0]
    )
)
_predict_f_jit = jax.jit(gpa_predict_f, static_argnames=("full_cov",))


class GPA:
    """Latent GP with non-Gaussian likelihood; HMC/ESS-ready
    (ref GPA constructors, src/GPA.jl:53-95)."""

    def __init__(self, x, y, mean: Mean | None, kernel: Kernel,
                 lik: Likelihood, covstrat=None, v=None):
        self.x = _as_X(x)
        self.y = jnp.asarray(y)
        n = self.x.shape[0]
        if self.y.shape[0] != n:
            raise ValueError("Input and output observations must have "
                             "consistent dimensions")
        mean = mean if mean is not None else MeanZero()
        v = jnp.zeros(n) if v is None else jnp.asarray(v, dtype=float)
        self.params = GPAParams(v=v, lik=lik, mean=mean, kernel=kernel)
        covstrat = covstrat if covstrat is not None else FullCovariance()
        if not getattr(covstrat, "supports_whitened_latents", False):
            # GPA needs pd.unwhiten (f = mu + L v); the low-rank sparse
            # strategies don't provide a square factor (ref GPA is
            # FullCovariance-only, src/GPA.jl:53-95)
            raise TypeError(
                f"GPA requires a covariance strategy with whitened-latent "
                f"support (full dense factor); got {type(covstrat).__name__}")
        self.covstrat = covstrat

    # -- accessors ---------------------------------------------------------
    @property
    def nobs(self):
        return self.x.shape[0]

    @property
    def dim(self):
        return self.x.shape[1]

    @property
    def kernel(self):
        return self.params.kernel

    @property
    def mean(self):
        return self.params.mean

    @property
    def lik(self):
        return self.params.lik

    @property
    def v(self):
        return self.params.v

    # -- targets -----------------------------------------------------------
    @property
    def ll(self):
        return jax.jit(
            lambda p, X, y, cs: gpa_ll(p, X, y, cs)[0]
        )(self.params, self.x, self.y, self.covstrat)

    @property
    def target(self):
        return _target_jit(self.params, self.x, self.y, self.covstrat)

    def target_and_dtarget(self):
        vec = self.params.flat_params()
        return _target_and_grad_flat(vec, self.params, self.x, self.y,
                                     self.covstrat)

    @property
    def dtarget(self):
        return self.target_and_dtarget()[1]

    # -- parameter protocol (ref src/GPA.jl:336-381) -----------------------
    def get_params(self, lik=True, domean=True, kern=True):
        vec = self.params.flat_params()
        sv, sl, sm, sk = self.params.block_slices()
        parts = [vec[sv]]  # v is always included (ref src/GPA.jl:336)
        for flag, s in zip((lik, domean, kern), (sl, sm, sk)):
            if flag:
                parts.append(vec[s])
        return jnp.concatenate(parts)

    def set_params(self, hyp, process=True, lik=True, domean=True, kern=True):
        hyp = jnp.asarray(hyp)
        expected = self.num_params(lik=lik, domean=domean, kern=kern)
        if not process:
            expected -= self.nobs
        if hyp.shape[0] != expected:
            raise ValueError(
                f"expected {expected} parameters, got {hyp.shape[0]}")
        vec = self.params.flat_params()
        sv, sl, sm, sk = self.params.block_slices()
        i = 0
        for flag, s in zip((process, lik, domean, kern), (sv, sl, sm, sk)):
            if flag:
                n = s.stop - s.start
                vec = vec.at[s].set(hyp[i : i + n])
                i += n
        self.params = self.params.with_flat_params(vec)
        return self

    def num_params(self, lik=True, domean=True, kern=True):
        sv, sl, sm, sk = self.params.block_slices()
        n = sv.stop - sv.start
        for flag, s in zip((lik, domean, kern), (sl, sm, sk)):
            if flag:
                n += s.stop - s.start
        return n

    def set_priors(self, *, lik=None, mean=None, kern=None):
        p = self.params
        if lik is not None:
            p = replace(p, lik=p.lik.set_priors(tuple(lik)))
        if mean is not None:
            p = replace(p, mean=p.mean.set_priors(tuple(mean)))
        if kern is not None:
            p = replace(p, kernel=p.kernel.set_priors(tuple(kern)))
        self.params = p
        return self

    # -- objective plumbing ------------------------------------------------
    def block_flag_names(self):
        return ("lik", "domean", "kern")

    def _block_plumbing(self, flags):
        """(embed, x0, active_blocks) over [v (always); selected blocks]."""
        full0 = self.params.flat_params()
        sls = self.params.block_slices()
        names = ("process",) + self.block_flag_names()
        flags = (True,) + tuple(flags)
        active = [(n, s) for n, s, f in zip(names, sls, flags) if f]

        def embed(sub):
            vec = full0
            i = 0
            for _, s in active:
                m = s.stop - s.start
                vec = vec.at[s].set(sub[i : i + m])
                i += m
            return vec

        x0 = jnp.concatenate([full0[s] for _, s in active])
        blocks = [(n, s.stop - s.start) for n, s in active]
        return embed, x0, blocks

    def make_logprob(self, lik=True, domean=True, kern=True, *,
                     include_priors=True):
        """Pure log-target over [v; selected hyper blocks] (for samplers)."""
        embed, x0, blocks = self._block_plumbing((lik, domean, kern))
        base, X, y, cs = self.params, self.x, self.y, self.covstrat

        def logprob(sub):
            p = base.with_flat_params(embed(sub))
            if include_priors:
                return gpa_target(p, X, y, cs)[0]
            return gpa_ll(p, X, y, cs)[0]

        return logprob, x0, embed, blocks

    def make_split_logprob(self, *, include_priors=True):
        """Target split for `inference.split.split_hmc` — the TPU analog of
        the reference's "recompute K only if kern moved" cache (ref
        update_ll!, src/GPA.jl:118-128).

        Block A = [v; lik; mean] (the factor is constant given the
        kernel), block B = [kern] (moves refactorize). Returns
        (precompute, logprob_a, logprob_b, a0, b0):

          precompute(b)          -> pd (factorized K at kernel params b)
          logprob_a(a, pd, b)    -> full joint target with the CACHED pd
          logprob_b(b, a)        -> full joint target, rebuilding pd
        """
        base, X, y, cs = self.params, self.x, self.y, self.covstrat
        sk = base.block_slices()[3]
        na = sk.start
        full0 = base.flat_params()

        def to_params(a, b):
            return base.with_flat_params(jnp.concatenate([a, b]))

        def precompute(b):
            kern = base.kernel.with_flat_params(b)
            return cs.build(kern, gpa_nugget(X.dtype), X)

        def logprob_a(a, pd, b):
            p = to_params(a, b)
            mu = p.mean.mean(X)
            f = pd.unwhiten(p.v) + mu  # one batched matvec — no Cholesky
            ll = jnp.sum(p.lik.log_dens(f, y))
            n = jnp.size(p.v)
            lp = ll - 0.5 * (jnp.sum(p.v**2) + n * _LOG_2PI)
            if include_priors:
                lp = lp + (p.lik.prior_logpdf() + p.mean.prior_logpdf()
                           + p.kernel.prior_logpdf())
            return jnp.where(pd.ok, lp, -jnp.inf)

        def logprob_b(b, a):
            p = to_params(a, b)
            if include_priors:
                return gpa_target(p, X, y, cs)[0]
            return gpa_ll(p, X, y, cs)[0]

        return precompute, logprob_a, logprob_b, full0[:na], full0[na:]

    def make_objective(self, lik=True, domean=True, kern=True):
        """value_and_grad over [v; selected hyper blocks] — v always free
        (ref optimize! on GPA optimizes the latents jointly)."""
        logprob, x0, embed, blocks = self.make_logprob(
            lik=lik, domean=domean, kern=kern)

        @jax.jit
        def vg(sub):
            return jax.value_and_grad(lambda s: -logprob(s))(sub)

        return vg, x0, embed, blocks

    # -- prediction --------------------------------------------------------
    def predict_f(self, xs, full_cov: bool = False):
        return _predict_f_jit(self.params, self.x, self.y, _as_X(xs),
                              self.covstrat, full_cov)

    def predict_y(self, xs, full_cov: bool = False):
        """Predictive observation moments through the likelihood's
        predict_obs quadrature (ref predict_y, src/GPA.jl:303-306)."""
        mu, cov = self.predict_f(xs, full_cov=full_cov)
        var = jnp.diag(cov) if full_cov else cov
        return self.params.lik.predict_obs(mu, var)

    def rand(self, key, xs, n_samples: int = 1):
        """Sample latent draws at xs from the current (v, theta) posterior."""
        mu, cov = self.predict_f(xs, full_cov=True)
        w, U = jnp.linalg.eigh(cov)
        scale = jnp.sqrt(jnp.maximum(w, 0.0))
        z = jax.random.normal(key, (cov.shape[0], n_samples), dtype=cov.dtype)
        out = mu[:, None] + U @ (scale[:, None] * z)
        return out[:, 0] if n_samples == 1 else out

    def optimize(self, **kwargs):
        from ..inference.optimize import optimize

        return optimize(self, **kwargs)

    def sample_params(self, key):
        """Sample hyperparameters (not latents) from their priors
        (ref sample_params, src/GPA.jl:313-334)."""
        k1, k2, k3 = jax.random.split(key, 3)
        return jnp.concatenate([
            self.params.lik.sample_priors(k1),
            self.params.mean.sample_priors(k2),
            self.params.kernel.sample_priors(k3),
        ])

    def __repr__(self):
        return (f"GPA(nobs={self.nobs}, dim={self.dim}, "
                f"lik={type(self.params.lik).__name__}, "
                f"kernel={self.params.kernel!r})")
