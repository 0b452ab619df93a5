"""Exact GP regression — GPE (ref: src/GPE.jl, 567 LoC; src/GP.jl).

Architecture vs. the reference:
  * The reference maintains a mutable GPE struct and incrementally updates
    preallocated buffers through `update_target_and_dtarget!`
    (ref src/GPE.jl:346-392) with hand-derived gradients
    (`get_ααinvcKI!`/`dmll_kern!`/`dmll_noise`/`dmll_mean!`,
    ref src/GPE.jl:151-291). Here the marginal likelihood is one pure
    function of the hyperparameters; `jax.value_and_grad` of it *is*
    `update_target_and_dtarget!`, jit-compiled once per shape and fused by
    XLA (gram build + Cholesky + solves in a single executable).
  * Data layout is row-major (n, d) — natural for JAX; the reference is
    column-major (d, n).
  * Prediction is batched (one whiten + reduction for all test points),
    fixing the reference's deliberate per-point loop (ref src/GP.jl:69-77).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kernels import Kernel, SEIso
from ..ops.means import Mean, MeanZero
from ..utils.modules import Module, module, replace
from ..utils.params import Param, wrap_param
from .covariance import FullCovariance

__all__ = ["GPEParams", "GPE", "GP", "gpe_mll", "gpe_target", "gpe_predict_f",
           "noise_variance"]

_LOG_2PI = jnp.log(2.0 * jnp.pi)


@module(static=())
class GPEParams(Module):
    """Trainable state of a GPE; flat order [logNoise; mean; kernel]
    matches ref get_params(gp::GPE) (src/GPE.jl:447-457)."""

    lognoise: Param
    mean: Mean
    kernel: Kernel

    def block_slices(self):
        n0 = self.lognoise.n_params
        n1 = self.mean.n_params
        n2 = self.kernel.n_params
        return slice(0, n0), slice(n0, n0 + n1), slice(n0 + n1, n0 + n1 + n2)


def _noise_var(lognoise_value):
    return jnp.exp(2.0 * lognoise_value)


# ---------------------------------------------------------------------------
# Pure inference core
# ---------------------------------------------------------------------------


def gpe_factorize(params: GPEParams, X, covstrat):
    return covstrat.build(params.kernel, _noise_var(params.lognoise.value), X)


def gpe_mll(params: GPEParams, X, y, covstrat=FullCovariance()):
    """Marginal log likelihood -1/2 (r^T a + logdet + n log 2pi)
    (ref update_mll!, src/GPE.jl:202-212). Returns (mll, (pd, mu));
    mll is -inf when the factorization failed. pd in the aux is None for
    strategies with a fused quad_logdet fast path (nothing consumes it —
    use gpe_factorize to get the factorization)."""
    mu = params.mean.mean(X)
    r = y - mu
    n = y.shape[0]
    fused = getattr(covstrat, "quad_logdet", None)
    if fused is not None:
        quad, logdet, ok = fused(
            params.kernel, _noise_var(params.lognoise.value), X, r)
        pd = None
    else:
        pd = gpe_factorize(params, X, covstrat)
        quad = pd.quad(r)  # strategies provide a cancellation-stable form
        logdet = pd.logdet()
        ok = pd.ok
    mll = -0.5 * (quad + logdet + n * _LOG_2PI)
    # a negative quadratic form or non-finite pieces mean the factorization
    # is numerically invalid: treat like the reference's PosDefException
    valid = ok & (quad >= 0.0) & jnp.isfinite(quad) & jnp.isfinite(logdet)
    mll = jnp.where(valid, mll, -jnp.inf)
    return mll, (pd, mu)


def gpe_target(params: GPEParams, X, y, covstrat=FullCovariance()):
    """Log posterior target = mll + log priors (ref update_target!,
    src/GPE.jl:346-392)."""
    mll, aux = gpe_mll(params, X, y, covstrat)
    return mll + params.prior_logpdf(), aux


def gpe_predict_f(params: GPEParams, X, y, Xs, covstrat=FullCovariance(),
                  full_cov: bool = False, blockindpred=None):
    """Posterior predictive of the latent f at Xs (ref predict_f,
    src/GP.jl:64-79), batched.

    blockindpred: padded static (idx, mask) tuples (models.sparse
    pad_pred_blocks) assigning test points to FSA training blocks for the
    cross-Lambda correction (ref full_scale_approximation.jl:456-477);
    only FullScaleApproxStrat accepts it."""
    pd = gpe_factorize(params, X, covstrat)
    r = y - params.mean.mean(X)
    alpha = pd.solve(r)
    if blockindpred is None:
        mu_cross, cov = covstrat.predict_mvn(pd, params.kernel, X, r, alpha,
                                             Xs, full_cov)
    else:
        mu_cross, cov = covstrat.predict_mvn(pd, params.kernel, X, r, alpha,
                                             Xs, full_cov,
                                             blockindpred=blockindpred)
    mu = params.mean.mean(Xs) + mu_cross
    return mu, cov


# jitted wrappers ----------------------------------------------------------

_target_and_grad_flat = jax.jit(
    jax.value_and_grad(
        lambda vec, params, X, y, covstrat: gpe_target(
            params.with_flat_params(vec), X, y, covstrat
        )[0]
    )
)

_mll_jit = jax.jit(lambda params, X, y, covstrat: gpe_mll(params, X, y, covstrat)[0])
_target_jit = jax.jit(
    lambda params, X, y, covstrat: gpe_target(params, X, y, covstrat)[0]
)
_predict_f_jit = jax.jit(gpe_predict_f,
                         static_argnames=("full_cov", "blockindpred"))


# ---------------------------------------------------------------------------
# Stateful user-facing wrapper (reference-style API)
# ---------------------------------------------------------------------------


def _as_X(x):
    x = jnp.asarray(x, dtype=float)
    if x.ndim == 1:
        x = x[:, None]
    return x


class GPE:
    """Exact GP regression model with the reference's surface API:
    `mll`, `target`, `dtarget`, `predict_f`, `predict_y`, `rand`, `fit`,
    `optimize` (ref GPE/GP constructors src/GPE.jl:68-120).

    lognoise is the log observation noise std; pass a vector for
    heteroscedastic noise (ref src/GPE.jl:177-186)."""

    def __init__(self, x, y, mean: Mean | None = None,
                 kernel: Kernel | None = None, lognoise=-2.0,
                 covstrat=None):
        self.x = _as_X(x)
        self.y = jnp.asarray(y, dtype=float)
        mean = mean if mean is not None else MeanZero()
        kernel = kernel if kernel is not None else SEIso(
            ll=jnp.zeros(()), lsigma=jnp.zeros(()))
        self.params = GPEParams(
            lognoise=wrap_param(lognoise), mean=mean, kernel=kernel
        )
        self.covstrat = covstrat if covstrat is not None else FullCovariance()

    # -- basic accessors ---------------------------------------------------
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
    def lognoise(self):
        return self.params.lognoise.value

    # -- targets -----------------------------------------------------------
    @property
    def mll(self):
        return _mll_jit(self.params, self.x, self.y, self.covstrat)

    @property
    def target(self):
        """mll + log prior (ref update_target!)."""
        return _target_jit(self.params, self.x, self.y, self.covstrat)

    def target_and_dtarget(self):
        """(target, gradient wrt flat params) — the reference's
        update_target_and_dtarget! hot path (src/GPE.jl:387-392)."""
        vec = self.params.flat_params()
        return _target_and_grad_flat(vec, self.params, self.x, self.y, self.covstrat)

    @property
    def dtarget(self):
        return self.target_and_dtarget()[1]

    # -- parameter protocol (ref src/GPE.jl:447-512) -----------------------
    def get_params(self, noise=True, domean=True, kern=True):
        vec = self.params.flat_params()
        sl = self.params.block_slices()
        parts = []
        for flag, s in zip((noise, domean, kern), sl):
            if flag:
                parts.append(vec[s])
        return jnp.concatenate(parts) if parts else jnp.zeros((0,))

    def set_params(self, hyp, noise=True, domean=True, kern=True):
        hyp = jnp.asarray(hyp)
        expected = self.num_params(noise=noise, domean=domean, kern=kern)
        if hyp.shape[0] != expected:
            raise ValueError(
                f"expected {expected} parameters for the selected blocks, "
                f"got {hyp.shape[0]}"
            )
        vec = self.params.flat_params()
        sl = self.params.block_slices()
        i = 0
        for flag, s in zip((noise, domean, kern), sl):
            if flag:
                n = s.stop - s.start
                vec = vec.at[s].set(hyp[i : i + n])
                i += n
        self.params = self.params.with_flat_params(vec)
        return self

    def num_params(self, noise=True, domean=True, kern=True):
        sl = self.params.block_slices()
        return sum(
            (s.stop - s.start)
            for flag, s in zip((noise, domean, kern), sl)
            if flag
        )

    def set_priors(self, *, noise=None, mean=None, kern=None):
        p = self.params
        if noise is not None:
            p = replace(p, lognoise=p.lognoise.set_priors(tuple(noise)))
        if mean is not None:
            p = replace(p, mean=p.mean.set_priors(tuple(mean)))
        if kern is not None:
            p = replace(p, kernel=p.kernel.set_priors(tuple(kern)))
        self.params = p
        return self

    # -- prediction --------------------------------------------------------
    def predict_f(self, xs, full_cov: bool = False, blockindpred=None):
        """Posterior latent predictive. For an FSA-strategy model,
        `blockindpred` (one sequence of test-point indices per training
        block — ref blocked predict_f, full_scale_approximation.jl:456-477)
        turns on the cross-block Lambda_xf correction; test points left
        unassigned are treated as their own blocks."""
        xs = _as_X(xs)
        if blockindpred is not None:
            from .sparse import FullScaleApproxStrat, pad_pred_blocks

            if not isinstance(self.covstrat, FullScaleApproxStrat):
                raise TypeError(
                    "blockindpred is only meaningful for the FSA strategy; "
                    f"got {type(self.covstrat).__name__}")
            blockindpred = pad_pred_blocks(
                blockindpred, xs.shape[0], len(self.covstrat.block_idx))
        return _predict_f_jit(
            self.params, self.x, self.y, xs, self.covstrat, full_cov,
            blockindpred
        )

    def predict_y(self, xs, full_cov: bool = False):
        """Adds observation noise to the latent predictive
        (ref predict_y, src/GPE.jl:408-416).

        Heteroscedastic (vector-noise) models support predict_y only at the
        TRAINING locations, where the per-observation noise is defined (the
        reference's vector-noise GPE is exercised through prediction in
        test/heteroscedastic.jl); at new locations the noise is undefined —
        use predict_f. The training-location check runs on HOST values
        (np.array_equal), so the heteroscedastic path is eager-only —
        calling it under jit/vmap would need a traced equality test on
        data that is static by construction (ADVICE r4)."""
        if jnp.ndim(self.lognoise) > 0:
            xs_ = _as_X(xs)
            if xs_.shape != self.x.shape or not np.array_equal(
                    np.asarray(xs_), np.asarray(self.x)):
                raise ValueError(
                    "heteroscedastic (vector-noise) predict_y is defined "
                    "only at the training locations (the per-observation "
                    "noise vector); use predict_f at new locations")
            mu, cov = self.predict_f(xs_, full_cov=full_cov)
            nv = _noise_var(self.lognoise)  # (n,) per-observation variances
            if full_cov:
                return mu, cov + jnp.diag(nv)
            return mu, cov + nv
        mu, cov = self.predict_f(xs, full_cov=full_cov)
        nv = _noise_var(self.lognoise)
        if full_cov:
            n = cov.shape[0]
            return mu, cov + nv * jnp.eye(n, dtype=cov.dtype)
        return mu, cov + nv

    def rand(self, key, xs, n_samples: int = 1, *, from_prior: bool = False):
        """Sample latent draws at xs (ref rand!, src/GP.jl:120-146)."""
        xs = _as_X(xs)
        if from_prior or self.nobs == 0:
            mu = self.params.mean.mean(xs)
            cov = self.params.kernel.gram(xs)
        else:
            mu, cov = self.predict_f(xs, full_cov=True)
        n = xs.shape[0]
        # The reference Cholesky-samples with a 1e-10 nugget (f64 CPU,
        # src/GP.jl:120-146). In f32 on TPU the posterior covariance can be
        # slightly indefinite (whiten-subtract cancellation), so sample via
        # an eigendecomposition with clamped spectrum instead — exact for a
        # PSD input, robust for a near-PSD one.
        w, U = jnp.linalg.eigh(cov)
        scale = jnp.sqrt(jnp.maximum(w, 0.0))
        z = jax.random.normal(key, (n, n_samples), dtype=cov.dtype)
        out = mu[:, None] + U @ (scale[:, None] * z)
        return out[:, 0] if n_samples == 1 else out

    # -- data updates ------------------------------------------------------
    def fit(self, x, y):
        """Replace the data (ref fit!, src/GPE.jl:131-140)."""
        self.x = _as_X(x)
        self.y = jnp.asarray(y, dtype=float)
        return self

    def push(self, x, y):
        """Append observations by refitting (ref Base.push!,
        src/GPE.jl:530-543 — same recompute semantics; see models/elastic.py
        for the bucketed incremental variant)."""
        x = _as_X(x)
        y = jnp.atleast_1d(jnp.asarray(y, dtype=float))
        if self.nobs == 0:
            return self.fit(x, y)
        if x.shape[1] != self.dim:
            raise ValueError("inconsistent input dimension")
        return self.fit(jnp.vstack([self.x, x]), jnp.concatenate([self.y, y]))

    # -- objective plumbing for inference drivers --------------------------
    def block_flag_names(self):
        return ("noise", "domean", "kern")

    def _block_plumbing(self, flags):
        """(embed, x0, active_blocks) over the selected parameter blocks."""
        full0 = self.params.flat_params()
        sls = self.params.block_slices()
        names = self.block_flag_names()
        active = [(n, s) for n, s, f in zip(names, sls, flags) if f]

        def embed(sub):
            vec = full0
            i = 0
            for _, s in active:
                m = s.stop - s.start
                vec = vec.at[s].set(sub[i : i + m])
                i += m
            return vec

        x0 = jnp.concatenate([full0[s] for _, s in active]) if active else (
            jnp.zeros((0,)))
        blocks = [(n, s.stop - s.start) for n, s in active]
        return embed, x0, blocks

    def make_logprob(self, noise=True, domean=True, kern=True, *,
                     include_priors=True):
        """Pure log-target over the selected blocks (for samplers)."""
        embed, x0, blocks = self._block_plumbing((noise, domean, kern))
        base, X, y, cs = self.params, self.x, self.y, self.covstrat

        def logprob(sub):
            p = base.with_flat_params(embed(sub))
            if include_priors:
                return gpe_target(p, X, y, cs)[0]
            return gpe_mll(p, X, y, cs)[0]

        return logprob, x0, embed, blocks

    def make_objective(self, noise=True, domean=True, kern=True):
        """Build (value_and_grad(sub), x0, embed, active_blocks) over the
        selected parameter blocks — the per-evaluation closure of
        ref get_optim_target (src/optimize.jl:39-97)."""
        logprob, x0, embed, blocks = self.make_logprob(
            noise=noise, domean=domean, kern=kern)

        @jax.jit
        def vg(sub):
            return jax.value_and_grad(lambda s: -logprob(s))(sub)

        return vg, x0, embed, blocks

    # -- optimization / sampling entry points (delegate to inference/) -----
    def optimize(self, **kwargs):
        from ..inference.optimize import optimize

        return optimize(self, **kwargs)

    def sample_params(self, key):
        """Draw a flat parameter vector from the priors (ref sample_params)."""
        return self.params.sample_priors(key)

    def __repr__(self):
        return (
            f"GPE(nobs={self.nobs}, dim={self.dim}, kernel={self.params.kernel!r}, "
            f"mean={self.params.mean!r}, lognoise={self.lognoise})"
        )


def GP(x, y, mean=None, kernel=None, lik=None, lognoise=-2.0):
    """Convenience constructor: GPE for Gaussian observations, GPA when a
    likelihood is given (ref GP dispatch, src/GPE.jl:119-120 and
    src/GPA.jl:88-95)."""
    if lik is not None:
        from .gpa import GPA

        return GPA(x, y, mean, kernel, lik)
    return GPE(x, y, mean=mean, kernel=kernel, lognoise=lognoise)


def noise_variance(gp):
    """Observation-noise variance exp(2*logNoise) — scalar, or a vector for
    heteroscedastic models (ref noise_variance, src/GPE.jl:269-271)."""
    return _noise_var(gp.lognoise)
