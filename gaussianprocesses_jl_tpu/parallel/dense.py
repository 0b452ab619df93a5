"""Distributed exact-GP covariance strategy (SURVEY §2.9 TP row).

`DistributedFullCovariance` is a drop-in `covstrat` for `GPE`: the train
covariance K = k(X,X) + noise I is built, factorized, solved, and
differentiated entirely in block-cyclic tile-column shards over a device
mesh (parallel/cholesky.py) — K never exists on a single device. A GPE
constructed with it optimizes hyperparameters (value+grad through the
custom-VJP `distributed_quad_logdet`), predicts, and samples on data whose
gram matrix exceeds one chip's HBM.

The reference has no distributed path (SURVEY §2.9: single-process Julia);
this mirrors the strategy-pattern slot its `CovarianceStrategy` occupies
(ref src/GP.jl:10-20) at pod scale.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from jax.sharding import Mesh

from ..models.covariance import FullCovariance
from ..utils.modules import Module, module
from .cholesky import (
    ambient_gram,
    ambient_quad_logdet,
    ambient_unwhiten_build,
    build_tiles,
    choose_tile_size,
    distributed_chol_solve,
    distributed_cholesky,
    distributed_quad_logdet,
    distributed_solve_lower,
    distributed_unwhiten,
    distributed_unwhiten_build,
    identity_tiles,
)

__all__ = ["DistributedPD", "DistributedFullCovariance",
           "AmbientFullCovariance"]


@module(static=("mesh", "axis", "B"))
class DistributedPD(Module):
    """PD matrix represented by its sharded lower-Cholesky tile-columns.

    Implements the same protocol as models.covariance.DensePD (solve /
    whiten / unwhiten / logdet / quad + ok flag) against the distributed
    factor; on factorization failure the factor is the identity and `ok`
    is False (safe_cholesky semantics)."""

    L_tiles: Any  # (nb, nb, B, B) sharded tile-columns
    logdet_value: Any  # () — accumulated during the factorization
    ok: Any  # () bool
    mesh: Mesh
    axis: str
    B: int

    def solve(self, Bmat):
        return distributed_chol_solve(self.L_tiles, Bmat, self.B, self.mesh,
                                      self.axis)

    def whiten(self, Bmat):
        return distributed_solve_lower(self.L_tiles, Bmat, self.B, self.mesh,
                                       self.axis)

    def unwhiten(self, v):
        return distributed_unwhiten(self.L_tiles, v, self.B, self.mesh,
                                    self.axis)

    def logdet(self):
        return self.logdet_value

    def quad(self, y):
        w = self.whiten(y)
        return jnp.sum(w * w)


@module(static=("mesh", "axis", "B"))
class DistributedFullCovariance(Module):
    """Exact dense covariance sharded over `mesh[axis]` (tile size B;
    B=None picks the largest valid size at build time). Requires
    n % (B * mesh.shape[axis]) == 0 — pad the data or pass an explicit B.

    Serves both GPE (fused quad_logdet with a ring-ppermute K^-1 backward)
    and GPA: the whitened-latent map f = L v is differentiable THROUGH the
    distributed factorization via the custom-VJP
    `distributed_unwhiten_build` (Murray-style Cholesky reverse mode
    executed on the shards — parallel/cholesky.py), so sharded MCMC/VI over
    dense-GP latents composes with observation sharding."""

    mesh: Mesh
    axis: str = "j"
    B: int | None = None

    supports_whitened_latents = True
    # explicit protocol flag: gpa_ll routes the sampling hot loop through
    # latent_f() only when this is declared (no attribute duck-typing)
    supports_fused_latent_f = True

    def _tile(self, n: int) -> int:
        if self.B is not None:
            return self.B
        return choose_tile_size(n, self.mesh.shape[self.axis])

    def build(self, kernel, noise_var, X) -> DistributedPD:
        n = X.shape[0]
        B = self._tile(n)
        tiles = build_tiles(kernel, noise_var, X, B, self.mesh, self.axis)
        L_tiles, logdet = distributed_cholesky(tiles, self.mesh, self.axis)
        # any non-PD pivot NaNs its panel, which contaminates every trailing
        # update and later diagonal tile, so logdet is NaN iff the
        # factorization failed anywhere
        ok = jnp.isfinite(logdet)
        # identity fallback keeps downstream solves finite; callers gate on ok
        eye_t = identity_tiles(n // B, B, self.mesh, self.axis,
                               dtype=L_tiles.dtype)
        L_tiles = jnp.where(ok, L_tiles, eye_t)
        logdet = jnp.where(ok, logdet, 0.0)
        return DistributedPD(L_tiles=L_tiles, logdet_value=logdet, ok=ok,
                             mesh=self.mesh, axis=self.axis, B=B)

    def quad_logdet(self, kernel, noise_var, X, r):
        """Fused (r^T K^-1 r, logdet, ok) — the differentiable mll hot path
        (custom VJP with ring-ppermute K^-1, parallel/cholesky.py)."""
        n = X.shape[0]
        B = self._tile(n)
        tiles = build_tiles(kernel, noise_var, X, B, self.mesh, self.axis)
        return distributed_quad_logdet(tiles, r, B, self.mesh, self.axis)

    def latent_f(self, kernel, noise_var, X, v):
        """(f, ok) with f = L v — the whitened-latent map for GPA targets,
        differentiable w.r.t. kernel/noise hyperparameters and v (custom
        VJP through the distributed factorization)."""
        n = X.shape[0]
        B = self._tile(n)
        tiles = build_tiles(kernel, noise_var, X, B, self.mesh, self.axis)
        return distributed_unwhiten_build(tiles, v, B, self.mesh, self.axis)

    def predict_mvn(self, pd: DistributedPD, kernel, X, r, alpha, Xs,
                    full_cov: bool):
        """Same math as FullCovariance.predict_mvn (batched whiten), with
        the whiten running as distributed forward substitution."""
        return FullCovariance.predict_mvn(self, pd, kernel, X, r, alpha, Xs,
                                          full_cov)


@module(static=("axis", "P_", "B"))
class AmbientFullCovariance(Module):
    """Exact dense covariance over an AMBIENT mesh axis — the covstrat for
    chains x j composition (VERDICT r4 item 2).

    Usable ONLY inside an enclosing shard_map whose mesh includes `axis`
    (e.g. parallel/chains.sharded_hmc over make_pod_mesh({'j': P_}):
    shard_map in_specs split chains, leave 'j' unsharded, and every psum /
    ppermute in the tile machinery resolves against the ambient axis). The
    mll (GPE) and whitened-latent map (GPA) are differentiable through the
    device-local factorization via the ambient custom VJPs
    (parallel/cholesky.py). n must satisfy n % (B * P_) == 0."""

    axis: str = "j"
    P_: int = 1
    B: int = 64

    supports_whitened_latents = True
    supports_fused_latent_f = True

    def quad_logdet(self, kernel, noise_var, X, r):
        tiles = ambient_gram(kernel, noise_var, X, self.B, self.P_,
                             self.axis)
        return ambient_quad_logdet(tiles, r, self.B, self.P_, self.axis)

    def latent_f(self, kernel, noise_var, X, v):
        tiles = ambient_gram(kernel, noise_var, X, self.B, self.P_,
                             self.axis)
        return ambient_unwhiten_build(tiles, v, self.B, self.P_, self.axis)
