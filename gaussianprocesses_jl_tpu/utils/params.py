"""Parameter wrappers (ref: Param/Scalar/VectorParam in src/common.jl:1-34).

A `Param` wraps a raw scalar or vector hyperparameter (e.g. the GPE's
logNoise, which may be a vector for heteroscedastic noise —
ref src/GPE.jl:177-186) so it can carry priors and participate in the flat
parameter protocol like any other module."""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from .modules import Module, module

__all__ = ["Param", "wrap_param"]


@module(static=("priors",))
class Param(Module):
    value: Any
    priors: tuple = ()

    @property
    def shape(self):
        return jnp.shape(self.value)


def wrap_param(value, priors: tuple = ()) -> Param:
    if isinstance(value, Param):
        return value
    return Param(value=jnp.asarray(value, dtype=float), priors=priors)
