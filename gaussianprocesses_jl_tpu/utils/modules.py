"""Pytree module system: frozen dataclasses registered with JAX.

The reference library (GaussianProcesses.jl) builds its component tree out of
mutable Julia structs with `get_params`/`set_params!` flattening
(ref: src/common.jl:98-117). The TPU-native equivalent is a *functional*
module system: every kernel / mean / likelihood / model-state is a frozen
dataclass registered as a JAX pytree, so that

  * `jax.grad` / `jax.jit` / `jax.vmap` traverse hyperparameters natively,
  * "set_params" is a pure `with_flat_params` returning a new instance,
  * static configuration (degrees, active dims, priors) lives in aux data and
    participates in the jit cache key.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

__all__ = [
    "module",
    "replace",
    "Module",
    "asarray_fields",
]


def module(*, static: Sequence[str] = ()):  # decorator factory
    """Register a class as a frozen dataclass + JAX pytree.

    Fields named in ``static`` become aux (meta) data: they must be hashable
    and are compared by equality for jit-cache purposes. All other fields are
    pytree children (differentiable hyperparameters or arrays).
    """

    def wrap(cls):
        cls = dataclasses.dataclass(frozen=True, repr=False)(cls)
        field_names = [f.name for f in dataclasses.fields(cls)]
        data_fields = [n for n in field_names if n not in static]
        jax.tree_util.register_dataclass(
            cls, data_fields=data_fields, meta_fields=list(static)
        )
        cls._data_fields = tuple(data_fields)
        cls._meta_fields = tuple(static)
        if "__repr__" not in cls.__dict__:
            cls.__repr__ = _module_repr
        return cls

    return wrap


def _module_repr(self) -> str:
    parts = []
    for f in dataclasses.fields(self):
        v = getattr(self, f.name)
        if isinstance(v, (jnp.ndarray,)) and getattr(v, "ndim", 0) == 0:
            parts.append(f"{f.name}={float(v):.4g}")
        else:
            parts.append(f"{f.name}={v!r}")
    return f"{type(self).__name__}({', '.join(parts)})"


replace = dataclasses.replace


def asarray_fields(**kwargs) -> dict:
    """Coerce constructor args to jnp arrays (for factory functions)."""
    return {k: jnp.asarray(v, dtype=float) for k, v in kwargs.items()}


class Module:
    """Mixin giving reference-style flat parameter access.

    Mirrors the `get_params` / `set_params!` / `num_params` protocol of
    src/common.jl:98-117, functionally. The flat order is the dataclass field
    declaration order, which each component declares to match the reference's
    published parameter order (e.g. SEIso -> [ll, lsigma],
    ref src/kernels/se_iso.jl get_params).
    """

    # -- flat parameter protocol ------------------------------------------
    # Recursive so that wrappers (e.g. FixedKernel) can override what they
    # expose no matter how deeply they are nested in a composite.
    def flat_params(self) -> jnp.ndarray:
        parts = []
        for f in self._data_fields:
            v = getattr(self, f)
            if isinstance(v, Module):
                parts.append(v.flat_params())
            else:
                flat, _ = ravel_pytree(v)
                parts.append(flat)
        if not parts:
            return jnp.zeros((0,))
        return jnp.concatenate([jnp.atleast_1d(p) for p in parts])

    def with_flat_params(self, vec) -> "Module":
        vec = jnp.asarray(vec)
        updates, i = {}, 0
        for f in self._data_fields:
            v = getattr(self, f)
            if isinstance(v, Module):
                n = v.n_params
                updates[f] = v.with_flat_params(vec[i : i + n])
            else:
                flat, unravel = ravel_pytree(v)
                n = int(flat.shape[0])
                updates[f] = unravel(vec[i : i + n])
            i += n
        if i != vec.shape[0]:
            raise ValueError(
                f"{type(self).__name__} has {i} parameters, got {vec.shape[0]}"
            )
        return dataclasses.replace(self, **updates)

    @property
    def n_params(self) -> int:
        total = 0
        for f in self._data_fields:
            v = getattr(self, f)
            if isinstance(v, Module):
                total += v.n_params
            else:
                total += sum(int(jnp.size(l)) for l in jax.tree_util.tree_leaves(v))
        return total

    def param_names(self) -> list:
        names = []
        for f in self._data_fields:
            v = getattr(self, f)
            leaves = jax.tree_util.tree_leaves(v)
            if isinstance(v, Module) or (leaves and isinstance(leaves[0], Module)):
                names.extend(f"{f}.{n}" for n in v.param_names())
            else:
                size = sum(jnp.size(l) for l in leaves)
                if size == 1:
                    names.append(f)
                else:
                    names.extend(f"{f}_{i+1}" for i in range(size))
        return names

    # -- priors ------------------------------------------------------------
    # Leaf components that accept priors declare a static field
    # `priors: tuple` with one prior per local flat parameter; composites
    # concatenate their children's priors (ref: src/common.jl:123-158).
    def priors_flat(self) -> list:
        """One prior (or None) per entry of flat_params(), in order."""
        own = getattr(self, "priors", ())
        if own:
            out = list(own)
            if len(out) != self.n_params:
                raise ValueError(
                    f"{type(self).__name__}: {len(out)} priors for "
                    f"{self.n_params} parameters"
                )
            return out
        out = []
        for f in self._data_fields:
            v = getattr(self, f)
            if isinstance(v, Module):
                out.extend(v.priors_flat())
            else:
                size = sum(jnp.size(l) for l in jax.tree_util.tree_leaves(v))
                out.extend([None] * size)
        return out

    def set_priors(self, priors) -> "Module":
        priors = tuple(priors)
        if len(priors) != self.n_params:
            raise ValueError(
                f"{type(self).__name__} has {self.n_params} parameters, "
                f"got {len(priors)} priors"
            )
        if hasattr(self, "priors"):
            return dataclasses.replace(self, priors=priors)
        # composite: distribute across Module children in field order
        updates, i = {}, 0
        for f in self._data_fields:
            v = getattr(self, f)
            if isinstance(v, Module):
                updates[f] = v.set_priors(priors[i : i + v.n_params])
                i += v.n_params
            else:
                size = sum(jnp.size(l) for l in jax.tree_util.tree_leaves(v))
                if any(p is not None for p in priors[i : i + size]):
                    raise ValueError(
                        f"cannot attach priors to raw field {f!r} of composite "
                        f"{type(self).__name__}"
                    )
                i += size
        return dataclasses.replace(self, **updates)

    def prior_logpdf(self) -> jnp.ndarray:
        """Sum of log prior densities over this module's flat params."""
        priors = self.priors_flat()
        if not any(p is not None for p in priors):
            return jnp.zeros(())
        flat = self.flat_params()
        total = jnp.zeros(())
        for i, pr in enumerate(priors):
            if pr is not None:
                total = total + pr.logpdf(flat[i])
        return total

    def sample_priors(self, key) -> jnp.ndarray:
        """Draw a flat parameter vector from the priors (Uniform(-2,2)
        fallback for parameters without priors, matching sample_params in
        ref src/GPE.jl)."""
        priors = self.priors_flat()
        n = self.n_params
        keys = jax.random.split(key, max(n, 1))
        vals = []
        for i in range(n):
            if priors[i] is not None:
                vals.append(priors[i].sample(keys[i]))
            else:
                vals.append(jax.random.uniform(keys[i], (), minval=-2.0, maxval=2.0))
        return jnp.stack(vals) if vals else jnp.zeros((0,))
