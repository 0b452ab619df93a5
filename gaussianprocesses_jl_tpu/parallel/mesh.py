"""Device-mesh helpers.

The reference is single-process (SURVEY §2.9: no DP/TP/PP/SP/EP, no
communication backend). This package adds the TPU-native distribution layer:
`jax.sharding.Mesh` + `shard_map` with XLA collectives over ICI/DCN.
Axis conventions:

  'chains' — data-parallel axis for MCMC chains / VI batches (config #5)
  'data'   — observation axis n for sharded gram/FITC reductions (config #4)
  'j'      — tile-column axis for the distributed dense Cholesky (TP)

Multi-host story (ICI vs DCN): within a slice, chips are connected by ICI
(fast torus links — all shard_map collectives in this package ride it);
across slices/pods the links are DCN (datacenter network, ~10-100x lower
bandwidth). The rule encoded in `make_pod_mesh`: put the *embarrassingly
parallel* axis ('chains' — one psum of a few scalars per HMC iteration)
OUTERMOST so it maps onto DCN, and keep bandwidth-hungry axes ('j' panel
broadcasts, 'data' gram reductions) innermost on ICI. jax device order
already groups each process's local chips contiguously, so an outer axis
of size n_slices naturally falls on slice boundaries."""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "make_pod_mesh", "initialize_distributed", "Mesh",
           "NamedSharding", "P"]


def make_mesh(axis_sizes: dict | None = None, devices=None) -> Mesh:
    """Build a mesh from {axis_name: size}; defaults to all devices on one
    'chains' axis."""
    devices = devices if devices is not None else jax.devices()
    if axis_sizes is None:
        axis_sizes = {"chains": len(devices)}
    names = tuple(axis_sizes)
    shape = tuple(axis_sizes.values())
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, names)


def _distributed_kwargs(coordinator_address=None, num_processes=None,
                        process_id=None, env=None) -> dict:
    """Resolve the jax.distributed.initialize arguments from explicit
    values, falling back to JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID. Raises ValueError on a half-specified or malformed
    configuration (a misconfigured pod job must fail loudly, not silently
    degrade to single-process)."""
    import os

    env = os.environ if env is None else env
    kwargs = {}
    addr = coordinator_address or env.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kwargs["coordinator_address"] = addr
    npr = (num_processes if num_processes is not None
           else env.get("JAX_NUM_PROCESSES"))
    if npr is not None:
        try:
            kwargs["num_processes"] = int(npr)
        except (TypeError, ValueError):
            raise ValueError(f"JAX_NUM_PROCESSES must be an int, got {npr!r}")
    pid = (process_id if process_id is not None
           else env.get("JAX_PROCESS_ID"))
    if pid is not None:
        try:
            kwargs["process_id"] = int(pid)
        except (TypeError, ValueError):
            raise ValueError(f"JAX_PROCESS_ID must be an int, got {pid!r}")
    # Validation: a coordinator address without a rank is a misconfigured
    # pod job — jax would hang or mis-join; reject up front. BOTH
    # num_processes and process_id without an address are allowed (Cloud
    # TPU auto-detects the coordinator from the TPU metadata), but a lone
    # one of the pair is half-specified in every backend.
    has_np, has_pid = "num_processes" in kwargs, "process_id" in kwargs
    if "coordinator_address" in kwargs:
        missing = [k for k, h in (("num_processes", has_np),
                                  ("process_id", has_pid)) if not h]
        if missing:
            raise ValueError(
                "explicit JAX_COORDINATOR_ADDRESS requires "
                + " and ".join(missing)
                + " (set JAX_NUM_PROCESSES / JAX_PROCESS_ID)")
    elif has_np != has_pid:
        raise ValueError(
            "num_processes and process_id must be given together (a "
            "coordinator address is optional only on auto-detecting "
            "backends such as Cloud TPU)")
    if has_np and has_pid:
        npv, pv = kwargs["num_processes"], kwargs["process_id"]
        if npv < 1 or not (0 <= pv < npv):
            raise ValueError(
                f"process_id {pv} out of range for num_processes {npv}")
    return kwargs


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Join (or start) the multi-host JAX runtime.

    On Cloud TPU pods the arguments are auto-detected from the TPU
    metadata (call with no arguments from every host); elsewhere pass the
    coordinator host:port and this process's rank explicitly, or set
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID. After
    this returns, `jax.devices()` spans every chip in the job and
    make_mesh/make_pod_mesh build global meshes whose collectives ride ICI
    within a slice and DCN across slices (see module docstring). Safe to
    call twice (the second call is a no-op).

    Returns True when a multi-process runtime is active. A half-specified
    or malformed configuration raises ValueError; an explicit
    configuration whose coordinator cannot be reached re-raises jax's
    error (only the *unconfigured* auto-detect path may fall back to
    single-process, with a warning)."""
    import warnings

    if jax.process_count() > 1:
        return True  # already initialized
    kwargs = _distributed_kwargs(coordinator_address, num_processes,
                                 process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        if kwargs:
            # the user configured a pod job; degrading it silently to
            # single-process would wedge every collective at a barrier
            raise
        warnings.warn(
            "jax.distributed.initialize() could not auto-detect a "
            "multi-host environment; continuing single-process",
            RuntimeWarning, stacklevel=2)
        return False
    return jax.process_count() > 1


def make_pod_mesh(inner: dict, outer_axis: str = "chains",
                  devices=None) -> Mesh:
    """Mesh for a multi-slice job: `outer_axis` spans processes/slices
    (DCN — keep it to low-volume collectives like the psum'd accept
    statistics), `inner` axes subdivide each slice's chips (ICI — panel
    broadcasts, ring permutes, gram reductions).

    Example: 2 hosts x 4 chips, make_pod_mesh({'j': 4}) ->
    Mesh(('chains', 'j'), shape (2, 4)): chain shards per host, each
    factorizing its own tile-columns over its local ICI ring."""
    devices = devices if devices is not None else jax.devices()
    n_inner = int(np.prod(tuple(inner.values())))
    if len(devices) % n_inner:
        raise ValueError(
            f"{len(devices)} devices not divisible by inner size {n_inner}")
    n_outer = len(devices) // n_inner
    names = (outer_axis,) + tuple(inner)
    shape = (n_outer,) + tuple(inner.values())
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, names)
