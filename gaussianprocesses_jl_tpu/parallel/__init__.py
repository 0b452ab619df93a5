"""Distribution layer: device meshes, sharded samplers, distributed dense
and sparse covariance paths (SURVEY §2.9 — the subsystem the reference
lacks entirely)."""
from .cholesky import (
    build_tiles,
    choose_tile_size,
    distributed_cholesky,
    distributed_chol_solve,
    distributed_mll,
    distributed_quad_logdet,
    distributed_solve_lower,
    distributed_solve_upper,
    distributed_unwhiten,
    tile_and_shard,
    untile,
)
from .dense import DistributedFullCovariance, DistributedPD
from .gram import ring_gram
from .mesh import make_mesh

__all__ = [
    "build_tiles",
    "choose_tile_size",
    "distributed_cholesky",
    "distributed_chol_solve",
    "distributed_mll",
    "distributed_quad_logdet",
    "distributed_solve_lower",
    "distributed_solve_upper",
    "distributed_unwhiten",
    "tile_and_shard",
    "untile",
    "DistributedFullCovariance",
    "DistributedPD",
    "ring_gram",
    "make_mesh",
]
