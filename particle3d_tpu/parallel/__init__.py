"""Multi-chip scale-out: device meshes, ring all-pairs, sharded stepping."""

from .mesh import make_mesh, make_mesh_2d, particle_sharding
from .ring import (
    ring_forces, ring_forces_2level, sharded_step, sharded_simulate,
    shard_state,
)
from .domain import sharded_cell_simulate, sharded_dense_forces
from .domain_sharded import sharded_dense_simulate

__all__ = [
    "sharded_dense_simulate",
    "make_mesh",
    "make_mesh_2d",
    "particle_sharding",
    "ring_forces",
    "ring_forces_2level",
    "sharded_step",
    "sharded_simulate",
    "shard_state",
    "sharded_cell_simulate",
    "sharded_dense_forces",
]
