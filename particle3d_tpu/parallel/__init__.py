"""Multi-chip scale-out: device meshes, ring all-pairs, sharded stepping."""

from .mesh import make_mesh, make_mesh_2d, particle_sharding
from .ring import (
    ring_forces, ring_forces_masked, ring_forces_2level, sharded_step,
    sharded_simulate, shard_state,
)
from .domain import sharded_cell_simulate, sharded_dense_forces
from .domain_sharded import (
    sharded_dense_simulate, build_sharded_dense, sharded_dense_steps,
    gather_sharded_dense, init_sharded_dense,
    sharded_dense_adaptive, recap_sharded_dense,
    sharded_exact_steps, sharded_relayout,
)
from .launch import (
    initialize_distributed, mesh_shape_2level, auto_mesh_2d,
    shard_state_2level, sharded_simulate_2level, cluster_env_configured,
)

__all__ = [
    "sharded_dense_simulate",
    "build_sharded_dense",
    "sharded_dense_steps",
    "gather_sharded_dense",
    "init_sharded_dense",
    "sharded_dense_adaptive",
    "recap_sharded_dense",
    "sharded_exact_steps",
    "sharded_relayout",
    "ring_forces_masked",
    "initialize_distributed",
    "mesh_shape_2level",
    "auto_mesh_2d",
    "shard_state_2level",
    "sharded_simulate_2level",
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
