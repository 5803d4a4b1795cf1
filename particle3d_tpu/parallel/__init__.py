"""Multi-chip scale-out: device meshes, ring all-pairs, sharded stepping."""

from .mesh import make_mesh, particle_sharding
from .ring import ring_forces, sharded_step, sharded_simulate, shard_state

__all__ = [
    "make_mesh",
    "particle_sharding",
    "ring_forces",
    "sharded_step",
    "sharded_simulate",
    "shard_state",
]
