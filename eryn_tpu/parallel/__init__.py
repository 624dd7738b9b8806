"""Multi-chip scaling: device meshes and sharded sampler steps."""

from .mesh import (
    constrain_state,
    make_mesh,
    mesh_of_state,
    shard_state,
    sharding_for_state,
)
from .para import ParaEnsembleSampler

__all__ = [
    "make_mesh",
    "shard_state",
    "sharding_for_state",
    "mesh_of_state",
    "constrain_state",
    "ParaEnsembleSampler",
]
