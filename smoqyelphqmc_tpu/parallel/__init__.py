from .walkers import (
    init_walker_states,
    walker_mesh,
    shard_walker_states,
    walker_sweep,
    walker_measure,
)

__all__ = [
    "init_walker_states",
    "walker_mesh",
    "shard_walker_states",
    "walker_sweep",
    "walker_measure",
]
