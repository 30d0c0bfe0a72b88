from .distributed import (
    gather_walker_scalars,
    global_walker_mesh,
    initialize_distributed,
    local_walker_ids,
)
from .walkers import (
    init_walker_states,
    shared_precond_refresh,
    shard_walker_states,
    walker_measure,
    walker_mesh,
    walker_sweep,
)

__all__ = [
    "init_walker_states",
    "walker_mesh",
    "shard_walker_states",
    "shared_precond_refresh",
    "walker_sweep",
    "walker_measure",
    "initialize_distributed",
    "global_walker_mesh",
    "local_walker_ids",
    "gather_walker_scalars",
]
