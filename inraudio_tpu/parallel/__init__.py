from .mesh import (coord_sharding, make_mesh, pad_to_multiple,
                   replicated_sharding, shard_problem_arrays)

__all__ = [
    "make_mesh", "coord_sharding", "replicated_sharding",
    "pad_to_multiple", "shard_problem_arrays",
]
