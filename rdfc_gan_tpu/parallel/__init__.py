from .mesh import (make_mesh, shard_batch, replicate_state,
                   init_replicated, data_sharding)

__all__ = ["make_mesh", "shard_batch", "replicate_state",
           "init_replicated", "data_sharding"]
