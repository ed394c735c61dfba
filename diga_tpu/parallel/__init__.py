from .mesh import (batch_sharding, make_mesh, replicated, shard_batch,
                   spatial_sharding)
