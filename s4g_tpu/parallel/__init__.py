from .mesh import (DATA_AXIS, make_mesh, shard_batch, replicate_sharding,
                   batch_sharding)
