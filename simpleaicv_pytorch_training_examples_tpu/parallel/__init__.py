from .mesh import (build_mesh, data_sharding, replicated_sharding,
                   shard_batch, distributed_init)
