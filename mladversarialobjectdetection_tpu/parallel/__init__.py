from .mesh import (make_mesh, make_mesh_for_batch, batch_sharding,  # noqa: F401
                   replicated_sharding, shard_batch, replicate)
