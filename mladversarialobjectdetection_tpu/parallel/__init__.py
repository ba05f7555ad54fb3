from .mesh import (make_mesh, make_mesh_for_batch, make_hybrid_mesh,  # noqa: F401
                   batch_sharding, replicated_sharding, shard_batch,
                   replicate)
