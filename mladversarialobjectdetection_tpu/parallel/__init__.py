from .mesh import (make_mesh, make_mesh_for_batch, make_hybrid_mesh,  # noqa: F401
                   make_serve_mesh, batch_sharding, image_sharding,
                   data_axis_names, replicated_sharding, shard_batch,
                   replicate, SPATIAL_AXIS)
