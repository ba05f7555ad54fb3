from .mesh import (make_mesh, make_mesh_for_batch, make_hybrid_mesh,  # noqa: F401
                   make_serve_mesh, make_train_mesh, batch_sharding,
                   image_sharding,
                   data_axis_names, replicated_sharding, shard_batch,
                   shard_batch_local, shard_batch_auto, local_batch_size,
                   is_main_process, replicate, SPATIAL_AXIS)
