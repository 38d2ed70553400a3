from .mesh import (DATA_AXIS, SOURCE_AXIS, make_mesh, make_mesh_for_batch,
                   make_source_mesh, source_sharding, params_by_source,
                   batch_sharding, replicated, shard_batch, replicate,
                   pad_to_multiple, put_global_batch, init_distributed)

__all__ = ["DATA_AXIS", "SOURCE_AXIS", "make_mesh", "make_mesh_for_batch",
           "make_source_mesh", "source_sharding", "params_by_source",
           "batch_sharding", "replicated", "shard_batch", "replicate",
           "pad_to_multiple", "put_global_batch", "init_distributed"]
