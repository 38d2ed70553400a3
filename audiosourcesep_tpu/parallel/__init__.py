from .mesh import (DATA_AXIS, make_mesh, make_mesh_for_batch,
                   batch_sharding, replicated, shard_batch, replicate,
                   pad_to_multiple, put_global_batch, init_distributed)

__all__ = ["DATA_AXIS", "make_mesh", "make_mesh_for_batch",
           "batch_sharding", "replicated", "shard_batch", "replicate",
           "pad_to_multiple", "put_global_batch", "init_distributed"]
