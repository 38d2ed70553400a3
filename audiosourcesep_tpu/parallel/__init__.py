from .mesh import (DATA_AXIS, make_mesh, batch_sharding, replicated,
                   shard_batch, replicate, pad_to_multiple)

__all__ = ["DATA_AXIS", "make_mesh", "batch_sharding", "replicated",
           "shard_batch", "replicate", "pad_to_multiple"]
