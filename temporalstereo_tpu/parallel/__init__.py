from .mesh import (
    batch_sharding,
    make_data_mesh,
    make_mesh,
    make_sharded_eval_step,
    make_sharded_train_step,
    prefetch_to_device,
    replicate,
    shard_batch,
    shard_batch_multihost,
)
from .spatial import image_sharding, make_2d_mesh, make_spatial_forward

__all__ = [k for k in dir() if not k.startswith("_")]
