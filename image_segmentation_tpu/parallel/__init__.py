from image_segmentation_tpu.parallel.mesh import (
    get_mesh,
    replicate,
    shard_batch,
)
from image_segmentation_tpu.parallel.sp import shard_batch_spatial

__all__ = ["get_mesh", "shard_batch", "replicate", "shard_batch_spatial"]
