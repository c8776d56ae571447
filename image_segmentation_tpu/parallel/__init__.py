from image_segmentation_tpu.parallel.mesh import (
    get_mesh,
    replicate,
    shard_batch,
)

__all__ = ["get_mesh", "shard_batch", "replicate"]
