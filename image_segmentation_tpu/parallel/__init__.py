from image_segmentation_tpu.parallel.mesh import (
    get_mesh,
    replicate,
    shard_batch,
)
from image_segmentation_tpu.parallel.multihost import (
    global_batch_from_local,
    initialize_multihost,
    process_local_indices,
    replicate_for_processes,
)
from image_segmentation_tpu.parallel.pp import (
    pipeline_blocks,
    shard_stacked_params,
    stack_block_params,
    unstack_block_params,
)
from image_segmentation_tpu.parallel.sp import (
    max_spatial_shards,
    shard_batch_spatial,
)

__all__ = [
    "get_mesh",
    "shard_batch",
    "replicate",
    "shard_batch_spatial",
    "max_spatial_shards",
    "pipeline_blocks",
    "stack_block_params",
    "unstack_block_params",
    "shard_stacked_params",
    "initialize_multihost",
    "process_local_indices",
    "global_batch_from_local",
    "replicate_for_processes",
]
