"""Spatial partitioning (SP): shard the image height axis over the mesh.

The reference scales resolution only as far as one GPU's memory allows
at micro-batch 2 (reference utils/training.py:18-64 hardcodes that
schedule; there is no multi-device code at all, utils/training.py:11-16).
The TPU-native way to scale RESOLUTION (rather than batch) is GSPMD
spatial partitioning — the segmentation analogue of sequence
parallelism: shard the H axis of the NHWC activations across mesh
devices and let XLA's SPMD partitioner insert the halo exchanges that
3×3 convs, 2×2 pools and stride-2 transpose convs need at shard
boundaries. No model code changes: annotating the *inputs* at the jit
boundary is enough — sharding propagates through the whole UNet, and
every collective rides the ICI.

BatchNorm stays exact under SP for free: batch statistics are means
over (N, H, W), so XLA emits cross-device reductions over the sharded
H axis — the same sync-BN-by-sharding semantics the data axis already
has (models/layers.py docstring, SURVEY.md §5.8 decision).

Two layouts, both over the standard (data, model) mesh (parallel/mesh.py):

- pure SP      — batch replicated, H split across 'data'
                 (`spatial_axis=DATA_AXIS, batch_axis=None`): the
                 high-resolution/low-batch regime, e.g. B=1 at 2048px.
- DP × SP      — batch on 'data', H on 'model'
                 (`spatial_axis=MODEL_AXIS, batch_axis=DATA_AXIS`):
                 medium batch and resolution both too big per chip.

Equivalence with the single-device step (params, BN stats, loss) is
pinned by tests/test_sp.py on an 8-fake-device mesh; the driver's
__graft_entry__.dryrun_multichip runs an SP train-step phase.
"""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from image_segmentation_tpu.parallel.mesh import DATA_AXIS

# Height is dim 1 for both NHWC images and NHW integer label maps.
_SPATIAL_DIM = 1


def spatial_spec(
    ndim: int,
    spatial_axis: str = DATA_AXIS,
    batch_axis: Optional[str] = None,
) -> P:
    """PartitionSpec for one batch array: dim 0 on `batch_axis` (or
    replicated), dim 1 (height) on `spatial_axis`, the rest replicated.
    Arrays without a spatial dim (ndim < 3, e.g. per-image scalars)
    shard only the batch dim."""
    if ndim >= 3:
        return P(batch_axis, spatial_axis)
    if ndim >= 1:
        return P(batch_axis)
    return P()


def spatial_sharding(
    mesh: Mesh,
    ndim: int = 4,
    spatial_axis: str = DATA_AXIS,
    batch_axis: Optional[str] = None,
) -> NamedSharding:
    return NamedSharding(
        mesh, spatial_spec(ndim, spatial_axis, batch_axis)
    )


def max_spatial_shards(height: int, downsample_factor: int = 16) -> int:
    """The SP capability envelope, as an API instead of a surprise.

    The mesh's spatial axis may be at most `height // downsample_factor`
    wide (the model's bottleneck rows): beyond that XLA SPMD's
    padded-shard backward is SILENTLY WRONG (measured 9e-3 gradient
    error, see shard_batch_spatial) and halo exchange degenerates into
    all-gathers. Decision record (round 5): the sub-bottleneck regime is
    PARKED rather than fixed with a manual shard_map halo-exchange
    pipeline, because the envelope only excludes configurations SP
    exists to avoid — for the 5-level UNet (factor 16):

        height   max spatial shards
         128px    8   (a full v5e-8 slice already)
         256px   16
         512px   32
        2048px  128

    i.e. every resolution that NEEDS spatial partitioning on real
    slices (≥512px on ≤32 chips) is inside the envelope; the guard only
    rejects small-image/many-shard layouts where pure DP is strictly
    better anyway (a 128px image fits one chip thousands of times
    over). Callers planning a mesh can clamp with this function; the
    ValueError below remains as the hard backstop. PERFORMANCE.md §SP
    records the measured wrong-gradient repro this parks around."""
    return max(1, height // downsample_factor)


def shard_batch_spatial(
    batch,
    mesh: Mesh,
    spatial_axis: str = DATA_AXIS,
    batch_axis: Optional[str] = None,
    downsample_factor: int = 16,
):
    """device_put every array in the pytree with its height axis on
    `spatial_axis` (and optionally batch on `batch_axis`).

    HARD CONSTRAINT: the model's smallest activation height
    (H / `downsample_factor`; 16 for the 5-level UNet, models/unet.py)
    must be ≥ the spatial axis size. When shards outnumber bottleneck
    rows, XLA SPMD's ragged-shard padding makes the BACKWARD pass
    silently wrong while forward/loss stay correct — measured on an
    8-fake-device mesh: UNet H=64 (bottleneck 4 < 8 shards) gives
    gradients off by up to 9e-3, while H=128 (bottleneck 8) and 2/4-way
    shardings agree with the replicated step to ≤2e-5
    (tests/test_sp.py pins the clean cases). It is also the performance
    cliff: sub-shard-height levels turn halo exchange into all-gathers.
    Pass the model's true factor (e.g. 1 for a conv-only stem) to relax.
    """
    n_shards = mesh.shape[spatial_axis]
    heights = {
        x.shape[_SPATIAL_DIM]
        for x in jax.tree_util.tree_leaves(batch)
        if getattr(x, "ndim", 0) >= 3
    }
    for h in heights:
        if h // downsample_factor < n_shards:
            raise ValueError(
                f"spatial sharding {n_shards}-way needs bottleneck height "
                f"H/{downsample_factor} >= {n_shards}, got H={h}: XLA's "
                "padded-shard backward is silently wrong below that "
                "(see shard_batch_spatial docstring)"
            )

    def put(x):
        s = spatial_sharding(mesh, x.ndim, spatial_axis, batch_axis)
        return jax.device_put(x, s)

    return jax.tree_util.tree_map(put, batch)
