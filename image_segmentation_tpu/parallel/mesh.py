"""Device mesh + sharding helpers.

The reference is single-device (reference utils/training.py:11-16); its
only batch-scaling mechanism is gradient accumulation. The TPU-native
equivalent (SURVEY.md §2.3, §5.8) is data parallelism over the ICI: a
1-D (or 2-D data×model) `jax.sharding.Mesh`, batches sharded along
'data' with NamedSharding, parameters replicated. Under `jit` XLA then
inserts the gradient `psum`s automatically — there is no hand-written
collective in the train step.

The 'model' axis is available for tensor-parallel sharding of the CLIP
ViT (attention heads / MLP features) at larger scales; at the reference
model sizes (≤86M params) it defaults to size 1.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(**kwargs) -> None:
    """Multi-host initialisation (jax.distributed) for multi-slice / DCN
    deployments. No-op when already initialised or single-host. Call
    before any other JAX API on each host; afterwards jax.devices()
    spans the full job and get_mesh() lays the data axis across hosts
    (batch shards ride ICI within a slice, DCN across slices)."""
    import jax

    try:
        jax.distributed.initialize(**kwargs)
    except ValueError as e:
        # single-host: no coordinator address to be discovered
        if "coordinator" in str(e).lower():
            return
        raise
    except RuntimeError as e:
        # re-initialisation ("should only be called once")
        if "once" in str(e).lower() or "already" in str(e).lower():
            return
        raise


def get_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallel: int = 1,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    With `model_parallel=1` this is pure data parallelism: every chip in
    a v5e-8 slice holds a batch shard and full replicated params.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(
            f"{n} devices not divisible by model_parallel={model_parallel}"
        )
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across 'data', replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """device_put every array in the pytree with its batch axis on 'data'."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (parameters / optimizer state) across the mesh."""
    s = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
