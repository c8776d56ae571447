"""Multi-host (multi-process) data parallelism over DCN.

The reference is a single-process, single-device trainer (reference
utils/training.py:11-16). Scaling past one host on TPU is NOT done by
porting a NCCL/MPI process-group layer — it is the same GSPMD program
as single-host: `jax.distributed.initialize` makes every host see the
full device mesh, each host feeds only its local shard of the global
batch, and under `jit` XLA inserts the gradient reductions (riding ICI
within a slice, DCN across slices). The train step (train/steps.py) is
byte-for-byte the same program in both regimes.

What this module adds is the host-side contract around that program:

- `initialize_multihost(...)` — process-group bring-up (idempotent);
  picks the gloo transport for CPU test clusters so the same code path
  is exercisable without TPU pods.
- `process_local_indices(n, mesh)` — which rows of the global dataset
  THIS process must load. Derived from the batch sharding's device→
  index map restricted to addressable devices, so it is correct for any
  mesh layout, not just the contiguous default.
- `global_batch_from_local(local, mesh, global_batch)` — assemble
  global `jax.Array`s from per-process host shards
  (jax.make_array_from_process_local_data); the result feeds
  make_train_step / make_train_epoch unchanged.
- `assert_same_across_processes(x)` — cheap divergence tripwire for
  loss/metric scalars (an all-gather compare, debugging aid).
- `process_local_batch_columns` / `global_prebatched_from_local` /
  `replicate_result` — the same contract for DISTRIBUTED EVAL: feed the
  (nb, B, ...) pre-batched original-resolution eval layout
  (train/fast_eval.py) by per-process column blocks and read back the
  replicated results.

Tested by tests/test_multihost.py, which spawns REAL separate JAX
processes on a CPU gloo cluster and pins the 2-process × 2-device train
step against the single-process 4-device step on identical data.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from image_segmentation_tpu.parallel.mesh import DATA_AXIS, batch_sharding


def initialize_multihost(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    use_gloo_for_cpu: bool = True,
    **kwargs,
) -> None:
    """Bring up the process group. Idempotent.

    On TPU pods the three arguments usually come from the environment
    and plain `jax.distributed.initialize()` autodetects them; this
    wrapper is for explicit bring-up (tests, bare-metal CPU clusters,
    custom launchers). `use_gloo_for_cpu` selects the gloo transport for
    cross-process CPU collectives — required for CPU test clusters,
    ignored by TPU backends.
    """
    if use_gloo_for_cpu:
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:  # option renamed/absent: TPU-only deployment
            pass
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except RuntimeError as e:
        if "once" in str(e).lower() or "already" in str(e).lower():
            return
        raise


def _check_divisible(n: int, mesh: Mesh) -> None:
    """Batch-sharded global arrays need the leading axis to divide the
    data axis evenly (GSPMD tiling); surface that contract as a clear
    error instead of a deep partitioner failure. Pad or trim the batch
    (data/loader.py pads eval batches the same way) or pick a dividing
    batch size, as run.py's device-count selection does."""
    d = mesh.shape[DATA_AXIS]
    if n % d != 0:
        raise ValueError(
            f"global batch/dataset length {n} does not divide the data "
            f"axis ({d} shards); pad or trim to a multiple of {d}"
        )


def process_local_indices(n: int, mesh: Mesh) -> np.ndarray:
    """Global dataset indices this process must load for a length-`n`
    batch-sharded array on `mesh`.

    Uses the sharding's device→index map restricted to this process's
    addressable devices, so any mesh layout (including non-contiguous
    process placement along 'data') resolves correctly. The result is
    sorted and unique; with the data axis replicated per-process this
    is all of range(n).
    """
    _check_divisible(n, mesh)
    s = batch_sharding(mesh)
    idx_map = s.devices_indices_map((n,))
    mine: set[int] = set()
    for dev, idx in idx_map.items():
        if dev.process_index != jax.process_index():
            continue
        sl = idx[0]
        mine.update(range(*sl.indices(n)))
    return np.array(sorted(mine), dtype=np.int64)


def global_batch_from_local(
    local_batch,
    mesh: Mesh,
    global_batch: int,
    sharding: Optional[NamedSharding] = None,
):
    """Assemble global batch-sharded jax.Arrays from per-process host
    shards.

    `local_batch` is a pytree of numpy/jax arrays holding ONLY the rows
    from `process_local_indices(global_batch, mesh)`, in that order.
    Every process must call this collectively with its own shard; the
    result is a pytree of global arrays that feeds the jitted train step
    exactly like a single-host `shard_batch` result.
    """
    _check_divisible(global_batch, mesh)
    s = sharding if sharding is not None else batch_sharding(mesh)

    def assemble(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            s, x, (global_batch,) + x.shape[1:]
        )

    return jax.tree_util.tree_map(assemble, local_batch)


def replicate_for_processes(tree, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) across a mesh that
    spans processes.

    Single-host `replicate()` (mesh.py) device_puts to a replicated
    sharding, which requires every mesh device to be addressable; across
    processes the same state is instead assembled with
    make_array_from_process_local_data, relying on each process holding
    an IDENTICAL host copy (e.g. init from the same PRNGKey, or a
    restored checkpoint). Collective — call on all processes.
    """
    s = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(s, x, x.shape)

    return jax.tree_util.tree_map(put, tree)


def process_local_batch_columns(batch_size: int, mesh: Mesh) -> np.ndarray:
    """Columns of the (nb, B, ...) pre-batched DISTRIBUTED EVAL layout
    (train/fast_eval.py `get_eval_epoch_prebatched_fn`) this process must
    feed.

    The eval epoch shards its batch axis (axis 1) along 'data'; a process
    owns a contiguous block of columns on its addressable devices and, in
    a real run, decodes/materialises only the dataset rows referenced by
    `idx_mat[:, cols]`. Sorted and unique, same derivation as
    `process_local_indices` but against the (None, 'data') spec.
    """
    _check_divisible(batch_size, mesh)
    s = NamedSharding(mesh, P(None, DATA_AXIS))
    idx_map = s.devices_indices_map((1, batch_size))
    mine: set[int] = set()
    for dev, idx in idx_map.items():
        if dev.process_index != jax.process_index():
            continue
        sl = idx[1]
        mine.update(range(*sl.indices(batch_size)))
    return np.array(sorted(mine), dtype=np.int64)


def global_prebatched_from_local(local, mesh: Mesh, batch_size: int):
    """Assemble global (nb, B, ...) arrays for the distributed eval
    protocol from per-process COLUMN blocks.

    `local` is a pytree of arrays holding, for every batch, only the
    columns from `process_local_batch_columns(batch_size, mesh)`, in that
    order — shape (nb, B_local, ...). Collective; the result feeds
    `fast_eval.get_eval_epoch_prebatched_fn` exactly like the
    single-process `loop._evaluate_device` mesh path.
    """
    _check_divisible(batch_size, mesh)
    s = NamedSharding(mesh, P(None, DATA_AXIS))

    def assemble(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            s, x, (x.shape[0], batch_size) + x.shape[2:]
        )

    return jax.tree_util.tree_map(assemble, local)


@functools.lru_cache(maxsize=8)
def _replicate_fn(mesh: Mesh):
    # cached per mesh: a fresh jax.jit(lambda ...) per call would
    # re-trace and re-compile the gather program on every invocation
    return jax.jit(lambda y: y, out_shardings=NamedSharding(mesh, P()))


def replicate_result(x, mesh: Mesh):
    """All-gather a (possibly sharded) device result to a fully
    replicated array every process can read on the host — e.g. the
    per-image losses the distributed eval returns. Collective."""
    return _replicate_fn(mesh)(x)


def assert_same_across_processes(
    value, mesh: Mesh, atol: float = 0.0, name: str = "value"
) -> None:
    """Debugging tripwire: verify a host scalar (loss, metric) is
    identical on every process. Collective — call on all processes."""
    n = jax.process_count()
    if n == 1:
        return
    dev_per_proc = jax.local_device_count()
    # one row per device, gathered via a tiny jitted allgather program
    local = np.full((dev_per_proc, 1), float(value), np.float32)
    s = NamedSharding(mesh, P(DATA_AXIS))
    g = jax.make_array_from_process_local_data(
        s, local, (n * dev_per_proc, 1)
    )
    gathered = jax.jit(
        lambda x: x * 1.0, out_shardings=NamedSharding(mesh, P())
    )(g)
    vals = np.asarray(gathered).ravel()
    if not np.allclose(vals, vals[0], atol=atol, rtol=0):
        raise AssertionError(
            f"{name} diverged across processes: {vals.tolist()}"
        )
