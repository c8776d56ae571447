"""Multi-host training loop: fit() semantics over a real process group.

`train.loop.fit` is single-controller by design (host-side uploads and
write-behind checkpoint fetches assume fully-addressable arrays) and
refuses to run under `jax.process_count() > 1`. This module is the
multi-process counterpart: the SAME jitted train step and the SAME
distributed original-resolution eval program run over a global mesh,
with the host-side contract from parallel/multihost.py around them —

  * identical state init/replication on every process
    (`replicate_for_processes`),
  * one shared-seed shuffle per epoch, so the batch schedule is
    bit-identical to single-process fit() on the same data and seed
    (each process holds the full materialized dataset on host — the
    honest cost of exact global shuffling; device memory and compute
    are what shard, each process feeding only its devices' rows via
    `global_batch_from_local`),
  * distributed eval: the pre-batched original-resolution protocol
    (train/fast_eval.py) fed by per-process column blocks, results
    all-gathered so every process sees identical metrics,
  * best-val-mIoU checkpointing from process 0 only (synchronous
    save_checkpoint — the write-behind machinery is single-controller),
    with the weights-only `MO_` copy and the per-epoch metrics file the
    reference pipeline writes (reference utils/training.py:453-618).

Pinned by tests/test_multihost.py: a 2-process gloo CPU cluster runs
fit_multihost and the parent compares its full history against
single-process fit() with the same seed on the same data.

The reference has no distributed anything (utils/training.py:11-16);
this is the TPU-native scale-out of its `start(...)` pipeline.
"""
from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from image_segmentation_tpu.data.loader import MaterializedDataset
from image_segmentation_tpu.metrics import MetricsHistory
from image_segmentation_tpu.ops import geometry as G
from image_segmentation_tpu.parallel.mesh import get_mesh
from image_segmentation_tpu.parallel.multihost import (
    global_batch_from_local,
    global_prebatched_from_local,
    process_local_batch_columns,
    process_local_indices,
    replicate_for_processes,
    replicate_result,
)
from image_segmentation_tpu.train import checkpoint as ckpt
from image_segmentation_tpu.train import fast_eval
from image_segmentation_tpu.train.loop import (
    FitResult,
    _history_new,
    _save_history,
)
from image_segmentation_tpu.train.steps import make_train_step


def _evaluate_multihost(state, val_data: MaterializedDataset, mesh, *,
                        loss_cfg, num_classes: int, agg: MetricsHistory,
                        batch_size: int, cache: dict, verbose: bool):
    """Distributed original-resolution eval across the process group.

    Same math as loop._evaluate_device's mesh path; the difference is
    purely host-side: arrays are assembled from per-process column
    blocks (make_array_from_process_local_data) instead of device_put,
    because device_put cannot target non-addressable devices. The
    uploaded epoch layout is cached across epochs like the
    single-controller path."""
    if val_data.label_canvases is None:
        val_data.label_canvases = fast_eval.pack_label_canvases(
            val_data.orig_labels
        )
    canvases = val_data.label_canvases
    agg.reset()
    n = len(val_data)
    n_data = int(dict(mesh.shape).get("data", 1))
    # same safety valves as loop._evaluate_device: shrink the eval batch
    # when the (B, Hc, Wc, C+1) inverse buffer would blow the per-device
    # 2^31 limit (budget scales with the data axis), keeping B a multiple
    # of it
    hc, wc = canvases.shape[1:]
    batch_bytes = lambda b: b * hc * wc * (num_classes + 1) * 4
    k = max(1, batch_size // n_data)
    while k > 1 and batch_bytes(k * n_data) > 2**31 * n_data:
        k //= 2
    batch_size = k * n_data
    nb = -(-n // batch_size)
    idx_mat = np.minimum(
        np.arange(nb * batch_size).reshape(nb, batch_size), n - 1
    ).astype(np.int32)
    real_mat = np.arange(nb * batch_size).reshape(nb, batch_size) < n
    cols = process_local_batch_columns(batch_size, mesh)
    # each process materialises ONLY its column block — index with
    # idx_mat[:, cols] so no process ever builds the global layout
    loc = lambda a: np.asarray(a)[idx_mat[:, cols]]

    cache_mb = float(os.environ.get("ISTPU_EVAL_DEVICE_CACHE_MB", "4096"))
    total_bytes = (
        val_data.images.nbytes + canvases.nbytes
        + (val_data.heatmaps.nbytes if val_data.has_heatmaps else 0)
    )
    if total_bytes <= cache_mb * 2**20:
        key = (tuple(sorted(dict(mesh.shape).items())), batch_size)
        if cache.get("key") != key:
            b_inputs = (global_prebatched_from_local(loc(val_data.images),
                                                     mesh, batch_size),)
            if val_data.has_heatmaps:
                b_inputs += (global_prebatched_from_local(
                    loc(val_data.heatmaps), mesh, batch_size),)
            cache.update(key=key, payload=(
                b_inputs,
                G.ResizeMeta(*(global_prebatched_from_local(loc(f), mesh,
                                                            batch_size)
                               for f in val_data.metas)),
                global_prebatched_from_local(loc(canvases), mesh,
                                             batch_size),
                global_prebatched_from_local(real_mat[:, cols], mesh,
                                             batch_size),
            ))
        b_inputs, b_metas, b_canv, b_real = cache["payload"]
        eval_epoch = fast_eval.get_eval_epoch_prebatched_fn(
            canvases.shape[1:], num_classes, loss_cfg
        )
        with mesh:
            conf, losses = eval_epoch(state, b_inputs, b_metas, b_canv,
                                      b_real)
        losses = np.asarray(replicate_result(losses, mesh)).reshape(-1)
    else:
        # oversized val set: stream per batch, assembling each batch's
        # column block on the fly — only one batch is ever resident
        from jax.sharding import NamedSharding, PartitionSpec as P

        row_sh = NamedSharding(mesh, P("data"))
        eval_batch = fast_eval.get_eval_batch_fn(
            canvases.shape[1:], num_classes, loss_cfg
        )
        put = lambda x: jax.make_array_from_process_local_data(
            row_sh, np.asarray(x), (batch_size,) + np.asarray(x).shape[1:]
        )
        conf = jnp.zeros((num_classes, num_classes), jnp.int32)
        parts = []
        for b in range(nb):
            rows = idx_mat[b][cols]
            inputs = (put(val_data.images[rows]),)
            if val_data.has_heatmaps:
                inputs += (put(val_data.heatmaps[rows]),)
            metas = G.ResizeMeta(*(put(np.asarray(f)[rows])
                                   for f in val_data.metas))
            with mesh:
                bconf, blosses = eval_batch(
                    state, inputs, metas, put(canvases[rows]),
                    put(real_mat[b][cols]),
                )
            conf = conf + bconf
            parts.append(np.asarray(replicate_result(blosses, mesh)))
        losses = np.concatenate(parts)
    conf = np.asarray(replicate_result(conf, mesh))
    agg.accumulate_confusion(conf)
    dice, iou, acc = agg.compute_epoch_metrics()
    flat_real = real_mat.reshape(-1)
    val_loss = (float(losses.reshape(-1)[flat_real].mean())
                if loss_cfg is not None else float("nan"))
    if verbose and jax.process_index() == 0:
        per_iou = agg.get_last_per_class_iou()
        print(f"  val: loss={val_loss:.4f} acc={acc:.4f} dice={dice:.4f} "
              f"miou={iou:.4f} per-class IoU={np.round(per_iou, 4).tolist()}")
    return {"loss": val_loss, "dice": dice, "iou": iou, "acc": acc,
            "per_class_iou": np.asarray(agg.get_last_per_class_iou())}


def fit_multihost(
    state,
    train_data: MaterializedDataset,
    val_data: MaterializedDataset,
    *,
    loss_fn: Callable,
    epochs: int,
    batch_size: int,
    accum_steps: int = 1,
    save_dir: str,
    name: str,
    num_classes: int = 4,
    eval_ignore_index: Optional[int] = 3,
    eval_batch_size: Optional[int] = None,
    eval_loss_cfg=None,
    seed: int = 0,
    notes: str = "",
    verbose: bool = True,
    save_weights_only_copy: bool = True,
    resume: bool = False,
    augment_fn=None,
    metrics_logger=None,
    checkpoint_every: int = 1,
) -> FitResult:
    """Train with per-epoch distributed validation and best-val-mIoU
    checkpointing across a multi-process mesh.

    Every process calls this collectively with IDENTICAL arguments and
    identically-materialized data (same files / same synthetic seed);
    the batch schedule and results match single-process
    `fit(..., mesh=...)` with the same seed. The global `batch_size`
    must divide the mesh's 'data' axis.

    `resume=True` restores the '_last' preemption checkpoint (falling
    back to the best one), exactly like fit(): every process reads the
    shared checkpoint, the epoch counter / best metrics / history carry
    on, and the shuffle rng restarts from `seed + start_epoch` — so a
    preempted-and-resumed run follows fit()'s resumed schedule."""
    mesh = get_mesh()  # all global devices on 'data'
    proc0 = jax.process_index() == 0

    if proc0:
        os.makedirs(save_dir, exist_ok=True)
    ckpt_path = os.path.join(save_dir, name)
    last_path = os.path.join(save_dir, name + "_last")
    weights_path = os.path.join(save_dir, "MO_" + name)

    history = _history_new()
    best = {"dice": -1.0, "miou": -1.0, "loss": float("inf")}
    start_epoch = 0
    if resume:
        source = last_path if os.path.isdir(last_path) else ckpt_path
        if os.path.isdir(source):
            # every process restores the same host arrays from the shared
            # checkpoint (collective-safe: all enter orbax's restore)
            state, meta = ckpt.restore_checkpoint(source, state)
            start_epoch = int(meta.get("epoch", 0)) + 1
            best.update(meta.get("best", {}))
            saved_hist = meta.get("history", {})
            for k in history:
                if k in saved_hist:
                    history[k] = list(saved_hist[k])
            if verbose and proc0:
                print(f"Resumed {name} from {os.path.basename(source)} at "
                      f"epoch {start_epoch} (best miou {best['miou']:.4f})")

    state = replicate_for_processes(state, mesh)

    has_aux = train_data.has_heatmaps
    if augment_fn is not None and has_aux:
        raise ValueError(
            "augment_fn is not supported for prompt (heatmap) datasets; "
            "generate augmented prompt triplets offline instead (same "
            "contract as fit())"
        )
    # On-device augmentation keys are split PER SAMPLE
    # (ops/augment.random_augment_batch), so applying the jitted augment
    # to the sharded global batch is sharding-invariant: identical
    # results to single-process fit()'s eager per-batch call with the
    # same key sequence (pinned by tests/test_multihost.py).
    aug_jit = jax.jit(augment_fn) if augment_fn is not None else None
    step = make_train_step(loss_fn, accum_steps=accum_steps,
                           has_aux_input=has_aux)
    mine = process_local_indices(batch_size, mesh)

    agg = MetricsHistory(num_classes, ignore_index=eval_ignore_index)
    eval_cache: dict = {}
    rng = np.random.default_rng(seed + start_epoch)
    import time as _time

    for epoch in range(start_epoch, epochs):
        t0 = _time.time()
        if verbose and proc0:
            print(f"Epoch {epoch + 1}/{epochs} [{name}] "
                  f"({jax.process_count()} processes)")
        n = len(train_data)
        nsteps = n // batch_size
        if nsteps == 0:
            raise ValueError(
                f"dataset size {n} < global batch_size {batch_size}"
            )
        # same shuffle contract as fit(): permutation, drop_last
        order = rng.permutation(n)[: nsteps * batch_size]
        idx_mat = order.reshape(nsteps, batch_size)
        # same augmentation key schedule as fit()
        aug_key = jax.random.PRNGKey(seed * 100003 + epoch)
        losses = []
        for b in range(nsteps):
            rows = idx_mat[b][mine]  # this process's device rows only
            local = (train_data.images[rows],)
            if has_aux:
                local += (train_data.heatmaps[rows],)
            local += (train_data.labels[rows],)
            batch = global_batch_from_local(local, mesh, batch_size)
            with mesh:
                if aug_jit is not None:
                    aug_key, k = jax.random.split(aug_key)
                    batch = aug_jit(batch[0], batch[1], k)
                state, loss = step(state, batch)
            losses.append(loss)
        train_loss = float(np.mean([float(l) for l in losses]))
        if verbose and proc0:
            print(f"  train: loss={train_loss:.4f}")

        val = _evaluate_multihost(
            state, val_data, mesh, loss_cfg=eval_loss_cfg,
            num_classes=num_classes, agg=agg,
            batch_size=eval_batch_size or batch_size,
            cache=eval_cache, verbose=verbose,
        )

        history["train_loss"].append(train_loss)
        history["val_loss"].append(val["loss"])
        history["val_dice"].append(val["dice"])
        history["val_iou"].append(val["iou"])
        history["val_acc"].append(val["acc"])
        history["val_per_class_iou"].append(val["per_class_iou"])
        history["epoch_time_s"].append(_time.time() - t0)
        if proc0:
            _save_history(save_dir, name, history)
            if metrics_logger is not None:
                metrics_logger.log(epoch + 1, {
                    "train/loss": train_loss,
                    "val/loss": val["loss"],
                    "val/dice": val["dice"],
                    "val/miou": val["iou"],
                    "val/acc": val["acc"],
                    "val/per_class_iou": val["per_class_iou"],
                    "time/epoch_s": history["epoch_time_s"][-1],
                })

        improved = (val["loss"] < best["loss"] if np.isnan(val["iou"])
                    else val["iou"] > best["miou"])
        if improved:
            best = {"dice": val["dice"], "miou": val["iou"],
                    "loss": val["loss"]}
        # metrics are replicated, so `improved` agrees on every process.
        # Saves are COLLECTIVE: orbax's save carries an internal
        # cross-process barrier, so skipping it on any process deadlocks
        # the group — every process enters, the primary host writes
        # (shared checkpoint filesystem, the standard pod setup), and
        # np.asarray on the fully replicated state is valid everywhere.
        # Synchronous (not write-behind): the async machinery is
        # single-controller. On improved epochs the '_last' preemption
        # point is a proc-0 FILE COPY of the just-written best directory
        # (fit() shares one device fetch via extra_paths the same way) —
        # never a second device fetch.
        last_due = (
            (epoch + 1) % max(1, checkpoint_every) == 0
            or epoch == epochs - 1
        )
        if improved:
            ckpt.save_checkpoint(ckpt_path, state, epoch=epoch, best=best,
                                 history=history, notes=notes)
            if save_weights_only_copy:
                ckpt.save_params_only(weights_path, state.params,
                                      state.batch_stats)
            if proc0:
                import shutil

                shutil.rmtree(last_path, ignore_errors=True)
                shutil.copytree(ckpt_path, last_path)
            if verbose and proc0:
                print(f"  saved checkpoint (new best miou {val['iou']:.4f})")
        elif last_due:
            ckpt.save_checkpoint(last_path, state, epoch=epoch, best=best,
                                 history=history, notes=notes)

    return FitResult(state=state, history=history, best=best)
