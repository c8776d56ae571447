"""Training orchestration: the TPU-native `start(...)` pipeline.

Mirrors the reference engine (utils/training.py):
  * train epoch = shuffled fixed-shape batches through ONE jitted,
    donated step (grad accumulation inside, §steps);
  * eval epoch = the original-resolution protocol: fixed-size logits on
    device, inverse geometry + per-image loss + confusion accumulation
    on host in float64 (utils/training.py:67-121);
  * per-epoch metrics-history file; checkpoint on best val mIoU with a
    weights-only copy; tolerant resume (utils/training.py:453-618).

`fit` covers segmentation and prompt training (reference start /
start_prompt — the prompt path differs only by the aux heatmap input and
a probability-emitting model); `fit_reconstruction` covers the
autoencoder stage-1 loop (autoencoder.ipynb cell 0: MSE, best-val-loss
checkpointing).
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np

from image_segmentation_tpu.data.loader import (
    MaterializedDataset,
    eval_batches,
    train_batches,
)
from image_segmentation_tpu.metrics import MetricsHistory
from image_segmentation_tpu.ops import geometry as G
from image_segmentation_tpu.parallel.mesh import replicate, shard_batch
from image_segmentation_tpu.train import checkpoint as ckpt
from image_segmentation_tpu.train.steps import make_eval_forward, make_train_step


@dataclasses.dataclass
class FitResult:
    state: Any
    history: Dict[str, list]
    best: Dict[str, float]


_EVAL_FORWARD = None


def _default_eval_forward():
    global _EVAL_FORWARD
    if _EVAL_FORWARD is None:
        _EVAL_FORWARD = make_eval_forward()
    return _EVAL_FORWARD


def _history_new() -> Dict[str, list]:
    return {
        "train_loss": [],
        "val_loss": [],
        "val_dice": [],
        "val_iou": [],
        "val_acc": [],
        "val_per_class_iou": [],
        "epoch_time_s": [],
    }


def _save_history(save_dir: str, name: str, history: Dict[str, list]):
    """Per-epoch metrics file (reference utils/training.py:557-562)."""
    os.makedirs(os.path.join(save_dir, "metrics"), exist_ok=True)
    payload = {
        k: [np.asarray(v) for v in vs] if k == "val_per_class_iou" else list(vs)
        for k, vs in history.items()
    }
    with open(os.path.join(save_dir, "metrics", name + ".msgpack"), "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))


def _evaluate_device(
    state,
    val_data: MaterializedDataset,
    *,
    loss_cfg,
    num_classes: int,
    agg: MetricsHistory,
    batch_size: int = 8,
    verbose: bool = True,
    mesh=None,
):
    """Device-protocol original-resolution eval (see train/fast_eval.py).

    When the val set fits the HBM budget (ISTPU_EVAL_DEVICE_CACHE_MB,
    default 4096) it is uploaded to the device ONCE — it is static across
    epochs — and every epoch is a single jitted dispatch (a lax.scan over
    batches); only a (C, C) confusion and the per-image losses come back.
    Larger sets fall back to per-batch streaming, still fetching only
    (C, C) + (B,) per batch.

    Under a `mesh` with a non-trivial 'data' axis the protocol runs
    DISTRIBUTED: the epoch is laid out pre-batched as (nb, B, ...) with
    batch rows sharded along 'data' (each device stores and evaluates
    B/n_data images per step); the state must already be mesh-placed
    (fit() replicates it). Results are bit-identical to the single-device
    path — the confusion counts are integers and each per-image loss is
    computed by one device (tests/test_fast_eval.py pins this on 8 fake
    devices). The reference protocol is single-device only
    (reference utils/training.py:67-121)."""
    from image_segmentation_tpu.train import fast_eval

    agg.reset()
    n_data = 1 if mesh is None else int(dict(mesh.shape).get("data", 1))
    if n_data > 1 or len(val_data) < 16:
        # sharded runs keep the single dataset-max canvas (the
        # pre-batched distributed layout is one upload); tiny sets
        # aren't worth extra compiles
        buckets = None
    else:
        if val_data.bucket_views is None:
            plan = fast_eval.plan_size_buckets(val_data.orig_labels)
            if len(plan) == 1:
                val_data.bucket_views = []
            else:
                val_data.bucket_views = [
                    dataclasses.replace(
                        val_data,
                        images=val_data.images[idx],
                        labels=val_data.labels[idx],
                        metas=G.ResizeMeta(
                            *(np.asarray(f)[idx] for f in val_data.metas)
                        ),
                        heatmaps=(val_data.heatmaps[idx]
                                  if val_data.has_heatmaps else None),
                        orig_labels=[val_data.orig_labels[i] for i in idx],
                        label_canvases=None,
                        device_eval_cache=None,
                        device_train_cache=None,
                        bucket_views=None,
                    )
                    for idx in plan
                ]
        buckets = val_data.bucket_views or None

    if buckets is not None:
        if verbose:
            sizes = [len(b) for b in buckets]
            print(f"  val: {len(buckets)} canvas buckets {sizes}")
        conf_total, losses_all = None, []
        for view in buckets:
            conf, losses = _eval_one_canvas(
                state, view, loss_cfg=loss_cfg, num_classes=num_classes,
                batch_size=batch_size, mesh=mesh,
            )
            conf_total = conf if conf_total is None else conf_total + conf
            losses_all.extend(losses)
    else:
        conf_total, losses_all = _eval_one_canvas(
            state, val_data, loss_cfg=loss_cfg, num_classes=num_classes,
            batch_size=batch_size, mesh=mesh,
        )
    agg.accumulate_confusion(conf_total)
    dice, iou, acc = agg.compute_epoch_metrics()
    val_loss = float(np.mean(losses_all)) if losses_all else float("nan")
    if verbose:
        per_iou = agg.get_last_per_class_iou()
        print(
            f"  val: loss={val_loss:.4f} acc={acc:.4f} dice={dice:.4f} "
            f"miou={iou:.4f} per-class IoU={np.round(per_iou, 4).tolist()}"
        )
    return {
        "loss": val_loss,
        "dice": dice,
        "iou": iou,
        "acc": acc,
        "per_class_iou": np.asarray(agg.get_last_per_class_iou()),
    }


def _eval_one_canvas(
    state,
    val_data: MaterializedDataset,
    *,
    loss_cfg,
    num_classes: int,
    batch_size: int,
    mesh=None,
):
    """The device eval protocol over ONE packed canvas (the whole set, or
    one size bucket). Returns (confusion (C, C) int64, losses list)."""
    from image_segmentation_tpu.train import fast_eval

    if val_data.label_canvases is None:
        val_data.label_canvases = fast_eval.pack_label_canvases(
            val_data.orig_labels
        )
    canvases = val_data.label_canvases
    n = len(val_data)
    n_data = 1 if mesh is None else int(dict(mesh.shape).get("data", 1))
    sharded = n_data > 1
    # Padded batch-index matrix (nb, B): tail batch repeats its last real
    # index; `real` masks the repeats out of the counts.
    # Auto-shrink the eval batch when the canvases are huge: the jitted
    # evaluator materialises a (B, Hc, Wc, C+1) float32 inverse per batch,
    # and one outlier-large validation image sets Hc x Wc for everyone.
    # Under a mesh the per-batch budget scales with the data axis (the
    # inverse canvases are sharded over it) and B stays a multiple of it.
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
    counts = real_mat.sum(axis=1)

    cache_mb = float(os.environ.get("ISTPU_EVAL_DEVICE_CACHE_MB", "4096"))
    total_bytes = (
        val_data.images.nbytes + canvases.nbytes
        + (val_data.heatmaps.nbytes if val_data.has_heatmaps else 0)
    )
    results = []
    if total_bytes <= cache_mb * 2**20 and not sharded:
        cache_key = ("flat",)
        if (val_data.device_eval_cache is None
                or val_data.device_eval_cache[0] != cache_key):
            dev_inputs = (jnp.asarray(val_data.images),)
            if val_data.has_heatmaps:
                dev_inputs += (jnp.asarray(val_data.heatmaps),)
            val_data.device_eval_cache = (cache_key, (
                dev_inputs,
                G.ResizeMeta(*(jnp.asarray(np.asarray(f))
                               for f in val_data.metas)),
                jnp.asarray(canvases),
            ))
        dev_inputs, dev_metas, dev_canvases = val_data.device_eval_cache[1]
        eval_epoch = fast_eval.get_eval_epoch_fn(
            canvases.shape[1:], num_classes, loss_cfg
        )
        conf, losses = eval_epoch(
            state, dev_inputs, dev_metas, dev_canvases,
            jnp.asarray(idx_mat), jnp.asarray(real_mat),
        )
        losses = np.asarray(losses)
        results = [
            (np.asarray(conf) if b == 0 else np.zeros_like(np.asarray(conf)),
             losses[b], int(counts[b]))
            for b in range(nb)
        ]
    elif total_bytes <= cache_mb * 2**20 and sharded:
        # Distributed eval: pre-batched (nb, B, ...) layout, batch rows
        # sharded along 'data'. The epoch order is static (sequential
        # indices), so the layout is built once on the host and cached
        # per (mesh layout, batch size); re-evaluations each epoch reuse
        # the upload like the flat path does.
        from jax.sharding import NamedSharding, PartitionSpec as P

        cache_key = ("sharded", tuple(sorted(dict(mesh.shape).items())),
                     batch_size)
        if (val_data.device_eval_cache is None
                or val_data.device_eval_cache[0] != cache_key):
            row_sh = NamedSharding(mesh, P(None, "data"))

            def _put(x):
                return jax.device_put(np.asarray(x)[idx_mat], row_sh)

            b_inputs = (_put(val_data.images),)
            if val_data.has_heatmaps:
                b_inputs += (_put(val_data.heatmaps),)
            val_data.device_eval_cache = (cache_key, (
                b_inputs,
                G.ResizeMeta(*(_put(f) for f in val_data.metas)),
                _put(canvases),
                jax.device_put(real_mat, row_sh),
            ))
        b_inputs, b_metas, b_canvases, b_real = val_data.device_eval_cache[1]
        eval_epoch = fast_eval.get_eval_epoch_prebatched_fn(
            canvases.shape[1:], num_classes, loss_cfg
        )
        conf, losses = eval_epoch(state, b_inputs, b_metas, b_canvases, b_real)
        losses = np.asarray(losses)
        results = [
            (np.asarray(conf) if b == 0 else np.zeros_like(np.asarray(conf)),
             losses[b], int(counts[b]))
            for b in range(nb)
        ]
    else:
        eval_batch = fast_eval.get_eval_batch_fn(
            canvases.shape[1:], num_classes, loss_cfg
        )
        if sharded:
            from jax.sharding import NamedSharding, PartitionSpec as P

            row_sh = NamedSharding(mesh, P("data"))
            _stage = lambda x: jax.device_put(jnp.asarray(x), row_sh)
        else:
            _stage = jax.numpy.asarray
        for b in range(nb):
            ii = idx_mat[b]
            inputs = (val_data.images[ii],)
            if val_data.has_heatmaps:
                inputs = (val_data.images[ii], val_data.heatmaps[ii])
            metas = G.ResizeMeta(*(np.asarray(f)[ii] for f in val_data.metas))
            if sharded:
                metas = G.ResizeMeta(*(_stage(f) for f in metas))
            conf, losses = eval_batch(
                state,
                tuple(_stage(x) for x in inputs),
                metas,
                _stage(canvases[ii]),
                _stage(real_mat[b]),
            )
            results.append((conf, losses, int(counts[b])))
    conf_total = np.zeros((num_classes, num_classes), np.int64)
    losses_all = []
    for conf, losses, count in results:
        conf_total += np.asarray(conf).astype(np.int64)
        if loss_cfg is not None:
            losses_all.extend(np.asarray(losses)[:count].tolist())
    return conf_total, losses_all


def evaluate(
    state,
    val_data: MaterializedDataset,
    *,
    host_loss_fn: Optional[Callable] = None,
    num_classes: int = 4,
    eval_ignore_index: Optional[int] = 3,
    batch_size: int = 8,
    forward=None,
    agg: Optional[MetricsHistory] = None,
    verbose: bool = True,
    protocol: str = "auto",
    loss_cfg=None,
    mesh=None,
):
    """Original-resolution evaluation (reference utils/training.py:67-121).

    Two implementations of the same protocol:
      * 'device' — inverse geometry, argmax, masked loss and confusion all
        on device with static canvas shapes (train/fast_eval.py); only a
        (C, C) matrix + (B,) losses cross the link per batch. Needs
        `loss_cfg` (a frozen loss dataclass) for the val loss. With a
        `mesh` (data axis > 1) the protocol runs distributed: images
        sharded over 'data', per-device confusion psum'd by GSPMD —
        results identical to single-device.
      * 'host' — device forward, float64 host inverse + loss + confusion
        per image. The exactness reference; slow (per-image score
        transfer); ignores `mesh`.
    'auto' picks 'device' when a `loss_cfg` is given (or no loss is
    wanted), else 'host'. Tests pin the two protocols to each other.
    """
    assert val_data.orig_labels is not None, (
        "materialize val data with keep_orig_labels=True"
    )
    if protocol == "auto":
        protocol = "device" if (loss_cfg is not None or host_loss_fn is None) \
            else "host"
    if agg is None:
        agg = MetricsHistory(num_classes, ignore_index=eval_ignore_index)
    if protocol == "device":
        if loss_cfg is None and host_loss_fn is not None:
            raise ValueError(
                "protocol='device' computes the val loss from `loss_cfg` (a "
                "frozen loss dataclass, e.g. DiceCELoss(...)); the supplied "
                "host_loss_fn callable is only usable by protocol='host'. "
                "Pass loss_cfg=, or protocol='host'."
            )
        return _evaluate_device(
            state, val_data, loss_cfg=loss_cfg, num_classes=num_classes,
            batch_size=batch_size, agg=agg, verbose=verbose, mesh=mesh,
        )
    if forward is None:
        # module-level singleton: jit caches per (apply_fn, shapes), so one
        # shared forward avoids recompiling on every evaluate() call
        forward = _default_eval_forward()
    agg.reset()  # (the reference prompt eval forgot this — SURVEY C26 quirk)

    losses = []
    from concurrent.futures import ThreadPoolExecutor

    def _one_image(out_i, meta, label):
        inv = G.invert_resize_padding_np(out_i, meta, method="linear")
        loss = host_loss_fn(inv, label) if host_loss_fn is not None else None
        pred = inv.argmax(axis=-1)
        idx = label.astype(np.int64) * agg.num_classes + pred.astype(np.int64)
        conf = np.bincount(
            idx.reshape(-1), minlength=agg.num_classes**2
        ).reshape(agg.num_classes, agg.num_classes)
        return loss, conf

    def _host_side(out, metas, origs, count):
        # per-image inverse geometry / loss / confusion in a small thread
        # pool (the native resampler and big numpy ops release the GIL);
        # the float64 accumulation stays in this thread.
        metas_list = G.metas_to_list(metas)
        results = pool.map(
            _one_image,
            (out[i] for i in range(count)),
            metas_list[:count],
            (origs[i] for i in range(count)),
        )
        for loss, conf in results:
            if loss is not None:
                losses.append(loss)
            agg.accumulate_confusion(conf)

    # Pipeline: dispatch batch k+1's device forward before fetching batch
    # k's scores, so device compute + host↔device transfer overlap the
    # host-side inverse geometry / metric work. The with-block shuts the
    # pool down on every exit path (a host_loss_fn error previously
    # leaked the workers).
    with ThreadPoolExecutor(max_workers=4) as pool:
        pending = None
        for inputs, _, metas, origs, count in eval_batches(val_data, batch_size):
            out_dev = forward(state, *(jax.numpy.asarray(x) for x in inputs))
            if pending is not None:
                p_out, p_metas, p_origs, p_count = pending
                _host_side(np.asarray(p_out), p_metas, p_origs, p_count)
            pending = (out_dev, metas, origs, count)
        if pending is not None:
            p_out, p_metas, p_origs, p_count = pending
            _host_side(np.asarray(p_out), p_metas, p_origs, p_count)
    dice, iou, acc = agg.compute_epoch_metrics()
    val_loss = float(np.mean(losses)) if losses else float("nan")
    if verbose:
        per_iou = agg.get_last_per_class_iou()
        print(
            f"  val: loss={val_loss:.4f} acc={acc:.4f} dice={dice:.4f} "
            f"miou={iou:.4f} per-class IoU={np.round(per_iou, 4).tolist()}"
        )
    return {
        "loss": val_loss,
        "dice": dice,
        "iou": iou,
        "acc": acc,
        "per_class_iou": np.asarray(agg.get_last_per_class_iou()),
    }


def _quantize_u8(a: np.ndarray) -> np.ndarray:
    """[0,1] float array → 0..255 uint8 (round-to-nearest). Quantisation
    error ≤ 1/510 per pixel — the same 8-bit granularity the reference's
    on-disk images and heatmaps had before their /255 load-time scaling
    (reference utils/dataset.py:39,90).

    Slab-wise with in-place ops: the naive `clip(rint(a*255))` chain
    materialises three full-size float temporaries — ~3× the dataset
    again in host RAM and minutes of single-thread memory churn at
    real-data scale (measured 266 s for an 8 GB dataset on a 1-core
    host; this path does the same math in one bounded scratch buffer)."""
    a = np.asarray(a)
    if a.dtype == np.uint8:
        return a
    out = np.empty(a.shape, np.uint8)
    flat_in = a.reshape(-1)
    flat_out = out.reshape(-1)
    step = 1 << 24  # 64 MB f32 scratch
    buf = np.empty(min(step, flat_in.size), np.float32)
    for i in range(0, flat_in.size, step):
        j = min(i + step, flat_in.size)
        b = buf[: j - i]
        np.multiply(flat_in[i:j], 255.0, out=b)
        np.rint(b, out=b)
        np.clip(b, 0.0, 255.0, out=b)
        flat_out[i:j] = b
    return out


def _labels_u8(labels: np.ndarray) -> np.ndarray:
    """Class-id labels → uint8 (ids are 0..C-1, or ≤255 sentinels)."""
    labels = np.asarray(labels)
    if labels.min() < 0 or labels.max() > 255:
        raise ValueError(
            f"labels outside uint8 range [{labels.min()}, {labels.max()}]"
        )
    return labels.astype(np.uint8)


def _resident_plan(resident_dtype: str, f32_bytes: int, budget: int):
    """Pick the HBM residency mode for the epoch trainer.

    Returns (use_device_epoch, quantize): 'auto' keeps bit-exact float32
    residency when it fits, drops to uint8 (4× capacity — e.g. ~20k
    256px images inside the 4 GB default; capacity table in
    PERFORMANCE.md) when only that fits, and streams otherwise."""
    if resident_dtype == "float32":
        return f32_bytes <= budget, False
    if resident_dtype == "uint8":
        return f32_bytes // 4 <= budget, True
    if resident_dtype != "auto":
        raise ValueError(f"resident_dtype {resident_dtype!r} not in "
                         "('auto', 'float32', 'uint8')")
    if f32_bytes <= budget:
        return True, False
    return f32_bytes // 4 <= budget, True


def _stream_batches(batch_iter, put, lookahead: int = 2):
    """Double-buffered streaming: issue the host→device transfer for the
    next `lookahead` batches before yielding the current one, so uploads
    overlap the (donated, async-dispatched) train step instead of
    serialising with it. Matters most over slow device links, where the
    per-batch path was measured 10× slower than HBM residency."""
    from collections import deque

    pending = deque()
    for b in batch_iter:
        pending.append(put(b))
        if len(pending) > lookahead:
            yield pending.popleft()
    while pending:
        yield pending.popleft()


def _get_device_train_cache(train_data, kind, arrays, mesh):
    """Device-resident upload for the whole-epoch trainer, memoised on
    the dataset. `kind` tags the payload contract ('seg' images+labels,
    'aux' images+heatmaps+labels, 'recon' (x, x)) plus the residency
    dtype plus the mesh layout — a dataset pre-trained with
    fit_reconstruction and then segmented with fit() must NOT silently
    reuse the reconstruction cache, nor a float32 run a uint8 upload."""
    dtypes = tuple(str(np.asarray(a).dtype) for a in arrays)
    key = (kind, dtypes,
           None if mesh is None else tuple(sorted(mesh.shape.items())))
    cached = train_data.device_train_cache
    if cached is not None and cached[0] == key:
        return cached[1]
    dev = _upload_train_arrays(arrays, mesh)
    train_data.device_train_cache = (key, dev)
    return dev


def _upload_train_arrays(arrays, mesh):
    """Replicated on a single chip; sharded along 'data' (padded to the
    axis size) under a mesh. Duplicate entries in `arrays` (e.g.
    reconstruction's (x, x)) share one buffer."""
    uploaded = {}

    if mesh is None:
        def _put(a):
            return jnp.asarray(a)
    else:
        from jax.sharding import NamedSharding, PartitionSpec

        ndata = mesh.shape["data"]
        s = NamedSharding(mesh, PartitionSpec("data"))

        def _put(a):
            pad = (-a.shape[0]) % ndata
            if pad:
                a = np.concatenate([a, a[:pad]], axis=0)
            return jax.device_put(a, s)

    out = []
    for a in arrays:
        key = id(a)
        if key not in uploaded:
            uploaded[key] = _put(a)
        out.append(uploaded[key])
    return tuple(out)


# per-chunk dispatch diagnostics ring: (scan_steps, wall_s, compiled)
# appended by _dispatch_epoch_chunked for every bounded dispatch —
# readable by harnesses (scripts/fullscale_r5.py) to attribute
# epoch-time outliers to compile events vs dispatch stalls.
CHUNK_LOG: list = []
CHUNK_LOG_MAX = 10000


def _dispatch_epoch_chunked(train_epoch, state, dev_train, idx_mat, aug_key):
    """Run one epoch through the whole-epoch program in bounded-length
    dispatches.

    One scan dispatch covering a very long epoch can exceed environment
    execution deadlines: measured on the v5e tunnel here, a ~64 s single
    dispatch executes but ~72 s crashes the TPU worker outright
    (UNAVAILABLE, not a clean error). Real-data-scale epochs hit this —
    23k augmented images at B=32 is 728 scan steps ≈ 60+ s. Chunking the
    shuffled index matrix bounds per-dispatch duration while keeping
    every residency property: the dataset stays in HBM, the state stays
    donated, host↔device traffic per chunk is (chunk, B) indices in and
    (chunk,) losses out. At most two program shapes compile (full chunks
    + one remainder).

    `ISTPU_EPOCH_MAX_STEPS_PER_DISPATCH` (default 256) caps scan steps
    per dispatch; <= 0 disables chunking. The cap unit is steps, so for
    unusually slow steps (e.g. 512px, large batch) lower it such that
    cap × step_time stays well under ~60 s; a warning prints when an
    already-compiled dispatch exceeds 45 s (compiling dispatches are
    exempt — at 23k-image scale a chunk-program compile alone runs
    30-40 s and is paid at most twice per run: full-chunk shape +
    remainder shape). Chunking folds the chunk's start step into
    the augmentation key, so augmentation draws differ from the
    unchunked schedule (still fully deterministic for a fixed seed and
    cap).

    Diagnostics (the round-4 full-scale run had one unexplained 842.9 s
    epoch amid 73.5 s neighbors): every chunk dispatch appends
    (steps, wall_s, compiled) to the module-level `CHUNK_LOG` ring
    (jit-cache growth across the call = a compile event), and
    `ISTPU_LOG_CHUNKS=1` prints each record as it lands — enough to
    split any future spike into compile vs dispatch-stall causes."""
    cap = int(os.environ.get("ISTPU_EPOCH_MAX_STEPS_PER_DISPATCH", "256"))
    nsteps = idx_mat.shape[0]
    if cap <= 0 or nsteps <= cap:
        return train_epoch(state, dev_train, jnp.asarray(idx_mat), aug_key)
    log_chunks = os.environ.get("ISTPU_LOG_CHUNKS", "0") == "1"

    def _cache_size():
        try:
            return train_epoch._cache_size()
        except Exception:
            return None

    losses = []
    for s in range(0, nsteps, cap):
        before = _cache_size()
        t0 = time.time()
        state, l = train_epoch(
            state, dev_train, jnp.asarray(idx_mat[s:s + cap]),
            jax.random.fold_in(aug_key, s),
        )
        losses.append(np.asarray(l))  # blocks: one dispatch in flight
        dt = time.time() - t0
        after = _cache_size()
        compiled = (before is not None and after is not None
                    and after > before)
        CHUNK_LOG.append((len(losses[-1]), round(dt, 2), compiled))
        if len(CHUNK_LOG) > CHUNK_LOG_MAX:
            del CHUNK_LOG[: len(CHUNK_LOG) - CHUNK_LOG_MAX]
        if log_chunks:
            print(f"[fit] chunk steps={len(losses[-1])} wall={dt:.1f}s"
                  + (" (compiled)" if compiled else ""))
        if dt > 45.0 and not compiled:
            print(f"[fit] warning: epoch dispatch of {len(losses[-1])} "
                  f"compiled steps took {dt:.0f}s — lower "
                  "ISTPU_EPOCH_MAX_STEPS_PER_DISPATCH to stay clear of "
                  "execution deadlines (~70s kills the TPU worker here)")
    return state, np.concatenate(losses)


def fit(
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
    host_loss_fn: Optional[Callable] = None,
    num_classes: int = 4,
    eval_ignore_index: Optional[int] = 3,
    eval_batch_size: Optional[int] = None,
    mesh=None,
    resume: bool = False,
    seed: int = 0,
    notes: str = "",
    verbose: bool = True,
    save_weights_only_copy: bool = True,
    augment_fn=None,
    eval_state_fn=None,
    eval_protocol: str = "auto",
    eval_loss_cfg=None,
    checkpoint_every: int = 1,
    metrics_logger=None,
    resident_dtype: str = "auto",
    early_stop_patience: Optional[int] = None,
) -> FitResult:
    """Train with per-epoch original-resolution validation and
    best-val-mIoU checkpointing (reference utils/training.py:453-618).

    `checkpoint_every` sets the '_last' preemption-checkpoint cadence in
    epochs (best-metric epochs always checkpoint); raise it when the
    state is large relative to the device link so saves don't pace
    training.

    `augment_fn(images, labels, key) -> (images, labels)` applies
    on-device online augmentation per batch (ops.augment).

    `metrics_logger` (e.g. utils.tb.TensorBoardLogger) receives one
    `log(epoch_number, scalars)` call per epoch with the same values
    appended to `history` — dashboarding off the training path.

    `eval_state_fn(state) -> state'` maps the training state to the one
    used for evaluation — e.g. merging decoder-only params back into the
    full model when training on cached frozen-encoder features
    (train.feature_cache).

    `early_stop_patience=N` stops training after N consecutive epochs
    without a val-mIoU improvement (the reference trains a fixed 100
    epochs and keeps the best-mIoU checkpoint, utils/training.py:551-609
    — early stop reaches the same best artifact without paying for the
    plateau; the stop epoch is recorded in history['stopped_early'])."""
    if eval_loss_cfg is None and host_loss_fn is None:
        # default the val loss to the train loss under the EVAL contract
        # (eval ignore_index, tight Dice smooth — what run.py wires
        # explicitly; reference eval_loop reuses its train loss_fn the
        # same way, utils/training.py:97). Without this the device eval
        # had no loss config and reported val loss = nan. Only the loss
        # configs fast_eval.make_masked_loss dispatches on qualify —
        # a custom frozen dataclass with the same field names would
        # survive dataclasses.replace here only to crash at first eval.
        from image_segmentation_tpu.losses import DiceCELoss, DiceNLLLoss

        if isinstance(loss_fn, (DiceCELoss, DiceNLLLoss)):
            eval_loss_cfg = dataclasses.replace(
                loss_fn, ignore_index=eval_ignore_index, smooth_dice=1e-5
            )
        else:
            eval_loss_cfg = None  # custom callable: no val loss
    if jax.process_count() > 1:
        # fit() is a single-controller loop (host-side data upload,
        # write-behind checkpoint fetches of fully-addressable state).
        # Multi-process training uses the same jitted step with the
        # parallel.multihost helpers — see EXAMPLES.md §8.
        raise NotImplementedError(
            "fit() is single-process; for multi-host runs drive "
            "make_train_step with parallel.multihost (process-local "
            "data feeding, global-array assembly)"
        )
    os.makedirs(save_dir, exist_ok=True)
    ckpt_path = os.path.join(save_dir, name)
    last_path = os.path.join(save_dir, name + "_last")
    weights_path = os.path.join(save_dir, "MO_" + name)

    history = _history_new()
    best = {"dice": -1.0, "miou": -1.0, "loss": float("inf")}
    start_epoch = 0
    if resume:
        # prefer the per-epoch 'last' checkpoint (preemption recovery);
        # fall back to the best-mIoU one (the reference's resume,
        # utils/training.py:502-544)
        source = last_path if os.path.isdir(last_path) else ckpt_path
        if os.path.isdir(source):
            state, meta = ckpt.restore_checkpoint(source, state)
            start_epoch = int(meta.get("epoch", 0)) + 1
            best.update(meta.get("best", {}))
            saved_hist = meta.get("history", {})
            for k in history:
                if k in saved_hist:
                    history[k] = list(saved_hist[k])
            if verbose:
                print(f"Resumed {name} from {os.path.basename(source)} at "
                      f"epoch {start_epoch} (best miou {best['miou']:.4f})")

    # Preemption safety (SURVEY.md §5.3 — the reference has none): on
    # SIGTERM/SIGINT finish the current epoch, save, and return cleanly.
    import signal

    stop_requested = {"flag": False}
    prev_handlers = {}

    def _request_stop(signum, frame):
        stop_requested["flag"] = True
        print(f"[fit] signal {signum} received — will checkpoint and stop "
              "after this epoch")

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _request_stop)
        except ValueError:  # not main thread
            prev_handlers = {}
            break

    try:
        if mesh is not None:
            state = replicate(state, mesh)

        has_aux = train_data.has_heatmaps
        if augment_fn is not None and has_aux:
            # neither the epoch scan nor the streaming path augments
            # heatmap triplets (the heatmap and its class-filtered target
            # would need consistent spatial transforms) — fail loudly
            # rather than silently training un-augmented
            raise ValueError(
                "augment_fn is not supported for prompt (heatmap) datasets; "
                "generate augmented prompt triplets offline instead "
                "(data.prompts.generate_prompt_dataset over an augmented "
                "dataset, reference utils/augmentation.ipynb cell 23)"
            )
        # Single-chip datasets within the HBM budget train as ONE dispatch
        # per epoch: data uploaded once, shuffle = an index permutation,
        # lax.scan over on-device gathered batches with the state donated
        # (train/steps.py make_train_epoch). When the float32 dataset
        # exceeds the budget but a uint8 copy fits (4× capacity — real
        # augmented-Pet-scale datasets), images/heatmaps upload quantised
        # 0..255 and labels as uint8 ids, decoded per gathered batch
        # inside the scan body. Oversized runs keep the per-batch
        # dispatch path, double-buffered.
        cache_mb = float(os.environ.get("ISTPU_TRAIN_DEVICE_CACHE_MB", "4096"))
        train_bytes = (
            train_data.images.nbytes + train_data.labels.nbytes
            + (train_data.heatmaps.nbytes if has_aux else 0)
        )
        use_device_epoch, quantize = _resident_plan(
            resident_dtype, train_bytes, int(cache_mb * 2**20)
        )
        if use_device_epoch:
            from image_segmentation_tpu.train.steps import make_train_epoch

            # under a mesh the dataset is sharded along 'data' (padded to
            # the axis size; idx_mat never references the padding) — the
            # shuffle's cross-shard gathers become XLA collectives over
            # ICI instead of host feeds.
            if quantize:
                if verbose:
                    print(f"[fit] uint8 HBM residency "
                          f"({train_bytes / 2**20:.0f} MB float32 > "
                          f"{cache_mb:.0f} MB budget)")
                if cache_mb > 4096 and verbose:
                    # the budget covers DATA only; the step's activation
                    # working set (several GiB at B>=64, 256px, base=64)
                    # shares the same HBM. An oversized override can
                    # crash the TPU worker outright (observed at
                    # 8192 MB budget + 5.8 GiB resident + B=64) rather
                    # than raise a clean OOM — if that happens, lower
                    # ISTPU_TRAIN_DEVICE_CACHE_MB or the batch size.
                    print("[fit] note: residency budget raised above the "
                          "4096 MB default — leave HBM headroom for the "
                          "training step's activations (a TPU-worker "
                          "crash here means the budget or batch is too "
                          "large)")
                arrays = (_quantize_u8(train_data.images),) + (
                    (_quantize_u8(train_data.heatmaps),) if has_aux else ()
                ) + (_labels_u8(train_data.labels),)
            else:
                arrays = (train_data.images,) + (
                    (train_data.heatmaps,) if has_aux else ()
                ) + (train_data.labels,)
            dev_train = _get_device_train_cache(
                train_data, "aux" if has_aux else "seg", arrays, mesh
            )
            train_epoch = make_train_epoch(
                loss_fn, accum_steps=accum_steps, has_aux_input=has_aux,
                augment_fn=augment_fn, mesh=mesh,
                resident_decode="seg" if quantize else None,
            )
        else:
            train_step = make_train_step(loss_fn, accum_steps=accum_steps,
                                         has_aux_input=has_aux)
        forward = _default_eval_forward()  # shared: avoid per-fit recompiles
        rng = np.random.default_rng(seed + start_epoch)
        agg = MetricsHistory(num_classes, ignore_index=eval_ignore_index)
        epochs_since_improve = 0

        for epoch in range(start_epoch, epochs):
            t0 = time.time()
            if verbose:
                print(f"Epoch {epoch + 1}/{epochs} [{name}]")
            aug_key = jax.random.PRNGKey(seed * 100003 + epoch)
            n = len(train_data)
            nsteps = n // batch_size
            if nsteps == 0:
                raise ValueError(
                    f"epoch produced zero training batches: dataset size "
                    f"{len(train_data)} < batch_size {batch_size} "
                    "(drop_last requires at least one full batch)"
                )
            if use_device_epoch:
                # same shuffle contract as data.loader.train_batches:
                # permutation, drop_last
                order = rng.permutation(n)[: nsteps * batch_size]
                idx_mat = order.reshape(nsteps, batch_size).astype(np.int32)
                state, losses = _dispatch_epoch_chunked(
                    train_epoch, state, dev_train, idx_mat, aug_key,
                )
                train_loss = float(np.mean(np.asarray(losses)))
            else:
                # streaming fallback, double-buffered: transfers for the
                # next batches are issued (async device_put) while the
                # current step computes, so a slow device link overlaps
                # the feed with compute instead of serialising with it
                def _put(b):
                    if mesh is not None:
                        return shard_batch(b, mesh)  # sharded device_put
                    return tuple(jax.device_put(np.asarray(x)) for x in b)

                losses = []
                for batch in _stream_batches(
                    train_batches(train_data, batch_size, rng), _put
                ):
                    if augment_fn is not None and len(batch) == 2:
                        aug_key, k = jax.random.split(aug_key)
                        batch = augment_fn(batch[0], batch[1], k)
                    state, loss = train_step(state, batch)
                    losses.append(loss)
                train_loss = float(np.mean([float(l) for l in losses]))
            if verbose:
                print(f"  train: loss={train_loss:.4f}")

            val = evaluate(
                eval_state_fn(state) if eval_state_fn is not None else state,
                val_data,
                host_loss_fn=host_loss_fn,
                num_classes=num_classes,
                eval_ignore_index=eval_ignore_index,
                batch_size=eval_batch_size or batch_size,
                forward=forward,
                agg=agg,
                verbose=verbose,
                protocol=eval_protocol,
                loss_cfg=eval_loss_cfg,
                mesh=mesh,
            )

            history["train_loss"].append(train_loss)
            history["val_loss"].append(val["loss"])
            history["val_dice"].append(val["dice"])
            history["val_iou"].append(val["iou"])
            history["val_acc"].append(val["acc"])
            history["val_per_class_iou"].append(val["per_class_iou"])
            history["epoch_time_s"].append(time.time() - t0)
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

            # Saves are ASYNC and COALESCED: one device snapshot + one
            # device→host fetch per saving epoch writes the best checkpoint,
            # its weights-only copy, and the preemption '_last' copy together
            # (the fetch is the expensive part — on a slow device link it can
            # exceed the epoch's compute many times over). The '_last'
            # cadence is `checkpoint_every`; best-metric epochs always save.
            # wait_for_saves() below makes fit() return only after everything
            # is durably on disk.
            if np.isnan(val["iou"]):
                # fully degenerate val metrics (no valid class present
                # at all): fall back to val loss so the run still
                # checkpoints instead of never saving a best artifact
                improved = val["loss"] < best["loss"]
            else:
                improved = val["iou"] > best["miou"]
            if improved:
                best = {"dice": val["dice"], "miou": val["iou"], "loss": val["loss"]}
                epochs_since_improve = 0
            else:
                epochs_since_improve += 1
            if (early_stop_patience is not None
                    and epochs_since_improve >= early_stop_patience):
                stop_requested["flag"] = True
                # list-valued like every other history entry (the
                # history serializers list()-coerce all values)
                history["stopped_early"] = [epoch + 1]
                if verbose:
                    print(f"[fit] early stop: no val-mIoU improvement in "
                          f"{epochs_since_improve} epochs "
                          f"(best {best['miou']:.4f})")
            last_due = (
                (epoch + 1) % max(1, checkpoint_every) == 0
                or epoch == epochs - 1
                or stop_requested["flag"]
            )
            if improved:
                ckpt.save_checkpoint_async(
                    ckpt_path, state, epoch=epoch, best=best, history=history,
                    notes=notes,
                    params_only_path=weights_path if save_weights_only_copy
                    else None,
                    extra_paths=(last_path,),
                    slot="best",  # only ever replaced by a strictly better one
                )
                if verbose:
                    print(f"  saved checkpoint (new best miou {val['iou']:.4f})")
            elif last_due:
                # '_last' checkpoint: preemption/crash recovery point; a
                # superseded pending save is dropped (newer state replaces it)
                ckpt.save_checkpoint_async(
                    last_path, state, epoch=epoch, best=best, history=history,
                    notes=notes, slot="last",
                )
            if stop_requested["flag"]:
                if verbose:
                    print(f"[fit] stopping after epoch {epoch + 1} on request")
                break

    except BaseException:
        # surface queued async-save errors without masking the
        # active exception, then restore handlers via finally
        try:
            ckpt.wait_for_saves()
        except Exception as save_err:
            print(f"[fit] async save also failed: {save_err!r}")
        raise
    finally:
        # ALWAYS restore the previous signal handlers — leaving
        # _request_stop installed after fit() dies makes the
        # process uninterruptible (the dead flag swallows Ctrl-C)
        for sig, h in prev_handlers.items():
            signal.signal(sig, h)
    ckpt.wait_for_saves()
    return FitResult(state=state, history=history, best=best)


def evaluate_reconstruction(
    state,
    val_data: MaterializedDataset,
    *,
    originals: list,
    batch_size: int = 8,
    forward=None,
    verbose: bool = True,
) -> float:
    """Reconstruction eval at original resolution: reverse-resize the
    reconstruction, MSE against the untouched input image
    (reference utils/training.py:202-239)."""
    if forward is None:
        forward = _default_eval_forward()
    losses = []
    for inputs, _, metas, _, count in eval_batches(val_data, batch_size):
        out = np.asarray(forward(state, jax.numpy.asarray(inputs[0])))
        metas_list = G.metas_to_list(metas)
        base = len(losses)
        for i in range(count):
            inv = G.invert_resize_padding_np(out[i], metas_list[i], method="linear")
            orig = originals[base + i][:, :, :3]  # RGBA truncation, ref :231
            losses.append(float(((inv - orig) ** 2).mean()))
    val = float(np.mean(losses))
    if verbose:
        print(f"  val recon mse={val:.6f}")
    return val


def fit_reconstruction(
    state,
    train_data: MaterializedDataset,
    val_data: MaterializedDataset,
    *,
    originals: list,
    epochs: int,
    batch_size: int,
    accum_steps: int = 1,
    save_dir: str,
    name: str,
    mesh=None,
    resume: bool = False,
    seed: int = 0,
    verbose: bool = True,
    metrics_logger=None,
) -> FitResult:
    """Autoencoder stage 1 (reference autoencoder.ipynb cell 0): MSE
    against the resized input, best-val-loss checkpointing.

    `originals` are the raw val images (native size) for the
    original-resolution eval MSE."""
    os.makedirs(save_dir, exist_ok=True)
    ckpt_path = os.path.join(save_dir, name)

    def mse(pred, target):
        return jax.numpy.mean((pred - target) ** 2)

    history = {"train_loss": [], "val_loss": [], "epoch_time_s": []}
    best = {"loss": float("inf")}
    start_epoch = 0
    if resume and os.path.isdir(ckpt_path):
        state, meta = ckpt.restore_checkpoint(ckpt_path, state)
        start_epoch = int(meta.get("epoch", 0)) + 1
        best.update(meta.get("best", {}))
        for k in history:
            if k in meta.get("history", {}):
                history[k] = list(meta["history"][k])

    cache_mb = float(os.environ.get("ISTPU_TRAIN_DEVICE_CACHE_MB", "4096"))
    use_device_epoch, quantize = _resident_plan(
        "auto", train_data.images.nbytes, int(cache_mb * 2**20)
    )
    if use_device_epoch:
        from image_segmentation_tpu.train.steps import make_train_epoch

        # (x, x): reconstruct the input — one shared device buffer;
        # uint8 residency dequantises BOTH (input and target stay equal)
        imgs = _quantize_u8(train_data.images) if quantize \
            else train_data.images
        dev_train = _get_device_train_cache(
            train_data, "recon", (imgs, imgs), mesh,
        )
        train_epoch = make_train_epoch(
            mse, accum_steps=accum_steps, mesh=mesh,
            resident_decode="recon" if quantize else None,
        )
    else:
        train_step = make_train_step(mse, accum_steps=accum_steps)
    forward = _default_eval_forward()  # shared: avoid per-fit recompiles
    rng = np.random.default_rng(seed + start_epoch)

    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        if verbose:
            print(f"Epoch {epoch + 1}/{epochs} [{name}]")
        if use_device_epoch:
            n = len(train_data)
            nsteps = max(1, n // batch_size)
            order = rng.permutation(n)[: nsteps * batch_size]
            idx_mat = order.reshape(nsteps, -1).astype(np.int32)
            state, losses = _dispatch_epoch_chunked(
                train_epoch, state, dev_train, idx_mat,
                jax.random.PRNGKey(seed + epoch),
            )
            train_loss = float(np.mean(np.asarray(losses)))
        else:
            def _put(b):
                x = b[0]
                batch = (x, x)  # reconstruct the input — shared buffer
                if mesh is not None:
                    return shard_batch(batch, mesh)
                xd = jax.device_put(np.asarray(x))
                return (xd, xd)

            losses = []
            for batch in _stream_batches(
                train_batches(train_data, batch_size, rng), _put
            ):
                state, loss = train_step(state, batch)
                losses.append(loss)
            train_loss = float(np.mean([float(l) for l in losses]))
        if verbose:
            print(f"  train: mse={train_loss:.6f}")
        val_loss = evaluate_reconstruction(
            state, val_data, originals=originals, batch_size=batch_size,
            forward=forward, verbose=verbose,
        )
        history["train_loss"].append(train_loss)
        history["val_loss"].append(val_loss)
        history["epoch_time_s"].append(time.time() - t0)
        _save_history(save_dir, name, history)
        if metrics_logger is not None:
            metrics_logger.log(epoch + 1, {
                "train/mse": train_loss,
                "val/mse": val_loss,
                "time/epoch_s": history["epoch_time_s"][-1],
            })
        if val_loss < best["loss"]:
            best = {"loss": val_loss}
            ckpt.save_checkpoint_async(
                ckpt_path, state, epoch=epoch, best=best, history=history
            )
            if verbose:
                print(f"  saved checkpoint (new best val mse {val_loss:.6f})")

    ckpt.wait_for_saves()
    return FitResult(state=state, history=history, best=best)
