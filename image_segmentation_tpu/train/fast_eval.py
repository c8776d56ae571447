"""Device-side original-resolution evaluation.

The reference protocol (reference utils/training.py:67-121) un-pads each
prediction and bilinearly resizes it back to the image's NATIVE (h, w)
before computing the loss and the confusion counts. Native sizes are
per-image dynamic, which rules out a naive jit — round 1 therefore ran
the inverse on the host, paying a full (T, T, C) float32 score transfer
per image (~1 MB) over the device link: ~16 img/s.

TPU-native redesign: the inverse is just an affine resampling, so every
image's native-size prediction fits on a FIXED canvas of the dataset's
maximum native size. One `jax.image.scale_and_translate` per image maps
the content region [pad:pad+new] of the (T, T, C) logits onto
[0:h, 0:w] of the (Hc, Wc, C) canvas — identical triangle-kernel math to
the host inverse (ops/geometry.py), with static shapes throughout. The
ground-truth labels live on matching uint8 canvases (fill=255 marks
out-of-image pixels). Argmax, the masked per-image loss, and the (C, C)
confusion counts all run on device; the ONLY host transfer per batch is
a (C, C) int32 matrix and (B,) float32 losses — a ~30,000× reduction.

The host path (train/loop.py `evaluate(..., protocol='host')`) remains
the float64 parity reference; tests pin both protocols to each other.

Because the val set is static across epochs, `_evaluate_device` uploads
it to HBM once and runs each epoch as ONE jitted dispatch — a lax.scan
over batch indices with on-device gathers (`get_eval_epoch_fn`). That
removes the per-batch host→device re-upload of images/canvases that
dominated over slow device links. Measured (v5e, UNet base=64 bf16,
T=256, 128 Pet-sized images, benchmarks/eval_bench.py): 137 img/s
single-dispatch vs 12-22 img/s streaming vs ~10-16 img/s round-1 host
path.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from image_segmentation_tpu.losses.combos import DiceCELoss, DiceNLLLoss
from image_segmentation_tpu.ops import geometry as G

FILL = 255  # canvas fill marking out-of-image pixels (labels are 0..C-1)


def pack_label_canvases(
    orig_labels, multiple: int = 8
) -> np.ndarray:
    """Pack native-size (h, w) int label maps into one (N, Hc, Wc) uint8
    array, content top-left, FILL elsewhere. Hc/Wc are the dataset maxima
    rounded up to `multiple` (static shapes for the jitted evaluator)."""
    hc = max(l.shape[0] for l in orig_labels)
    wc = max(l.shape[1] for l in orig_labels)
    hc = -(-hc // multiple) * multiple
    wc = -(-wc // multiple) * multiple
    out = np.full((len(orig_labels), hc, wc), FILL, dtype=np.uint8)
    for i, lab in enumerate(orig_labels):
        out[i, : lab.shape[0], : lab.shape[1]] = lab.astype(np.uint8)
    return out


def plan_size_buckets(
    orig_labels,
    multiple: int = 8,
    max_buckets: int = 4,
    min_bucket: int = 8,
    min_gain: float = 0.15,
):
    """Partition image indices into ≤ `max_buckets` canvas-size buckets.

    One dataset-max canvas makes every image pay the outlier's Hc×Wc
    inverse-resample cost. Bucketing groups images by size so each
    bucket gets its own (smaller) canvas + jitted evaluator; the
    protocol math is canvas-size independent (content lands on
    [0:h, 0:w] and FILL masks the rest), so results are bit-identical —
    only the wasted canvas pixels change.

    Partition choice: sort by rounded canvas area; exact DP over split
    points minimising Σ bucket_size × bucket_max_h × bucket_max_w, with
    every bucket ≥ `min_bucket` images (so batches stay full). A larger
    K is accepted only while it saves ≥ `min_gain` of the cost — each
    extra bucket costs one extra compile.

    Returns a list of int index arrays (original order preserved inside
    each bucket).
    """
    n = len(orig_labels)
    hs = np.asarray([-(-l.shape[0] // multiple) * multiple
                     for l in orig_labels], np.int64)
    ws = np.asarray([-(-l.shape[1] // multiple) * multiple
                     for l in orig_labels], np.int64)
    if n < 2 * min_bucket or max_buckets <= 1:
        return [np.arange(n)]
    order = np.argsort(hs * ws, kind="stable")
    sh, sw = hs[order], ws[order]
    kmax = min(max_buckets, n // min_bucket)

    # dp[k-1][j] = min cost of first j sorted items in k buckets
    INF = np.inf
    dp = np.full((kmax, n + 1), INF)
    parent = np.zeros((kmax, n + 1), np.int64)
    # cost(i, j) = (j-i)·max(sh[i:j])·max(sw[i:j]); for fixed j the maxima
    # over i are reverse running maxima of the prefix — O(n) per j.
    for j in range(1, n + 1):
        rmax_h = np.maximum.accumulate(sh[:j][::-1])[::-1]
        rmax_w = np.maximum.accumulate(sw[:j][::-1])[::-1]
        sizes = j - np.arange(j)
        cost_ij = sizes * rmax_h * rmax_w  # cost(i, j) for i = 0..j-1
        dp[0][j] = cost_ij[0]
        parent[0][j] = 0
        for k in range(1, kmax):
            # i ranges where both sides respect min_bucket
            lo, hi = k * min_bucket, j - min_bucket + 1
            if hi <= lo or j < (k + 1) * min_bucket:
                continue
            cand = dp[k - 1][lo:hi] + cost_ij[lo:hi]
            a = int(np.argmin(cand))
            dp[k][j] = cand[a]
            parent[k][j] = lo + a

    # accept K while each extra bucket saves ≥ min_gain
    best_k = 0
    for k in range(1, kmax):
        if dp[k][n] < (1.0 - min_gain) * dp[best_k][n]:
            best_k = k
    # walk parents
    bounds = [n]
    k, j = best_k, n
    while k > 0:
        j = int(parent[k][j])
        bounds.append(j)
        k -= 1
    bounds.append(0)
    bounds = bounds[::-1]
    return [np.sort(order[bounds[b]:bounds[b + 1]])
            for b in range(len(bounds) - 1)]


def _invert_one_to_canvas(scores_tt, meta: G.ResizeMeta, canvas_hw):
    """Inverse geometry for one image, on device, static output shape.

    Maps the [pad:pad+new] content of (T, T, C) scores onto [0:h, 0:w] of
    an (Hc, Wc, C) canvas with align_corners=False bilinear — the same
    sampling as the host inverse (ops/geometry.py:314-356): output pixel o
    samples input coordinate pad + (o+0.5)·new/orig − 0.5, i.e.
    scale = orig/new, translation = −pad·orig/new in scale_and_translate
    terms. Taps that would cross the crop boundary are renormalised over
    in-crop taps by the resample(mask)-divide trick, matching the host
    path's edge weight renormalisation."""
    t = scores_tt.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    content = (
        (rows >= meta.pad_top)
        & (rows < meta.pad_top + meta.new_h)
        & (cols >= meta.pad_left)
        & (cols < meta.pad_left + meta.new_w)
    ).astype(scores_tt.dtype)
    stacked = jnp.concatenate([scores_tt * content[:, :, None],
                               content[:, :, None]], axis=-1)
    sy = meta.orig_h.astype(jnp.float32) / meta.new_h.astype(jnp.float32)
    sx = meta.orig_w.astype(jnp.float32) / meta.new_w.astype(jnp.float32)
    out = jax.image.scale_and_translate(
        stacked,
        shape=(canvas_hw[0], canvas_hw[1], stacked.shape[-1]),
        spatial_dims=(0, 1),
        scale=jnp.stack([sy, sx]),
        translation=jnp.stack(
            [-meta.pad_top.astype(jnp.float32) * sy,
             -meta.pad_left.astype(jnp.float32) * sx]
        ),
        method="linear",
        antialias=False,
    )
    coverage = out[:, :, -1:]
    return out[:, :, :-1] / jnp.maximum(coverage, 1e-6)


def _masked_dice(probs, onehot_valid, valid, ignore_index, class_weights,
                 smooth):
    """Soft Dice over the valid region only — mirrors losses.host._dice_np
    restricted to [0:h, 0:w]."""
    num_classes = probs.shape[-1]
    v = valid[..., None].astype(probs.dtype)
    intersect = (probs * onehot_valid).sum(axis=(0, 1))
    sum_pred = (probs * v).sum(axis=(0, 1))
    sum_gt = onehot_valid.sum(axis=(0, 1))
    dc = (2 * intersect + smooth) / jnp.maximum(sum_pred + sum_gt + smooth, 1e-8)
    keep = jnp.ones((num_classes,), probs.dtype)
    if ignore_index is not None and 0 <= ignore_index < num_classes:
        keep = keep.at[ignore_index].set(0.0)
    if class_weights is not None:
        w = jnp.asarray(class_weights, probs.dtype) * keep
        return -(dc * w).sum() / jnp.maximum(w.sum(), 1e-8)
    return -(dc * keep).sum() / jnp.maximum(keep.sum(), 1.0)


def _masked_pixel_mean(pix, onehot_clip, targets, valid, class_weights,
                       ignore_index, C):
    """Weighted mean over valid pixels — mirrors
    losses.host._weighted_pixel_mean_np.

    `onehot_clip` is one_hot(clip(targets, 0, C-1)) shared with the
    per-pixel NLL select: the per-pixel weight lookup contracts it
    against the weight vector instead of indexing w[targets] — a
    per-pixel gather lowers to a serialized scatter/gather loop on TPU
    (the same hazard losses/cross_entropy.py documents; measured as the
    dominant fusion of the whole eval epoch before this rewrite)."""
    v = valid.astype(pix.dtype)
    if ignore_index is not None:
        v = v * (targets != ignore_index).astype(pix.dtype)
    if class_weights is not None:
        w = jnp.asarray(class_weights, pix.dtype)
        pw = (onehot_clip * w).sum(axis=-1) * v
    else:
        pw = v
    return (pix * pw).sum() / jnp.maximum(pw.sum(), 1e-12)


def make_masked_loss(cfg):
    """Per-image masked loss for canvas scores: f(scores (H,W,C) f32,
    targets (H,W) i32, valid (H,W) bool) -> scalar. Dispatches on the loss
    config dataclass (DiceCELoss | DiceNLLLoss), mirroring losses/host.py."""
    if isinstance(cfg, DiceCELoss):
        def loss(scores, targets, valid):
            C = scores.shape[-1]
            probs = jax.nn.softmax(scores, axis=-1)
            onehot = jax.nn.one_hot(targets, C, dtype=scores.dtype)
            onehot = onehot * valid[..., None].astype(scores.dtype)
            d = _masked_dice(probs, onehot, valid, cfg.ignore_index,
                             cfg.class_weights, cfg.smooth_dice)
            logp = jax.nn.log_softmax(scores, axis=-1)
            # one-hot contraction, NOT take_along_axis: the per-pixel
            # class gather lowered to a serialized kCustom gather that
            # was 80% of the eval epoch's device time (it is exact — the
            # selected lane contributes its own fp value, every other
            # lane is exactly 0.0)
            ohc = jax.nn.one_hot(jnp.clip(targets, 0, C - 1), C,
                                 dtype=scores.dtype)
            pix = -jnp.sum(logp * ohc, axis=-1)
            ce = _masked_pixel_mean(pix, ohc, targets, valid,
                                    cfg.class_weights, cfg.ignore_index, C)
            return cfg.dice_weight * d + cfg.ce_weight * ce
        return loss
    if isinstance(cfg, DiceNLLLoss):
        def loss(scores, targets, valid):
            C = scores.shape[-1]
            p = jax.nn.softmax(scores, axis=-1) if cfg.apply_softmax else scores
            onehot = jax.nn.one_hot(targets, C, dtype=scores.dtype)
            onehot = onehot * valid[..., None].astype(scores.dtype)
            d = _masked_dice(p, onehot, valid, cfg.ignore_index,
                             cfg.class_weights, cfg.smooth_dice)
            # the loss's own nonlin (default log_with_eps = log(x+1e-9)),
            # not a hard-coded copy — a custom nll_nonlin must evaluate
            # identically here and in training (losses/cross_entropy.py
            # nll_loss)
            logp = cfg.nll_nonlin(scores)
            # one-hot contraction, NOT take_along_axis (see DiceCELoss
            # branch above)
            ohc = jax.nn.one_hot(jnp.clip(targets, 0, C - 1), C,
                                 dtype=scores.dtype)
            pix = -jnp.sum(logp * ohc, axis=-1)
            n = _masked_pixel_mean(pix, ohc, targets, valid,
                                   cfg.class_weights, cfg.ignore_index, C)
            return cfg.dice_weight * d + cfg.nll_weight * n
        return loss
    raise TypeError(f"no masked-loss mirror for {type(cfg).__name__}")


@functools.lru_cache(maxsize=16)
def _build_eval_batch_fn(canvas_hw: Tuple[int, int], num_classes: int,
                         loss_cfg):
    """Jitted per-batch evaluator (cached per canvas/classes/loss).

    eval_batch(state, inputs, metas, label_canvases, real) ->
      (conf (C, C) i32, losses (B,) f32)
    `real` is a (B,) bool masking the repeated tail of the padded last
    batch out of the confusion counts (losses for those entries are
    computed but discarded by the caller)."""
    loss_fn = make_masked_loss(loss_cfg) if loss_cfg is not None else None

    @jax.jit
    def eval_batch(state, inputs, metas, label_canvases, real):
        return _eval_batch_core(
            state, inputs, metas, label_canvases.astype(jnp.int32), real,
            canvas_hw, num_classes, loss_fn,
        )

    return eval_batch


def _eval_batch_core(state, inputs, metas, labels, real, canvas_hw,
                     num_classes, loss_fn):
    """Shared traced body of the original-resolution eval protocol:
    forward → per-image inverse geometry onto the static canvas → masked
    loss → argmax → confusion counts (padding rows masked by `real`).
    Both the per-batch and the single-dispatch epoch evaluator wrap this
    so the protocol math cannot diverge between them."""
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    scores = state.apply_fn(variables, *inputs, train=False)
    scores = scores.astype(jnp.float32)
    inv = jax.vmap(
        lambda s, m: _invert_one_to_canvas(s, m, canvas_hw)
    )(scores, metas)  # (B, Hc, Wc, C)
    valid = labels != FILL
    pred = jnp.argmax(inv, axis=-1)

    # Per-image confusion counts, then a masked sum over the batch. The
    # per-image form keeps every count shard-local when the batch axis is
    # sharded over a mesh (loop._evaluate_device's distributed eval): the
    # only cross-device communication is the final (C, C) reduction,
    # which GSPMD lowers to one psum.
    #
    # Counting is one-hot(label)ᵀ @ one-hot(pred) — two (P, C) one-hots
    # and a matmul XLA tiles onto the MXU — NOT a bincount: TPU lowers
    # bincount to a serialized scatter-add, which measured 2.3× slower
    # in an isolated formulation probe (benchmarks/confusion_probe.py;
    # end-to-end protocol numbers in benchmarks/eval_bench.py). FILL
    # (255) one-hots to all-zero rows, so invalid pixels DROP out of the
    # counts (the old bincount path clamped out-of-range labels into
    # class C-1 instead — drop is the more correct semantic for the
    # packed canvases, whose labels are only ever 0..C-1 or FILL; the
    # host oracle parity tests cover an out-of-range-label case).
    # The per-image einsum is exact in f32 (per-cell counts ≤ Hc·Wc
    # ≪ 2^24); each image's counts are cast to int32 BEFORE the masked
    # batch sum so the epoch totals are exact integers for any batch
    # size / canvas (an f32 batch sum would cap at 2^24 over
    # B·Hc·Wc pixels).
    def _conf_one(labels_i, pred_i, valid_i):
        t = jax.nn.one_hot(labels_i.reshape(-1), num_classes,
                           dtype=jnp.float32)
        t = t * valid_i.reshape(-1, 1).astype(jnp.float32)
        p = jax.nn.one_hot(pred_i.reshape(-1), num_classes,
                           dtype=jnp.float32)
        return jnp.einsum("nt,np->tp", t, p).astype(jnp.int32)

    conf_per = jax.vmap(_conf_one)(labels, pred, valid)
    conf = (conf_per * real[:, None, None].astype(jnp.int32)).sum(axis=0)
    if loss_fn is not None:
        losses = jax.vmap(loss_fn)(inv, labels, valid)
    else:
        losses = jnp.full((inv.shape[0],), jnp.nan, jnp.float32)
    return conf, losses


def get_eval_batch_fn(canvas_hw, num_classes: int, loss_cfg=None):
    """Public cached accessor (loss_cfg must be hashable — the frozen loss
    dataclasses are)."""
    return _build_eval_batch_fn(
        (int(canvas_hw[0]), int(canvas_hw[1])), int(num_classes), loss_cfg
    )


@functools.lru_cache(maxsize=16)
def _build_eval_epoch_fn(canvas_hw: Tuple[int, int], num_classes: int,
                         loss_cfg):
    """Whole-epoch evaluator: ONE device dispatch for the full val set.

    The val set is static across epochs, so the caller uploads it to HBM
    once (loop._evaluate_device gates this on dataset size) and each
    epoch is a single jitted call — a `lax.scan` over batch indices that
    gathers each batch on device, runs forward + inverse + loss +
    confusion, and returns only a (C, C) confusion matrix and (nb, B)
    losses. Per-epoch host↔device traffic drops from the whole dataset
    (the round-1 bottleneck over slow links) to the index matrices in and
    a few KB of results out.

    eval_epoch(state, dev_inputs, dev_metas, dev_canvases, idx, real) ->
      (conf (C, C) i32, losses (nb, B) f32)
    with idx/real of shape (nb, B): batch indices into the device arrays
    and the real-vs-padding mask for the tail batch.
    """
    loss_fn = make_masked_loss(loss_cfg) if loss_cfg is not None else None

    @jax.jit
    def eval_epoch(state, dev_inputs, dev_metas, dev_canvases, idx, real):
        def body(conf, per):
            ii, rr = per
            inputs = tuple(jnp.take(x, ii, axis=0) for x in dev_inputs)
            metas = G.ResizeMeta(*(jnp.take(f, ii) for f in dev_metas))
            labels = jnp.take(dev_canvases, ii, axis=0).astype(jnp.int32)
            bconf, losses = _eval_batch_core(
                state, inputs, metas, labels, rr,
                canvas_hw, num_classes, loss_fn,
            )
            return conf + bconf, losses

        conf0 = jnp.zeros((num_classes, num_classes), jnp.int32)
        conf, losses = jax.lax.scan(body, conf0, (idx, real))
        return conf, losses

    return eval_epoch


def get_eval_epoch_fn(canvas_hw, num_classes: int, loss_cfg=None):
    """Public cached accessor for the single-dispatch epoch evaluator."""
    return _build_eval_epoch_fn(
        (int(canvas_hw[0]), int(canvas_hw[1])), int(num_classes), loss_cfg
    )


@functools.lru_cache(maxsize=16)
def _build_eval_epoch_prebatched_fn(canvas_hw: Tuple[int, int],
                                    num_classes: int, loss_cfg):
    """Whole-epoch evaluator over PRE-BATCHED (nb, B, ...) arrays — the
    distributed-eval form.

    Unlike `_build_eval_epoch_fn` there are no on-device gathers: the
    caller lays the epoch out as (nb, B, ...) and uploads it with the
    sharding it wants — under a mesh, batch rows sharded along 'data'
    (`NamedSharding(mesh, P(None, 'data'))`). The jitted program is
    mesh-agnostic; GSPMD partitions the scan body from the input
    shardings, so each device evaluates B/n_data images per step
    (forward, inverse geometry, masked loss, per-image confusion all
    shard-local) and the only collectives are the final (C, C) confusion
    psum and the loss all-gather. The reference protocol has no
    distributed evaluation at all (it is single-device,
    reference utils/training.py:67-121); under data-parallel training
    this removes eval as the serial Amdahl fraction of fit().

    eval_epoch(state, b_inputs, b_metas, b_canvases, real) ->
      (conf (C, C) i32, losses (nb, B) f32)
    with b_inputs a tuple of (nb, B, ...) arrays, b_metas a ResizeMeta of
    (nb, B) arrays, b_canvases (nb, B, Hc, Wc) uint8 and real (nb, B)
    bool masking padded rows out of the counts.
    """
    loss_fn = make_masked_loss(loss_cfg) if loss_cfg is not None else None

    @jax.jit
    def eval_epoch(state, b_inputs, b_metas, b_canvases, real):
        def body(conf, per):
            inputs, metas, labels, rr = per
            bconf, losses = _eval_batch_core(
                state, inputs, metas, labels.astype(jnp.int32), rr,
                canvas_hw, num_classes, loss_fn,
            )
            return conf + bconf, losses

        conf0 = jnp.zeros((num_classes, num_classes), jnp.int32)
        conf, losses = jax.lax.scan(
            body, conf0, (b_inputs, b_metas, b_canvases, real)
        )
        return conf, losses

    return eval_epoch


def get_eval_epoch_prebatched_fn(canvas_hw, num_classes: int, loss_cfg=None):
    """Public cached accessor for the pre-batched (distributed) epoch
    evaluator."""
    return _build_eval_epoch_prebatched_fn(
        (int(canvas_hw[0]), int(canvas_hw[1])), int(num_classes), loss_cfg
    )
