"""Soft Dice loss with the reference's exact semantics.

Replicates WeightedMemoryEfficientDiceLoss (reference
utils/weighted_loss.py:6-98) and its prompt variant (:170-265):

  * softmax over the class axis (optional — the prompt model already
    emits probabilities), then an optional extra non-linearity;
  * one-hot targets; per-class intersection / prediction-sum / GT-sum
    reduced over batch AND spatial dims together (so the loss is a
    batch-aggregate Dice, not a mean of per-image Dice);
  * dice_c = (2·I_c + smooth) / max(P_c + G_c + smooth, 1e-8);
  * `ignore_index` excludes that CLASS from the final mean — it does NOT
    mask pixels (the reference's pixel-mask path is dead code,
    utils/weighted_loss.py:49);
  * optional class-weighted mean over the remaining classes;
  * returns −dice (a score in [−1, 0]).

Loss math stays in float32 regardless of activation dtype — bf16 models
upcast at the softmax (SURVEY.md §7 "PromptModel numerics").

Layout: logits are NHWC (N, H, W, C); targets are (N, H, W) int.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def soft_dice_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    *,
    apply_softmax: bool = True,
    ignore_index: Optional[int] = None,
    class_weights: Optional[jnp.ndarray] = None,
    smooth: float = 1e-5,
    nonlin: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> jnp.ndarray:
    num_classes = logits.shape[-1]
    x = logits.astype(jnp.float32)
    probs = jax.nn.softmax(x, axis=-1) if apply_softmax else x
    if nonlin is not None:
        probs = nonlin(probs)

    onehot = jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)
    onehot = jax.lax.stop_gradient(onehot)

    # Aggregate over batch + spatial together (reference sums per-sample then
    # over the batch — identical result).
    reduce_axes = tuple(range(probs.ndim - 1))
    intersect = jnp.sum(probs * onehot, axis=reduce_axes)
    sum_pred = jnp.sum(probs, axis=reduce_axes)
    sum_gt = jnp.sum(onehot, axis=reduce_axes)

    dc = (2.0 * intersect + smooth) / jnp.maximum(sum_pred + sum_gt + smooth, 1e-8)

    valid = jnp.ones((num_classes,), dtype=bool)
    if ignore_index is not None and 0 <= ignore_index < num_classes:
        valid = valid.at[ignore_index].set(False)
    validf = valid.astype(jnp.float32)

    if class_weights is not None:
        w = jnp.asarray(class_weights, jnp.float32) * validf
        dc_final = jnp.sum(dc * w) / jnp.maximum(jnp.sum(w), 1e-8)
    else:
        dc_final = jnp.sum(dc * validf) / jnp.maximum(jnp.sum(validf), 1e-8)

    return -dc_final
