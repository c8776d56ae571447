"""Weighted cross-entropy / NLL with torch-compatible reduction.

torch.nn.CrossEntropyLoss(weight=w, ignore_index=k) computes

    sum_i  w[y_i] * (-log softmax(x_i)[y_i])  /  sum_i w[y_i]

over pixels i with y_i != k — i.e. a *weighted* mean whose denominator is
the sum of per-pixel weights, not the pixel count. The reference relies
on this (utils/weighted_loss.py:132-138); we replicate it exactly so
FullWeight-class-weight training matches.

Loss math in float32; NHWC logits, (N, H, W) integer targets.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def _nll_from_logp(logp, targets, weights, ignore_index, num_classes):
    """sum_i w[y_i]·(−logp_i[y_i]) / sum_i w[y_i] via one-hot contractions.

    TPU note: per-pixel gathers (take_along_axis / w[targets]) lower to
    scatter-gather loops that dominate the whole train step; expressing
    the select as one_hot·logp keeps everything on the VPU/MXU.
    """
    onehot = jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)
    pix = -jnp.sum(logp * onehot, axis=-1)
    if ignore_index is not None:
        valid = jnp.where(targets == ignore_index, 0.0, 1.0)
    else:
        valid = jnp.ones_like(pix)
    if weights is not None:
        w = jnp.asarray(weights, jnp.float32)
        pix_w = jnp.sum(onehot * w, axis=-1) * valid
    else:
        pix_w = valid
    return jnp.sum(pix * pix_w) / jnp.maximum(jnp.sum(pix_w), 1e-12)


def cross_entropy_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    *,
    class_weights: Optional[jnp.ndarray] = None,
    ignore_index: Optional[int] = None,
) -> jnp.ndarray:
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return _nll_from_logp(logp, targets, class_weights, ignore_index, num_classes)


def nll_loss(
    log_probs: jnp.ndarray,
    targets: jnp.ndarray,
    *,
    class_weights: Optional[jnp.ndarray] = None,
    ignore_index: Optional[int] = None,
    nonlin: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> jnp.ndarray:
    """torch.nn.NLLLoss equivalent. `nonlin` converts inputs first — the
    prompt pipeline passes lambda x: log(x + 1e-9) since the model emits
    probabilities (reference prompt.ipynb cell 0, weighted_loss.py:338-340)."""
    num_classes = log_probs.shape[-1]
    x = log_probs.astype(jnp.float32)
    if nonlin is not None:
        x = nonlin(x)
    return _nll_from_logp(x, targets, class_weights, ignore_index, num_classes)


def log_with_eps(x: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """The prompt pipeline's probability→log-prob nonlinearity."""
    return jnp.log(x + eps)
