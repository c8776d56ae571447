"""Combined losses: Dice+CE and Dice+NLL.

Replicate WeightedDiceCELoss (reference utils/weighted_loss.py:102-166)
and WeightedDiceNLLLoss (:268-343). Both forward ignore_index and
class_weights into each component. Exposed as frozen dataclasses that are
plain callables — hashable, so they can be closed over by jitted steps.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax.numpy as jnp

from image_segmentation_tpu.losses.cross_entropy import (
    cross_entropy_loss,
    log_with_eps,
    nll_loss,
)
from image_segmentation_tpu.losses.dice import soft_dice_loss


@dataclasses.dataclass(frozen=True)
class DiceCELoss:
    dice_weight: float = 1.0
    ce_weight: float = 1.0
    ignore_index: Optional[int] = None
    class_weights: Optional[Tuple[float, ...]] = None
    smooth_dice: float = 1e-5

    def __call__(self, logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
        cw = None if self.class_weights is None else jnp.asarray(self.class_weights)
        d = soft_dice_loss(
            logits,
            targets,
            apply_softmax=True,
            ignore_index=self.ignore_index,
            class_weights=cw,
            smooth=self.smooth_dice,
        )
        ce = cross_entropy_loss(
            logits,
            targets,
            class_weights=cw,
            ignore_index=self.ignore_index,
        )
        return self.dice_weight * d + self.ce_weight * ce


@dataclasses.dataclass(frozen=True)
class DiceNLLLoss:
    """For models that emit probabilities (the prompt model): Dice on the
    probabilities directly (apply_softmax=False), NLL on log(p + 1e-9).

    Constraint: `nll_nonlin(probs)` must be finite across ALL class lanes,
    not just the target lane — the fast-eval path evaluates NLL as a
    one-hot contraction (fast_eval._nll_from_logp), where 0*NaN/0*(-inf)
    in a non-target lane poisons the sum. With the default log_with_eps
    this holds for any nonnegative input; if apply_softmax=True is ever
    combined with raw logits, pass a nonlin defined on negatives too."""

    dice_weight: float = 1.0
    nll_weight: float = 1.0
    ignore_index: Optional[int] = None
    class_weights: Optional[Tuple[float, ...]] = None
    smooth_dice: float = 1e-5
    apply_softmax: bool = False
    nll_nonlin: Callable = log_with_eps

    def __call__(self, probs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
        cw = None if self.class_weights is None else jnp.asarray(self.class_weights)
        d = soft_dice_loss(
            probs,
            targets,
            apply_softmax=self.apply_softmax,
            ignore_index=self.ignore_index,
            class_weights=cw,
            smooth=self.smooth_dice,
        )
        n = nll_loss(
            probs,
            targets,
            class_weights=cw,
            ignore_index=self.ignore_index,
            nonlin=self.nll_nonlin,
        )
        return self.dice_weight * d + self.nll_weight * n


def make_dice_ce_loss(**kw) -> DiceCELoss:
    if kw.get("class_weights") is not None:
        kw["class_weights"] = tuple(float(x) for x in kw["class_weights"])
    return DiceCELoss(**kw)


def make_dice_nll_loss(**kw) -> DiceNLLLoss:
    if kw.get("class_weights") is not None:
        kw["class_weights"] = tuple(float(x) for x in kw["class_weights"])
    return DiceNLLLoss(**kw)
