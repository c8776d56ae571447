from image_segmentation_tpu.losses.dice import soft_dice_loss
from image_segmentation_tpu.losses.cross_entropy import (
    cross_entropy_loss,
    nll_loss,
)
from image_segmentation_tpu.losses.combos import (
    DiceCELoss,
    DiceNLLLoss,
    make_dice_ce_loss,
    make_dice_nll_loss,
)

__all__ = [
    "soft_dice_loss",
    "cross_entropy_loss",
    "nll_loss",
    "DiceCELoss",
    "DiceNLLLoss",
    "make_dice_ce_loss",
    "make_dice_nll_loss",
]
