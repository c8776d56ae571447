"""U-Net (reference unet/unet.py:67-105, rebuilt NHWC/linen).

5-level encoder (stem is conv-only; levels 2-5 are maxpool + doubleconv)
with channels base·{1,2,4,8,16}; 4 up blocks (transpose-conv halving
channels, concat skip, doubleconv); 1×1 conv head to `num_classes`
logits. `base=64` gives the reference's 64→1024 schedule (~31M params
at 3-in/4-out).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from image_segmentation_tpu.models.layers import (
    DoubleConv,
    Down,
    Up,
    conv_kernel_init,
)


class UNet(nn.Module):
    num_classes: int = 4
    base: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, dt = self.base, self.dtype
        x = x.astype(dt)
        x1 = DoubleConv(b, dtype=dt)(x, train)
        x2 = Down(2 * b, dtype=dt)(x1, train)
        x3 = Down(4 * b, dtype=dt)(x2, train)
        x4 = Down(8 * b, dtype=dt)(x3, train)
        x5 = Down(16 * b, dtype=dt)(x4, train)

        y = Up(8 * b, dtype=dt)(x4, x5, train)
        y = Up(4 * b, dtype=dt)(x3, y, train)
        y = Up(2 * b, dtype=dt)(x2, y, train)
        y = Up(b, dtype=dt)(x1, y, train)

        logits = nn.Conv(
            self.num_classes, (1, 1), dtype=dt, kernel_init=conv_kernel_init
        )(y)
        return logits.astype(jnp.float32)
