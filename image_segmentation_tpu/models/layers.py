"""Shared conv building blocks (Flax linen, NHWC, TPU-native layout).

The reference composes every model out of [Conv3×3 → BN → ReLU]×2 blocks
plus maxpool-2×2 downs and transpose-conv-2×2-stride-2 ups
(reference unet/unet.py:4-64, autoencoder/autoencoder.py:6-33,57-93,
clip/clipunet.py:86-93). Here the same blocks are linen modules in NHWC
with a configurable compute dtype (bfloat16 on TPU; params stay float32)
so XLA fuses BN+ReLU into the convolution epilogues and tiles the convs
onto the MXU.

BatchNorm semantics: torch momentum 0.1 ≡ flax momentum 0.9 (flax's is
the decay of the old stat), eps 1e-5. Under `jit` over a data mesh the
batch axis is sharded, so batch statistics are computed globally by XLA
collectives — i.e. sync-BN across replicas (decision recorded per
SURVEY.md §5.8; the reference had single-device per-microbatch stats).

Initialisation: He/Kaiming-uniform with fan_in — the variance torch uses
for conv layers feeding ReLU.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

conv_kernel_init = nn.initializers.variance_scaling(
    2.0, "fan_in", "uniform"
)


class ConvBNRelu(nn.Module):
    """Conv3×3 (pad 1) → BatchNorm → ReLU."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (3, 3),
            padding=1,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=conv_kernel_init,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )(x)
        return nn.relu(x)


class DoubleConv(nn.Module):
    """[Conv3×3 → BN → ReLU] × 2 (reference unet/unet.py:4-25)."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNRelu(self.features, self.use_bias, self.dtype)(x, train)
        x = ConvBNRelu(self.features, self.use_bias, self.dtype)(x, train)
        return x


def max_pool_2x2(x):
    """MaxPool kernel 2 stride 2 (reference unet/unet.py:40)."""
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


class Down(nn.Module):
    """MaxPool2×2 then DoubleConv (reference unet/unet.py:28-45)."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return DoubleConv(self.features, self.use_bias, self.dtype)(
            max_pool_2x2(x), train
        )


class UpConv(nn.Module):
    """Transpose-conv kernel 2 stride 2 (doubles H, W; reference
    unet/unet.py:59). With k == s the output is exactly 2H×2W."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(
            self.features,
            (2, 2),
            strides=(2, 2),
            padding="VALID",
            dtype=self.dtype,
            kernel_init=conv_kernel_init,
        )(x)


class Up(nn.Module):
    """Upsample ×2 via transpose conv (halving channels), concat the skip,
    DoubleConv (reference unet/unet.py:47-64: cat[skip, up(x)])."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, skip, x, train: bool = False):
        up = UpConv(self.features, self.dtype)(x)
        x = jnp.concatenate([skip, up], axis=-1)
        return DoubleConv(self.features, self.use_bias, self.dtype)(x, train)


def center_crop_to(x, target_hw: Sequence[int]):
    """Centre-crop spatial dims of NHWC `x` down to target (H, W) — the
    skip/upsample reconciliation in the AE decoder
    (reference autoencoder/autoencoder.py:82-88)."""
    h, w = x.shape[1], x.shape[2]
    th, tw = target_hw
    dy, dx = h - th, w - tw
    if dy < 0 or dx < 0:
        raise ValueError("Upsampled larger than skip")
    return x[:, dy // 2 : dy // 2 + th, dx // 2 : dx // 2 + tw, :]
