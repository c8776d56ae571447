"""Autoencoder models (reference autoencoder/autoencoder.py, NHWC/linen).

Stage 1: `ReconstructionAutoencoder` — 3-block encoder (bias-free convs,
channels base·{1,2,4}; each block returns its pre-pool activation as a
skip and the pooled output), skip-free decoder (3 transpose-conv up
blocks 4b→2b→b→b), head Conv3×3→`dout` + sigmoid
(reference autoencoder/autoencoder.py:171-200).

Stage 2: `SegmentationAutoencoder` — the same encoder (weights
transferable from stage 1 via train.checkpoint.load_subtree, optionally
frozen via the optimizer mask), decoder WITH skips (transpose-conv up,
centre-crop skip on mismatch, concat, doubleconv), 1×1 head to
`num_classes` logits (reference autoencoder/autoencoder.py:271-305).

Encoder freezing is functional here: instead of requires_grad flags the
train step applies `optax.masked`/stop-gradient over the `encoder`
parameter subtree (see train.steps.partition_trainable).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from image_segmentation_tpu.models.layers import (
    ConvBNRelu,
    UpConv,
    center_crop_to,
    conv_kernel_init,
    max_pool_2x2,
)


class EncoderBlock(nn.Module):
    """[Conv3×3 bias-free → BN → ReLU]×2, returning (pooled, pre-pool skip)
    (reference autoencoder/autoencoder.py:6-33)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNRelu(self.features, use_bias=False, dtype=self.dtype)(x, train)
        skip = ConvBNRelu(self.features, use_bias=False, dtype=self.dtype)(x, train)
        return max_pool_2x2(skip), skip


class AEEncoder(nn.Module):
    """3 encoder blocks; returns (bottleneck, skip3, skip2, skip1)
    (reference autoencoder/autoencoder.py:35-54)."""

    base: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = self.base
        x1, skip1 = EncoderBlock(b, self.dtype)(x, train)
        x2, skip2 = EncoderBlock(2 * b, self.dtype)(x1, train)
        bottleneck, skip3 = EncoderBlock(4 * b, self.dtype)(x2, train)
        return bottleneck, skip3, skip2, skip1


class DecoderBlockNoSkips(nn.Module):
    """Transpose-conv up then [Conv→BN→ReLU]×2, no concat
    (reference autoencoder/autoencoder.py:117-146)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = UpConv(self.features, self.dtype)(x)
        x = ConvBNRelu(self.features, use_bias=False, dtype=self.dtype)(x, train)
        x = ConvBNRelu(self.features, use_bias=False, dtype=self.dtype)(x, train)
        return x


class DecoderBlockWithSkips(nn.Module):
    """Transpose-conv up, centre-crop the skip to match, concat, double conv
    (reference autoencoder/autoencoder.py:57-93)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        up = UpConv(self.features, self.dtype)(x)
        if skip.shape[1:3] != up.shape[1:3]:
            skip = center_crop_to(skip, up.shape[1:3])
        x = jnp.concatenate([up, skip], axis=-1)
        x = ConvBNRelu(self.features, use_bias=False, dtype=self.dtype)(x, train)
        x = ConvBNRelu(self.features, use_bias=False, dtype=self.dtype)(x, train)
        return x


class ReconstructionAutoencoder(nn.Module):
    dout: int = 3
    base: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, dt = self.base, self.dtype
        x = x.astype(dt)
        bottleneck, *_ = AEEncoder(b, dt, name="encoder")(x, train)
        y = DecoderBlockNoSkips(2 * b, dt)(bottleneck, train)
        y = DecoderBlockNoSkips(b, dt)(y, train)
        y = DecoderBlockNoSkips(b, dt)(y, train)
        y = nn.Conv(
            self.dout, (3, 3), padding=1, dtype=dt, kernel_init=conv_kernel_init
        )(y)
        return nn.sigmoid(y).astype(jnp.float32)


class SegmentationAutoencoder(nn.Module):
    num_classes: int = 4
    base: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, dt = self.base, self.dtype
        x = x.astype(dt)
        bottleneck, skip3, skip2, skip1 = AEEncoder(b, dt, name="encoder")(x, train)
        y = DecoderBlockWithSkips(2 * b, dt)(bottleneck, skip3, train)
        y = DecoderBlockWithSkips(b, dt)(y, skip2, train)
        y = DecoderBlockWithSkips(b, dt)(y, skip1, train)
        logits = nn.Conv(
            self.num_classes, (1, 1), dtype=dt, kernel_init=conv_kernel_init
        )(y)
        return logits.astype(jnp.float32)
