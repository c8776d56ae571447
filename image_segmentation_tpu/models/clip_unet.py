"""ClipUNet: frozen CLIP ViT encoder + U-Net-style decoder, with and
without skip connections (reference clip/clipunet.py, clipunet_noskips.py).

Architecture contract:
  * encoder: ClipViT; bottleneck = final block output reshaped to
    (N, 14, 14, 768); skips = hidden states at indices [3, 5, 7, 9]
    reshaped the same way (reference clip/clipunet.py:43-63);
  * decoder (skips variant, clip/clipunet.py:68-144): 1×1 init conv
    768→1024, then 4 blocks — transpose-conv ×2 halving channels,
    1×1 skip_conv projecting the 768-ch ViT skip to the matching width,
    bilinear-resize the skip to the upsampled resolution, concat,
    bias-free doubleconv; skips consumed deepest-first;
  * decoder (no-skips variant, clipunet_noskips.py:51-118): transpose-conv
    keeping channels, doubleconv to the next width;
  * 1×1 head → num_classes logits; channel schedule
    [1024, 512, 256, 128, 64]; 14×14 → 224×224 over the 4 blocks.

TPU-first: when `freeze_encoder` (the reference default) the ViT outputs
are wrapped in stop_gradient, so the backward pass never materialises
encoder activations — the decoder trains against constant features and
the whole encoder can run in bfloat16.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_segmentation_tpu.models.clip_vit import (
    ClipViT,
    ClipViTConfig,
    tokens_to_grid,
)
from image_segmentation_tpu.models.layers import (
    ConvBNRelu,
    UpConv,
    conv_kernel_init,
)


class ClipDecoderBlock(nn.Module):
    """Up ×2 (channels → in/2), project+resize skip (768 → in/2), concat,
    bias-free doubleconv → out (reference clip/clipunet.py:68-105)."""

    in_channels: int
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        half = self.in_channels // 2
        up = UpConv(half, self.dtype)(x)
        skip = nn.Conv(
            half, (1, 1), dtype=self.dtype, kernel_init=conv_kernel_init,
            name="skip_proj",
        )(skip)
        if skip.shape[1:3] != up.shape[1:3]:
            skip = jax.image.resize(
                skip,
                (skip.shape[0], up.shape[1], up.shape[2], skip.shape[3]),
                method="linear",
            )
        x = jnp.concatenate([up, skip], axis=-1)
        x = ConvBNRelu(self.out_channels, use_bias=False, dtype=self.dtype)(x, train)
        x = ConvBNRelu(self.out_channels, use_bias=False, dtype=self.dtype)(x, train)
        return x


class ClipDecoderBlockNoSkip(nn.Module):
    """Up ×2 keeping channels, then doubleconv to the next width
    (reference clip/clipunet_noskips.py:51-81)."""

    in_channels: int
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = UpConv(self.in_channels, self.dtype)(x)
        x = ConvBNRelu(self.out_channels, use_bias=False, dtype=self.dtype)(x, train)
        x = ConvBNRelu(self.out_channels, use_bias=False, dtype=self.dtype)(x, train)
        return x


def _apply_decoder(num_classes, decoder_channels, dtype, bottleneck, skips,
                   train):
    """Shared decoder assembly: 1×1 init_conv → dec_i blocks → 1×1 head.

    `skips=None` builds the no-skip variant. Called from inside each
    module's @nn.compact so the explicit names (init_conv / dec_i / head)
    land in the caller's scope — ClipUNet, ClipUNetDecoderOnly and
    ClipUNetNoSkips share this one definition, so the verbatim
    params-transfer contract between them cannot drift."""
    ch = list(decoder_channels)
    y = nn.Conv(
        ch[0], (1, 1), dtype=dtype, kernel_init=conv_kernel_init,
        name="init_conv",
    )(bottleneck)
    if skips is None:
        for i in range(len(ch) - 1):
            y = ClipDecoderBlockNoSkip(
                ch[i], ch[i + 1], dtype, name=f"dec_{i}"
            )(y, train)
    else:
        # deepest-first: reversed(skips) (reference clip/clipunet.py:141);
        # zip truncates like the reference's zip(blocks, reversed(skips))
        for i, skip in zip(range(len(ch) - 1), reversed(skips)):
            y = ClipDecoderBlock(ch[i], ch[i + 1], dtype, name=f"dec_{i}")(
                y, skip, train
            )
    logits = nn.Conv(
        num_classes, (1, 1), dtype=dtype, kernel_init=conv_kernel_init,
        name="head",
    )(y)
    return logits.astype(jnp.float32)


class ClipUNet(nn.Module):
    """Reference clip/clipunet.py:147-188."""

    num_classes: int = 4
    decoder_channels: Sequence[int] = (1024, 512, 256, 128, 64)
    skip_indices: Sequence[int] = (3, 5, 7, 9)
    freeze_encoder: bool = True
    vit: ClipViTConfig = ClipViTConfig()
    dtype: Any = jnp.float32
    use_pallas_attention: bool = False
    use_pallas_mlp: Optional[bool] = None  # None -> follow attention flag

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = self.vit.grid_size
        last, hidden = ClipViT(
            self.vit, self.dtype, self.use_pallas_attention,
            self.use_pallas_mlp, name="encoder"
        )(x)
        bottleneck = tokens_to_grid(last, g)
        skips = [tokens_to_grid(hidden[i], g) for i in sorted(self.skip_indices)]
        if self.freeze_encoder:
            bottleneck = jax.lax.stop_gradient(bottleneck)
            skips = [jax.lax.stop_gradient(s) for s in skips]

        return _apply_decoder(
            self.num_classes, self.decoder_channels, self.dtype,
            bottleneck, skips, train,
        )


class ClipUNetDecoderOnly(nn.Module):
    """The ClipUNet decoder consuming PRECOMPUTED encoder features.

    TPU-first optimisation (SURVEY.md §7 'Frozen-CLIP efficiency'): with
    a frozen encoder the ViT output for each (non-augmented) training
    image never changes, so the features can be materialised once and
    the per-step work shrinks to the decoder alone — a throughput win
    the reference never exploited.

    Input `feats` is (N, 1 + len(skip_indices), G, G, H): bottleneck
    first, then the skips in ascending layer order (the packing from
    train.feature_cache.encode_clip_features). Parameter names match
    ClipUNet's decoder exactly (init_conv / dec_i / head), so params
    transfer verbatim between the two modules (same 'params' subtree,
    minus 'encoder').
    """

    num_classes: int = 4
    decoder_channels: Sequence[int] = (1024, 512, 256, 128, 64)
    num_skips: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        bottleneck = feats[:, 0].astype(self.dtype)
        skips = [feats[:, 1 + i].astype(self.dtype)
                 for i in range(self.num_skips)]
        return _apply_decoder(
            self.num_classes, self.decoder_channels, self.dtype,
            bottleneck, skips, train,
        )


class ClipUNetNoSkips(nn.Module):
    """Ablation variant (reference clip/clipunet_noskips.py:121-160)."""

    num_classes: int = 4
    decoder_channels: Sequence[int] = (1024, 512, 256, 128, 64)
    freeze_encoder: bool = True
    vit: ClipViTConfig = ClipViTConfig()
    dtype: Any = jnp.float32
    use_pallas_attention: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = self.vit.grid_size
        last, _ = ClipViT(
            self.vit, self.dtype, self.use_pallas_attention, name="encoder"
        )(x)
        bottleneck = tokens_to_grid(last, g)
        if self.freeze_encoder:
            bottleneck = jax.lax.stop_gradient(bottleneck)

        return _apply_decoder(
            self.num_classes, self.decoder_channels, self.dtype,
            bottleneck, None, train,
        )
