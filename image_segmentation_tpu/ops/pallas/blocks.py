"""Fused U-Net block ops: down-block and up-block (inference mode).

The reference's structural blocks (SURVEY.md §2.3 kernel list):
  down-block = maxpool2×2 → double-conv   (reference unet/unet.py:28-45)
  up-block   = transpose-conv ×2 → concat skip → double-conv
               (reference unet/unet.py:47-64)

Composition strategy: the double-conv — where the fusion actually pays
(the intermediate activation never leaves VMEM) — runs in the Pallas
kernel (ops/pallas/double_conv.py); the cheap bandwidth-bound
pre-stages (2×2 max-reduce, 2×2-stride-2 transpose conv, channel
concat) stay on XLA, which fuses them with the kernel's input padding.
Hand-writing those pre-stages in Pallas was measured to add nothing
(the double-conv itself already runs at XLA-conv parity) and each extra
construct risks this environment's fragile Mosaic lowering (see the
crasher list in double_conv.py).

BatchNorm is pre-folded via double_conv.fold_bn — inference semantics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from image_segmentation_tpu.ops.pallas.double_conv import fused_double_conv


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC 2×2 stride-2 max pool (XLA reduce_window)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def fused_down_block(
    x, w1, scale1, bias1, w2, scale2, bias2, strip: int = 0,
    interpret: bool = False,
):
    """maxpool2×2 then fused double-conv (reference Down block)."""
    return fused_double_conv(
        max_pool_2x2(x), w1, scale1, bias1, w2, scale2, bias2,
        strip=strip, interpret=interpret,
    )


def transpose_conv_2x2(x, kernel, bias=None):
    """ConvTranspose kernel 2 stride 2 (NHWC, HWIO kernel) — the
    reference's upsampling op; k == s means exact 2× with no overlap."""
    out = jax.lax.conv_transpose(
        x, kernel, strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def fused_up_block(
    skip, x, up_kernel, up_bias, w1, scale1, bias1, w2, scale2, bias2,
    strip: int = 0, interpret: bool = False,
):
    """transpose-conv ×2 (halving channels), concat [skip, up], fused
    double-conv (reference Up block — skip first in the concat,
    unet/unet.py:63)."""
    up = transpose_conv_2x2(x, up_kernel, up_bias)
    cat = jnp.concatenate([skip, up], axis=-1)
    return fused_double_conv(
        cat, w1, scale1, bias1, w2, scale2, bias2,
        strip=strip, interpret=interpret,
    )
