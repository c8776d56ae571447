"""Aspect-preserving resize+pad geometry, TPU-first.

Reference semantics (reference utils/utils.py:13-115):
  * forward: scale the longer side to `target`, preserve aspect ratio
    (bilinear for images, nearest for labels), centre with zero padding;
    record meta {original_size, new_size, pad, scale}.
  * inverse: crop the padding back out and resize to the original size
    (bilinear for logits, nearest for labels).

The reference runs this as a per-image Python loop on the host CPU
(utils/utils.py:90-96) — a data-pipeline bottleneck. The TPU-native
design here instead does the forward geometry **on device, batched, with
static shapes**: every image is delivered in a fixed-size staging buffer
(content in the top-left corner, edge-replicated to the buffer border)
plus its true (h, w); a vmapped `jax.image.scale_and_translate` with a
per-image scale/translation then produces the (N, T, T, C) batch in one
fused XLA computation. No dynamic shapes, no host round-trips, and the
resampling weights hit the MXU as two small matmuls per image.

The inverse direction produces genuinely dynamic per-image shapes, so it
runs host-side in float32 numpy (`invert_resize_padding_np`) — used only
by the original-resolution eval protocol, where exactness beats speed.
Host and device paths share identical resampling math (both implement
the same triangle-kernel weight matrices as `jax.image`), which the unit
tests assert.

Layout: HWC / NHWC everywhere (TPU-native).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class ResizeMeta(NamedTuple):
    """Per-image geometry metadata (arrays so the whole batch is one pytree).

    Mirrors the reference meta dict (utils/utils.py:43-48).
    """

    orig_h: jnp.ndarray  # int32 ()
    orig_w: jnp.ndarray  # int32 ()
    new_h: jnp.ndarray   # int32 ()
    new_w: jnp.ndarray   # int32 ()
    pad_top: jnp.ndarray   # int32 ()
    pad_left: jnp.ndarray  # int32 ()
    scale: jnp.ndarray     # float32 ()


def compute_meta(h, w, target: int):
    """scale = min(T/h, T/w); new = round(orig*scale); centred padding.

    Works on python ints, numpy or traced jnp scalars.
    Matches reference utils/utils.py:24-38 (round() is round-half-even in
    both numpy and python3).
    """
    hf = jnp.asarray(h, jnp.float32)
    wf = jnp.asarray(w, jnp.float32)
    scale = jnp.minimum(target / hf, target / wf)
    # clamp to >=1: extreme aspect ratios can round the short side to 0
    # (e.g. 3x192 at target 32), which the reference would crash on
    new_h = jnp.maximum(jnp.round(hf * scale), 1).astype(jnp.int32)
    new_w = jnp.maximum(jnp.round(wf * scale), 1).astype(jnp.int32)
    pad_top = (target - new_h) // 2
    pad_left = (target - new_w) // 2
    return ResizeMeta(
        orig_h=jnp.asarray(h, jnp.int32),
        orig_w=jnp.asarray(w, jnp.int32),
        new_h=new_h,
        new_w=new_w,
        pad_top=pad_top,
        pad_left=pad_left,
        scale=scale,
    )


# ---------------------------------------------------------------------------
# Device path: batched, static-shape, jit/vmap-friendly
# ---------------------------------------------------------------------------


def _resize_pad_one_linear(buf, h, w, target: int, antialias: bool):
    """Resize the [:h, :w] content of `buf` (S,S,C) into a centred (T,T,C).

    Implemented as one scale_and_translate: output pixel j samples input
    coordinate ((j - pad + 0.5) * orig/new - 0.5), i.e. half-pixel-centre
    bilinear resize of the content placed at offset `pad` — identical math
    to resizing then padding, but with no dynamic intermediate shape.

    Kernel taps that fall outside the [:h, :w] content must not count
    (torch / torchvision renormalise edge weights over in-bounds taps).
    The staging buffer is zero beyond the content, so dividing by the
    resampled coverage mask restores exactly those renormalised weights:
        out = resample(img · mask) / resample(mask).
    """
    meta = compute_meta(h, w, target)
    sy = meta.new_h.astype(jnp.float32) / meta.orig_h.astype(jnp.float32)
    sx = meta.new_w.astype(jnp.float32) / meta.orig_w.astype(jnp.float32)
    size = buf.shape[0]
    rows_in = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    cols_in = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
    content = ((rows_in < meta.orig_h) & (cols_in < meta.orig_w)).astype(buf.dtype)
    stacked = jnp.concatenate([buf, content[:, :, None]], axis=-1)
    out = jax.image.scale_and_translate(
        stacked,
        shape=(target, target, stacked.shape[-1]),
        spatial_dims=(0, 1),
        scale=jnp.stack([sy, sx]),
        translation=jnp.stack(
            [meta.pad_top.astype(jnp.float32), meta.pad_left.astype(jnp.float32)]
        ),
        method="linear",
        antialias=antialias,
    )
    coverage = out[:, :, -1:]
    out = out[:, :, :-1] / jnp.maximum(coverage, 1e-6)
    rows = jax.lax.broadcasted_iota(jnp.int32, (target, target), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (target, target), 1)
    valid = (
        (rows >= meta.pad_top)
        & (rows < meta.pad_top + meta.new_h)
        & (cols >= meta.pad_left)
        & (cols < meta.pad_left + meta.new_w)
    )
    out = jnp.where(valid[:, :, None], out, 0.0)
    return out, meta


def _resize_pad_one_nearest(buf, h, w, target: int):
    """Nearest-neighbour variant for label maps (fill value 0 = background).

    Legacy floor(dst·in/out) index mapping — what torchvision
    InterpolationMode.NEAREST applies in the reference's forward path
    (utils/utils.py:30 with NEAREST → F.interpolate legacy 'nearest')."""
    meta = compute_meta(h, w, target)
    inv_sy = meta.orig_h.astype(jnp.float32) / meta.new_h.astype(jnp.float32)
    inv_sx = meta.orig_w.astype(jnp.float32) / meta.new_w.astype(jnp.float32)
    j = jnp.arange(target, dtype=jnp.float32)
    src_y = jnp.floor((j - meta.pad_top.astype(jnp.float32)) * inv_sy)
    src_x = jnp.floor((j - meta.pad_left.astype(jnp.float32)) * inv_sx)
    yi = jnp.clip(src_y, 0, meta.orig_h - 1).astype(jnp.int32)
    xi = jnp.clip(src_x, 0, meta.orig_w - 1).astype(jnp.int32)
    out = buf[yi[:, None], xi[None, :], :]
    rows = jax.lax.broadcasted_iota(jnp.int32, (target, target), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (target, target), 1)
    valid = (
        (rows >= meta.pad_top)
        & (rows < meta.pad_top + meta.new_h)
        & (cols >= meta.pad_left)
        & (cols < meta.pad_left + meta.new_w)
    )
    out = jnp.where(valid[:, :, None], out, jnp.zeros_like(out))
    return out, meta


@functools.partial(jax.jit, static_argnames=("target", "method", "antialias"))
def batched_resize_with_padding(
    buffers: jnp.ndarray,
    sizes: jnp.ndarray,
    target: int,
    method: str = "linear",
    antialias: bool = True,
):
    """Batched on-device resize+pad.

    Args:
      buffers: (N, S, S, C) staging buffers; image content occupies
        [:h, :w, :] and is edge-replicated to the buffer border
        (see data.loader.stage_images).
      sizes: (N, 2) int32 true (h, w) per image.
      target: output side T.
      method: 'linear' (images / logits) or 'nearest' (label maps).
      antialias: triangle-kernel antialiasing on downscale (images).

    Returns:
      out: (N, T, T, C); metas: ResizeMeta of (N,)-shaped arrays.
    """
    if method == "linear":
        fn = lambda b, s: _resize_pad_one_linear(b, s[0], s[1], target, antialias)
    elif method == "nearest":
        fn = lambda b, s: _resize_pad_one_nearest(b, s[0], s[1], target)
    else:
        raise ValueError(f"unknown method {method!r}")
    return jax.vmap(fn)(buffers, sizes)


# ---------------------------------------------------------------------------
# Shared resampling math (numpy mirror of jax.image's weight matrices)
# ---------------------------------------------------------------------------


def _native():
    """The C++ resampler (ops.native) if it built; None → numpy fallback.
    Same algorithm in float32 on both paths (tests pin them to ≤5e-6);
    ~7× faster per image when built."""
    try:
        from image_segmentation_tpu.ops import native

        return native if native.available() else None
    except Exception:
        return None


@functools.lru_cache(maxsize=4096)
def _triangle_weight_matrix_np(in_size: int, out_size: int, antialias: bool):
    """(out, in) separable linear-resize weights, half-pixel centres.

    Mirrors jax.image.resize(method='linear'): triangle kernel, scaled by
    1/scale when antialiasing a downscale, edge weights renormalised.
    With antialias=False this is exactly torch F.interpolate(bilinear,
    align_corners=False) — the reference's inverse path
    (utils/utils.py:71-74).
    """
    scale = out_size / in_size
    kernel_scale = max(1.0 / scale, 1.0) if antialias else 1.0
    sample = (np.arange(out_size) + 0.5) / scale - 0.5  # (out,)
    x = np.abs(sample[:, None] - np.arange(in_size)[None, :]) / kernel_scale
    weights = np.clip(1.0 - x, 0.0, 1.0)
    total = weights.sum(axis=1, keepdims=True)
    weights = np.where(total > 1e-7, weights / np.maximum(total, 1e-7), 0.0)
    return weights.astype(np.float64)


def resize_linear_np(img: np.ndarray, out_hw, antialias: bool = False,
                     dtype=np.float64):
    """Separable linear resize of (H, W, C) float array.

    Two small matmuls per image with cached weight matrices; float64 by
    default (metric-parity path), pass dtype=np.float32 for throughput.
    """
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    in_h, in_w = img.shape[:2]
    wy = _triangle_weight_matrix_np(in_h, out_h, antialias).astype(dtype)
    wx = _triangle_weight_matrix_np(in_w, out_w, antialias).astype(dtype)
    # rows: (out_h, in_h) @ (in_h, in_w*C)
    tmp = (wy @ img.astype(dtype).reshape(in_h, -1)).reshape(out_h, in_w, -1)
    # cols: contract in_w against (out_w, in_w) per row
    out = np.einsum("ow,hwc->hoc", wx, tmp, optimize=True)
    return out


def resize_nearest_np(img: np.ndarray, out_hw, exact: bool = True):
    """Nearest resize of (H, W, C). exact=True uses half-pixel centres
    ('nearest-exact'); exact=False uses the legacy floor(dst*in/out) that
    torch F.interpolate(mode='nearest') applies (reference inverse path for
    labels)."""
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    in_h, in_w = img.shape[:2]
    if exact:
        yi = np.floor((np.arange(out_h) + 0.5) * in_h / out_h).astype(np.int64)
        xi = np.floor((np.arange(out_w) + 0.5) * in_w / out_w).astype(np.int64)
    else:
        yi = np.floor(np.arange(out_h) * in_h / out_h).astype(np.int64)
        xi = np.floor(np.arange(out_w) * in_w / out_w).astype(np.int64)
    yi = np.clip(yi, 0, in_h - 1)
    xi = np.clip(xi, 0, in_w - 1)
    return img[yi[:, None], xi[None, :], ...]


# ---------------------------------------------------------------------------
# Host path: single-image forward (offline materialisation) and the inverse
# ---------------------------------------------------------------------------


def resize_with_padding_np(
    img: np.ndarray, target: int, method: str = "linear", antialias: bool = True
):
    """Host-side forward geometry for one (H, W, C) image.

    Same math as the device path; used by the offline augmentation
    materialiser and anywhere a single host image needs staging.
    Returns (out (T, T, C) float64-or-input-dtype, meta dict of ints).
    """
    h, w = img.shape[:2]
    scale = min(target / h, target / w)
    new_h = max(1, int(round(h * scale)))
    new_w = max(1, int(round(w * scale)))
    pad_top = (target - new_h) // 2
    pad_left = (target - new_w) // 2
    native = _native()
    if method == "linear":
        if native is not None and img.ndim == 3:
            resized = native.resize_linear(img, (new_h, new_w), antialias=antialias)
        else:
            resized = resize_linear_np(
                img, (new_h, new_w), antialias=antialias, dtype=np.float32
            )
    elif method == "nearest":
        # legacy floor(dst*in/out) mapping — matches the reference's
        # torchvision NEAREST forward path for label maps
        if native is not None and img.ndim == 3 and np.issubdtype(
            np.asarray(img).dtype, np.floating
        ):
            resized = native.resize_nearest(img, (new_h, new_w), exact=False)
        else:
            resized = resize_nearest_np(img, (new_h, new_w), exact=False)
    else:
        raise ValueError(method)
    out = np.zeros((target, target) + img.shape[2:], dtype=resized.dtype)
    out[pad_top : pad_top + new_h, pad_left : pad_left + new_w] = resized
    meta = {
        "original_size": (h, w),
        "new_size": (new_h, new_w),
        "pad": (pad_left, pad_top, target - new_w - pad_left, target - new_h - pad_top),
        "scale": scale,
    }
    return out, meta


def invert_resize_padding_np(
    out_tt: np.ndarray, meta, method: str = "linear"
) -> np.ndarray:
    """Inverse geometry: crop padding, resize back to the original size.

    `out_tt` is (T, T, C); `meta` is a dict from resize_with_padding_np or a
    ResizeMeta of scalars. Bilinear here is align_corners=False without
    antialias — exactly the reference's F.interpolate call
    (utils/utils.py:71-74). Runs host-side because the output shape is
    per-image dynamic (the original-resolution eval protocol,
    utils/training.py:87-101).
    """
    if isinstance(meta, ResizeMeta):
        pad_top = int(meta.pad_top)
        pad_left = int(meta.pad_left)
        new_h, new_w = int(meta.new_h), int(meta.new_w)
        orig_h, orig_w = int(meta.orig_h), int(meta.orig_w)
    else:
        pad_left, pad_top, _, _ = meta["pad"]
        new_h, new_w = meta["new_size"]
        orig_h, orig_w = meta["original_size"]
    native = _native()
    if native is not None and out_tt.ndim == 3:
        if method == "linear":
            return native.resize_linear(
                out_tt, (orig_h, orig_w), antialias=False,
                crop=(pad_top, pad_left, new_h, new_w),
            )
        if method == "nearest":
            return native.resize_nearest(
                out_tt, (orig_h, orig_w), exact=False,
                crop=(pad_top, pad_left, new_h, new_w),
            )
    crop = out_tt[pad_top : pad_top + new_h, pad_left : pad_left + new_w]
    if method == "linear":
        # float32 like the native path, so metrics don't depend on whether
        # the C++ library built (paths agree to ≤1e-7 either way)
        return resize_linear_np(
            crop, (orig_h, orig_w), antialias=False, dtype=np.float32
        )
    elif method == "nearest":
        return resize_nearest_np(crop, (orig_h, orig_w), exact=False)
    raise ValueError(method)


def stage_image_np(img: np.ndarray, buffer_size: int) -> np.ndarray:
    """Place (h, w, C) content in the top-left of a zero-filled (S, S, C)
    staging buffer (the device resampler masks out-of-content taps itself).

    If the image is larger than the buffer it is first downscaled
    (aspect-preserving, antialiased) so the longer side equals S — the
    subsequent on-device resize then works from this proxy. Returns the
    buffer; the true content size must be tracked by the caller.
    """
    h, w = img.shape[:2]
    if max(h, w) > buffer_size:
        s = buffer_size / max(h, w)
        nh, nw = max(1, int(round(h * s))), max(1, int(round(w * s)))
        img = resize_linear_np(img.astype(np.float64), (nh, nw), antialias=True)
        h, w = nh, nw
    buf = np.pad(
        img,
        [(0, buffer_size - h), (0, buffer_size - w)] + [(0, 0)] * (img.ndim - 2),
        mode="constant",
    )
    return buf


def metas_to_list(metas: ResizeMeta) -> Sequence[ResizeMeta]:
    """Split a batched ResizeMeta (arrays of shape (N,)) into per-image
    scalar ResizeMetas for the host-side inverse path."""
    n = int(np.asarray(metas.orig_h).shape[0])
    out = []
    for i in range(n):
        out.append(ResizeMeta(*(np.asarray(f)[i] for f in metas)))
    return out
