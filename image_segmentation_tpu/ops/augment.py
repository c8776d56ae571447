"""On-device, jittable, batched augmentation ops.

The reference materialises augmentations OFFLINE with imgaug
(reference utils/augmentation.ipynb cells 1-21; see data/augment.py for
the offline-compatible host pipeline). TPU-first, the same 8 transforms
are also implemented here as pure-jnp batched ops on fixed-shape
(N, S, S, C) arrays, so augmentation can run ONLINE inside the jitted
input pipeline — zero host work, new samples every epoch (a capability
the reference lacks; parameters match its augmenters):

  rotation 45-315° with fit-output scaling   (cell 3)
  centre / random square crop               (cell 5)
  coarse dropout p=0.15, cells ~2% of side  (cell 7, applied to image
                                             AND label with the same
                                             mask — imgaug random_state=2
                                             shared by both)
  grayscale                                  (cell 9)
  additive Laplace noise, scale U(0.1,0.3)  (cell 11, per-channel)
  average blur k=12                          (cell 13)
  linear contrast alpha U(0.2,0.6) @ 0.5    (cell 15)

All geometric transforms are affine resamples (one gather per output
pixel, vmapped over the batch) — no dynamic shapes anywhere.
Images float32 [0,1]; labels int32.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Affine warp core
# ---------------------------------------------------------------------------


def _affine_sample(img, A, method: str):
    """Sample (H,W,C) `img` at output grid mapped through the 2×3 affine
    `A` (output (y,x,1) → input (y,x)); out-of-range fills 0."""
    h, w = img.shape[:2]
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    sy = A[0, 0] * yy + A[0, 1] * xx + A[0, 2]
    sx = A[1, 0] * yy + A[1, 1] * xx + A[1, 2]

    if method == "nearest":
        yi = jnp.round(sy).astype(jnp.int32)
        xi = jnp.round(sx).astype(jnp.int32)
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yi = jnp.clip(yi, 0, h - 1)
        xi = jnp.clip(xi, 0, w - 1)
        out = img[yi, xi]
        return jnp.where(valid[..., None], out, jnp.zeros_like(out))

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy = (sy - y0)[..., None]
    fx = (sx - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(valid[..., None], v, jnp.zeros_like(v))

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def _center_affine(scale, angle_rad, size: int):
    """Affine mapping output coords → input coords: rotate by `angle` and
    zoom by `scale` about the image centre (inverse map)."""
    c = (size - 1) / 2.0
    cos = jnp.cos(angle_rad)
    sin = jnp.sin(angle_rad)
    inv_s = 1.0 / scale
    # inverse of (rotate θ, scale s) = rotate -θ, scale 1/s
    a00 = cos * inv_s
    a01 = sin * inv_s
    a10 = -sin * inv_s
    a11 = cos * inv_s
    return jnp.array(
        [
            [a00, a01, c - a00 * c - a01 * c],
            [a10, a11, c - a10 * c - a11 * c],
        ],
        jnp.float32,
    )


# ---------------------------------------------------------------------------
# Individual augmentations (single image + label; vmap for batches)
# ---------------------------------------------------------------------------


def rotate_fit(img, label, key):
    """Rotate by U(45°, 315°), scaling down so the rotated canvas fits
    (imgaug Affine(rotate, fit_output=True) + resize back — cell 3)."""
    angle = jax.random.uniform(key, (), minval=45.0, maxval=315.0)
    rad = angle * (jnp.pi / 180.0)
    fit = 1.0 / (jnp.abs(jnp.cos(rad)) + jnp.abs(jnp.sin(rad)))
    A = _center_affine(fit, rad, img.shape[0])
    return (
        _affine_sample(img, A, "linear"),
        _affine_sample(label[..., None].astype(jnp.float32), A, "nearest")[..., 0]
        .astype(label.dtype),
    )


def random_square_crop(img, label, key, min_scale: float = 0.5):
    """Random zoom-crop: crop a square of side U(min_scale, 1)·S at a
    random position, resize back to S (the fixed-shape analogue of
    RandomSquareCropAugmenter — cell 5)."""
    k1, k2, k3 = jax.random.split(key, 3)
    size = img.shape[0]
    s = jax.random.uniform(k1, (), minval=min_scale, maxval=1.0)
    # output index size-1 samples source s*(size-1)+offset, so the offset
    # bound is (size-1)*(1-s) — `size - s*size` would let edge pixels
    # sample past the last input pixel (zero fill bleeding into the label
    # border)
    oy = jax.random.uniform(k2, (), maxval=(size - 1.0) * (1.0 - s))
    ox = jax.random.uniform(k3, (), maxval=(size - 1.0) * (1.0 - s))
    A = jnp.array(
        [[s, 0.0, oy], [0.0, s, ox]], jnp.float32
    )  # out (y,x) -> in (s*y+oy, s*x+ox)
    return (
        _affine_sample(img, A, "linear"),
        _affine_sample(label[..., None].astype(jnp.float32), A, "nearest")[..., 0]
        .astype(label.dtype),
    )


def center_square_crop(img, label, key=None, scale: float = 0.75):
    """Centre zoom-crop at a fixed scale (CenterSquareCropAugmenter is
    deterministic on the already-square base — cell 5)."""
    size = img.shape[0]
    off = (1.0 - scale) * size / 2.0
    A = jnp.array([[scale, 0.0, off], [0.0, scale, off]], jnp.float32)
    return (
        _affine_sample(img, A, "linear"),
        _affine_sample(label[..., None].astype(jnp.float32), A, "nearest")[..., 0]
        .astype(label.dtype),
    )


def coarse_dropout(img, label, key, p: float = 0.15, size_percent: float = 1 / 50):
    """Drop coarse cells (side = size_percent·S) with probability p, in the
    IMAGE and the LABEL (the reference shares the dropout mask between
    both via random_state=2 — cell 7)."""
    size = img.shape[0]
    cells = max(1, int(round(size * size_percent)))
    keep = jax.random.uniform(key, (cells, cells)) >= p
    mask = jax.image.resize(
        keep.astype(jnp.float32), (size, size), method="nearest"
    )
    img = img * mask[..., None]
    label = (label.astype(jnp.float32) * mask).astype(label.dtype)
    return img, label


def grayscale(img, label, key=None):
    """ITU-R BT.601 luma replicated to 3 channels (imgaug Grayscale — cell 9)."""
    luma = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    return jnp.stack([luma, luma, luma], axis=-1), label


def laplace_noise(img, label, key, lo: float = 0.1, hi: float = 0.3):
    """Additive per-channel Laplace noise with scale U(lo, hi) (in [0,1]
    units; the reference's (0.1·255, 0.3·255) on uint8 — cell 11)."""
    k1, k2 = jax.random.split(key)
    scale = jax.random.uniform(k1, (), minval=lo, maxval=hi)
    noise = jax.random.laplace(k2, img.shape) * scale
    return jnp.clip(img + noise, 0.0, 1.0), label


def average_blur(img, label, key=None, k: int = 12):
    """Box blur with a k×k kernel (imgaug AverageBlur(k=12) — cell 13),
    as two separable depthwise convolutions (VPU-friendly)."""
    kern = jnp.ones((k,), jnp.float32) / k
    x = img.transpose(2, 0, 1)[:, None]  # (C,1,S,S)
    x = jax.lax.conv_general_dilated(
        x, kern.reshape(1, 1, k, 1), (1, 1), padding="SAME"
    )
    x = jax.lax.conv_general_dilated(
        x, kern.reshape(1, 1, 1, k), (1, 1), padding="SAME"
    )
    return x[:, 0].transpose(1, 2, 0), label


def linear_contrast(img, label, key, lo: float = 0.2, hi: float = 0.6):
    """out = 0.5 + alpha·(x − 0.5), alpha ~ U(lo, hi) (imgaug
    LinearContrast centred at 127 on uint8 — cell 15)."""
    alpha = jax.random.uniform(key, (), minval=lo, maxval=hi)
    return jnp.clip(0.5 + alpha * (img - 0.5), 0.0, 1.0), label


AUGMENTERS = (
    rotate_fit,
    center_square_crop,
    random_square_crop,
    coarse_dropout,
    grayscale,
    laplace_noise,
    average_blur,
    linear_contrast,
)
AUGMENTER_NAMES = (
    "rotation",
    "center_crop",
    "random_crop",
    "masking",
    "grayscale",
    "laplace",
    "blur",
    "contrast",
)


@functools.partial(jax.jit, static_argnames=("p_augment",))
def random_augment_batch(
    images: jnp.ndarray,
    labels: jnp.ndarray,
    key: jax.Array,
    p_augment: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply one uniformly-chosen augmenter (or identity with probability
    1 − p_augment) independently per sample — the online equivalent of the
    reference's 8-way offline expansion, fully fused under jit."""

    def one(img, label, key):
        k_sel, k_gate, k_aug = jax.random.split(key, 3)
        idx = jax.random.randint(k_sel, (), 0, len(AUGMENTERS))
        branches = [
            (lambda im, lb, kk, fn=fn: fn(im, lb, kk)) for fn in AUGMENTERS
        ]
        aug_img, aug_lab = jax.lax.switch(idx, branches, img, label, k_aug)
        use = jax.random.uniform(k_gate) < p_augment
        return (
            jnp.where(use, aug_img, img),
            jnp.where(use, aug_lab, label),
        )

    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(one)(images, labels, keys)
