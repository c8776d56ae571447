"""Prompt rendering for interactive serving
(reference segmentation_webapp/app.py:132-184).

Prompt types:
  * points   — filled circles radius 20, then Gaussian blur radius 10
               (σ = r/2 like PIL's GaussianBlur radius semantics);
  * bbox     — filled rectangle;
  * scribble — user-drawn grayscale mask, binarised at threshold 10/255;
  * text     — unsupported: empty mask (the reference returns empty too).

All pure numpy/scipy on the original image resolution; the result is a
float [0,1] HxW heatmap fed to the prompt model alongside the image.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np
from scipy.ndimage import gaussian_filter


def _filled_circle(mask: np.ndarray, cy: int, cx: int, radius: int) -> None:
    h, w = mask.shape
    y0, y1 = max(0, cy - radius), min(h, cy + radius + 1)
    x0, x1 = max(0, cx - radius), min(w, cx + radius + 1)
    if y0 >= y1 or x0 >= x1:
        return
    yy, xx = np.ogrid[y0:y1, x0:x1]
    mask[y0:y1, x0:x1][(yy - cy) ** 2 + (xx - cx) ** 2 <= radius**2] = 1.0


def render_points(
    points: Sequence[Dict], size: Tuple[int, int],
    radius: int = 20, blur_radius: int = 10,
) -> np.ndarray:
    """points: [{'x': .., 'y': ..}, ...] in original-image pixels."""
    mask = np.zeros(size, np.float32)
    for p in points:
        _filled_circle(mask, int(round(p["y"])), int(round(p["x"])), radius)
    if blur_radius > 0:
        mask = gaussian_filter(mask, sigma=blur_radius / 2.0)
        m = mask.max()
        if m > 0:
            mask = mask / m
    return np.clip(mask, 0.0, 1.0)


def render_bbox(bbox: Dict, size: Tuple[int, int]) -> np.ndarray:
    """bbox: {'x','y','width','height'} in original-image pixels."""
    mask = np.zeros(size, np.float32)
    # extent from the RAW origin, then clip both edges — clamping the
    # origin first would shift (and enlarge) a box that starts off-canvas
    # instead of clipping it (reference PIL draw.rectangle clips)
    x0r = int(round(bbox["x"]))
    y0r = int(round(bbox["y"]))
    # clamp BOTH edges into [0, size]: a negative end index would wrap
    # around as a Python slice
    x1 = max(0, min(size[1], x0r + max(0, int(round(bbox["width"])))))
    y1 = max(0, min(size[0], y0r + max(0, int(round(bbox["height"])))))
    x0 = max(0, x0r)
    y0 = max(0, y0r)
    mask[y0:y1, x0:x1] = 1.0
    return mask


def render_scribble(scribble: np.ndarray, size: Tuple[int, int],
                    threshold: float = 10 / 255) -> np.ndarray:
    """Binarise a grayscale scribble image at threshold 10 (uint8 scale)."""
    s = np.asarray(scribble, np.float32)
    if s.ndim == 3:
        s = s.mean(axis=-1)
    if s.max() > 1.0:
        s = s / 255.0
    if s.shape != size:
        from image_segmentation_tpu.ops.geometry import resize_nearest_np

        s = resize_nearest_np(s[..., None], size)[..., 0]
    return (s > threshold).astype(np.float32)


def create_prompt_mask(
    prompt_type: str, prompt_data, size: Tuple[int, int]
) -> np.ndarray:
    if prompt_type == "points":
        return render_points(prompt_data or [], size)
    if prompt_type == "bbox":
        return render_bbox(prompt_data, size)
    if prompt_type == "scribble":
        return render_scribble(prompt_data, size)
    # 'text' and unknown types: empty mask (reference app.py:180-184)
    return np.zeros(size, np.float32)
