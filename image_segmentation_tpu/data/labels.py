"""Label semantics: class-id maps, remapping, class weights.

The cross-cutting contract (SURVEY.md §2.2):
  on-disk labels are class-id PNGs — 0 background, 1 cat, 2 dog,
  255 boundary; training remaps 255→3 (reference utils/dataset.py:131-138)
  so NUM_CLASSES=4 with boundary trained on but ignored in eval metrics.
  Prompt task relabels to {0 deactivated, 1 bg+boundary, 2 cat, 3 dog}.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def target_remap(label: np.ndarray, boundary_value: int = 255, to: int = 3):
    """Remap the boundary sentinel (255) to class id 3.

    Reference utils/dataset.py:131-138 (in-place on torch tensors; here a
    pure function)."""
    label = np.asarray(label)
    return np.where(label == boundary_value, to, label).astype(label.dtype)


def convert_rgb_label_to_classes(label_rgb: np.ndarray) -> np.ndarray:
    """HxWx3 RGB course mask → HxW class ids.

    black/white → 0 (background), (128,0,0) → 1 (cat), (0,128,0) → 2 (dog),
    anything else → 255 (ignore). Reference utils/utils.py:201-250.
    """
    if label_rgb.ndim != 3 or label_rgb.shape[2] != 3:
        raise ValueError(
            f"Input label must be HxWx3 RGB, got shape {label_rgb.shape}"
        )
    h, w, _ = label_rgb.shape
    out = np.full((h, w), 255, dtype=np.uint8)
    out[np.all(label_rgb == (0, 0, 0), axis=2)] = 0
    out[np.all(label_rgb == (255, 255, 255), axis=2)] = 0
    out[np.all(label_rgb == (128, 0, 0), axis=2)] = 1
    out[np.all(label_rgb == (0, 128, 0), axis=2)] = 2
    return out


def remap_for_prompt_task(label: np.ndarray) -> np.ndarray:
    """Segmentation ids {0 bg, 1 cat, 2 dog, 255 boundary} → prompt-task ids
    {1 bg+boundary, 2 cat, 3 dog} with 0 reserved for 'deactivated'
    (reference augmentation.ipynb cell 23: remap 255→3, then 3→0, then +1)."""
    label = target_remap(label)  # 255 -> 3
    label = np.where(label == 3, 0, label)  # boundary joins background
    return (label + 1).astype(label.dtype)


def calculate_class_weights(
    labels: Sequence[np.ndarray],
    num_classes: int,
    ignore_index: Optional[int] = None,
    unimportant_class_indices: Optional[List[int]] = None,
    target_unimportant_weight: float = 1.0,
    normalize_target_sum: float = -1.0,
    verbose: bool = False,
) -> np.ndarray:
    """Inverse-pixel-frequency class weights.

    Reference utils/utils.py:117-198: count pixels per class over the label
    source (values clamped to [0, C-1], ignore_index pixels excluded),
    weights = 1/(freq + 1e-6); the 'MinWeight' scheme sets listed classes to
    the minimum weight; finally normalise so the weights sum to
    `normalize_target_sum` (num_classes when -1).

    `labels` is any iterable of integer arrays (file loading is the
    caller's concern — keeps this pure and testable).
    """
    counts = np.zeros(num_classes, dtype=np.float64)
    total = 0
    for label in labels:
        flat = np.asarray(label).reshape(-1).astype(np.int64)
        if ignore_index is not None:
            flat = flat[flat != ignore_index]
        flat = np.clip(flat, 0, num_classes - 1)
        if flat.size:
            counts += np.bincount(flat, minlength=num_classes).astype(np.float64)
            total += flat.size
    if verbose:
        print(f"Raw pixel counts per class: {counts.astype(np.int64).tolist()}")
        print(f"Total valid pixels counted: {total}")
    frequencies = counts / max(total, 1)
    weights = 1.0 / (frequencies + 1e-6)
    if unimportant_class_indices:
        for idx in unimportant_class_indices:
            weights[idx] = weights.min()
    target_sum = normalize_target_sum if normalize_target_sum > 0 else float(num_classes)
    final = weights / weights.sum() * target_sum
    if verbose:
        print(f"Calculated Final Class Weights: {final.tolist()}")
    return final.astype(np.float32)


# Webapp colour map: 0→black, 1→red, 2→green, 3→blue
# (reference segmentation_webapp/app.py:187-192)
COLOR_MAP = np.array(
    [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
)


def colorize_mask(mask: np.ndarray, color_map: np.ndarray = COLOR_MAP) -> np.ndarray:
    """HxW class ids → HxWx3 uint8 RGB using the webapp colour map."""
    mask = np.asarray(mask)
    mask = np.clip(mask, 0, len(color_map) - 1).astype(np.int64)
    return color_map[mask]
