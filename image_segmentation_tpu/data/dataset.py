"""Datasets: directory-backed and in-memory image/label(+heatmap) pairs.

Reference behavior (utils/dataset.py:6-103): items are keyed by sorted
file stems; images are decoded and scaled to [0,1] float; labels are raw
class-id PNGs; heatmaps are [0,1] float PNGs; an optional
target_transform (the 255→3 boundary remap) applies to labels.

Decoding uses PIL on the host — but unlike the reference's per-step
DataLoader decode, the training path materialises the dataset ONCE into
fixed-shape arrays (data.loader.materialize) so the TPU is never
input-starved (SURVEY.md §7 'throughput north star').
"""
from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def _decode_image(path: str) -> np.ndarray:
    """Decode to (H, W, C) uint8 (RGB kept as-is; palettes expanded)."""
    if Image is None:
        raise RuntimeError("PIL is required for file datasets")
    with Image.open(path) as im:
        if im.mode == "P":
            im = im.convert("RGB")
        arr = np.asarray(im)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def normalize_image_channels(arr: np.ndarray) -> np.ndarray:
    """(H, W[, C]) → (H, W, 3): drop alpha (RGBA), drop alpha then
    replicate gray (LA), replicate gray (L). THE single definition of
    the image channel rules (reference utils/utils.py:92-93) — shared by
    the file datasets, the native-pipeline fallback and serving upload
    decode so they cannot diverge."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.shape[2] == 4:
        arr = arr[:, :, :3]
    if arr.shape[2] == 2:
        arr = arr[:, :, :1]
    if arr.shape[2] == 1:
        arr = np.repeat(arr, 3, axis=2)
    return arr


def list_stems(directory: str) -> List[str]:
    """Sorted extension-less file stems (reference utils/dataset.py:20)."""
    return sorted(os.path.splitext(f)[0] for f in os.listdir(directory))


class SegmentationDataset:
    """{img_dir}/{stem}.jpg + {label_dir}/{stem}.png
    (reference utils/dataset.py:6-51)."""

    def __init__(
        self,
        img_dir: str,
        label_dir: str,
        transform: Optional[Callable] = None,
        target_transform: Optional[Callable] = None,
        img_ext: str = ".jpg",
        label_ext: str = ".png",
    ):
        self.img_dir = img_dir
        self.label_dir = label_dir
        self.stems = list_stems(img_dir)
        self.transform = transform
        self.target_transform = target_transform
        self.img_ext = img_ext
        self.label_ext = label_ext

    def __len__(self) -> int:
        return len(self.stems)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        stem = self.stems[idx]
        img = _decode_image(os.path.join(self.img_dir, stem + self.img_ext))
        img = normalize_image_channels(img).astype(np.float32) / 255.0
        label = _decode_image(os.path.join(self.label_dir, stem + self.label_ext))
        label = label[:, :, 0].astype(np.int32)
        if self.transform:
            img = self.transform(img)
        if self.target_transform:
            label = self.target_transform(label)
        return img, label


class PromptDataset:
    """Image + point-prompt heatmap + label triplets
    (reference utils/dataset.py:53-103)."""

    def __init__(
        self,
        img_dir: str,
        heatmap_dir: str,
        label_dir: str,
        transform: Optional[Callable] = None,
        target_transform: Optional[Callable] = None,
    ):
        self.img_dir = img_dir
        self.heatmap_dir = heatmap_dir
        self.label_dir = label_dir
        self.stems = list_stems(img_dir)
        self.transform = transform
        self.target_transform = target_transform

    def __len__(self) -> int:
        return len(self.stems)

    def __getitem__(self, idx: int):
        stem = self.stems[idx]
        img = _decode_image(os.path.join(self.img_dir, stem + ".jpg"))
        img = normalize_image_channels(img).astype(np.float32) / 255.0
        heatmap = _decode_image(os.path.join(self.heatmap_dir, stem + ".png"))
        heatmap = heatmap[:, :, :1].astype(np.float32) / 255.0
        label = _decode_image(os.path.join(self.label_dir, stem + ".png"))
        label = label[:, :, 0].astype(np.int32)
        if self.transform:
            img = self.transform(img)
        if self.target_transform:
            label = self.target_transform(label)
        return img, heatmap, label


class ArrayDataset:
    """In-memory dataset of pre-decoded items — synthetic data, tests,
    and offline-augmented arrays. Items are (img, label) or
    (img, heatmap, label) tuples of numpy arrays."""

    def __init__(self, items: Sequence[tuple]):
        self.items = list(items)

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, idx: int):
        return self.items[idx]

    def map_labels(self, fn) -> "ArrayDataset":
        """Apply `fn` to every item's label IN PLACE (the label is the
        last tuple element) and return self. In-place matters at scale:
        a full-size offline-augmented train set is ~23k 256² samples,
        and rebuilding a remapped copy doubles host memory."""
        self.items = [(*item[:-1], fn(np.asarray(item[-1])))
                      for item in self.items]
        return self


class U8ArrayDataset(ArrayDataset):
    """ArrayDataset storing float [0,1] images (and heatmaps) QUANTIZED
    to uint8 in memory, dequantizing on access.

    Why: the offline augmentation pipeline (data/augment.py, reference
    utils/augmentation.ipynb C29) expands the Pet train split ~9× to
    ~23k 256² samples; held as float32 that is ~18 GB of host RAM
    before the materialized staging copy even exists (a full-scale run
    measured >100 GB RSS and nearly exhausted the host). Sources are
    8-bit JPEGs, so uint8 is the SOURCE precision — quantization here
    loses nothing the decode hadn't already lost, and cuts storage 4×.
    Labels stay integer and are stored as-is."""

    def __init__(self, items: Sequence[tuple]):
        super().__init__(
            (*(np.clip(np.round(np.asarray(a, np.float32) * 255.0),
                       0, 255).astype(np.uint8) for a in item[:-1]),
             item[-1])
            for item in items
        )

    def __getitem__(self, idx: int):
        item = self.items[idx]
        return (*(a.astype(np.float32) / 255.0 for a in item[:-1]),
                item[-1])
