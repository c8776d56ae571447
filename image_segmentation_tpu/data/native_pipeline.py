"""Native materialisation: the C++ data-loader fast path.

The reference loads training data through torch DataLoader worker
processes that re-decode and re-resize every image each epoch (reference
utils/dataset.py:6-51, utils/training.py:40-43). This framework
materialises once (data/loader.py); here that materialisation runs
through the native codec library (ops/native_codec.py →
native/imagecodec.cpp): ONE C call per item does file read → libjpeg/
libpng decode → float staging → resize_with_padding → centred pad, with
the GIL released, fanned out over a thread pool. The PIL/numpy path
remains the fallback (per item, and wholesale when the native library is
unavailable) and the parity oracle (tests/test_native_codec.py).

Measured (this build's single-core host, 48 Pet-sized images → 256px,
keep_orig_labels): 46.5 img/s native vs 31.8 img/s PIL+numpy — 1.46×
from the fused single-call path alone; on multi-core hosts the thread
pool multiplies that (the PIL path is serial Python).

Label transforms: the native path applies `label_transform` AFTER the
nearest resize (the Python datasets apply it before). Nearest resizing
only copies values, so any per-pixel VALUE remap — `target_remap`, the
prompt relabeling — commutes exactly; spatial label transforms do not,
and the dataset fast-path gate only accepts known-elementwise transforms
(`_is_elementwise`).
"""
from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, List, Optional, Sequence

import numpy as np

from image_segmentation_tpu.data import dataset as D
from image_segmentation_tpu.data.labels import target_remap
from image_segmentation_tpu.ops import geometry as G
from image_segmentation_tpu.ops import native_codec as nc


def available() -> bool:
    return nc.available()


def _is_elementwise(fn: Optional[Callable]) -> bool:
    """True for label transforms known to be per-pixel value remaps (safe
    to apply after the nearest resize)."""
    if fn is None:
        return True
    if fn is target_remap:
        return True
    return bool(getattr(fn, "elementwise", False))


def _default_workers() -> int:
    return max(1, min(16, os.cpu_count() or 1))


def _fallback_item(img_path, label_path, heatmap_path, target, antialias):
    """PIL + numpy geometry for one item (native decode declined it)."""
    img = D.normalize_image_channels(
        D._decode_image(img_path)
    ).astype(np.float32) / 255.0
    out, meta = G.resize_with_padding_np(
        img, target, method="linear", antialias=antialias
    )
    lab = D._decode_image(label_path)[:, :, 0].astype(np.int32)
    lab_out, _ = G.resize_with_padding_np(
        lab[:, :, None].astype(np.float32), target, method="nearest"
    )
    heat_out = None
    if heatmap_path is not None:
        heat = D._decode_image(heatmap_path)[:, :, :1].astype(np.float32) / 255.0
        heat_out, _ = G.resize_with_padding_np(
            heat, target, method="linear", antialias=antialias
        )
    return (
        out.astype(np.float32),
        lab_out[:, :, 0].astype(np.int32),
        meta,
        lab,
        heat_out,
    )


def materialize_paths(
    img_paths: Sequence[str],
    label_paths: Sequence[str],
    target_size: int,
    heatmap_paths: Optional[Sequence[str]] = None,
    keep_orig_labels: bool = False,
    antialias: bool = True,
    label_transform: Optional[Callable] = None,
    workers: Optional[int] = None,
):
    """Materialise (images, labels[, heatmaps], metas[, orig_labels]) from
    file paths through the native codec, threaded across items.

    Returns a data.loader.MaterializedDataset. `label_transform` must be
    an elementwise value remap (see module docstring)."""
    from image_segmentation_tpu.data.loader import MaterializedDataset

    if not nc.available():
        raise RuntimeError("native image codec unavailable")
    n = len(img_paths)
    assert len(label_paths) == n
    if heatmap_paths is not None:
        assert len(heatmap_paths) == n

    images = np.zeros((n, target_size, target_size, 3), np.float32)
    labels = np.zeros((n, target_size, target_size), np.int32)
    heatmaps = (
        np.zeros((n, target_size, target_size, 1), np.float32)
        if heatmap_paths is not None
        else None
    )
    metas_cols = {f: [None] * n for f in G.ResizeMeta._fields}
    origs: List[Optional[np.ndarray]] = [None] * n

    def one(i: int) -> None:
        hp = heatmap_paths[i] if heatmap_paths is not None else None
        try:
            img, meta = nc.load_image(
                img_paths[i], target_size, antialias=antialias
            )
            if keep_orig_labels:
                lab, _, orig = nc.load_label(
                    label_paths[i], target_size, want_orig=True
                )
            else:
                lab, _ = nc.load_label(label_paths[i], target_size)
                orig = None
            heat = (
                nc.load_heatmap(hp, target_size, antialias=antialias)[0]
                if hp is not None
                else None
            )
        except (nc.CodecError, RuntimeError):
            img, lab, meta, orig_full, heat = _fallback_item(
                img_paths[i], label_paths[i], hp, target_size, antialias
            )
            orig = orig_full if keep_orig_labels else None
        if label_transform is not None:
            lab = np.asarray(label_transform(lab), np.int32)
            if orig is not None:
                orig = np.asarray(label_transform(orig), np.int32)
        images[i] = img
        labels[i] = lab
        if heatmaps is not None and heat is not None:
            heatmaps[i] = heat
        if keep_orig_labels:
            origs[i] = orig
        h, w = meta["original_size"]
        nh, nw = meta["new_size"]
        pl_, pt, _, _ = meta["pad"]
        for f, v in zip(
            G.ResizeMeta._fields, (h, w, nh, nw, pt, pl_, meta["scale"])
        ):
            metas_cols[f][i] = v

    nw_ = workers or _default_workers()
    if nw_ <= 1 or n <= 1:
        for i in range(n):
            one(i)
    else:
        with ThreadPoolExecutor(max_workers=nw_) as pool:
            list(pool.map(one, range(n)))

    metas = G.ResizeMeta(
        **{
            f: np.asarray(
                metas_cols[f], dtype=np.float32 if f == "scale" else np.int32
            )
            for f in G.ResizeMeta._fields
        }
    )
    return MaterializedDataset(
        images=images,
        labels=labels,
        metas=metas,
        heatmaps=heatmaps,
        orig_labels=list(origs) if keep_orig_labels else None,
    )


def try_materialize_dataset(
    dataset,
    target_size: int,
    keep_orig_labels: bool = False,
    antialias: bool = True,
    workers: Optional[int] = None,
):
    """Native materialisation of a file-backed dataset, or None when the
    fast path doesn't apply (non-file dataset, image transform present,
    non-elementwise label transform, codec unavailable)."""
    if not nc.available():
        return None
    if isinstance(dataset, D.SegmentationDataset):
        if dataset.transform is not None:
            return None
        if not _is_elementwise(dataset.target_transform):
            return None
        return materialize_paths(
            [os.path.join(dataset.img_dir, s + dataset.img_ext)
             for s in dataset.stems],
            [os.path.join(dataset.label_dir, s + dataset.label_ext)
             for s in dataset.stems],
            target_size,
            keep_orig_labels=keep_orig_labels,
            antialias=antialias,
            label_transform=dataset.target_transform,
            workers=workers,
        )
    if isinstance(dataset, D.PromptDataset):
        if dataset.transform is not None:
            return None
        if not _is_elementwise(dataset.target_transform):
            return None
        return materialize_paths(
            [os.path.join(dataset.img_dir, s + ".jpg") for s in dataset.stems],
            [os.path.join(dataset.label_dir, s + ".png") for s in dataset.stems],
            target_size,
            heatmap_paths=[
                os.path.join(dataset.heatmap_dir, s + ".png")
                for s in dataset.stems
            ],
            keep_orig_labels=keep_orig_labels,
            antialias=antialias,
            label_transform=dataset.target_transform,
            workers=workers,
        )
    return None
