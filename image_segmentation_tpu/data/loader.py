"""Materialisation + batching: keep the TPU fed.

The reference re-decodes and re-resizes every image on every epoch in
DataLoader workers plus a per-image Python loop (reference
utils/training.py:40-43 → utils/utils.py:77-96) — a host bottleneck.
Here each dataset is materialised ONCE into fixed-shape float32 arrays
(geometry on host or staged through the batched device resampler), and
epochs are pure array indexing: zero per-step decode/resize work, so
steps stream to the device back-to-back.

A materialised dataset keeps:
  images  (N, T, T, 3) float32 — resized+padded inputs
  labels  (N, T, T)    int32   — nearest-resized class ids
  heatmaps(N, T, T, 1) float32 — prompt heatmaps (prompt task only)
  metas   ResizeMeta of (N,) arrays — for the inverse eval geometry
  orig_labels list[np.ndarray] — untouched GT at native size (eval only)
"""
from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional

import numpy as np

from image_segmentation_tpu.ops import geometry as G


@dataclasses.dataclass
class MaterializedDataset:
    images: np.ndarray
    labels: np.ndarray
    metas: G.ResizeMeta  # arrays of shape (N,)
    heatmaps: Optional[np.ndarray] = None
    orig_labels: Optional[List[np.ndarray]] = None
    # lazily packed by train.fast_eval for the device-side eval protocol
    label_canvases: Optional[np.ndarray] = None
    # device-resident copy (inputs, metas, canvases) built once by
    # train.loop._evaluate_device when the set fits the HBM budget; stale
    # if images/heatmaps/orig_labels are mutated afterwards
    device_eval_cache: Optional[tuple] = None
    # device-resident (contract_key, arrays) built once by train.loop's
    # fit / fit_reconstruction for the single-dispatch-per-epoch train
    # path; the key tags payload kind + residency dtype + mesh layout so
    # the two trainers never reuse each other's upload
    device_train_cache: Optional[tuple] = None
    # canvas-size bucket views built lazily by train.loop's device eval
    # ([] = planner chose a single bucket); each view is itself a
    # MaterializedDataset carrying its own canvases + device cache
    bucket_views: Optional[list] = None

    def __len__(self) -> int:
        return self.images.shape[0]

    @property
    def has_heatmaps(self) -> bool:
        return self.heatmaps is not None


def materialize(
    dataset,
    target_size: int,
    keep_orig_labels: bool = False,
    antialias: bool = True,
    native: bool = True,
) -> MaterializedDataset:
    """Resize+pad every item to (T, T) once, on the host.

    Works for (img, label) and (img, heatmap, label) datasets. File-backed
    datasets without image transforms take the native C++ decode+staging
    path (data/native_pipeline.py) when the codec library built;
    everything else (and `native=False`) uses the PIL + numpy loop below.
    """
    if native:
        from image_segmentation_tpu.data import native_pipeline as NP

        fast = NP.try_materialize_dataset(
            dataset, target_size,
            keep_orig_labels=keep_orig_labels, antialias=antialias,
        )
        if fast is not None:
            return fast
    images, labels, heatmaps, metas_list, origs = [], [], [], None, []
    metas_cols = {f: [] for f in G.ResizeMeta._fields}
    has_heat = False
    for i in range(len(dataset)):
        item = dataset[i]
        if len(item) == 3:
            img, heat, label = item
            has_heat = True
        else:
            img, label = item
            heat = None
        img = np.asarray(img, dtype=np.float32)
        out, meta = G.resize_with_padding_np(
            img, target_size, method="linear", antialias=antialias
        )
        images.append(out.astype(np.float32))
        lab = np.asarray(label)
        lab_out, _ = G.resize_with_padding_np(
            lab[:, :, None].astype(np.float32), target_size, method="nearest"
        )
        labels.append(lab_out[:, :, 0].astype(np.int32))
        if heat is not None:
            h_out, _ = G.resize_with_padding_np(
                np.asarray(heat, dtype=np.float32), target_size,
                method="linear", antialias=antialias,
            )
            heatmaps.append(h_out.astype(np.float32))
        h, w = meta["original_size"]
        nh, nw = meta["new_size"]
        pl_, pt, _, _ = meta["pad"]
        for f, v in zip(
            G.ResizeMeta._fields, (h, w, nh, nw, pt, pl_, meta["scale"])
        ):
            metas_cols[f].append(v)
        if keep_orig_labels:
            origs.append(lab.astype(np.int32))
    metas = G.ResizeMeta(
        **{
            f: np.asarray(
                metas_cols[f], dtype=np.float32 if f == "scale" else np.int32
            )
            for f in G.ResizeMeta._fields
        }
    )
    return MaterializedDataset(
        images=np.stack(images),
        labels=np.stack(labels),
        metas=metas,
        heatmaps=np.stack(heatmaps) if has_heat else None,
        orig_labels=origs if keep_orig_labels else None,
    )


def train_batches(
    data: MaterializedDataset,
    batch_size: int,
    rng: np.random.Generator,
    drop_last: bool = True,
) -> Iterator[tuple]:
    """Shuffled epoch iterator of stacked fixed-shape batches.

    Yields (images, labels) or (images, heatmaps, labels) numpy tuples.
    drop_last keeps every batch the same shape (one XLA compilation).
    """
    n = len(data)
    order = rng.permutation(n)
    end = n - (n % batch_size) if drop_last else n
    for start in range(0, end, batch_size):
        idx = order[start : start + batch_size]
        if data.has_heatmaps:
            yield data.images[idx], data.heatmaps[idx], data.labels[idx]
        else:
            yield data.images[idx], data.labels[idx]


def eval_batches(
    data: MaterializedDataset, batch_size: int
) -> Iterator[tuple]:
    """Sequential fixed-shape eval batches with per-image metas and
    native-resolution GT. The LAST batch is padded up to `batch_size` by
    repeating the final item (static shapes; `count` says how many are
    real). Yields (inputs_tuple, labels, metas, orig_labels, count)."""
    n = len(data)
    for start in range(0, n, batch_size):
        idx = list(range(start, min(start + batch_size, n)))
        count = len(idx)
        while len(idx) < batch_size:
            idx.append(idx[-1])
        ii = np.asarray(idx)
        inputs = (data.images[ii],)
        if data.has_heatmaps:
            inputs = (data.images[ii], data.heatmaps[ii])
        metas = G.ResizeMeta(*(np.asarray(f)[ii] for f in data.metas))
        origs = (
            [data.orig_labels[j] for j in idx]
            if data.orig_labels is not None
            else None
        )
        yield inputs, data.labels[ii], metas, origs, count
