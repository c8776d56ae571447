"""Shared deterministic dataset recipe for the multi-host fit test.

Both the worker processes and the parent test's single-process
reference materialize EXACTLY this data (fit_multihost's contract:
every process holds identically-materialized data)."""
import numpy as np

from image_segmentation_tpu.data.dataset import ArrayDataset
from image_segmentation_tpu.data.loader import materialize


def make_train_val(target_size: int = 32):
    rng = np.random.default_rng(123)
    train_items = []
    for i in range(24):
        img = rng.uniform(0, 1, (target_size, target_size, 3)).astype(
            np.float32)
        lab = np.zeros((target_size, target_size), np.int32)
        lab[target_size // 2:, :] = 1 + (i % 2)
        train_items.append((img, lab))
    val_items = []
    for i in range(10):
        h, w = int(rng.integers(24, 48)), int(rng.integers(24, 48))
        img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
        lab = np.zeros((h, w), np.int32)
        lab[h // 2:, :] = 1 + (i % 3)
        val_items.append((img, lab))
    train = materialize(ArrayDataset(train_items), target_size)
    val = materialize(ArrayDataset(val_items), target_size,
                      keep_orig_labels=True)
    return train, val
