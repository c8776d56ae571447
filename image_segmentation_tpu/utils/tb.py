"""TensorBoard metrics logging for training runs.

The reference's observability is tqdm postfix prints plus a pickled
MetricsHistory (reference utils/training.py:37,60,557-562; SURVEY.md
§5.5). The msgpack history file reproduces that contract
(train/loop.py); this module adds the standard dashboard on top: one
scalar event per epoch metric, written through tensorboardX when it is
available. Logging is strictly off the training path — a few host
floats per epoch.

Usage:
    logger = TensorBoardLogger(logdir)          # or run.py --tensorboard
    fit(..., metrics_logger=logger)
    logger.close()
"""
from __future__ import annotations

import os
from typing import Mapping, Optional

import numpy as np


class TensorBoardLogger:
    """Per-epoch scalar logging to a TensorBoard event file.

    Raises ImportError with a clear message when tensorboardX is not
    installed — callers opt in explicitly (run.py --tensorboard), so a
    silent no-op would be worse than failing."""

    def __init__(self, logdir: str):
        try:
            import tensorboardX
        except ImportError as e:  # pragma: no cover - env without tbX
            raise ImportError(
                "TensorBoard logging needs the tensorboardX package "
                "(pip install tensorboardX) or drop --tensorboard"
            ) from e
        os.makedirs(logdir, exist_ok=True)
        self.logdir = logdir
        self._writer = tensorboardX.SummaryWriter(logdir)

    def log(self, step: int, scalars: Mapping[str, object]) -> None:
        """Write one step's scalars. Array values (e.g. per-class IoU)
        fan out to one tag per element; NaNs are written as-is (they are
        information — e.g. degenerate val metrics)."""
        for tag, value in scalars.items():
            arr = np.asarray(value)
            if arr.ndim == 0:
                self._writer.add_scalar(tag, float(arr), step)
            else:
                for i, v in enumerate(arr.ravel().tolist()):
                    self._writer.add_scalar(f"{tag}_{i}", float(v), step)

    def flush(self) -> None:
        self._writer.flush()

    def close(self) -> None:
        self._writer.close()


def maybe_logger(logdir: Optional[str]) -> Optional[TensorBoardLogger]:
    """None-propagating constructor for CLI plumbing."""
    return TensorBoardLogger(logdir) if logdir else None
