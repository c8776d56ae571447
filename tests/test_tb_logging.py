"""TensorBoard metrics logging (utils/tb.py + run.py --tensorboard).

The reference's observability is prints + a pickled MetricsHistory
(reference utils/training.py:557-562); the msgpack history mirrors
that, and the TensorBoard logger adds the standard dashboard. The test
drives a real tiny run through the CLI and reads the event file back
with TensorBoard's own reader.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _read_scalars(logdir):
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(logdir)
    acc.Reload()
    return {
        tag: [(s.step, s.value) for s in acc.Scalars(tag)]
        for tag in acc.Tags()["scalars"]
    }


def test_run_cli_writes_tensorboard_scalars(tmp_path):
    from image_segmentation_tpu.run import main

    res = main([
        "--config", "unet_noaug", "--synthetic", "8", "--epochs", "2",
        "--batch-size", "4", "--target-size", "32",
        "--save-dir", str(tmp_path / "runs"), "--max-devices", "1",
        "--tensorboard", str(tmp_path / "tb"),
    ])
    logdir = str(tmp_path / "tb" / "unet_noaug")
    scalars = _read_scalars(logdir)
    for tag in ("train/loss", "val/loss", "val/dice", "val/miou",
                "val/acc", "time/epoch_s", "val/per_class_iou_0"):
        assert tag in scalars, (tag, sorted(scalars))
        assert [s for s, _ in scalars[tag]] == [1, 2]
    # values match the returned history exactly
    want = [round(v, 5) for v in res.history["train_loss"]]
    got = [round(v, 5) for _, v in scalars["train/loss"]]
    assert got == want


def test_logger_scalar_and_array_fanout(tmp_path):
    from image_segmentation_tpu.utils.tb import TensorBoardLogger

    lg = TensorBoardLogger(str(tmp_path))
    lg.log(1, {"a": 0.5, "b": np.array([1.0, 2.0])})
    lg.close()
    scalars = _read_scalars(str(tmp_path))
    assert scalars["a"] == [(1, 0.5)]
    assert scalars["b_0"] == [(1, 1.0)]
    assert scalars["b_1"] == [(1, 2.0)]
    assert os.listdir(str(tmp_path))
