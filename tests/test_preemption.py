"""Preemption-safety tests: per-epoch 'last' checkpoint + graceful-stop
resume (SURVEY.md §5.3 upgrade over the reference)."""
import os
import signal

import numpy as np
import pytest

from image_segmentation_tpu.data.loader import materialize
from image_segmentation_tpu.losses import DiceCELoss
from image_segmentation_tpu.train.loop import fit

pytestmark = pytest.mark.slow


def _setup():
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_train import small_state, synthetic_dataset

    train_ds = materialize(synthetic_dataset(n=8), 32)
    val_ds = materialize(synthetic_dataset(n=4, seed=1), 32, keep_orig_labels=True)
    _, state = small_state()
    return train_ds, val_ds, state


def test_last_checkpoint_written_every_epoch(tmp_path):
    train_ds, val_ds, state = _setup()
    fit(
        state, train_ds, val_ds, loss_fn=DiceCELoss(), epochs=2, batch_size=4,
        save_dir=str(tmp_path), name="m", verbose=False,
    )
    assert os.path.isdir(tmp_path / "m_last")


def test_sigterm_stops_after_epoch_and_resumes(tmp_path):
    train_ds, val_ds, state = _setup()
    import threading

    # fire SIGTERM shortly after training starts: epoch 1 completes,
    # 'last' checkpoint written, loop exits
    timer = threading.Timer(0.5, lambda: os.kill(os.getpid(), signal.SIGTERM))
    timer.start()
    try:
        res = fit(
            state, train_ds, val_ds, loss_fn=DiceCELoss(), epochs=50,
            batch_size=4, save_dir=str(tmp_path), name="m", verbose=False,
        )
    finally:
        timer.cancel()
    done = len(res.history["train_loss"])
    assert 1 <= done < 50
    assert os.path.isdir(tmp_path / "m_last")

    # resume continues from the interrupted epoch with history intact
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_train import small_state

    _, state2 = small_state()
    res2 = fit(
        state2, train_ds, val_ds, loss_fn=DiceCELoss(), epochs=done + 1,
        batch_size=4, save_dir=str(tmp_path), name="m", resume=True,
        verbose=False,
    )
    assert len(res2.history["train_loss"]) == done + 1
    np.testing.assert_allclose(
        res2.history["train_loss"][:done], res.history["train_loss"], atol=1e-7
    )
