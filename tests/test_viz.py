"""Visualisation smoke tests (headless Agg backend)."""
import numpy as np
import pytest

mpl = pytest.importorskip("matplotlib")
mpl.use("Agg")

from image_segmentation_tpu.utils.viz import (  # noqa: E402
    display_img_label,
    plot_mask_with_colors,
    plot_prediction_triptych,
    plot_training_curves,
)


def test_display_img_label(tmp_path):
    img = np.random.default_rng(0).uniform(0, 1, (32, 32, 3))
    label = np.random.default_rng(1).integers(0, 4, (32, 32))
    p = display_img_label(img, label, save_path=str(tmp_path / "a.png"))
    assert (tmp_path / "a.png").exists()


def test_plot_mask_with_colors(tmp_path):
    mask = np.random.default_rng(0).integers(0, 4, (32, 32))
    plot_mask_with_colors(mask, save_path=str(tmp_path / "m.png"))
    assert (tmp_path / "m.png").stat().st_size > 0


def test_triptych(tmp_path):
    rng = np.random.default_rng(0)
    plot_prediction_triptych(
        rng.uniform(0, 1, (32, 32, 3)),
        rng.integers(0, 4, (32, 32)),
        rng.integers(0, 4, (32, 32)),
        save_path=str(tmp_path / "t.png"),
    )
    assert (tmp_path / "t.png").exists()


def test_training_curves(tmp_path):
    history = {
        "train_loss": [1.0, 0.5], "val_loss": [1.1, 0.6],
        "val_dice": [0.2, 0.4], "val_iou": [0.1, 0.3], "val_acc": [0.5, 0.7],
    }
    plot_training_curves(history, save_path=str(tmp_path / "c.png"))
    assert (tmp_path / "c.png").exists()
