"""Runner-CLI integration tests (synthetic data, tiny shapes, CPU).

One quick config per pipeline family; the slower clip/prompt paths are
smoke-covered with --smoke-vit in the same style the verify workflow
drives them."""
import os

import pytest

from image_segmentation_tpu.run import main

pytestmark = pytest.mark.slow


def test_unet_noaug_end_to_end(tmp_path):
    res = main([
        "--config", "unet_noaug", "--synthetic", "8", "--epochs", "2",
        "--batch-size", "4", "--target-size", "32",
        "--save-dir", str(tmp_path),
    ])
    assert len(res.history["train_loss"]) == 2
    assert os.path.isdir(tmp_path / "unet_noaug")
    assert os.path.isdir(tmp_path / "unet_noaug_last")
    assert os.path.isdir(tmp_path / "MO_unet_noaug")


def test_two_stage_autoencoder(tmp_path):
    r1 = main([
        "--config", "recon_ae", "--synthetic", "6", "--epochs", "1",
        "--batch-size", "2", "--target-size", "32",
        "--save-dir", str(tmp_path),
    ])
    assert "loss" in r1.best
    r2 = main([
        "--config", "autoencoder", "--synthetic", "6", "--epochs", "1",
        "--batch-size", "2", "--target-size", "32",
        "--save-dir", str(tmp_path),
        "--pretrained-encoder", str(tmp_path / "recon_ae"),
    ])
    assert 0 <= r2.best["miou"] <= 1


def test_unknown_config_exits():
    with pytest.raises(SystemExit):
        main(["--config", "nope", "--synthetic", "4"])


def test_no_data_source_exits():
    with pytest.raises(SystemExit):
        main(["--config", "unet_noaug"])
