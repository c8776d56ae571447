"""Runner-CLI integration tests (synthetic data, tiny shapes, CPU).

One quick config per pipeline family; the slower clip/prompt paths are
smoke-covered with --smoke-vit in the same style the verify workflow
drives them."""
import os

import pytest

from image_segmentation_tpu.run import main

pytestmark = pytest.mark.slow


def test_unet_noaug_end_to_end(tmp_path):
    # --max-devices 2 keeps run.py's data-parallel mesh branch covered
    # while bounding the in-process CPU collective rendezvous (8-way
    # fake-device reductions abort on a ~40s deadline under xdist
    # contention; full DP semantics are pinned by test_train/test_tp).
    res = main([
        "--config", "unet_noaug", "--synthetic", "8", "--epochs", "2",
        "--batch-size", "4", "--target-size", "32",
        "--save-dir", str(tmp_path), "--max-devices", "2",
    ])
    assert len(res.history["train_loss"]) == 2
    assert os.path.isdir(tmp_path / "unet_noaug")
    assert os.path.isdir(tmp_path / "unet_noaug_last")
    assert os.path.isdir(tmp_path / "MO_unet_noaug")


def test_two_stage_autoencoder(tmp_path):
    r1 = main([
        "--config", "recon_ae", "--synthetic", "6", "--epochs", "1",
        "--batch-size", "2", "--target-size", "32",
        "--save-dir", str(tmp_path), "--max-devices", "1",
    ])
    assert "loss" in r1.best
    r2 = main([
        "--config", "autoencoder", "--synthetic", "6", "--epochs", "1",
        "--batch-size", "2", "--target-size", "32",
        "--save-dir", str(tmp_path), "--max-devices", "1",
        "--pretrained-encoder", str(tmp_path / "recon_ae"),
    ])
    assert 0 <= r2.best["miou"] <= 1


def test_unknown_config_exits():
    with pytest.raises(SystemExit):
        main(["--config", "nope", "--synthetic", "4"])


def test_no_data_source_exits():
    with pytest.raises(SystemExit):
        main(["--config", "unet_noaug"])


def test_evaluate_checkpoint(tmp_path):
    """--evaluate reproduces the notebooks' final test-set eval (reference
    unet.ipynb last cell: eval_loop on the Test dataloader).

    Evaluating the best checkpoint on the SAME split fit() validated on
    must reproduce the recorded best metrics exactly; the weights-only
    MO_ artifact must evaluate on a held-out split via both protocols."""
    res = main([
        "--config", "unet_noaug", "--synthetic", "8", "--epochs", "2",
        "--batch-size", "4", "--target-size", "32",
        "--save-dir", str(tmp_path), "--max-devices", "1",
    ])
    ev = main([
        "--config", "unet_noaug", "--synthetic", "8",
        "--batch-size", "4", "--target-size", "32",
        "--evaluate", str(tmp_path / "unet_noaug"), "--split", "Val",
        "--max-devices", "1",
    ])
    assert abs(ev["dice"] - res.best["dice"]) < 1e-4
    assert abs(ev["iou"] - res.best["miou"]) < 1e-4
    # held-out split from the weights-only artifact, host (oracle) protocol
    ev2 = main([
        "--config", "unet_noaug", "--synthetic", "8",
        "--batch-size", "4", "--target-size", "32",
        "--evaluate", str(tmp_path / "MO_unet_noaug"), "--split", "Test",
        "--eval-protocol", "host", "--max-devices", "1",
    ])
    for k in ("loss", "acc", "dice", "iou"):
        assert k in ev2
        if k != "loss":
            assert 0.0 <= ev2[k] <= 1.0
    # Test split differs from Val (held-out synthetic seed)
    assert ev2["dice"] != ev["dice"]


def test_evaluate_reconstruction(tmp_path):
    """--evaluate on the recon config scores a stage-1 checkpoint's MSE
    at original resolution (reference evalReconstruction,
    utils/training.py:202-239)."""
    r1 = main([
        "--config", "recon_ae", "--synthetic", "6", "--epochs", "1",
        "--batch-size", "2", "--target-size", "32",
        "--save-dir", str(tmp_path), "--max-devices", "1",
    ])
    ev = main([
        "--config", "recon_ae", "--synthetic", "6",
        "--batch-size", "2", "--target-size", "32",
        "--evaluate", str(tmp_path / "recon_ae"), "--split", "Val",
        "--max-devices", "1",
    ])
    assert abs(ev["loss"] - r1.best["loss"]) < 1e-5


def test_lr_schedule_cosine(tmp_path):
    """--lr-schedule cosine trains end-to-end, and the built schedule has
    the promised shape: warmup ramp from 0 to peak, cosine decay to 0."""
    from image_segmentation_tpu import config as C

    cfg = C.override(
        C.CONFIGS["unet_noaug"], lr_schedule="cosine", warmup_steps=4,
        learning_rate=1e-3,
    )
    sched = C.build_lr_schedule(cfg, total_steps=20)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(4)) - 1e-3) < 1e-9
    assert float(sched(20)) < 1e-4
    # constant stays constant (the reference's scheduler=None reality)
    assert C.build_lr_schedule(C.CONFIGS["unet_noaug"], 20) is None

    res = main([
        "--config", "unet_noaug", "--synthetic", "8", "--epochs", "2",
        "--batch-size", "4", "--target-size", "32",
        "--save-dir", str(tmp_path), "--lr-schedule", "cosine",
        "--warmup-steps", "2", "--max-devices", "1",
    ])
    assert len(res.history["train_loss"]) == 2


def test_early_stop_patience_cli(tmp_path, monkeypatch):
    """--early-stop-patience reaches fit() as early_stop_patience
    (plumbing pin — the stop BEHAVIOR itself is pinned deterministically
    by test_train.py::test_fit_early_stop_patience; a live-threshold CLI
    variant was flaky: on a steadily-learning synthetic task val mIoU
    can improve every epoch for the whole budget, and patience never
    fires — correctly)."""
    from image_segmentation_tpu.train import loop as L

    seen = {}
    real_fit = L.fit

    def spy(*a, **kw):
        seen.update(kw)
        return real_fit(*a, **kw)

    # run.py imports fit by name at call time from train.loop
    monkeypatch.setattr(L, "fit", spy)
    main([
        "--config", "unet_noaug", "--synthetic", "8", "--epochs", "1",
        "--batch-size", "4", "--target-size", "32",
        "--save-dir", str(tmp_path), "--max-devices", "1",
        "--early-stop-patience", "7",
    ])
    assert seen.get("early_stop_patience") == 7
    assert os.path.isdir(tmp_path / "unet_noaug")
