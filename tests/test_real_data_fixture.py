"""End-to-end REAL-DATA path test on a deterministic pseudo-Pet tree.

The Oxford-IIIT Pet dataset is not present in this environment, so the
quality-parity numbers can't be produced here — but the full real-data
code path CAN be exercised: a tiny synthetic Oxford-Pet *source* layout
(images/*.jpg + annotations/trimaps/*.png + list.txt) is generated on
the fly, converted by scripts/prepare_oxford_pet.py into the framework's
{Train,Val,Test}/{color,label} layout, and then driven through
run.py (file decode → 255→3 remap → class weights → train →
original-resolution eval → checkpoint), exactly as a real run would be.

Reference layout contract: utils/dataset.py:6-51 (jpg/png pairs keyed by
sorted stems) + SURVEY.md §2.2 (0 bg, 1 cat, 2 dog, 255 boundary).
"""
import importlib.util
import os
import sys

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_prepare_module():
    spec = importlib.util.spec_from_file_location(
        "prepare_oxford_pet",
        os.path.join(REPO, "scripts", "prepare_oxford_pet.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _make_fake_pet_source(src, n=10, seed=0):
    """A deterministic mini Oxford-Pet download: JPEG photos of random
    sizes with a bright 'pet' rectangle, matching trimaps (1=pet, 2=bg,
    3=border), and an annotations/list.txt with the species column."""
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(src, "images")
    tri_dir = os.path.join(src, "annotations", "trimaps")
    os.makedirs(img_dir)
    os.makedirs(tri_dir)
    lines = []
    stems = []
    for i in range(n):
        cat = i % 2 == 0
        stem = f"Abyssinian_{i}" if cat else f"beagle_{i}"
        stems.append(stem)
        h, w = int(rng.integers(40, 80)), int(rng.integers(40, 80))
        img = rng.integers(0, 60, (h, w, 3), dtype=np.int64).astype(np.uint8)
        tri = np.full((h, w), 2, np.uint8)  # 2 = background
        y0, y1 = h // 4, 3 * h // 4
        x0, x1 = w // 4, 3 * w // 4
        tri[y0:y1, x0:x1] = 1  # pet
        tri[y0:y1, x0] = 3  # border strip
        img[y0:y1, x0:x1, 0 if cat else 1] = 220
        Image.fromarray(img).save(os.path.join(img_dir, stem + ".jpg"),
                                  quality=95)
        Image.fromarray(tri).save(os.path.join(tri_dir, stem + ".png"))
        lines.append(f"{stem} {i + 1} {1 if cat else 2} 1")
    with open(os.path.join(src, "annotations", "list.txt"), "w") as f:
        f.write("#stem class species breed\n" + "\n".join(lines) + "\n")
    return stems


@pytest.fixture(scope="module")
def pet_tree(tmp_path_factory):
    base = tmp_path_factory.mktemp("pet")
    src, dst = str(base / "src"), str(base / "dst")
    _make_fake_pet_source(src, n=10)
    prep = _load_prepare_module()
    prep.main(["--src", src, "--dst", dst, "--val", "0.2", "--test", "0.2"])
    return dst


def test_prepared_layout_and_label_contract(pet_tree):
    for split, expect in (("Train", 6), ("Val", 2), ("Test", 2)):
        cdir = os.path.join(pet_tree, split, "color")
        ldir = os.path.join(pet_tree, split, "label")
        imgs = sorted(os.listdir(cdir))
        labs = sorted(os.listdir(ldir))
        assert len(imgs) == expect and len(labs) == expect
        assert all(f.endswith(".jpg") for f in imgs)
        assert all(f.endswith(".png") for f in labs)
        # same stems on both sides (reference utils/dataset.py:20 contract)
        assert [os.path.splitext(f)[0] for f in imgs] == [
            os.path.splitext(f)[0] for f in labs
        ]
        for f in labs:
            lab = np.asarray(Image.open(os.path.join(ldir, f)))
            vals = set(np.unique(lab).tolist())
            assert vals <= {0, 1, 2, 255}, vals
            # species encoding: cat stems → class 1, dog stems → class 2
            if f[0].isupper():
                assert 1 in vals and 2 not in vals
            else:
                assert 2 in vals and 1 not in vals


def test_class_weights_on_prepared_labels(pet_tree):
    """C8 (reference utils/utils.py:117-198) driven by the real-file path:
    decode every Train label, remap 255→3, compute FullWeight weights."""
    from image_segmentation_tpu.data.labels import (
        calculate_class_weights,
        target_remap,
    )

    ldir = os.path.join(pet_tree, "Train", "label")
    labels = [
        target_remap(np.asarray(Image.open(os.path.join(ldir, f))))
        for f in sorted(os.listdir(ldir))
    ]
    w = calculate_class_weights(labels, num_classes=4)
    assert w.shape == (4,)
    assert abs(float(w.sum()) - 4.0) < 1e-5
    # background dominates the fake data → smallest weight; the thin
    # boundary class is rarest → largest weight
    assert w.argmin() == 0
    assert w.argmax() == 3


def test_run_cli_on_prepared_tree(pet_tree, tmp_path):
    """The full real-data pipeline through the runner CLI: decode →
    remap → materialise → train 1 epoch → original-res device eval →
    checkpoint."""
    from image_segmentation_tpu.run import main

    res = main([
        "--config", "unet_noaug", "--data-root", pet_tree,
        "--epochs", "1", "--batch-size", "2", "--target-size", "32",
        "--save-dir", str(tmp_path), "--max-devices", "1",
    ])
    assert len(res.history["train_loss"]) == 1
    assert np.isfinite(res.history["train_loss"][0])
    assert np.isfinite(res.history["val_loss"][0])
    assert 0.0 <= res.best["miou"] <= 1.0
    assert os.path.isdir(tmp_path / "unet_noaug")
    assert os.path.isdir(tmp_path / "MO_unet_noaug")
