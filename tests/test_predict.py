"""Batch-predict CLI tests (image_segmentation_tpu/predict.py): files →
masks on disk, optional ground-truth scoring with the reference's
original-resolution protocol, point prompts for prompt models."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_segmentation_tpu.predict import (
    list_inputs,
    load_image,
    load_label,
    main,
    predict_paths,
)
from image_segmentation_tpu.serve.engine import InferenceEngine


@pytest.fixture(scope="module")
def tiny_engine():
    from image_segmentation_tpu.models import UNet

    model = UNet(num_classes=4, base=4)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )
    eng = InferenceEngine()
    eng.register("unet", model, variables, target_size=32)
    return eng


def _write_images(d, n=3, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        h, w = int(rng.integers(20, 60)), int(rng.integers(20, 60))
        arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(d, f"img{i}.png"))
    return [os.path.join(d, f"img{i}.png") for i in range(n)]


def _write_labels(d, image_paths, seed=1):
    from PIL import Image

    rng = np.random.default_rng(seed)
    os.makedirs(d, exist_ok=True)
    for p in image_paths:
        with Image.open(p) as im:
            w, h = im.size
        lab = rng.integers(0, 3, (h, w)).astype(np.uint8)
        lab[0, :] = 255  # boundary sentinel → remapped to 3 at load
        stem = os.path.splitext(os.path.basename(p))[0]
        Image.fromarray(lab, mode="L").save(os.path.join(d, f"{stem}.png"))


class TestHelpers:
    def test_list_inputs_dir_sorted_and_single_file(self, tmp_path):
        paths = _write_images(str(tmp_path / "imgs"))
        got = list_inputs(str(tmp_path / "imgs"))
        assert got == sorted(paths)
        assert list_inputs(paths[0]) == [paths[0]]
        (tmp_path / "imgs" / "notes.txt").write_text("skip me")
        assert list_inputs(str(tmp_path / "imgs")) == sorted(paths)

    def test_list_inputs_missing(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            list_inputs(str(tmp_path / "nope"))
        (tmp_path / "empty").mkdir()
        with pytest.raises(FileNotFoundError):
            list_inputs(str(tmp_path / "empty"))

    def test_load_image_channels_and_range(self, tmp_path):
        from PIL import Image

        rgba = np.random.default_rng(0).integers(
            0, 255, (12, 9, 4), dtype=np.uint8
        )
        p = str(tmp_path / "a.png")
        Image.fromarray(rgba, mode="RGBA").save(p)
        img = load_image(p)
        assert img.shape == (12, 9, 3)
        assert img.dtype == np.float32
        assert 0.0 <= img.min() and img.max() <= 1.0

    def test_load_label_remaps_boundary(self, tmp_path):
        from PIL import Image

        lab = np.zeros((6, 5), np.uint8)
        lab[0] = 255
        lab[1] = 2
        p = str(tmp_path / "l.png")
        Image.fromarray(lab, mode="L").save(p)
        out = load_label(p)
        assert out.shape == (6, 5)
        assert set(np.unique(out)) == {0, 2, 3}


class TestPredictPaths:
    def test_writes_masks_at_original_sizes(self, tiny_engine, tmp_path):
        from PIL import Image

        paths = _write_images(str(tmp_path / "imgs"))
        out = str(tmp_path / "out")
        summary = predict_paths(
            tiny_engine, "unet", paths, output_dir=out, verbose=False
        )
        assert summary["images"] == len(paths)
        assert summary["class_names"] == [
            "background", "cat", "dog", "boundary",
        ]
        for p in paths:
            stem = os.path.splitext(os.path.basename(p))[0]
            with Image.open(p) as im:
                size = im.size
            with Image.open(os.path.join(out, f"{stem}_mask.png")) as m:
                assert m.size == size
                ids = np.asarray(m)
            assert ids.dtype == np.uint8 and ids.max() < 4
            with Image.open(os.path.join(out, f"{stem}_color.png")) as c:
                assert c.size == size and c.mode == "RGB"

    def test_scoring_against_labels(self, tiny_engine, tmp_path):
        paths = _write_images(str(tmp_path / "imgs"))
        labels = str(tmp_path / "labels")
        _write_labels(labels, paths)
        summary = predict_paths(
            tiny_engine, "unet", paths, output_dir=None,
            labels_dir=labels, verbose=False,
        )
        assert summary["scored"] == len(paths)
        for k in ("mean_dice", "mean_iou", "mean_acc"):
            assert 0.0 <= summary[k] <= 1.0
        assert len(summary["per_class_iou"]) == 4

    def test_scoring_skips_missing_labels(self, tiny_engine, tmp_path):
        paths = _write_images(str(tmp_path / "imgs"), n=2)
        labels = str(tmp_path / "labels")
        _write_labels(labels, paths[:1])
        summary = predict_paths(
            tiny_engine, "unet", paths, labels_dir=labels, verbose=False
        )
        assert summary["scored"] == 1

    def test_perfect_prediction_scores_one(self, tmp_path):
        """A model whose argmax equals the GT scores Dice/IoU/Acc = 1."""
        import flax.linen as nn

        class Echo(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                # channel scores = one-hot of a deterministic pattern
                # derived from the input's red channel
                cls = jnp.clip((x[..., 0] * 4).astype(jnp.int32), 0, 3)
                return jax.nn.one_hot(cls, 4)

        from PIL import Image

        eng = InferenceEngine(fast_transfer=False)
        model = Echo()
        eng.register(
            "echo", model,
            model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))),
            target_size=32,
        )
        # image at exactly target size (identity geometry) with flat
        # class regions so resize/argmax can't smear boundaries
        img = np.zeros((32, 32, 3), np.uint8)
        img[:16] = 40   # class 0
        img[16:] = 150  # class 2
        p = str(tmp_path / "x.png")
        Image.fromarray(img).save(p)
        lab = np.zeros((32, 32), np.uint8)
        lab[16:] = 2
        labels = str(tmp_path / "labels")
        os.makedirs(labels)
        Image.fromarray(lab, mode="L").save(os.path.join(labels, "x.png"))
        summary = predict_paths(
            eng, "echo", [p], labels_dir=labels, verbose=False
        )
        assert summary["mean_dice"] == 1.0
        assert summary["mean_iou"] == 1.0

    def test_label_shape_mismatch_raises(self, tiny_engine, tmp_path):
        from PIL import Image

        paths = _write_images(str(tmp_path / "imgs"), n=1)
        with Image.open(paths[0]) as im:
            w, h = im.size
        labels = str(tmp_path / "labels")
        os.makedirs(labels)
        # transposed label: same pixel count, wrong shape — must be an
        # error, not silently reshaped into garbage metrics
        Image.fromarray(np.zeros((w, h), np.uint8), mode="L").save(
            os.path.join(labels, "img0.png")
        )
        with pytest.raises(ValueError, match="shape"):
            predict_paths(
                tiny_engine, "unet", paths, labels_dir=labels, verbose=False
            )

    def test_label_out_of_range_raises(self, tiny_engine, tmp_path):
        from PIL import Image

        paths = _write_images(str(tmp_path / "imgs"), n=1)
        with Image.open(paths[0]) as im:
            w, h = im.size
        labels = str(tmp_path / "labels")
        os.makedirs(labels)
        lab = np.full((h, w), 7, np.uint8)  # antialiased/garbage value
        Image.fromarray(lab, mode="L").save(os.path.join(labels, "img0.png"))
        with pytest.raises(ValueError, match="outside"):
            predict_paths(
                tiny_engine, "unet", paths, labels_dir=labels, verbose=False
            )

    def test_absent_class_iou_is_json_null(self, tiny_engine, tmp_path):
        """Classes absent from GT and predictions give NaN IoU — the
        summary must stay valid JSON (null), not emit a bare NaN."""
        from PIL import Image

        paths = _write_images(str(tmp_path / "imgs"), n=1)
        with Image.open(paths[0]) as im:
            w, h = im.size
        labels = str(tmp_path / "labels")
        os.makedirs(labels)
        Image.fromarray(np.zeros((h, w), np.uint8), mode="L").save(
            os.path.join(labels, "img0.png")
        )
        summary = predict_paths(
            tiny_engine, "unet", paths, labels_dir=labels, verbose=False
        )
        json.loads(json.dumps(summary, allow_nan=False))  # must not raise

    def test_prompt_model_requires_point(self, tmp_path):
        import flax.linen as nn

        class P(nn.Module):
            @nn.compact
            def __call__(self, x, heatmap, train=False):
                return jnp.zeros(x.shape[:3] + (4,))

        eng = InferenceEngine(fast_transfer=False)
        model = P()
        eng.register(
            "p", model,
            model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 1)),
            ),
            target_size=32, needs_prompt=True,
        )
        paths = _write_images(str(tmp_path / "imgs"), n=1)
        with pytest.raises(SystemExit, match="point"):
            predict_paths(eng, "p", paths, verbose=False)

    def test_prompt_scoring_uses_prompt_label_space(self, tmp_path):
        """GT PNGs on disk are in the SEG space (0 bg, 1 cat, 2 dog, 255
        boundary); scoring a prompt model must remap them to the prompt
        space {1 bg+boundary, 2 cat, 3 dog} so a perfect prompt-space
        prediction scores 1.0 (was: compared across spaces, off by one)."""
        import flax.linen as nn

        class Oracle(nn.Module):
            # predicts prompt-space ids from the red channel: dark → bg(1),
            # bright → dog(3) — matching how the fixture image is built
            @nn.compact
            def __call__(self, x, heatmap, train=False):
                cls = jnp.where(x[..., 0] > 0.5, 3, 1)
                return jax.nn.one_hot(cls, 4)

        from PIL import Image

        eng = InferenceEngine(fast_transfer=False)
        model = Oracle()
        eng.register(
            "oracle", model,
            model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 1)),
            ),
            target_size=32, needs_prompt=True,
        )
        img = np.zeros((32, 32, 3), np.uint8)
        img[16:] = 200  # bottom half bright → dog
        p = str(tmp_path / "x.png")
        Image.fromarray(img).save(p)
        lab = np.zeros((32, 32), np.uint8)  # seg space: 0 bg
        lab[16:] = 2                        # seg space: 2 dog
        lab[0, :] = 255                     # boundary → prompt bg (1)
        labels = str(tmp_path / "labels")
        os.makedirs(labels)
        Image.fromarray(lab, mode="L").save(os.path.join(labels, "x.png"))
        summary = predict_paths(
            eng, "oracle", [p], labels_dir=labels, point=(16, 16),
            ignore_index=None, verbose=False,
        )
        assert summary["mean_dice"] == 1.0
        assert summary["mean_iou"] == 1.0

    def test_prompt_model_gets_point_mask(self, tmp_path):
        """needs_prompt + --point: the rendered heatmap reaches the model."""
        import flax.linen as nn

        seen = {}

        class Probe(nn.Module):
            @nn.compact
            def __call__(self, x, heatmap, train=False):
                seen["traced"] = True
                # fold the heatmap in so it cannot be DCE'd
                return (
                    jnp.zeros(x.shape[:3] + (4,))
                    + heatmap.sum() * jnp.ones((1, 1, 1, 4)) * 0.0
                    + jax.nn.one_hot(
                        (heatmap[..., 0] > 0.5).astype(jnp.int32), 4
                    )
                )

        from PIL import Image

        eng = InferenceEngine(fast_transfer=False)
        model = Probe()
        eng.register(
            "probe", model,
            model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 1)),
            ),
            target_size=32, needs_prompt=True,
        )
        img = np.full((64, 64, 3), 128, np.uint8)
        p = str(tmp_path / "x.png")
        Image.fromarray(img).save(p)
        out = str(tmp_path / "out")
        summary = predict_paths(
            eng, "probe", [p], output_dir=out, point=(32, 32), verbose=False
        )
        assert summary["images"] == 1
        mask = np.asarray(Image.open(os.path.join(out, "x_mask.png")))
        # the point heatmap peaks at the center → class 1 there, 0 at corners
        assert mask[32, 32] == 1
        assert mask[0, 0] == 0


@pytest.mark.slow
class TestCLI:
    def test_demo_cli_end_to_end(self, tmp_path, capsys):
        paths = _write_images(str(tmp_path / "imgs"), n=2)
        labels = str(tmp_path / "labels")
        _write_labels(labels, paths)
        out = str(tmp_path / "out")
        summary = main([
            "--demo", "--input", str(tmp_path / "imgs"), "--output", out,
            "--labels", labels, "--model", "unet",
        ])
        assert summary["images"] == 2
        assert summary["scored"] == 2
        assert os.path.isfile(os.path.join(out, "img0_mask.png"))
        # the CLI prints a single JSON summary line last
        last = capsys.readouterr().out.strip().splitlines()[-1]
        assert json.loads(last)["model"] == "unet"
