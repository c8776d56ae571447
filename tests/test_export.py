"""AOT export tests (serve/export.py): serialize the serving forward to
a self-contained StableHLO artifact and serve it back with no model
code — scores must match the live-model engine, the symbolic batch
dimension must accept any batch, and the dtype adapter must bridge
fast-transfer and float32 contracts."""
import json
import os
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_segmentation_tpu.serve.engine import InferenceEngine
from image_segmentation_tpu.serve.export import (
    ARTIFACT_EXT,
    export_registry,
    load_exported,
    save_exported,
)


@pytest.fixture(scope="module")
def tiny_unet():
    from image_segmentation_tpu.models import UNet

    model = UNet(num_classes=4, base=4)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )
    return model, variables


@pytest.fixture(scope="module")
def tiny_prompt():
    from image_segmentation_tpu.models.clip_vit import ClipViTConfig
    from image_segmentation_tpu.models.prompt import PromptModel

    # 4 up-blocks (one per skip tap) climb the 16× patch stride back to
    # the input resolution — the same geometry run.py --smoke-vit uses
    vit = ClipViTConfig(
        image_size=32, patch_size=16, hidden_size=32, num_layers=4,
        num_heads=2, mlp_dim=64,
    )
    model = PromptModel(
        vit=vit, skip_indices=(1, 2, 3, 4),
        decoder_channels=(32, 16, 8, 8, 8), unet_base=4,
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 1)),
        train=False,
    )
    return model, variables


class TestRoundtrip:
    def test_scores_match_live_engine(self, tiny_unet, tmp_path):
        model, variables = tiny_unet
        path = str(tmp_path / f"unet{ARTIFACT_EXT}")
        meta = save_exported(
            path, model, variables, 32, name="unet",
            class_names=("background", "cat", "dog", "boundary"),
        )
        assert meta["platforms"] == ["cpu", "tpu"]

        live = InferenceEngine()
        live.register("unet", model, variables, target_size=32)
        aot = InferenceEngine()
        assert aot.register_exported(path) == "unet"
        assert aot.models["unet"].target_size == 32
        assert aot.models["unet"].class_names == (
            "background", "cat", "dog", "boundary",
        )

        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (40, 28, 3)).astype(np.float32)
        a = live.segment(img, "unet")
        b = aot.segment(img, "unet")
        np.testing.assert_array_equal(a["mask"], b["mask"])
        np.testing.assert_array_equal(a["color_mask"], b["color_mask"])

    def test_symbolic_batch(self, tiny_unet, tmp_path):
        """One artifact serves every batch size (BatchingEngine buckets
        included) — the batch dim was exported symbolically."""
        model, variables = tiny_unet
        path = str(tmp_path / f"unet{ARTIFACT_EXT}")
        save_exported(
            path, model, variables, 32, name="unet",
            class_names=("background", "cat", "dog", "boundary"),
        )
        call, meta = load_exported(path)
        rng = np.random.default_rng(1)
        for b in (1, 3, 5):
            x = rng.integers(0, 255, (b, 32, 32, 3)).astype(np.uint8)
            out = call(x)  # device array, same contract as live forwards
            assert out.shape == (b, 32, 32, 4)
            scores = np.asarray(out, dtype=np.float32)
            assert np.isfinite(scores).all()

    def test_prompt_model_two_inputs(self, tiny_prompt, tmp_path):
        model, variables = tiny_prompt
        path = str(tmp_path / f"prompt{ARTIFACT_EXT}")
        save_exported(
            path, model, variables, 32, name="prompt_model",
            class_names=("deactivated", "background", "cat", "dog"),
            needs_prompt=True,
        )
        live = InferenceEngine()
        live.register(
            "prompt_model", model, variables, target_size=32,
            needs_prompt=True,
        )
        aot = InferenceEngine()
        aot.register_exported(path)
        assert aot.models["prompt_model"].needs_prompt

        rng = np.random.default_rng(2)
        img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
        pm = np.zeros((32, 32), np.float32)
        pm[10:20, 10:20] = 1.0
        a = live.segment(img, "prompt_model", prompt_mask=pm)
        b = aot.segment(img, "prompt_model", prompt_mask=pm)
        np.testing.assert_array_equal(a["mask"], b["mask"])

    def test_dtype_adapter_bridges_contracts(self, tiny_unet, tmp_path):
        """A float32-exported artifact must serve from a fast-transfer
        (uint8-staging) engine and vice versa — the loader adapts."""
        model, variables = tiny_unet
        f32 = str(tmp_path / f"unet_f32{ARTIFACT_EXT}")
        save_exported(
            f32, model, variables, 32, name="unet",
            class_names=("background", "cat", "dog", "boundary"),
            fast_transfer=False,
        )
        u8 = str(tmp_path / f"unet_u8{ARTIFACT_EXT}")
        save_exported(
            u8, model, variables, 32, name="unet",
            class_names=("background", "cat", "dog", "boundary"),
            fast_transfer=True,
        )
        rng = np.random.default_rng(3)
        img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)

        fast_engine = InferenceEngine(fast_transfer=True)
        fast_engine.register_exported(f32, name="m")  # u8 staging → f32 fn
        slow_engine = InferenceEngine(fast_transfer=False)
        slow_engine.register_exported(u8, name="m")  # f32 staging → u8 fn
        a = fast_engine.segment(img, "m")["mask"]
        b = slow_engine.segment(img, "m")["mask"]
        # both paths quantize the staged input to uint8 exactly once;
        # the u8 artifact additionally rounds scores to bf16, which can
        # flip an argmax tie on a rare pixel — demand near-total
        # agreement, not bit equality
        assert (a == b).mean() > 0.99

    def test_version_mismatch_rejected(self, tiny_unet, tmp_path):
        model, variables = tiny_unet
        path = str(tmp_path / f"unet{ARTIFACT_EXT}")
        save_exported(
            path, model, variables, 32, name="unet",
            class_names=("background", "cat", "dog", "boundary"),
        )
        with zipfile.ZipFile(path) as z:
            meta = json.loads(z.read("meta.json"))
            blob = z.read("fn.bin")
        meta["version"] = 999
        bad = str(tmp_path / f"bad{ARTIFACT_EXT}")
        with zipfile.ZipFile(bad, "w") as z:
            z.writestr("meta.json", json.dumps(meta))
            z.writestr("fn.bin", blob)
        with pytest.raises(ValueError, match="version"):
            load_exported(bad)


@pytest.mark.slow
class TestRegistryCLI:
    def test_demo_export_and_serve(self, tmp_path):
        out = str(tmp_path / "exports")
        written = export_registry("", out, demo=True)
        names = {os.path.basename(w) for w in written}
        assert names == {
            f"unet{ARTIFACT_EXT}", f"autoencoder{ARTIFACT_EXT}",
            f"clip{ARTIFACT_EXT}", f"prompt_model{ARTIFACT_EXT}",
        }
        eng = InferenceEngine()
        for w in written:
            eng.register_exported(w)
        assert eng.available() == [
            "autoencoder", "clip", "prompt_model", "unet",
        ]
        img = np.random.default_rng(0).uniform(0, 1, (50, 70, 3)).astype(
            np.float32
        )
        res = eng.segment(img, "unet")
        assert res["mask"].shape == (50, 70)
        pm = np.zeros((50, 70), np.float32)
        pm[20:30, 30:40] = 1.0
        res = eng.segment(img, "prompt_model", prompt_mask=pm)
        assert res["mask"].shape == (50, 70)
        assert res["class_names"][0] == "deactivated"

    def test_only_filter_and_empty_error(self, tmp_path):
        out = str(tmp_path / "exports")
        written = export_registry("", out, demo=True, only="unet")
        assert [os.path.basename(w) for w in written] == [
            f"unet{ARTIFACT_EXT}"
        ]
        with pytest.raises(SystemExit):
            export_registry("", str(tmp_path / "e2"), demo=True,
                            only="nope")
