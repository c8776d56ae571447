"""Pure-Python safetensors reader + torch-free CLIP conversion.

The deploy-host contract (VERDICT r2 item 7): converting a real
openai/clip-vit-base-patch16 `model.safetensors` must need NEITHER
torch nor the `safetensors` package — stdlib + numpy only. Reference
consumer of the converted weights: clip/clipunet.py:7-65.
"""
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from image_segmentation_tpu.utils.safetensors_io import (
    read_safetensors,
    write_safetensors,
)


class TestReader:
    def test_round_trip_and_prefix_filter(self, tmp_path):
        rng = np.random.default_rng(0)
        tensors = {
            "vision_model.a": rng.normal(size=(3, 4)).astype(np.float32),
            "vision_model.b": np.arange(6, dtype=np.int64).reshape(2, 3),
            "text_model.c": rng.normal(size=(5,)).astype(np.float16),
            "scalar": np.array(2.5, np.float32),  # 0-d
        }
        path = str(tmp_path / "x.safetensors")
        write_safetensors(path, tensors)

        got = read_safetensors(path)
        assert set(got) == set(tensors)
        for k in tensors:
            np.testing.assert_array_equal(got[k], tensors[k])
            assert got[k].dtype == tensors[k].dtype
            assert got[k].shape == tensors[k].shape

        vis = read_safetensors(path, prefix="vision_model.")
        assert set(vis) == {"vision_model.a", "vision_model.b"}

    def test_bf16_widens_exactly(self, tmp_path):
        """bf16 payloads (common in HF uploads) widen to float32 exactly:
        bf16 IS float32's top 16 bits."""
        f32 = np.array([0.0, 1.0, -2.5, 3.14159, 1e30], np.float32)
        bf16_bits = (f32.view(np.uint32) >> 16).astype(np.uint16)
        header = {
            "w": {
                "dtype": "BF16",
                "shape": [5],
                "data_offsets": [0, 10],
            }
        }
        hjson = json.dumps(header).encode()
        path = str(tmp_path / "bf16.safetensors")
        with open(path, "wb") as f:
            f.write(len(hjson).to_bytes(8, "little"))
            f.write(hjson)
            f.write(bf16_bits.tobytes())
        got = read_safetensors(path)["w"]
        assert got.dtype == np.float32
        expected = (bf16_bits.astype(np.uint32) << 16).view(np.float32)
        np.testing.assert_array_equal(got, expected)
        # truncation error bounded by one ulp of bf16's 8-bit mantissa
        np.testing.assert_allclose(got, f32, rtol=2 ** -7)

    def test_metadata_ignored_and_bad_shape_rejected(self, tmp_path):
        header = {
            "__metadata__": {"format": "pt"},
            "w": {"dtype": "F32", "shape": [3], "data_offsets": [0, 8]},
        }
        hjson = json.dumps(header).encode()
        path = str(tmp_path / "bad.safetensors")
        with open(path, "wb") as f:
            f.write(len(hjson).to_bytes(8, "little"))
            f.write(hjson)
            f.write(np.zeros(2, np.float32).tobytes())
        with pytest.raises(ValueError, match="3"):
            read_safetensors(path)

    def test_unsupported_dtype_rejected(self, tmp_path):
        header = {"w": {"dtype": "F8_E4M3", "shape": [1],
                        "data_offsets": [0, 1]}}
        hjson = json.dumps(header).encode()
        path = str(tmp_path / "f8.safetensors")
        with open(path, "wb") as f:
            f.write(len(hjson).to_bytes(8, "little"))
            f.write(hjson)
            f.write(b"\x00")
        with pytest.raises(ValueError, match="unsupported dtype"):
            read_safetensors(path)


def _hf_vision_tensors(hidden=32, layers=2, heads=2, mlp=64,
                       patch=16, image=64, seed=0):
    """Synthesize an HF-CLIPVisionModel-shaped tensor dict (the exact
    key schema of openai/clip-vit-base-patch16's vision tower, tiny)."""
    rng = np.random.default_rng(seed)
    r = lambda *s: rng.normal(size=s).astype(np.float32)
    n_pos = (image // patch) ** 2 + 1
    t = {
        "embeddings.patch_embedding.weight": r(hidden, 3, patch, patch),
        "embeddings.class_embedding": r(hidden),
        "embeddings.position_embedding.weight": r(n_pos, hidden),
        "pre_layrnorm.weight": r(hidden),
        "pre_layrnorm.bias": r(hidden),
        "post_layernorm.weight": r(hidden),
        "post_layernorm.bias": r(hidden),
    }
    for i in range(layers):
        p = f"encoder.layers.{i}"
        for ln in ("layer_norm1", "layer_norm2"):
            t[f"{p}.{ln}.weight"] = r(hidden)
            t[f"{p}.{ln}.bias"] = r(hidden)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            t[f"{p}.self_attn.{proj}.weight"] = r(hidden, hidden)
            t[f"{p}.self_attn.{proj}.bias"] = r(hidden)
        t[f"{p}.mlp.fc1.weight"] = r(mlp, hidden)
        t[f"{p}.mlp.fc1.bias"] = r(mlp)
        t[f"{p}.mlp.fc2.weight"] = r(hidden, mlp)
        t[f"{p}.mlp.fc2.bias"] = r(hidden)
    return {f"vision_model.{k}": v for k, v in t.items()}


class TestTorchFreeConversion:
    def test_safetensors_to_npz_loads_into_clipvit(self, tmp_path):
        """Full path: HF-shaped .safetensors → scripts/convert_clip_weights
        --safetensors → .npz → load_pretrained_clip_params → param tree
        matching ClipViT.init name-for-name and value-for-value (linear
        transposes, OIHW→HWIO patch conv) — all without importing torch
        or transformers."""
        import flax
        import jax
        import jax.numpy as jnp

        from image_segmentation_tpu.models.clip_vit import (
            ClipViT,
            ClipViTConfig,
            convert_hf_vision_state_dict,
            load_pretrained_clip_params,
        )
        from scripts.convert_clip_weights import main as convert_main

        tensors = _hf_vision_tensors()
        # the real checkpoint also carries the text tower — must be
        # filtered out, not crash the converter
        tensors["text_model.embeddings.token_embedding.weight"] = (
            np.zeros((4, 8), np.float32)
        )
        st = str(tmp_path / "clip.safetensors")
        write_safetensors(st, tensors)

        out = str(tmp_path / "clip.npz")
        convert_main(["--safetensors", st, "--out", out])

        converted = load_pretrained_clip_params(cache_path=out)
        cfg = ClipViTConfig(image_size=64, patch_size=16, hidden_size=32,
                            num_layers=2, num_heads=2, mlp_dim=64)
        ref = ClipViT(cfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
        )["params"]
        got = flax.traverse_util.flatten_dict(converted, sep="/")
        want = flax.traverse_util.flatten_dict(ref, sep="/")
        assert {k: v.shape for k, v in got.items()} == {
            k: v.shape for k, v in want.items()
        }

        # values identical to feeding the same numpy dict straight into
        # the converter function (byte-exact file round-trip)
        direct = flax.traverse_util.flatten_dict(
            convert_hf_vision_state_dict(tensors), sep="/"
        )
        for k in direct:
            np.testing.assert_array_equal(np.asarray(got[k]), direct[k])

    def test_non_clip_safetensors_exits(self, tmp_path):
        from scripts.convert_clip_weights import main as convert_main

        st = str(tmp_path / "other.safetensors")
        write_safetensors(st, {"foo": np.zeros(3, np.float32)})
        with pytest.raises(SystemExit):
            convert_main(["--safetensors", st,
                          "--out", str(tmp_path / "o.npz")])
