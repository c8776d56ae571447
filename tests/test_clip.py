"""CLIP ViT + ClipUNet tests.

The key test is bit-parity of our pure-JAX ViT against HF's torch
CLIPVisionModel (random weights, converted with
convert_hf_vision_state_dict) — proving the reimplementation matches the
model the reference consumes (clip/clipunet.py:43-63)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_segmentation_tpu.models.clip_vit import (
    ClipViT,
    ClipViTConfig,
    convert_hf_vision_state_dict,
    tokens_to_grid,
)
from image_segmentation_tpu.models.clip_unet import ClipUNet, ClipUNetNoSkips
from image_segmentation_tpu.models.prompt import PromptModel

SMALL = ClipViTConfig(
    image_size=32, patch_size=16, hidden_size=64, num_layers=3,
    num_heads=4, mlp_dim=128,
)


def _small_hf_model():
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig, CLIPVisionModel

    cfg = CLIPVisionConfig(
        image_size=32, patch_size=16, hidden_size=64,
        num_hidden_layers=3, num_attention_heads=4, intermediate_size=128,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    return CLIPVisionModel(cfg)


@pytest.mark.slow
class TestHFParity:
    def test_matches_hf_vision_model(self):
        torch = pytest.importorskip("torch")
        hf = _small_hf_model().eval()
        params = convert_hf_vision_state_dict(hf.state_dict())

        rng = np.random.default_rng(0)
        x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            out = hf(
                pixel_values=torch.from_numpy(x).permute(0, 3, 1, 2),
                output_hidden_states=True,
            )
        model = ClipViT(SMALL)
        last, hidden = model.apply({"params": params}, jnp.asarray(x))

        np.testing.assert_allclose(
            np.asarray(last), out.last_hidden_state.numpy(), atol=2e-5
        )
        assert len(hidden) == len(out.hidden_states)
        for i in (0, 1, 2, 3):
            np.testing.assert_allclose(
                np.asarray(hidden[i]), out.hidden_states[i].numpy(), atol=2e-5,
                err_msg=f"hidden state {i}",
            )

    def test_converter_roundtrips_full_size_structure(self):
        """Converter handles the real ViT-B/16 layout (params created from
        shape only, no network)."""
        import torch

        sd = {}
        H, P, G, L, M = 768, 16, 14, 12, 3072
        sd["vision_model.embeddings.class_embedding"] = torch.zeros(H)
        sd["vision_model.embeddings.patch_embedding.weight"] = torch.zeros(H, 3, P, P)
        sd["vision_model.embeddings.position_embedding.weight"] = torch.zeros(G * G + 1, H)
        for nm in ("pre_layrnorm", "post_layernorm"):
            sd[f"vision_model.{nm}.weight"] = torch.zeros(H)
            sd[f"vision_model.{nm}.bias"] = torch.zeros(H)
        for i in range(L):
            p = f"vision_model.encoder.layers.{i}"
            for nm in ("layer_norm1", "layer_norm2"):
                sd[f"{p}.{nm}.weight"] = torch.zeros(H)
                sd[f"{p}.{nm}.bias"] = torch.zeros(H)
            for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
                sd[f"{p}.self_attn.{nm}.weight"] = torch.zeros(H, H)
                sd[f"{p}.self_attn.{nm}.bias"] = torch.zeros(H)
            sd[f"{p}.mlp.fc1.weight"] = torch.zeros(M, H)
            sd[f"{p}.mlp.fc1.bias"] = torch.zeros(M)
            sd[f"{p}.mlp.fc2.weight"] = torch.zeros(H, M)
            sd[f"{p}.mlp.fc2.bias"] = torch.zeros(H)
        params = convert_hf_vision_state_dict(sd)
        model = ClipViT(ClipViTConfig())
        ref = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
        )["params"]
        got_shapes = jax.tree_util.tree_map(lambda a: tuple(np.shape(a)), params)
        want_shapes = jax.tree_util.tree_map(lambda a: tuple(a.shape), ref)
        assert got_shapes == want_shapes


@pytest.mark.slow
class TestConverterScript:
    """Drive the ACTUAL conversion script (scripts/convert_clip_weights.py)
    — the exact pipeline a real openai/clip-vit-base-patch16 checkpoint
    will take once one exists in the environment (no network here, so the
    HF model is built locally from its config with random init)."""

    def test_full_size_conversion_loads_into_clipvit(self, tmp_path):
        """Full ViT-B/16 geometry: convert, then load via the package's
        load_pretrained_clip_params and check the tree matches ClipViT's
        init param-for-param (names AND shapes) — i.e. the converted file
        is drop-in for the 224px production encoder."""
        pytest.importorskip("torch")
        pytest.importorskip("transformers")
        import sys

        sys.path.insert(0, ".")
        import flax
        import jax

        from image_segmentation_tpu.models.clip_vit import (
            ClipViT,
            load_pretrained_clip_params,
        )
        from scripts.convert_clip_weights import main as convert_main

        out = str(tmp_path / "clip_vit_b16.npz")
        convert_main(["--from-config", "--out", out])
        converted = load_pretrained_clip_params(cache_path=out)
        total = sum(x.size for x in jax.tree.leaves(converted))
        assert total > 80e6  # ViT-B/16 vision tower ≈ 86M params

        ref = ClipViT().init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))
        )["params"]
        got = {
            k: v.shape
            for k, v in flax.traverse_util.flatten_dict(converted, sep="/").items()
        }
        want = {
            k: v.shape
            for k, v in flax.traverse_util.flatten_dict(ref, sep="/").items()
        }
        assert got == want

    def test_small_conversion_trains_through_runner(self, tmp_path):
        """Same script, smoke-ViT geometry (run.py --smoke-vit: hidden 64,
        4 layers, heads 4, mlp 128 at 224px/patch16): convert, then train
        one epoch through run.py --clip-weights on the produced .npz —
        file → load → param injection → frozen-encoder training, the full
        consumer path at a size CPU can run."""
        pytest.importorskip("torch")
        pytest.importorskip("transformers")
        import json
        import os
        import sys

        sys.path.insert(0, ".")
        from scripts.convert_clip_weights import main as convert_main

        out = str(tmp_path / "clip_smoke.npz")
        convert_main([
            "--from-config", "--out", out,
            "--config-json", json.dumps({
                "hidden_size": 64, "num_hidden_layers": 4,
                "num_attention_heads": 4, "intermediate_size": 128,
                "image_size": 224,
            }),
        ])

        from image_segmentation_tpu.run import main as run_main

        run_main([
            "--config", "clipunet", "--synthetic", "4", "--epochs", "1",
            "--batch-size", "2", "--save-dir", str(tmp_path / "runs"),
            "--smoke-vit", "--clip-weights", out, "--max-devices", "1",
        ])
        assert os.path.isdir(tmp_path / "runs" / "clipunet")


class TestClipUNet:
    def test_output_shape_and_upsampling_chain(self):
        model = ClipUNet(
            num_classes=4, decoder_channels=(32, 16, 8), vit=SMALL,
            skip_indices=(1, 2),
        )
        x = jnp.zeros((1, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(variables, x, train=False)
        # grid 2 -> two up blocks -> 8px
        assert y.shape == (1, 8, 8, 4)

    def test_noskips_output_shape(self):
        model = ClipUNetNoSkips(
            num_classes=4, decoder_channels=(32, 16, 8), vit=SMALL
        )
        x = jnp.zeros((1, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(variables, x, train=False)
        assert y.shape == (1, 8, 8, 4)

    def test_frozen_encoder_gets_no_gradient(self):
        model = ClipUNet(
            num_classes=4, decoder_channels=(32, 16, 8), vit=SMALL,
            skip_indices=(1, 2), freeze_encoder=True,
        )
        x = jnp.ones((1, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), x)

        def loss(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(out**2)

        g = jax.grad(loss)(variables["params"])
        enc_norm = sum(
            float(jnp.abs(l).sum())
            for l in jax.tree_util.tree_leaves(g["encoder"])
        )
        dec_norm = sum(
            float(jnp.abs(l).sum())
            for l in jax.tree_util.tree_leaves(g["init_conv"])
        )
        assert enc_norm == 0.0
        assert dec_norm > 0.0

    def test_wrong_input_size_raises(self):
        model = ClipUNet(vit=SMALL)
        with pytest.raises(ValueError):
            model.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 3)))


class TestPromptModel:
    def test_output_is_probability_partition(self):
        model = PromptModel(vit=SMALL, unet_base=4, skip_indices=(0, 1, 2, 3),
                            decoder_channels=(32, 16, 8, 8, 8))
        x = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (1, 32, 32, 3)), jnp.float32
        )
        hm = jnp.zeros((1, 32, 32, 1))
        variables = model.init(jax.random.PRNGKey(0), x, hm)
        probs = model.apply(variables, x, hm, train=False)
        assert probs.shape == (1, 32, 32, 4)
        p = np.asarray(probs)
        assert p.min() >= 0.0
        # ch0 + mask*sum(clip_probs) = 1: channel sum must be 1
        np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)

    def test_frozen_clip_branch(self):
        model = PromptModel(vit=SMALL, unet_base=4, skip_indices=(0, 1, 2, 3),
                            decoder_channels=(32, 16, 8, 8, 8), freeze_clip=True)
        x = jnp.ones((1, 32, 32, 3))
        hm = jnp.zeros((1, 32, 32, 1))
        variables = model.init(jax.random.PRNGKey(0), x, hm)

        def loss(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, hm, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(out**2)

        g = jax.grad(loss)(variables["params"])
        clip_norm = sum(
            float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g["clip"])
        )
        mask_norm = sum(
            float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g["mask"])
        )
        assert clip_norm == 0.0
        assert mask_norm > 0.0

    def test_finetune_variant_trains_decoder_not_vit(self):
        """freeze_clip=False (the reference's fine-tuned prompt,
        segmentation_webapp/prompt_model.py:101-102): gradients flow into
        the clip DECODER, but the inner ViT stays frozen — the
        reference's ClipViTEncoder freezes itself by default
        (clip/clipunet.py:28-30) and is never unfrozen."""
        model = PromptModel(vit=SMALL, unet_base=4, skip_indices=(0, 1, 2, 3),
                            decoder_channels=(32, 16, 8, 8, 8),
                            freeze_clip=False)
        x = jnp.ones((1, 32, 32, 3))
        hm = jnp.zeros((1, 32, 32, 1))
        variables = model.init(jax.random.PRNGKey(0), x, hm)

        def loss(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, hm, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(out**2)

        g = jax.grad(loss)(variables["params"])
        enc_norm = sum(
            float(jnp.abs(l).sum())
            for l in jax.tree_util.tree_leaves(g["clip"]["encoder"])
        )
        dec_norm = sum(
            float(jnp.abs(l).sum())
            for k, sub in g["clip"].items() if k != "encoder"
            for l in jax.tree_util.tree_leaves(sub)
        )
        assert enc_norm == 0.0
        assert dec_norm > 0.0

    def test_frozen_clip_bn_uses_batch_stats_in_train(self):
        """torch's frozen clip branch still runs BN in batch-stats mode
        during training (requires_grad only stops parameter gradients):
        the clip running statistics must UPDATE across a train-mode
        apply even with freeze_clip=True."""
        model = PromptModel(vit=SMALL, unet_base=4, skip_indices=(0, 1, 2, 3),
                            decoder_channels=(32, 16, 8, 8, 8),
                            freeze_clip=True)
        x = jnp.asarray(
            np.random.default_rng(1).uniform(0, 1, (2, 32, 32, 3)),
            jnp.float32,
        )
        hm = jnp.zeros((2, 32, 32, 1))
        variables = model.init(jax.random.PRNGKey(0), x, hm)
        _, mut = model.apply(
            variables, x, hm, train=True, mutable=["batch_stats"]
        )
        before = jax.tree_util.tree_leaves(variables["batch_stats"]["clip"])
        after = jax.tree_util.tree_leaves(mut["batch_stats"]["clip"])
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(before, after)
        )
        assert changed, "frozen clip BN running stats did not update"
