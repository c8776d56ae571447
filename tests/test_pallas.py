"""Pallas kernel tests (interpret mode on CPU, pinned against the
pure-XLA reference implementations)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_segmentation_tpu.ops.pallas.attention import (
    fused_attention,
    reference_attention,
)


class TestFusedAttention:
    @pytest.mark.parametrize("b,s,h,d", [(2, 197, 12, 64), (1, 5, 2, 16)])
    def test_matches_reference(self, b, s, h, d):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
        got = fused_attention(q, k, v, True)
        want = reference_attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5
        )

    def test_bfloat16_inputs(self):
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=(1, 64, 4, 32)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(1, 64, 4, 32)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(1, 64, 4, 32)), jnp.bfloat16)
        got = fused_attention(q, k, v, True)
        want = reference_attention(q, k, v)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32), atol=3e-2
        )

    def test_padding_does_not_leak(self):
        """Padded key positions must not receive attention mass: compare an
        odd-length sequence against the same data computed at exactly that
        length via the reference."""
        rng = np.random.default_rng(2)
        s = 130  # pads to 256 -> nearly half the scores masked
        q = jnp.asarray(rng.normal(size=(1, s, 2, 64)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(1, s, 2, 64)), jnp.float32)
        v = jnp.asarray(10.0 + rng.normal(size=(1, s, 2, 64)), jnp.float32)
        got = fused_attention(q, k, v, True)
        want = reference_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)

    def test_vit_with_pallas_matches_xla_path(self):
        from image_segmentation_tpu.models.clip_vit import ClipViT, ClipViTConfig

        cfg = ClipViTConfig(
            image_size=32, patch_size=16, hidden_size=64, num_layers=2,
            num_heads=4, mlp_dim=128,
        )
        x = jnp.asarray(
            np.random.default_rng(3).uniform(0, 1, (2, 32, 32, 3)), jnp.float32
        )
        params = ClipViT(cfg, use_pallas=False).init(jax.random.PRNGKey(0), x)
        last_xla, _ = ClipViT(cfg, use_pallas=False).apply(params, x)
        last_pls, _ = ClipViT(cfg, use_pallas=True).apply(params, x)
        np.testing.assert_allclose(
            np.asarray(last_xla), np.asarray(last_pls), atol=3e-5
        )
