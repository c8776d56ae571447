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


class TestFusedDoubleConv:
    def _args(self, N=2, H=32, W=40, Cin=8, C=16, seed=0):
        import numpy as np

        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.normal(size=(N, H, W, Cin)), jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(3, 3, Cin, C)) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.1, jnp.float32)
        s1 = jnp.asarray(rng.uniform(0.5, 1.5, C), jnp.float32)
        b1 = jnp.asarray(rng.normal(size=C) * 0.1, jnp.float32)
        s2 = jnp.asarray(rng.uniform(0.5, 1.5, C), jnp.float32)
        b2 = jnp.asarray(rng.normal(size=C) * 0.1, jnp.float32)
        return x, w1, s1, b1, w2, s2, b2

    @pytest.mark.parametrize("strip", [8, 16])
    def test_matches_reference(self, strip):
        from image_segmentation_tpu.ops.pallas.double_conv import (
            fused_double_conv,
            reference_double_conv,
        )

        args = self._args()
        got = fused_double_conv(*args, strip=strip, interpret=True)
        want = reference_double_conv(*args)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-6
        )

    def test_fold_bn(self):
        from image_segmentation_tpu.ops.pallas.double_conv import fold_bn

        rng = np.random.default_rng(1)
        C = 8
        bias = jnp.asarray(rng.normal(size=C), jnp.float32)
        mean = jnp.asarray(rng.normal(size=C), jnp.float32)
        var = jnp.asarray(rng.uniform(0.5, 2.0, C), jnp.float32)
        gamma = jnp.asarray(rng.uniform(0.5, 1.5, C), jnp.float32)
        beta = jnp.asarray(rng.normal(size=C), jnp.float32)
        scale, shift = fold_bn(bias, mean, var, gamma, beta)
        conv_out = jnp.asarray(rng.normal(size=(4, C)), jnp.float32)
        fused = conv_out * scale + shift
        ref = (conv_out + bias - mean) / jnp.sqrt(var + 1e-5) * gamma + beta
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-5)


class TestFusedBlocks:
    def test_down_block_matches_xla(self):
        from image_segmentation_tpu.ops.pallas.blocks import (
            fused_down_block,
            max_pool_2x2,
        )
        from image_segmentation_tpu.ops.pallas.double_conv import (
            reference_double_conv,
        )

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 8)), jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(3, 3, 8, 16)) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(3, 3, 16, 16)) * 0.1, jnp.float32)
        s = jnp.ones(16)
        b = jnp.zeros(16)
        got = fused_down_block(x, w1, s, b, w2, s, b, strip=8, interpret=True)
        want = reference_double_conv(max_pool_2x2(x), w1, s, b, w2, s, b)
        assert got.shape == (2, 16, 16, 16)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-6)

    def test_up_block_matches_xla(self):
        from image_segmentation_tpu.ops.pallas.blocks import (
            fused_up_block,
            transpose_conv_2x2,
        )
        from image_segmentation_tpu.ops.pallas.double_conv import (
            reference_double_conv,
        )

        rng = np.random.default_rng(1)
        skip = jnp.asarray(rng.normal(size=(1, 32, 32, 8)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 16)), jnp.float32)
        up_k = jnp.asarray(rng.normal(size=(2, 2, 16, 8)) * 0.1, jnp.float32)
        up_b = jnp.asarray(rng.normal(size=(8,)) * 0.1, jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(3, 3, 16, 8)) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(3, 3, 8, 8)) * 0.1, jnp.float32)
        s = jnp.ones(8)
        b = jnp.zeros(8)
        got = fused_up_block(
            skip, x, up_k, up_b, w1, s, b, w2, s, b, strip=8, interpret=True
        )
        up = transpose_conv_2x2(x, up_k, up_b)
        cat = jnp.concatenate([skip, up], axis=-1)
        want = reference_double_conv(cat, w1, s, b, w2, s, b)
        assert got.shape == (1, 32, 32, 8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-6)

    def test_up_block_doubles_resolution_like_linen(self):
        """transpose_conv_2x2 must match linen's ConvTranspose(k2 s2 VALID)
        used by models/layers.py UpConv (same kernel layout)."""
        import flax.linen as nn

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
        mod = nn.ConvTranspose(6, (2, 2), strides=(2, 2), padding="VALID")
        variables = mod.init(jax.random.PRNGKey(0), x)
        want = mod.apply(variables, x)
        from image_segmentation_tpu.ops.pallas.blocks import transpose_conv_2x2

        got = transpose_conv_2x2(
            x, variables["params"]["kernel"], variables["params"]["bias"]
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.slow
class TestFusedUNet:
    def test_matches_linen_forward(self):
        from image_segmentation_tpu.models import UNet
        from image_segmentation_tpu.models.fused_unet import fused_unet_forward

        model = UNet(num_classes=4, base=8)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        _, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
        variables = {"params": variables["params"],
                     "batch_stats": mut["batch_stats"]}
        want = model.apply(variables, x, train=False)
        got = fused_unet_forward(variables, x, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-6
        )


class TestFusedMLP:
    """ln2→fc1→quick-GELU→fc2→+x fused kernel (ops/pallas/mlp.py) pinned
    to its XLA reference, plus integration parity in TransformerBlock."""

    def _args(self, b=2, s=197, h=128, f=256, dtype=jnp.float32, seed=0):
        from image_segmentation_tpu.ops.pallas.mlp import fused_mlp  # noqa
        rng = np.random.default_rng(seed)
        return (
            jnp.asarray(rng.normal(size=(b, s, h)) * 0.5, dtype),
            jnp.asarray(rng.normal(size=(h,)), jnp.float32),
            jnp.asarray(rng.normal(size=(h,)), jnp.float32),
            jnp.asarray(rng.normal(size=(h, f)) * 0.05, dtype),
            jnp.asarray(rng.normal(size=(f,)), jnp.float32),
            jnp.asarray(rng.normal(size=(f, h)) * 0.05, dtype),
            jnp.asarray(rng.normal(size=(h,)), jnp.float32),
        )

    def test_matches_reference(self):
        from image_segmentation_tpu.ops.pallas.mlp import (
            _mlp_reference,
            fused_mlp,
        )
        args = self._args()
        got = fused_mlp(*args, 1e-5, True)
        want = _mlp_reference(*args, 1e-5)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5
        )

    def test_token_padding_exact(self):
        """Token counts that are not tile multiples (197·B) pad and slice
        without contaminating real rows."""
        from image_segmentation_tpu.ops.pallas.mlp import (
            _mlp_reference,
            fused_mlp,
        )
        args = self._args(b=1, s=131)
        got = fused_mlp(*args, 1e-5, True)
        want = _mlp_reference(*args, 1e-5)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5
        )

    def test_gradients_match_reference(self):
        from image_segmentation_tpu.ops.pallas.mlp import (
            _mlp_reference,
            fused_mlp,
        )
        x, lns, lnb, w1, b1, w2, b2 = self._args(s=64)
        f = lambda xx, ww: jnp.sum(
            fused_mlp(xx, lns, lnb, ww, b1, w2, b2, 1e-5, True) ** 2
        )
        g = lambda xx, ww: jnp.sum(
            _mlp_reference(xx, lns, lnb, ww, b1, w2, b2, 1e-5) ** 2
        )
        gx1, gw1 = jax.grad(f, argnums=(0, 1))(x, w1)
        gx2, gw2 = jax.grad(g, argnums=(0, 1))(x, w1)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), atol=2e-3)

    def test_unaligned_dims_rejected(self):
        from image_segmentation_tpu.ops.pallas.mlp import fused_mlp
        args = self._args(h=64, f=256)  # 64 not lane-aligned
        with pytest.raises(ValueError, match="lane-aligned"):
            fused_mlp(*args, 1e-5, True)

    def test_transformer_block_param_tree_and_output_parity(self):
        """use_pallas must not change the ViT parameter tree (names OR
        init values) and must produce the same function — checkpoints are
        interchangeable between the two paths."""
        import jax.tree_util as jtu

        from image_segmentation_tpu.models.clip_vit import (
            ClipViT,
            ClipViTConfig,
        )

        cfg = ClipViTConfig(image_size=32, patch_size=16, hidden_size=128,
                            num_layers=2, num_heads=4, mlp_dim=256)
        x = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (2, 32, 32, 3)),
            jnp.float32,
        )
        m_xla = ClipViT(cfg, use_pallas=False)
        m_pal = ClipViT(cfg, use_pallas=True)
        v_xla = m_xla.init(jax.random.PRNGKey(0), x)
        v_pal = m_pal.init(jax.random.PRNGKey(0), x)
        lx = jtu.tree_leaves_with_path(v_xla)
        lp = jtu.tree_leaves_with_path(v_pal)
        assert [jtu.keystr(p) for p, _ in lx] == [jtu.keystr(p) for p, _ in lp]
        for (p1, a), (_, b) in zip(lx, lp):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=jtu.keystr(p1)
            )
        out_x, _ = m_xla.apply(v_xla, x)
        out_p, _ = m_pal.apply(v_xla, x)
        np.testing.assert_allclose(
            np.asarray(out_x), np.asarray(out_p), atol=1e-4
        )
