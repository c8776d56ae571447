"""Model architecture tests: golden shapes, parameter schedules, BN
behavior (reference unet/unet.py, autoencoder/autoencoder.py contracts)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_segmentation_tpu.models import (
    ReconstructionAutoencoder,
    SegmentationAutoencoder,
    UNet,
)


def _init(model, shape, train=False):
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=train)
    return variables, x


def _param_count(params):
    return sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))


class TestUNet:
    def test_output_shape(self):
        model = UNet(num_classes=4, base=8)
        variables, x = _init(model, (2, 64, 64, 3))
        y = model.apply(variables, x, train=False)
        assert y.shape == (2, 64, 64, 4)
        assert y.dtype == jnp.float32

    def test_param_count_matches_reference_schedule(self):
        # Reference unet(3, 4) with base 64 has 31,043,652 params:
        # computed from the conv/BN arithmetic of unet/unet.py:67-91.
        def double_conv(cin, cout):
            return (cin * cout * 9 + cout + 2 * cout) + (cout * cout * 9 + cout + 2 * cout)

        def up(cin, cout):  # ConvTranspose(cin->cout,2x2)+bias, then dc(cin->cout)
            return cin * cout * 4 + cout + double_conv(cin, cout)

        b = 64
        expected = (
            double_conv(3, b)
            + sum(double_conv(b * 2**i, b * 2 ** (i + 1)) for i in range(4))
            + up(16 * b, 8 * b) + up(8 * b, 4 * b) + up(4 * b, 2 * b) + up(2 * b, b)
            + (b * 4 + 4)  # 1x1 head
        )
        model = UNet(num_classes=4, base=64)
        variables = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        )
        got = _param_count(variables["params"]) + _param_count(
            variables["batch_stats"]
        )
        # batch_stats (running mean/var) are not torch "parameters"; torch
        # counts weight+bias of BN only. Our params include BN scale+bias.
        got_params_only = _param_count(variables["params"])
        assert got_params_only == expected

    def test_train_mode_updates_batch_stats(self):
        model = UNet(num_classes=4, base=8)
        variables, x = _init(model, (2, 32, 32, 3), train=True)
        y, mutated = model.apply(
            variables, jnp.ones_like(x), train=True, mutable=["batch_stats"]
        )
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mutated["batch_stats"])
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(before, after)
        )
        assert changed

    def test_multiple_of_16_required(self):
        model = UNet(num_classes=4, base=8)
        variables, _ = _init(model, (1, 64, 64, 3))
        y = model.apply(variables, jnp.zeros((1, 128, 128, 3)), train=False)
        assert y.shape == (1, 128, 128, 4)


class TestAutoencoder:
    def test_reconstruction_shape_and_range(self):
        model = ReconstructionAutoencoder(base=8)
        variables, x = _init(model, (2, 64, 64, 3))
        y = model.apply(variables, x, train=False)
        assert y.shape == (2, 64, 64, 3)
        out = np.asarray(y)
        assert out.min() >= 0.0 and out.max() <= 1.0  # sigmoid head

    def test_bottleneck_shape(self):
        # 3 pooling blocks: 256px -> (N, 32, 32, 4*base)
        # (reference autoencoder/autoencoder.py: bottleneck (N,256,32,32))
        from image_segmentation_tpu.models.autoencoder import AEEncoder

        enc = AEEncoder(base=8)
        x = jnp.zeros((1, 64, 64, 3))
        variables = enc.init(jax.random.PRNGKey(0), x)
        bottleneck, s3, s2, s1 = enc.apply(variables, x)
        assert bottleneck.shape == (1, 8, 8, 32)
        assert s1.shape == (1, 64, 64, 8)
        assert s2.shape == (1, 32, 32, 16)
        assert s3.shape == (1, 16, 16, 32)

    def test_segmentation_shape(self):
        model = SegmentationAutoencoder(num_classes=4, base=8)
        variables, x = _init(model, (2, 64, 64, 3))
        y = model.apply(variables, x, train=False)
        assert y.shape == (2, 64, 64, 4)

    def test_encoder_subtree_shared_between_models(self):
        """Recon and Seg AEs must use the same 'encoder' parameter subtree
        structure so stage-1 weights transfer (reference
        autoencoder/autoencoder.py:220-248)."""
        r = ReconstructionAutoencoder(base=8)
        s = SegmentationAutoencoder(base=8)
        vr, x = _init(r, (1, 32, 32, 3))
        vs, _ = _init(s, (1, 32, 32, 3))
        tr = jax.tree_util.tree_structure(vr["params"]["encoder"])
        ts = jax.tree_util.tree_structure(vs["params"]["encoder"])
        assert tr == ts
        shapes_r = jax.tree_util.tree_map(lambda p: p.shape, vr["params"]["encoder"])
        shapes_s = jax.tree_util.tree_map(lambda p: p.shape, vs["params"]["encoder"])
        assert shapes_r == shapes_s
