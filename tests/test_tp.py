"""Tensor-parallel sharding tests: TP-annotated ViT must produce the
same numbers as the replicated run (GSPMD inserts the collectives)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_segmentation_tpu.models.clip_unet import ClipUNet
from image_segmentation_tpu.models.clip_vit import ClipViTConfig
from image_segmentation_tpu.parallel.mesh import (
    MODEL_AXIS,
    get_mesh,
    replicate,
    shard_batch,
)
from image_segmentation_tpu.parallel.tp import clip_tp_spec, shard_params_tp

VIT = ClipViTConfig(
    image_size=32, patch_size=16, hidden_size=64, num_layers=2,
    num_heads=4, mlp_dim=128,
)


def test_spec_rules():
    from jax.sharding import PartitionSpec as P

    assert clip_tp_spec("encoder/block_0/attn/q_proj/kernel") == P(None, MODEL_AXIS)
    assert clip_tp_spec("encoder/block_0/attn/q_proj/bias") == P(MODEL_AXIS)
    assert clip_tp_spec("encoder/block_0/attn/out_proj/kernel") == P(MODEL_AXIS, None)
    assert clip_tp_spec("encoder/block_0/attn/out_proj/bias") == P()
    assert clip_tp_spec("encoder/block_1/fc1/kernel") == P(None, MODEL_AXIS)
    assert clip_tp_spec("encoder/block_1/fc2/kernel") == P(MODEL_AXIS, None)
    assert clip_tp_spec("encoder/pre_layernorm/scale") == P()
    assert clip_tp_spec("head/kernel") == P()


@pytest.mark.skipif(jax.device_count() < 4, reason="needs >=4 fake devices")
def test_tp_forward_matches_replicated():
    model = ClipUNet(
        num_classes=4, vit=VIT, skip_indices=(1, 2), decoder_channels=(32, 16, 8)
    )
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (4, 32, 32, 3)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    want = np.asarray(fwd(variables, x))

    mesh = get_mesh(jax.devices()[:4], model_parallel=2)
    v_sharded = {
        "params": shard_params_tp(
            replicate(variables["params"], mesh), mesh, encoder_prefix="encoder"
        ),
        "batch_stats": replicate(variables["batch_stats"], mesh),
    }
    xs = shard_batch(x, mesh)
    with mesh:
        got = np.asarray(fwd(v_sharded, xs))
    np.testing.assert_allclose(got, want, atol=2e-5)

    # q_proj kernel really is sharded over 'model'
    k = v_sharded["params"]["encoder"]["block_0"]["attn"]["q_proj"]["kernel"]
    assert not k.sharding.is_fully_replicated
