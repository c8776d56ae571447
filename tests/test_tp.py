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


@pytest.mark.skipif(jax.device_count() < 4, reason="needs >=4 fake devices")
@pytest.mark.slow
def test_tp_train_step_matches_replicated():
    """Full GRADIENT equivalence: one make_train_step on a (data×model)
    mesh with TP-sharded encoder params must produce the same updated
    parameters as the unsharded single-device step (GSPMD's inserted
    collectives change nothing numerically). freeze_encoder=False so real
    gradients flow through every TP-sharded kernel."""
    import optax

    from image_segmentation_tpu.losses import DiceCELoss
    from image_segmentation_tpu.train import create_train_state
    from image_segmentation_tpu.train.steps import make_train_step

    # patch-8 grid on 32px input → 3 up-blocks (4→8→16→32) with 3 skips,
    # so the logits land at full label resolution for the loss
    vit = ClipViTConfig(
        image_size=32, patch_size=8, hidden_size=64, num_layers=3,
        num_heads=4, mlp_dim=128,
    )
    model = ClipUNet(
        num_classes=4, vit=vit, skip_indices=(1, 2, 3),
        decoder_channels=(32, 16, 8, 8), freeze_encoder=False,
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 4, (4, 32, 32)), jnp.int32)

    def fresh_state():
        # SGD: the update is LINEAR in the gradient, so param equality is a
        # direct gradient-equivalence check (Adam's first step is
        # ±lr·sign(g), which amplifies float noise on near-zero grads)
        return create_train_state(
            model, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
            optax.sgd(0.1),
        )

    step = make_train_step(DiceCELoss(ignore_index=None))

    ref_state, ref_loss = step(fresh_state(), (x, y))
    ref_params = jax.tree.map(np.asarray, ref_state.params)

    mesh = get_mesh(jax.devices()[:4], model_parallel=2)
    state = fresh_state()
    state = state.replace(
        params=shard_params_tp(
            replicate(state.params, mesh), mesh, encoder_prefix="encoder"
        ),
        batch_stats=replicate(state.batch_stats, mesh),
        opt_state=replicate(state.opt_state, mesh),
    )
    with mesh:
        tp_state, tp_loss = step(state, shard_batch((x, y), mesh))
    assert abs(float(tp_loss) - float(ref_loss)) < 1e-5

    tp_params = jax.tree.map(np.asarray, tp_state.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=5e-5, rtol=1e-4),
        ref_params, tp_params,
    )
    # BN statistics (updated through the sharded forward) must match too
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
        ),
        jax.tree.map(np.asarray, ref_state.batch_stats),
        jax.tree.map(np.asarray, tp_state.batch_stats),
    )
