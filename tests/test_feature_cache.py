"""Feature-cache tests: decoder-only training must be numerically
identical to the full frozen-encoder ClipUNet."""
import jax
import jax.numpy as jnp
import numpy as np

from image_segmentation_tpu.models.clip_unet import (
    ClipUNet,
    ClipUNetDecoderOnly,
)
from image_segmentation_tpu.models.clip_vit import ClipViTConfig
from image_segmentation_tpu.train.feature_cache import (
    clipunet_params_from_decoder,
    decoder_params_from_clipunet,
    encode_clip_features,
)

VIT = ClipViTConfig(
    image_size=32, patch_size=16, hidden_size=64, num_layers=3,
    num_heads=4, mlp_dim=128,
)
SKIPS = (1, 2)
CHANS = (32, 16, 8)


def _models_and_params():
    full = ClipUNet(
        num_classes=4, vit=VIT, skip_indices=SKIPS, decoder_channels=CHANS
    )
    x = jnp.zeros((1, 32, 32, 3))
    variables = full.init(jax.random.PRNGKey(0), x, train=False)
    dec = ClipUNetDecoderOnly(
        num_classes=4, decoder_channels=CHANS, num_skips=len(SKIPS)
    )
    return full, dec, variables


def test_decoder_only_matches_full_forward():
    full, dec, variables = _models_and_params()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (3, 32, 32, 3)), jnp.float32)

    want = full.apply(variables, x, train=False)

    feats = encode_clip_features(
        variables["params"]["encoder"], np.asarray(x), VIT,
        skip_indices=SKIPS, batch_size=2,
    )
    dvars = {
        "params": decoder_params_from_clipunet(variables["params"]),
        "batch_stats": variables["batch_stats"],
    }
    got = dec.apply(dvars, jnp.asarray(feats), train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_param_roundtrip():
    full, dec, variables = _models_and_params()
    d = decoder_params_from_clipunet(variables["params"])
    merged = clipunet_params_from_decoder(d, variables["params"]["encoder"])
    a = jax.tree_util.tree_leaves(merged)
    b = jax.tree_util.tree_leaves(variables["params"])
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_decoder_training_step_equivalent():
    """One SGD step on the decoder-only model must produce the same
    decoder params as a step on the full frozen model."""
    import optax

    from image_segmentation_tpu.losses import DiceCELoss
    from image_segmentation_tpu.train import TrainState, make_train_step

    full, dec, variables = _models_and_params()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 4, (2, 8, 8)), jnp.int32)
    loss_fn = DiceCELoss()
    tx = optax.sgd(1e-2)

    # the donated train step consumes its input arrays — give each state
    # its own copy
    variables = jax.tree_util.tree_map(lambda a: jnp.array(np.asarray(a)), variables)
    dparams = decoder_params_from_clipunet(variables["params"])
    feats = encode_clip_features(
        variables["params"]["encoder"], np.asarray(x), VIT, skip_indices=SKIPS,
        batch_size=2,
    )
    state_full = TrainState(
        step=0, params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        apply_fn=full.apply, tx=tx,
    )
    state_full = jax.tree_util.tree_map(
        lambda a: jnp.array(np.asarray(a)) if hasattr(a, "shape") else a,
        state_full,
    )
    step_full = make_train_step(loss_fn)
    state_full, loss_full = step_full(state_full, (x, y))

    state_dec = TrainState(
        step=0, params=dparams, batch_stats=variables["batch_stats"],
        opt_state=tx.init(dparams), apply_fn=dec.apply, tx=tx,
    )
    step_dec = make_train_step(loss_fn)
    state_dec, loss_dec = step_dec(state_dec, (jnp.asarray(feats), y))

    assert abs(float(loss_full) - float(loss_dec)) < 1e-5
    for k in state_dec.params:
        for a, b in zip(
            jax.tree_util.tree_leaves(state_dec.params[k]),
            jax.tree_util.tree_leaves(state_full.params[k]),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5, err_msg=k
            )
