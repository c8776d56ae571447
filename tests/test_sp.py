"""Spatial-partitioning tests: a UNet with the image HEIGHT axis sharded
across the mesh must produce the same numbers as the single-device run
(GSPMD inserts the conv/pool halo exchanges and the sync-BN reductions
over the sharded H axis)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_segmentation_tpu.models import UNet
from image_segmentation_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    get_mesh,
    replicate,
)
from image_segmentation_tpu.parallel.sp import (
    shard_batch_spatial,
    spatial_spec,
)


def test_spec_rules():
    from jax.sharding import PartitionSpec as P

    assert spatial_spec(4) == P(None, DATA_AXIS)
    assert spatial_spec(3) == P(None, DATA_AXIS)
    assert spatial_spec(4, MODEL_AXIS, DATA_AXIS) == P(DATA_AXIS, MODEL_AXIS)
    assert spatial_spec(1) == P(None)
    assert spatial_spec(0) == P()


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 fake devices")
def test_sp_guard_rejects_sub_bottleneck_sharding():
    """8 shards on H=64 would leave the UNet bottleneck (H=4) with more
    shards than rows — the regime where XLA's padded-shard backward is
    silently wrong (measured: grads off by 9e-3 while the loss matches
    to 2e-7). shard_batch_spatial must refuse it."""
    mesh = get_mesh(jax.devices()[:8])
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    with pytest.raises(ValueError, match="bottleneck"):
        shard_batch_spatial(x, mesh)
    # a conv-only model (no downsampling) may relax the factor
    out = shard_batch_spatial(x, mesh, downsample_factor=1)
    assert not out.sharding.is_fully_replicated


def test_max_spatial_shards_envelope():
    """The capability envelope as an API (round-5 park decision,
    parallel/sp.py max_spatial_shards): callers can clamp their mesh
    instead of hitting the ValueError backstop, and the envelope
    admits every resolution SP exists for (>=128px at 8-way)."""
    from image_segmentation_tpu.parallel import max_spatial_shards

    assert max_spatial_shards(128) == 8
    assert max_spatial_shards(256) == 16
    assert max_spatial_shards(2048) == 128
    assert max_spatial_shards(64) == 4    # sub-8 → guard fires at 8-way
    assert max_spatial_shards(8) == 1     # never zero
    assert max_spatial_shards(64, downsample_factor=1) == 64
    # consistency with the guard: exactly the envelope boundary passes
    mesh = get_mesh(jax.devices()[:8])
    ok = jnp.zeros((1, 128, 128, 3), jnp.float32)
    assert shard_batch_spatial(ok, mesh) is not None


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 fake devices")
@pytest.mark.slow
def test_sp_forward_matches_replicated():
    """Pure SP: batch replicated, H split 8 ways. 128px through the full
    5-level UNet (bottleneck H=8: one row per shard, the minimum the
    sharding guard admits)."""
    model = UNet(num_classes=4, base=8)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (2, 128, 128, 3)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    want = np.asarray(fwd(variables, x))

    mesh = get_mesh(jax.devices()[:8])
    v = replicate(variables, mesh)
    xs = shard_batch_spatial(x, mesh)
    assert not xs.sharding.is_fully_replicated
    with mesh:
        got = np.asarray(fwd(v, xs))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 fake devices")
@pytest.mark.slow
def test_sp_train_step_matches_replicated():
    """Gradient + BN-stat equivalence for one full train step with the
    batch spatially sharded (pure SP over 'data', one bottleneck row
    per shard). SGD keeps the update linear in the gradient, as in
    test_tp.py."""
    import optax

    from image_segmentation_tpu.losses import DiceCELoss
    from image_segmentation_tpu.train import create_train_state
    from image_segmentation_tpu.train.steps import make_train_step

    model = UNet(num_classes=4, base=8)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (2, 128, 128, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 4, (2, 128, 128)), jnp.int32)

    def fresh_state():
        return create_train_state(
            model, jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)),
            optax.sgd(0.1),
        )

    step = make_train_step(DiceCELoss(ignore_index=None))
    ref_state, ref_loss = step(fresh_state(), (x, y))

    mesh = get_mesh(jax.devices()[:8])
    state = replicate(fresh_state(), mesh)
    with mesh:
        sp_state, sp_loss = step(state, shard_batch_spatial((x, y), mesh))
    assert abs(float(sp_loss) - float(ref_loss)) < 1e-5

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
        ),
        ref_state.params, jax.device_get(sp_state.params),
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
        ),
        ref_state.batch_stats, jax.device_get(sp_state.batch_stats),
    )


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 fake devices")
@pytest.mark.slow
def test_dp_sp_train_step_matches_replicated():
    """DP × SP: batch on 'data' (2 ways), height on 'model' (4 ways) —
    the medium-batch / medium-resolution hybrid layout."""
    import optax

    from image_segmentation_tpu.losses import DiceCELoss
    from image_segmentation_tpu.train import create_train_state
    from image_segmentation_tpu.train.steps import make_train_step

    model = UNet(num_classes=4, base=8)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (4, 64, 64, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 4, (4, 64, 64)), jnp.int32)

    def fresh_state():
        return create_train_state(
            model, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
            optax.sgd(0.1),
        )

    step = make_train_step(DiceCELoss(ignore_index=None))
    ref_state, ref_loss = step(fresh_state(), (x, y))

    mesh = get_mesh(jax.devices()[:8], model_parallel=4)
    state = replicate(fresh_state(), mesh)
    batch = shard_batch_spatial(
        (x, y), mesh, spatial_axis=MODEL_AXIS, batch_axis=DATA_AXIS
    )
    with mesh:
        sp_state, sp_loss = step(state, batch)
    assert abs(float(sp_loss) - float(ref_loss)) < 1e-5

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
        ),
        ref_state.params, jax.device_get(sp_state.params),
    )
