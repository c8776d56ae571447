"""Pipeline-parallel tests: the GPipe shard_map pipeline over the ViT
block stack must reproduce the sequential ClipViT forward (final output
AND every per-layer hidden state), and its gradients must match the
sequential gradients (ppermute's transpose is the reverse shift)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_segmentation_tpu.models.clip_vit import (
    ClipViT,
    ClipViTConfig,
    TransformerBlock,
)
from image_segmentation_tpu.parallel.mesh import MODEL_AXIS, get_mesh
from image_segmentation_tpu.parallel.pp import (
    pipeline_blocks,
    shard_stacked_params,
    stack_block_params,
    unstack_block_params,
)

CFG = ClipViTConfig(
    image_size=32, patch_size=16, hidden_size=64, num_layers=4,
    num_heads=4, mlp_dim=128,
)


def _setup():
    model = ClipViT(cfg=CFG)
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), pixels)
    _, hidden = model.apply(variables, pixels)
    block_fn = lambda p, x: TransformerBlock(CFG).apply({"params": p}, x)
    stacked = stack_block_params(variables["params"], CFG.num_layers)
    return variables, pixels, hidden, block_fn, stacked


def test_stack_roundtrip():
    variables, _, _, _, stacked = _setup()
    back = unstack_block_params(stacked)
    for i in range(CFG.num_layers):
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            variables["params"][f"block_{i}"], back[f"block_{i}"],
        )


@pytest.mark.skipif(jax.device_count() < 4, reason="needs >=4 fake devices")
@pytest.mark.parametrize("n_stages,microbatches", [(4, 2), (2, 4)])
def test_pp_forward_matches_sequential(n_stages, microbatches):
    _, _, hidden, block_fn, stacked = _setup()
    x0 = hidden[0]  # embeddings after pre-layernorm: pipeline input

    mesh = get_mesh(jax.devices()[:n_stages], model_parallel=n_stages)
    stacked_sharded = shard_stacked_params(stacked, mesh)
    final, per_layer = pipeline_blocks(
        block_fn, stacked_sharded, x0, mesh, num_microbatches=microbatches
    )
    np.testing.assert_allclose(
        np.asarray(final), np.asarray(hidden[-1]), atol=2e-5
    )
    for i in range(CFG.num_layers):
        np.testing.assert_allclose(
            np.asarray(per_layer[i]), np.asarray(hidden[i + 1]), atol=2e-5,
            err_msg=f"hidden state {i + 1}",
        )


@pytest.mark.skipif(jax.device_count() < 4, reason="needs >=4 fake devices")
@pytest.mark.slow
def test_pp_grad_matches_sequential():
    _, _, hidden, block_fn, stacked = _setup()
    x0 = hidden[0]
    mesh = get_mesh(jax.devices()[:4], model_parallel=4)

    def seq_loss(stacked_params, x):
        h = x
        for i in range(CFG.num_layers):
            h = block_fn(jax.tree.map(lambda a: a[i], stacked_params), h)
        return jnp.sum(h**2)

    def pp_loss(stacked_params, x):
        final, _ = pipeline_blocks(
            block_fn, stacked_params, x, mesh, num_microbatches=2
        )
        return jnp.sum(final**2)

    want = jax.grad(seq_loss)(stacked, x0)
    got = jax.grad(pp_loss)(shard_stacked_params(stacked, mesh), x0)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-4
        ),
        want, jax.device_get(got),
    )
