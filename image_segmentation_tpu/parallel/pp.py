"""Pipeline parallelism (PP) for the ViT encoder block stack.

GPipe-style SPMD pipeline written the TPU way: the mesh's stage axis
holds S pipeline stages, each device owns a contiguous slice of the
stacked transformer-block parameters (leading "layer" dim sharded over
the axis), and microbatch activations circulate stage-to-stage with
`lax.ppermute` inside one `shard_map` — a single jitted program, all
communication on the ICI. The reference has nothing comparable (it is
single-device eager torch, reference utils/training.py:11-16); PP here
is the scale-out path for encoders too deep/large for one chip's HBM
(the frozen ViT-B/16 fits one v5e easily, so the production default
remains DP; PP is exercised at small config by tests/test_pp.py and is
shape-generic).

Schedule: the classic M-microbatch, (M + S - 1)-tick loop. At tick t,
stage 0 injects microbatch t, every stage applies its local layers
(a `lax.scan` over the stacked slice), the last stage banks its result,
and activations shift one stage forward. Bubble fraction is the usual
(S-1)/(M+S-1) — pick M ≥ 4·S for >80% utilisation.

Autodiff: `jax.grad` traces straight through shard_map/ppermute (the
transpose of a shift is the reverse shift), so the same function serves
frozen-encoder inference and full fine-tuning; the backward schedule is
whatever transposition yields (correct, not 1F1B-optimal).

Per-layer hidden states (the ClipUNet skip taps, models/clip_unet.py)
are returned too: each stage scan collects its local layer outputs and
one masked `psum` over the stage axis assembles the (L, N, T, H) stack.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from image_segmentation_tpu.parallel.mesh import MODEL_AXIS

import flax


def stack_block_params(params: dict, num_layers: int, prefix: str = "block_") -> dict:
    """Stack the per-block parameter subtrees `block_0..block_{L-1}`
    (models/clip_vit.py naming) into one pytree with a leading layer dim,
    ready to shard P('<stage axis>') for the pipeline."""
    blocks = [params[f"{prefix}{i}"] for i in range(num_layers)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def unstack_block_params(stacked: dict, prefix: str = "block_") -> dict:
    """Inverse of stack_block_params (e.g. to load a pipelined checkpoint
    back into the sequential ClipViT layout)."""
    num_layers = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    return {
        f"{prefix}{i}": jax.tree_util.tree_map(lambda x: x[i], stacked)
        for i in range(num_layers)
    }


def shard_stacked_params(stacked: dict, mesh: Mesh, axis: str = MODEL_AXIS):
    """Put the stacked block params with the layer dim split over `axis`
    (stage s holds layers [s·L/S, (s+1)·L/S))."""
    s = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), stacked)


def pipeline_blocks(
    block_fn: Callable,
    stacked_params,
    x: jnp.ndarray,
    mesh: Mesh,
    num_microbatches: int,
    axis: str = MODEL_AXIS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run `x` through the full stacked block sequence as an S-stage
    pipeline over `mesh[axis]`.

    block_fn(one_layer_params, x) -> x applies a single block.
    stacked_params: leading dim L (total layers), L % S == 0; shard with
    shard_stacked_params (an unsharded tree works too — shard_map slices
    it either way).
    x: (N, ...) with N % num_microbatches == 0.

    Returns (final (N, ...), per_layer (L, N, ...)) — per_layer[i] is the
    output of block i, matching ClipViT's hidden_states[1:].
    """
    n_stages = mesh.shape[axis]
    total_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if total_layers % n_stages:
        raise ValueError(f"{total_layers} layers not divisible by {n_stages} stages")
    m = num_microbatches
    if x.shape[0] % m:
        raise ValueError(f"batch {x.shape[0]} not divisible by {m} microbatches")

    def stage_program(local_params, x_all):
        # local_params: (L/S, ...) this stage's layers; x_all: full input
        # (shard_map with replicated in_spec for x).
        stage = jax.lax.axis_index(axis)
        local_params_len = total_layers // n_stages
        mb = x_all.reshape((m, x_all.shape[0] // m) + x_all.shape[1:])

        def run_stage(carry_x):
            def one(h, p):
                h = block_fn(p, h)
                return h, h

            return jax.lax.scan(one, carry_x, local_params)

        state = jnp.zeros_like(mb[0])
        outputs = jnp.zeros_like(mb)
        # local per-layer taps for every microbatch: (M, L/S, mb, ...)
        local_layers = jnp.zeros((m, local_params_len) + mb.shape[1:], mb.dtype)

        def tick(t, carry):
            state, outputs, local_layers = carry
            inject = mb[jnp.clip(t, 0, m - 1)]
            state = jnp.where(stage == 0, jnp.where(t < m, inject, state), state)
            state, taps = run_stage(state)
            # bank per-layer taps for the microbatch this stage just did
            mb_idx = t - stage
            valid = (mb_idx >= 0) & (mb_idx < m)
            idx = jnp.clip(mb_idx, 0, m - 1)
            local_layers = jnp.where(
                valid,
                jax.lax.dynamic_update_index_in_dim(local_layers, taps, idx, 0),
                local_layers,
            )
            outputs = jnp.where(
                (stage == n_stages - 1) & valid,
                jax.lax.dynamic_update_index_in_dim(outputs, state, idx, 0),
                outputs,
            )
            state = jax.lax.ppermute(
                state, axis, [(i, (i + 1) % n_stages) for i in range(n_stages)]
            )
            return state, outputs, local_layers

        state, outputs, local_layers = jax.lax.fori_loop(
            0, m + n_stages - 1, tick, (state, outputs, local_layers)
        )
        # final outputs live on the last stage only: masked psum broadcasts
        outputs = jax.lax.psum(
            jnp.where(stage == n_stages - 1, outputs, 0.0), axis
        )
        final = outputs.reshape(x_all.shape)
        # assemble (L, M, mb, ...) from each stage's (M, L/S, ...) slice
        per_layer_local = jnp.moveaxis(local_layers, 0, 1)  # (L/S, M, mb, ...)
        full = jnp.zeros((total_layers,) + per_layer_local.shape[1:],
                         per_layer_local.dtype)
        full = jax.lax.dynamic_update_slice_in_dim(
            full, per_layer_local, stage * local_params_len, 0
        )
        full = jax.lax.psum(full, axis)
        per_layer = full.reshape((total_layers,) + x_all.shape)
        return final, per_layer

    fn = jax.shard_map(
        stage_program,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(stacked_params, x)
