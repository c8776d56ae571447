"""Jitted train / eval steps with microbatch gradient accumulation.

Reference behavior being replicated (utils/training.py:18-64): the
optimizer steps once per `accumulation_steps` microbatches with the
mean gradient, and BatchNorm statistics update per microbatch. Here the
microbatch loop is a `lax.scan` inside ONE jitted step — the whole
accumulation compiles to a single XLA program with no host round-trips,
and the TrainState is donated so parameters update in place in HBM.

Under a data mesh the batch enters sharded on 'data'; XLA turns the
loss/grad means into psums over ICI automatically. No hand-written
collectives.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from image_segmentation_tpu.train.state import TrainState


def make_train_step(
    loss_fn: Callable,
    accum_steps: int = 1,
    has_aux_input: bool = False,
):
    """Build a jitted train step.

    loss_fn(logits, targets) -> scalar. If `has_aux_input`, batches are
    (images, aux, targets) and the model is applied as model(images, aux)
    (the prompt model's heatmap input, reference prompt_based/prompt.py:33).

    Returns train_step(state, batch) -> (state, loss) where batch arrays
    have leading dim B = accum_steps · microbatch.
    """

    def microbatch_loss(params, batch_stats, apply_fn, inputs, targets):
        variables = {"params": params, "batch_stats": batch_stats}
        out, mutated = apply_fn(
            variables, *inputs, train=True, mutable=["batch_stats"]
        )
        return loss_fn(out, targets), mutated["batch_stats"]

    grad_fn = jax.value_and_grad(microbatch_loss, has_aux=True)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch):
        if has_aux_input:
            images, aux, targets = batch
            inputs = (images, aux)
        else:
            images, targets = batch
            inputs = (images,)

        if accum_steps == 1:
            (loss, new_bs), grads = grad_fn(
                state.params, state.batch_stats, state.apply_fn, inputs, targets
            )
        else:
            # (B, ...) -> (accum, micro, ...): scan over microbatches,
            # averaging grads and updating BN stats sequentially.
            def split(x):
                return x.reshape((accum_steps, x.shape[0] // accum_steps) + x.shape[1:])

            inputs_s = jax.tree_util.tree_map(split, inputs)
            targets_s = split(targets)

            def body(carry, xs):
                bs, grad_acc, loss_acc = carry
                mb_inputs, mb_targets = xs
                (loss, new_bs), grads = grad_fn(
                    state.params, bs, state.apply_fn, mb_inputs, mb_targets
                )
                grad_acc = jax.tree_util.tree_map(jnp.add, grad_acc, grads)
                return (new_bs, grad_acc, loss_acc + loss), None

            zero_grads = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            (new_bs, grads, loss), _ = jax.lax.scan(
                body,
                (state.batch_stats, zero_grads, jnp.zeros((), jnp.float32)),
                (inputs_s, targets_s),
            )
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads)
            loss = loss / accum_steps

        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=new_bs)
        return state, loss

    return train_step


def make_eval_forward():
    """Jitted inference forward (BatchNorm in running-average mode).

    Returns forward(state, *inputs) -> model output (logits or probs);
    works for any number of model inputs (image, or image + heatmap).
    """

    @jax.jit
    def forward(state: TrainState, *inputs):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return state.apply_fn(variables, *inputs, train=False)

    return forward


def make_loss_eval(
    loss_fn: Callable,
):
    """Jitted loss-only evaluation on fixed-size batches (no grad)."""

    @jax.jit
    def eval_loss(state: TrainState, inputs, targets):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        out = state.apply_fn(variables, *inputs, train=False)
        return loss_fn(out, targets)

    return eval_loss
