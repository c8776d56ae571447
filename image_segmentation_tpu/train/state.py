"""Train state: params + batch_stats + optimizer state, one pytree.

The functional replacement for the reference's
model/optimizer/scheduler object trio (reference utils/training.py:
start() mutates an nn.Module in place; here the whole training state is
an immutable pytree threaded through a jitted, donated step).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import flax
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: int
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def create_train_state(
    model,
    rng: jax.Array,
    sample_input,
    tx: optax.GradientTransformation,
    extra_inputs=(),
) -> TrainState:
    """Initialise parameters from a sample input and build the state.

    `extra_inputs` covers multi-input models (the prompt model takes
    (image, heatmap))."""
    variables = model.init(rng, sample_input, *extra_inputs, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=0,
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
    )


def make_adamw(
    learning_rate=1e-3,
    weight_decay: float = 0.01,
    schedule: Optional[Callable] = None,
    trainable_mask: Any = None,
) -> optax.GradientTransformation:
    """AdamW matching the reference recipe (notebooks: AdamW lr 1e-3,
    wd 0.01). `trainable_mask` is a params-shaped pytree of bools;
    False-subtrees (e.g. a frozen encoder) receive zero updates —
    including zero weight decay — the functional analogue of
    requires_grad=False (reference autoencoder/autoencoder.py:255-260,
    clip/clipunet.py:28-30)."""
    lr = schedule if schedule is not None else learning_rate
    tx = optax.adamw(lr, weight_decay=weight_decay)
    if trainable_mask is not None:
        tx = optax.chain(
            optax.masked(optax.set_to_zero(), jax.tree_util.tree_map(lambda b: not b, trainable_mask)),
            optax.masked(tx, trainable_mask),
        )
    return tx


def subtree_mask(params, frozen_prefixes) -> Any:
    """Build a bool mask over `params` marking top-level subtrees whose key
    path starts with any of `frozen_prefixes` as NOT trainable.

    E.g. frozen_prefixes=('encoder',) freezes the AE encoder;
    ('clip',) freezes the prompt model's CLIP branch."""
    flat = flax.traverse_util.flatten_dict(params)
    mask_flat = {
        k: not any(k[0] == p or "/".join(k).startswith(p) for p in frozen_prefixes)
        for k in flat
    }
    return flax.traverse_util.unflatten_dict(mask_flat)
