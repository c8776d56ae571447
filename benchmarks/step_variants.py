"""Throughput experiments on the UNet train step (round-2 VERDICT item 2).

Measures img/s for controlled variants of the 256px B=128 bf16 train
step so each optimization's effect is isolated before it lands:

  base        current production step (DiceCELoss = separate softmaxes)
  fusedloss   one log_softmax shared by Dice (exp) and CE — identical math
  bf16stats   BatchNorm batch statistics computed in bfloat16 (numerics
              experiment: cheaper convert+reduce passes; quality must be
              revalidated before production)
  dts         transpose-conv 2x2/s2 re-expressed as 1x1 conv to 4*C
              channels + depth-to-space (identical operator, relabeled
              weights) — avoids XLA's input-dilation lowering which wastes
              3/4 of the MXU multiplies on zeros
  remat       every DoubleConv rematerialized (nn.remat): the backward
              (measured 2.54x forward, bandwidth-bound) re-computes block
              activations from block inputs instead of reading them from
              HBM — trades MXU flops for HBM traffic, and frees memory
              for larger batches

Measured (v5e, 256px B=128 bf16, 10 steps): base 405.9 img/s,
remat 320.2 (0.79x — the recompute costs more than the saved activation
reads; B=128 already fits, so the freed memory buys nothing). PARKED,
like the round-2 variants (fusedloss/bf16stats/dts all ~parity): the
production step stays the plain XLA program.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(step, state, batch, steps):
    import jax
    state, loss = step(state, batch)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = step(state, batch)
    float(loss)
    return time.perf_counter() - t0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--variants", default="base,fusedloss,bf16stats")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from image_segmentation_tpu.losses import DiceCELoss
    from image_segmentation_tpu.losses.dice import soft_dice_loss
    from image_segmentation_tpu.losses.cross_entropy import _nll_from_logp
    from image_segmentation_tpu.models import UNet
    from image_segmentation_tpu.train import create_train_state, make_train_step
    from image_segmentation_tpu.train.state import make_adamw

    on_accel = jax.devices()[0].platform != "cpu"
    B = args.batch if on_accel else 4
    S = args.size if on_accel else 64
    base_ch = 64 if on_accel else 8
    dt = jnp.bfloat16 if on_accel else jnp.float32

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 4, (B, S, S)), jnp.int32)
    batch = (x, y)

    class FusedDiceCE:
        """One log_softmax; dice uses exp(logp). Identical math to
        DiceCELoss(ignore_index=3)."""
        def __hash__(self):
            return hash("fused-dice-ce-3")

        def __eq__(self, other):
            return isinstance(other, FusedDiceCE)

        def __call__(self, logits, targets):
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            probs = jnp.exp(logp)
            d = soft_dice_loss(probs, targets, apply_softmax=False,
                               ignore_index=3)
            ce = _nll_from_logp(logp, targets, None, None, logits.shape[-1])
            return d + ce

    results = {}
    for variant in args.variants.split(","):
        if variant == "bf16stats":
            # flax computes stats in f32 via dtype promotion; force bf16
            # by patching _compute_stats below.
            model = UNet(num_classes=4, base=base_ch, dtype=dt)
            # monkeypatch: run stats in bf16 by wrapping _compute_stats
            from flax.linen import normalization as fnorm
            orig_stats = fnorm._compute_stats

            def bf16_stats(x, axes, dtype, *a, **k):
                return orig_stats(x.astype(jnp.bfloat16), axes,
                                  jnp.bfloat16, *a, **k)

            fnorm._compute_stats = bf16_stats
            try:
                tx = make_adamw(1e-3)
                state = create_train_state(model, jax.random.PRNGKey(0),
                                           x[:1], tx)
                step = make_train_step(DiceCELoss(ignore_index=3))
                dtm = measure(step, state, batch, args.steps)
            finally:
                fnorm._compute_stats = orig_stats
        elif variant == "dts":
            import flax.linen as nn
            from image_segmentation_tpu.models import layers as L

            class DtsUpConv(nn.Module):
                features: int
                dtype: object = jnp.float32

                @nn.compact
                def __call__(self, xx):
                    f = self.features
                    yy = nn.Conv(4 * f, (1, 1), use_bias=True,
                                 dtype=self.dtype,
                                 kernel_init=L.conv_kernel_init)(xx)
                    n, h, w, _ = yy.shape
                    yy = yy.reshape(n, h, w, 2, 2, f)
                    yy = yy.transpose(0, 1, 3, 2, 4, 5)
                    return yy.reshape(n, 2 * h, 2 * w, f)

            orig_up = L.UpConv
            L.UpConv = DtsUpConv
            try:
                model = UNet(num_classes=4, base=base_ch, dtype=dt)
                tx = make_adamw(1e-3)
                state = create_train_state(model, jax.random.PRNGKey(0),
                                           x[:1], tx)
                step = make_train_step(DiceCELoss(ignore_index=3))
                dtm = measure(step, state, batch, args.steps)
            finally:
                L.UpConv = orig_up
        elif variant == "remat":
            import flax.linen as nn
            from image_segmentation_tpu.models import layers as L
            from image_segmentation_tpu.models import unet as U

            orig_dc = L.DoubleConv
            # static_argnums counts (self, x, train): train must stay a
            # python bool through the remat trace
            remat_dc = nn.remat(L.DoubleConv, static_argnums=(2,))
            L.DoubleConv = remat_dc     # Down/Up resolve from layers.py
            U.DoubleConv = remat_dc     # UNet's stem binds it directly
            try:
                model = UNet(num_classes=4, base=base_ch, dtype=dt)
                tx = make_adamw(1e-3)
                state = create_train_state(model, jax.random.PRNGKey(0),
                                           x[:1], tx)
                step = make_train_step(DiceCELoss(ignore_index=3))
                dtm = measure(step, state, batch, args.steps)
            finally:
                L.DoubleConv = orig_dc
                U.DoubleConv = orig_dc
        else:
            loss = (FusedDiceCE() if variant == "fusedloss"
                    else DiceCELoss(ignore_index=3))
            model = UNet(num_classes=4, base=base_ch, dtype=dt)
            tx = make_adamw(1e-3)
            state = create_train_state(model, jax.random.PRNGKey(0), x[:1], tx)
            step = make_train_step(loss)
            dtm = measure(step, state, batch, args.steps)
        results[variant] = round(B * args.steps / dtm, 1)
        print(json.dumps({variant: results[variant]}), flush=True)

    print(json.dumps({"img_per_sec": results}))


if __name__ == "__main__":
    main()
