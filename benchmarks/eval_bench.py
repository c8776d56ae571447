"""Original-resolution eval throughput: host vs device protocol.

The reference evaluates every epoch at each image's NATIVE resolution
(reference utils/training.py:67-121). Round 1 ran the inverse geometry
on the host (~16 img/s, dominated by the per-image (T, T, C) f32 score
transfer over the device link). Round 2 added the device-side protocol
(train/fast_eval.py): static-canvas inverse + argmax + confusion on
device, only a (C, C) matrix and (B,) losses per batch cross the link.

This harness measures both protocols on the same synthetic Pet-like
dataset (variable native sizes 200-500 px, UNet bf16 base=64, T=256) and
prints one JSON line per protocol. The protocols are pinned to produce
identical metrics by tests/test_fast_eval.py; this file is about speed.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class _SyntheticPet:
    """Variable-size (img, label) pairs with Pet-like native sizes."""

    def __init__(self, n: int, seed: int = 0, max_side: int = 500):
        self.rng = np.random.default_rng(seed)
        self.sizes = [
            (int(self.rng.integers(200, max_side)),
             int(self.rng.integers(200, max_side)))
            for _ in range(n)
        ]

    def __len__(self):
        return len(self.sizes)

    def __getitem__(self, i):
        h, w = self.sizes[i]
        rng = np.random.default_rng(1000 + i)
        img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
        label = rng.integers(0, 4, (h, w)).astype(np.int32)
        return img, label


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=128)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--protocols", default="device,host")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from image_segmentation_tpu.data.loader import materialize
    from image_segmentation_tpu.losses import DiceCELoss
    from image_segmentation_tpu.losses.host import dice_ce_loss_np
    from image_segmentation_tpu.models import UNet
    from image_segmentation_tpu.train import create_train_state
    from image_segmentation_tpu.train.loop import evaluate
    from image_segmentation_tpu.train.state import make_adamw

    on_accel = jax.devices()[0].platform != "cpu"
    n = args.images if on_accel else 8
    T = 256 if on_accel else 64
    max_side = 500 if on_accel else 96

    ds = _SyntheticPet(n, max_side=max_side)
    val = materialize(ds, T, keep_orig_labels=True)

    model = UNet(num_classes=4, base=64 if on_accel else 8,
                 dtype=jnp.bfloat16 if on_accel else jnp.float32)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.asarray(val.images[:1]),
        make_adamw(learning_rate=1e-3),
    )

    loss_cfg = DiceCELoss(ignore_index=3)
    host_fn = lambda lg, lb: dice_ce_loss_np(lg, lb, loss_cfg)

    for protocol in args.protocols.split(","):
        kwargs = dict(num_classes=4, batch_size=args.batch,
                      verbose=False, protocol=protocol)
        if protocol == "host":
            kwargs["host_loss_fn"] = host_fn
        else:
            kwargs["loss_cfg"] = loss_cfg
        # warm (compile) then measure
        evaluate(state, val, **kwargs)
        t0 = time.perf_counter()
        m = evaluate(state, val, **kwargs)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": f"orig_res_eval_images_per_sec_{protocol}",
            "value": round(n / dt, 2),
            "unit": "images/sec",
            "images": n,
            "dice": round(float(m["dice"]), 6),
            "miou": round(float(m["iou"]), 6),
            "val_loss": round(float(m["loss"]), 6),
        }))


if __name__ == "__main__":
    main()
