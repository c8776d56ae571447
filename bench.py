"""Benchmark harness: images/sec/chip for the UNet train step at 256px.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline anchor: the reference publishes no throughput (BASELINE.md).
Its training hardware was an A100 40GB running eager PyTorch fp32/TF32
at micro-batch 2 with 32-step gradient accumulation (PDF §3.1/3.3,
notebooks). Analytic anchor: the reference UNet does ~96 GFLOPs/image
forward at 256px (~290 GFLOPs/image for a train step); eager PyTorch
conv stacks at micro-batch 2 sustain roughly 10-12% of A100 TF32 peak
(156 TFLOP/s), i.e. ~17 TFLOP/s → ≈ 60 images/sec. vs_baseline is
measured_value / 60. The north star (BASELINE.json) is ≥10×.

Run: python bench.py [--model unet|clipunet] [--steps N] [--batch N]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="unet", choices=["unet", "clipunet"])
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--batch", type=int, default=0, help="0 = auto")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--infer", action="store_true", help="benchmark inference")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from image_segmentation_tpu.losses import DiceCELoss
    from image_segmentation_tpu.models import UNet
    from image_segmentation_tpu.models.clip_unet import ClipUNet
    from image_segmentation_tpu.train import create_train_state, make_train_step
    from image_segmentation_tpu.train.state import make_adamw

    platform = jax.devices()[0].platform
    on_accel = platform != "cpu"
    size = args.size if on_accel else 64
    # B=128 saturates one v5e chip for the 256px UNet (B=192+ fails to
    # compile/fit); CLIP at 224px uses a smaller default.
    default_batch = (128 if args.model == "unet" else 32) if on_accel else 4
    batch = args.batch or default_batch
    steps = args.steps if on_accel else 3

    if args.model == "unet":
        model = UNet(num_classes=4, base=64 if on_accel else 8,
                     dtype=jnp.bfloat16 if on_accel else jnp.float32)
        name = "unet"
        size_used = size
    else:
        model = ClipUNet(num_classes=4,
                         dtype=jnp.bfloat16 if on_accel else jnp.float32,
                         use_pallas_attention=on_accel)
        name = "clipunet"
        size_used = 224

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(0, 1, (batch, size_used, size_used, 3)), jnp.float32
    )
    labels = jnp.asarray(rng.integers(0, 4, (batch, size_used, size_used)), jnp.int32)

    tx = make_adamw(learning_rate=1e-3)
    state = create_train_state(
        model, jax.random.PRNGKey(0), images[:1], tx
    )

    if args.infer:
        fwd = jax.jit(
            lambda s, x: s.apply_fn(
                {"params": s.params, "batch_stats": s.batch_stats}, x, train=False
            )
        )
        np.asarray(fwd(state, images))  # compile + sync
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fwd(state, images)
        # block_until_ready is unreliable over the axon tunnel; a value
        # fetch is a hard sync.
        np.asarray(out[0, 0, 0])
        dt = time.perf_counter() - t0
        metric = f"{name}_infer_images_per_sec_per_chip_{size_used}px"
    else:
        step = make_train_step(DiceCELoss(ignore_index=3))
        state, loss = step(state, (images, labels))  # compile
        float(loss)  # hard sync (block_until_ready no-ops over the tunnel)
        t0 = time.perf_counter()
        for _ in range(steps):
            state, loss = step(state, (images, labels))
        float(loss)
        dt = time.perf_counter() - t0
        metric = f"{name}_train_images_per_sec_per_chip_{size_used}px"

    value = batch * steps / dt
    ref_a100_imgs_per_sec = 60.0  # documented analytic anchor (see header)
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(value / ref_a100_imgs_per_sec, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
