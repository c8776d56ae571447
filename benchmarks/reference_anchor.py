"""Measure the reference's per-step training workload to anchor `vs_baseline`.

The reference (in5omnia/Image_Segmentation) publishes no throughput numbers
(BASELINE.md), so the 10x north star needs a *measured* anchor. This script
measures the reference UNet train step (`/root/reference/unet/unet.py:67-105`
driven by `/root/reference/utils/training.py:18-64`) two ways:

1. ``--mode torch-cpu``: the reference's actual stack — eager PyTorch fp32,
   micro-batch 2, gradient accumulation 32 (effective batch 64), weighted
   CE + soft-Dice loss, AdamW — run on this host's CPU. This is a direct
   measurement of the reference code path's per-step work (model re-expressed
   here, not imported, to keep /root/reference read-only and unexecuted).

2. ``--mode jax-samechip``: the same schedule — fp32, micro-batch 2, 32
   separate dispatches per optimizer step, gradients accumulated across
   dispatches, no cross-microbatch fusion — expressed in JAX and run on the
   SAME TPU chip our optimized pipeline runs on. This is the per-chip anchor:
   "what the reference's training approach achieves on identical hardware."
   A faithful port keeps the reference's choices (fp32 everywhere, NCHW-ish
   tiny micro-batches, one device round-trip per micro-batch for the loss
   print, `utils/training.py:58`) and only swaps cuDNN for XLA.

3. ``--mode torch-serve``: the reference webapp's per-REQUEST serving
   path (`segmentation_webapp/app.py:220-326`): CPU-pinned (app.py:26),
   one request = aspect-preserving resize+pad to TARGET_SIZE=224
   (app.py:26-30,277), a no_grad batch-1 forward, reverse geometry back
   to the original resolution, argmax. This anchors `bench.py --serve`'s
   vs_reference field — the reference has no request batching at all
   (one eager forward per request).

All modes print one JSON line; results are recorded in
BASELINE_MEASURED.md and pinned (with provenance) as anchors in bench.py.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MICRO_BATCH = 2      # unet.ipynb cell 0: batch_size=2
ACCUM_STEPS = 32     # accumulation = 64 // batch_size (utils/training.py:49-56)
SIZE = 256           # TARGET_SIZE=256 for UNet (unet.ipynb cell 0)
NUM_CLASSES = 4


def _build_ref_unet():
    """Reference UNet topology (unet/unet.py:4-105): double-conv stem at
    64ch, four maxpool+double-conv downs to 1024ch, four transpose-conv
    ups with skip concat, 1x1 head. Re-expressed compactly for
    measurement only."""
    import torch
    from torch import nn

    torch.manual_seed(0)

    def dconv(cin, cout):
        return nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1), nn.BatchNorm2d(cout), nn.ReLU(),
            nn.Conv2d(cout, cout, 3, padding=1), nn.BatchNorm2d(cout), nn.ReLU(),
        )

    class RefUNet(nn.Module):
        def __init__(self):
            super().__init__()
            chans = [64, 128, 256, 512, 1024]
            self.stem = dconv(3, chans[0])
            self.downs = nn.ModuleList(
                nn.Sequential(nn.MaxPool2d(2, 2), dconv(chans[i], chans[i + 1]))
                for i in range(4)
            )
            self.ups_t = nn.ModuleList(
                nn.ConvTranspose2d(chans[i + 1], chans[i], 2, stride=2)
                for i in reversed(range(4))
            )
            self.ups_c = nn.ModuleList(
                dconv(chans[i + 1], chans[i]) for i in reversed(range(4))
            )
            self.head = nn.Conv2d(chans[0], NUM_CLASSES, 1)

        def forward(self, x):
            feats = [self.stem(x)]
            for d in self.downs:
                feats.append(d(feats[-1]))
            y = feats[-1]
            for t, c, skip in zip(self.ups_t, self.ups_c, reversed(feats[:-1])):
                y = c(torch.cat([skip, t(y)], dim=1))
            return self.head(y)

    return RefUNet()


def run_torch_cpu(steps: int) -> dict:
    import numpy as np
    import torch
    from torch import nn

    model = _build_ref_unet()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3, weight_decay=0.01)
    ce = nn.CrossEntropyLoss()

    def soft_dice(logits, target):
        # Reference Dice semantics (utils/weighted_loss.py:31-98): softmax,
        # one-hot target, per-class 2I/(P+G), class-mean, negated.
        p = torch.softmax(logits, dim=1)
        oh = torch.zeros_like(p).scatter_(1, target.unsqueeze(1), 1.0)
        inter = (p * oh).sum(dim=(0, 2, 3))
        denom = p.sum(dim=(0, 2, 3)) + oh.sum(dim=(0, 2, 3))
        return -((2 * inter + 1e-5) / (denom + 1e-5)).mean()

    rng = np.random.default_rng(0)
    x = torch.from_numpy(
        rng.uniform(0, 1, (MICRO_BATCH, 3, SIZE, SIZE)).astype("float32")
    )
    y = torch.from_numpy(
        rng.integers(0, NUM_CLASSES, (MICRO_BATCH, SIZE, SIZE)).astype("int64")
    )

    def micro_step(i):
        # utils/training.py:46-56: forward, combined loss, scaled backward,
        # optimizer step every ACCUM_STEPS micro-batches.
        pred = model(x)
        loss = ce(pred, y) + soft_dice(pred, y)
        (loss / ACCUM_STEPS).backward()
        if (i + 1) % ACCUM_STEPS == 0:
            opt.step()
            opt.zero_grad()
        return float(loss.detach())  # .item() sync, utils/training.py:58

    micro_step(0)  # warm caches
    t0 = time.perf_counter()
    for i in range(steps):
        micro_step(i + 1)
    dt = time.perf_counter() - t0
    # With steps < ACCUM_STEPS the AdamW step never lands inside the
    # timed window; charge its amortised share (cost / ACCUM_STEPS per
    # micro-batch) so short runs still measure the full schedule. At
    # these conv costs it is a <0.1% correction, measured not assumed.
    if steps < ACCUM_STEPS:
        t1 = time.perf_counter()
        opt.step()
        opt.zero_grad()
        dt += (time.perf_counter() - t1) * steps / ACCUM_STEPS
    return {
        "mode": "torch-cpu-eager-fp32",
        "images_per_sec": round(MICRO_BATCH * steps / dt, 3),
        "micro_batch": MICRO_BATCH,
        "steps": steps,
    }


def run_torch_serve(requests: int) -> dict:
    """Reference serving path, one request at a time on CPU
    (segmentation_webapp/app.py:220-326, TARGET_SIZE=224 app.py:26-30):
    resize+pad -> no_grad batch-1 forward -> reverse geometry -> argmax."""
    import statistics

    import numpy as np
    import torch
    import torch.nn.functional as F

    model = _build_ref_unet().eval()
    T = 224  # webapp TARGET_SIZE (app.py:26)
    rng = np.random.default_rng(0)
    img = torch.from_numpy(
        rng.uniform(0, 1, (3, 300, 400)).astype("float32")
    )

    def request(img):
        # resize_with_padding (utils/utils.py:13-49): longer side -> T,
        # bilinear, centered zero pad
        c, h, w = img.shape
        scale = T / max(h, w)
        nh, nw = max(1, round(h * scale)), max(1, round(w * scale))
        resized = F.interpolate(
            img[None], size=(nh, nw), mode="bilinear", align_corners=False
        )
        pt, pl = (T - nh) // 2, (T - nw) // 2
        x = F.pad(resized, (pl, T - nw - pl, pt, T - nh - pt))
        with torch.no_grad():
            logits = model(x)
        # reverse_resize_and_padding (utils/utils.py:51-75) + argmax
        core = logits[:, :, pt:pt + nh, pl:pl + nw]
        back = F.interpolate(core, size=(h, w), mode="bilinear",
                             align_corners=False)
        return back.argmax(dim=1).squeeze(0).numpy()

    request(img)  # warm
    lat = []
    for _ in range(requests):
        t0 = time.perf_counter()
        request(img)
        lat.append(time.perf_counter() - t0)
    p50 = statistics.median(lat)
    return {
        "mode": "torch-serve-cpu-batch1-224px",
        "p50_ms": round(p50 * 1e3, 2),
        "requests_per_sec": round(1.0 / p50, 3),
        "requests": requests,
    }


def run_jax_samechip(steps: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from image_segmentation_tpu.losses import DiceCELoss
    from image_segmentation_tpu.models import UNet
    from image_segmentation_tpu.train import create_train_state

    # Reference schedule on this chip: fp32 model, micro-batch 2, one jitted
    # grad dispatch per micro-batch (no scan fusion, no donation across the
    # accumulation window), fp32 AdamW step every 32 micro-batches, and a
    # host sync per micro-batch mirroring loss.item() (utils/training.py:58).
    model = UNet(num_classes=NUM_CLASSES, base=64, dtype=jnp.float32)
    tx = optax.adamw(1e-3, weight_decay=0.01)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (MICRO_BATCH, SIZE, SIZE, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, NUM_CLASSES, (MICRO_BATCH, SIZE, SIZE)), jnp.int32)
    state = create_train_state(model, jax.random.PRNGKey(0), x, tx)
    loss_fn = DiceCELoss()

    @jax.jit
    def micro_grad(params, batch_stats, xb, yb):
        def f(p):
            logits, updates = state.apply_fn(
                {"params": p, "batch_stats": batch_stats},
                xb, train=True, mutable=["batch_stats"],
            )
            return loss_fn(logits.astype(jnp.float32), yb), updates["batch_stats"]
        (loss, bs), grads = jax.value_and_grad(f, has_aux=True)(params)
        return loss, grads, bs

    @jax.jit
    def apply_update(params, opt_state, acc):
        updates, opt_state = tx.update(acc, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    params, bs, opt_state = state.params, state.batch_stats, tx.init(state.params)
    zeros = jax.tree.map(jnp.zeros_like, params)
    acc = zeros

    def micro_step(i, acc, params, bs, opt_state):
        loss, grads, bs = micro_grad(params, bs, x, y)
        acc = jax.tree.map(jnp.add, acc, grads)
        float(loss)  # per-micro-batch host sync, as the reference does
        if (i + 1) % ACCUM_STEPS == 0:
            params, opt_state = apply_update(params, opt_state, acc)
            acc = jax.tree.map(jnp.zeros_like, acc)
        return acc, params, bs, opt_state

    acc, params, bs, opt_state = micro_step(ACCUM_STEPS - 1, acc, params, bs, opt_state)
    t0 = time.perf_counter()
    for i in range(steps):
        acc, params, bs, opt_state = micro_step(i + 1, acc, params, bs, opt_state)
    dt = time.perf_counter() - t0
    return {
        "mode": "jax-samechip-fp32-microbatch2",
        "device": jax.devices()[0].device_kind,
        "images_per_sec": round(MICRO_BATCH * steps / dt, 3),
        "micro_batch": MICRO_BATCH,
        "steps": steps,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["torch-cpu", "jax-samechip", "torch-serve"], required=True)
    p.add_argument("--steps", type=int, default=0, help="0 = mode default")
    args = p.parse_args()
    if args.mode == "torch-cpu":
        out = run_torch_cpu(args.steps or 4)
    elif args.mode == "torch-serve":
        out = run_torch_serve(args.steps or 12)
    else:
        out = run_jax_samechip(args.steps or 64)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
