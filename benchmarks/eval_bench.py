"""Original-resolution eval throughput: host vs device protocol.

The reference evaluates every epoch at each image's NATIVE resolution
(reference utils/training.py:67-121). Round 1 ran the inverse geometry
on the host (~16 img/s, dominated by the per-image (T, T, C) f32 score
transfer over the device link). Round 2 added the device-side protocol
(train/fast_eval.py): static-canvas inverse + argmax + confusion on
device, only a (C, C) matrix and (B,) losses per batch cross the link.
Round 3 made the masked loss gather-free (778 img/s at 128 images).

This harness measures both protocols on the same synthetic Pet-like
dataset (UNet bf16 base=64, T=256) and prints one JSON line per
protocol. The protocols are pinned to produce identical metrics by
tests/test_fast_eval.py; this file is about speed — plus, at full
test-split scale (--images 3700 --pet-like), about the bucket planner
(fast_eval.plan_size_buckets): the run reports the chosen bucket plan
and checks the device metrics against the float64 host oracle.

Size distribution: with --pet-like, native sizes approximate the
Oxford-IIIT Pet test split (~3.7k images): the bulk at 500×(250..400)
in either orientation (the dataset's JPEGs cluster at max-side 500),
a tail of smaller images down to 150 px, and ~1% larger outliers up to
1000 px — the shape that punishes a single dataset-max canvas and
rewards bucketing. Without it, sizes are uniform 200-500 (the r2/r3
fixture, kept for comparability with committed numbers).

Run (TPU): python benchmarks/eval_bench.py                    # r3 fixture
           python benchmarks/eval_bench.py --images 3700 --pet-like \
               --out benchmarks/eval3700_r4.json              # full-split scale
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

    def __init__(self, n: int, seed: int = 0, max_side: int = 500,
                 pet_like: bool = False):
        rng = np.random.default_rng(seed)
        self.sizes = []
        for _ in range(n):
            if not pet_like:
                self.sizes.append((int(rng.integers(200, max_side)),
                                   int(rng.integers(200, max_side))))
                continue
            u = rng.uniform()
            if u < 0.01:  # rare large outliers
                h, w = int(rng.integers(600, 1000)), int(rng.integers(600, 1000))
            elif u < 0.70:  # the max-side-500 bulk
                long, short = 500, int(rng.integers(250, 400))
                h, w = (long, short) if rng.uniform() < 0.5 else (short, long)
            else:  # smaller-image tail
                h, w = int(rng.integers(150, 500)), int(rng.integers(150, 500))
            self.sizes.append((h, w))

    def __len__(self):
        return len(self.sizes)

    def __getitem__(self, i):
        h, w = self.sizes[i]
        rng = np.random.default_rng(1000 + i)
        img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
        label = rng.integers(0, 4, (h, w)).astype(np.int32)
        return img, label


def _bucket_plan_summary(val):
    """Canvas sizes + image counts of the plan evaluate() actually used."""
    views = val.bucket_views
    if not views:
        return [{"images": len(val), "canvas": _canvas(val.orig_labels)}]
    return [{"images": len(v), "canvas": _canvas(v.orig_labels)}
            for v in views]


def _canvas(orig_labels, multiple=8):
    hc = max(-(-l.shape[0] // multiple) * multiple for l in orig_labels)
    wc = max(-(-l.shape[1] // multiple) * multiple for l in orig_labels)
    return [int(hc), int(wc)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=128)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--protocols", default="device,host")
    p.add_argument("--pet-like", action="store_true")
    p.add_argument("--out", default=None)
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

    ds = _SyntheticPet(n, max_side=max_side, pet_like=args.pet_like)
    t0 = time.perf_counter()
    val = materialize(ds, T, keep_orig_labels=True)
    stage_s = time.perf_counter() - t0

    model = UNet(num_classes=4, base=64 if on_accel else 8,
                 dtype=jnp.bfloat16 if on_accel else jnp.float32)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.asarray(val.images[:1]),
        make_adamw(learning_rate=1e-3),
    )

    loss_cfg = DiceCELoss(ignore_index=3)
    host_fn = lambda lg, lb: dice_ce_loss_np(lg, lb, loss_cfg)

    rows, metrics = [], {}
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
        metrics[protocol] = m
        rows.append({
            "metric": f"orig_res_eval_images_per_sec_{protocol}",
            "value": round(n / dt, 2),
            "unit": "images/sec",
            "images": n,
            "dice": round(float(m["dice"]), 6),
            "miou": round(float(m["iou"]), 6),
            "val_loss": round(float(m["loss"]), 6),
        })
        if protocol == "device":
            rows[-1]["bucket_plan"] = _bucket_plan_summary(val)
        print(json.dumps(rows[-1]), flush=True)

    summary = {"staging_s": round(stage_s, 2), "pet_like": args.pet_like}
    if "device" in metrics and "host" in metrics:
        d, h = metrics["device"], metrics["host"]
        # Confusion counts are integers on both paths, so any metric
        # delta means some pixels' argmax flipped between the device
        # (f32 inverse resample) and host (f64) protocols. With a
        # random-weights model on noise images the scores sit at
        # near-ties everywhere, so a handful of flips per billion
        # pixels is expected; trained models have real margins and the
        # protocols match bit-exactly (tests/test_fast_eval.py, and
        # the r3 128-image measurement). Report both levels.
        summary["metrics_bit_identical"] = bool(
            float(d["dice"]) == float(h["dice"])
            and float(d["iou"]) == float(h["iou"])
        )
        summary["dice_delta"] = abs(float(d["dice"]) - float(h["dice"]))
        summary["miou_delta"] = abs(float(d["iou"]) - float(h["iou"]))
        summary["loss_delta"] = abs(float(d["loss"]) - float(h["loss"]))
        summary["metrics_match_host_oracle"] = bool(
            summary["dice_delta"] < 1e-4 and summary["miou_delta"] < 1e-4
            and summary["loss_delta"] < 1e-4
        )
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"device": jax.devices()[0].device_kind,
                       "rows": rows, **summary}, f, indent=1)


if __name__ == "__main__":
    main()
