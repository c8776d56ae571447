"""Ablation harness: reproduce the reference report's experiment findings.

The reference's PDF report (SURVEY.md §6) is built around a set of
controlled comparisons, not just headline numbers. This harness re-runs
those comparisons in this framework so each finding has a measurable,
reproducible artifact (the real-data magnitudes await Oxford-Pet; the
*directions* are checkable on the hard synthetic task below):

  loss        weighted CE+SoftDice vs weighted CE alone
              (report §4: CE+SoftDice > CE; reference unet.ipynb's
              committed cell ends on plain CE but the PDF's best UNet
              config is weighted CE+Dice)
  weights     FullWeight (inverse-frequency over all 4 classes) vs
              MinWeight (boundary pinned to the minimum weight) vs
              unweighted (report §4: FullWeight > MinWeight for UNet —
              the boundary class is worth training on)
  skips       ClipUNet vs ClipUNetNoSkips, frozen smoke encoder
              (report §4: skips > no-skips)
  resolution  256px vs 512px UNet (report §4: 512 ≈ 256 quality at ~4×
              step cost)

Task design: the stock synthetic set (run.py) converges to dice ≈0.99
under ANY of these configs, so it cannot separate them. This harness
uses a deliberately harder set — small objects (~6% of pixels ⇒ heavy
class imbalance), low contrast, pixel noise, and a true boundary ring
labelled 255 — where loss/weighting choices change the outcome.

Usage:
  python benchmarks/ablations.py                    # all experiments
  python benchmarks/ablations.py --experiments loss,weights
  python benchmarks/ablations.py --epochs 12 --images 128

Prints one JSON line per run:
  {"experiment": ..., "variant": ..., "best_dice": ..., "best_miou": ...,
   "steady_epoch_s": ...}
and a final summary line per experiment naming the winner.

MEASURED (v5e via axon, 2026-08-18; defaults: 128 imgs, 12 epochs,
base=32, B=32; raw rows in benchmarks/ablations_r2_synthetic.json).
Best-val mIoU per variant — every direction matches the report:
  loss:       dice_ce 0.9487 > ce 0.9402              (CE+SoftDice > CE)
  weights:    full 0.9487 > none 0.9357 > min 0.9252  (FullWeight > MinWeight)
  skips:      skips 0.0666 > noskips 0.0434           (skips > no-skips;
              absolute level is low by construction: the smoke encoder
              is random and frozen, so only the skip taps carry signal)
  resolution: 512px 0.9692 vs 256px 0.9487 at 3.3× the epoch cost
              (512 ≈ marginal quality for ~4× compute)
"""
from __future__ import annotations

import argparse
import json
import tempfile

import numpy as np

NUM_CLASSES = 4


def hard_synthetic_items(n: int, seed: int = 0):
    """Small low-contrast objects + boundary rings: a task where class
    imbalance and the boundary class actually matter (unlike the smoke
    set in run.py, which any config solves)."""
    rng = np.random.default_rng(seed)
    items = []
    for _ in range(n):
        h = int(rng.integers(160, 320))
        w = int(rng.integers(160, 320))
        img = rng.normal(0.35, 0.12, (h, w, 3)).astype(np.float32)
        label = np.zeros((h, w), np.int32)
        for _obj in range(int(rng.integers(1, 4))):
            cls = int(rng.integers(1, 3))
            oh = int(rng.integers(h // 10, h // 4))
            ow = int(rng.integers(w // 10, w // 4))
            y0 = int(rng.integers(0, h - oh))
            x0 = int(rng.integers(0, w - ow))
            yy, xx = np.ogrid[:h, :w]
            cy, cx = y0 + oh / 2, x0 + ow / 2
            ellipse = (
                ((yy - cy) / (oh / 2)) ** 2 + ((xx - cx) / (ow / 2)) ** 2
            )
            inner = ellipse <= 1.0
            ring = (ellipse <= 1.35) & ~inner
            label[inner] = cls
            label[ring & (label == 0)] = 255  # boundary sentinel
            img[inner, cls - 1] += float(rng.uniform(0.15, 0.3))
        img += rng.normal(0, 0.08, img.shape).astype(np.float32)
        items.append((np.clip(img, 0, 1), label))
    return items


def _dataset(n, target, seed, keep_orig=False):
    from image_segmentation_tpu.data.dataset import ArrayDataset
    from image_segmentation_tpu.data.labels import target_remap
    from image_segmentation_tpu.data.loader import materialize

    items = [(i, target_remap(l)) for i, l in hard_synthetic_items(n, seed)]
    return materialize(ArrayDataset(items), target,
                       keep_orig_labels=keep_orig)


def _weights(train, scheme):
    from image_segmentation_tpu.data.labels import calculate_class_weights

    if scheme == "none":
        return None
    labels = [np.asarray(l) for l in train.labels]
    kw = {}
    if scheme == "min":
        # MinWeight (reference utils/utils.py:189-191): boundary (3)
        # pinned to the minimum computed weight
        kw = dict(unimportant_class_indices=[3])
    w = calculate_class_weights(labels, NUM_CLASSES, **kw)
    return tuple(float(x) for x in w)


def _run(model, train, val, loss_cfg, epochs, batch, label):
    import jax
    import jax.numpy as jnp

    from image_segmentation_tpu.train import create_train_state
    from image_segmentation_tpu.train.loop import fit
    from image_segmentation_tpu.train.state import make_adamw

    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.asarray(train.images[:1]),
        make_adamw(learning_rate=1e-3),
    )
    with tempfile.TemporaryDirectory() as d:
        res = fit(state, train, val, loss_fn=loss_cfg, epochs=epochs,
                  batch_size=batch, save_dir=d, name="abl",
                  eval_loss_cfg=loss_cfg, verbose=False,
                  save_weights_only_copy=False)
    et = res.history["epoch_time_s"]
    steady = et[-1] if len(et) < 3 else float(np.median(et[1:]))
    out = {
        "experiment": label[0], "variant": label[1],
        "best_dice": round(float(res.best["dice"]), 4),
        "best_miou": round(float(res.best["miou"]), 4),
        "steady_epoch_s": round(steady, 3),
    }
    print(json.dumps(out), flush=True)
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--experiments", default="loss,weights,skips,resolution")
    p.add_argument("--images", type=int, default=128)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--base", type=int, default=32,
                   help="UNet base width (32 separates the configs at a "
                        "fraction of the base-64 cost)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from image_segmentation_tpu.losses import DiceCELoss
    from image_segmentation_tpu.models import UNet

    on_accel = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_accel else jnp.float32
    n = args.images if on_accel else 16
    epochs = args.epochs if on_accel else 2
    batch = args.batch if on_accel else 8
    base = args.base if on_accel else 8
    T = 256 if on_accel else 64

    train = _dataset(n, T, seed=0)
    val = _dataset(max(16, n // 4), T, seed=1, keep_orig=True)
    full_w = _weights(train, "full")
    picked = args.experiments.split(",")
    results = []

    if "loss" in picked:
        for variant, dw in (("ce", 0.0), ("dice_ce", 1.0)):
            results.append(_run(
                UNet(num_classes=NUM_CLASSES, base=base, dtype=dtype),
                train, val,
                DiceCELoss(dice_weight=dw, class_weights=full_w),
                epochs, batch, ("loss", variant)))

    if "weights" in picked:
        for scheme in ("none", "min", "full"):
            results.append(_run(
                UNet(num_classes=NUM_CLASSES, base=base, dtype=dtype),
                train, val,
                DiceCELoss(class_weights=_weights(train, scheme)),
                epochs, batch, ("weights", scheme)))

    if "skips" in picked:
        from image_segmentation_tpu.models.clip_unet import (
            ClipUNet,
            ClipUNetNoSkips,
        )
        from image_segmentation_tpu.models.clip_vit import ClipViTConfig

        # smoke ViT (random frozen encoder), exactly run.py --smoke-vit's
        # construction: the ablation compares the DECODERS' use of
        # encoder information, which needs no pretrained weights
        size = 224 if on_accel else 64
        vit = ClipViTConfig(image_size=size, patch_size=16, hidden_size=64,
                            num_layers=4, num_heads=4, mlp_dim=128)
        chans = tuple(max(8, 64 >> i) for i in range(5))
        t224 = _dataset(n, size, seed=0)
        v224 = _dataset(max(16, n // 4), size, seed=1, keep_orig=True)
        for variant, model in (
            ("skips", ClipUNet(num_classes=NUM_CLASSES, vit=vit,
                               skip_indices=(1, 2, 3, 4),
                               decoder_channels=chans, dtype=dtype)),
            ("noskips", ClipUNetNoSkips(num_classes=NUM_CLASSES, vit=vit,
                                        decoder_channels=chans,
                                        dtype=dtype)),
        ):
            results.append(_run(
                model, t224, v224, DiceCELoss(class_weights=full_w),
                epochs, batch, ("skips", variant)))

    if "resolution" in picked and on_accel:
        t512 = _dataset(n, 512, seed=0)
        v512 = _dataset(max(16, n // 4), 512, seed=1, keep_orig=True)
        results.append(_run(
            UNet(num_classes=NUM_CLASSES, base=base, dtype=dtype),
            t512, v512, DiceCELoss(class_weights=full_w),
            epochs, max(4, batch // 4), ("resolution", "512px")))
        # the 256px weights/full run doubles as the 256px arm; rerun it
        # here when the weights experiment was not picked
        if "weights" not in picked:
            results.append(_run(
                UNet(num_classes=NUM_CLASSES, base=base, dtype=dtype),
                train, val, DiceCELoss(class_weights=full_w),
                epochs, batch, ("resolution", "256px")))

    by_exp = {}
    for r in results:
        by_exp.setdefault(r["experiment"], []).append(r)
    for exp, rs in by_exp.items():
        best = max(rs, key=lambda r: r["best_miou"])
        print(json.dumps({
            "summary": exp,
            "winner": best["variant"],
            "miou": {r["variant"]: r["best_miou"] for r in rs},
            "epoch_s": {r["variant"]: r["steady_epoch_s"] for r in rs},
        }), flush=True)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, ".")
    main()
