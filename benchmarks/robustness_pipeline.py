"""Aug-vs-no-aug robustness, pipeline-integrated (report PDF §4.1 Fig 6).

The round-2 robustness artifact trained a model by hand inside the
harness. This version runs the REAL reproduction pipeline end-to-end on
a pseudo-Pet tree — the same `scripts/prepare_oxford_pet.py` →
`scripts/reproduce_reference.py` chain a real-data run uses — for the
two UNet rows (unet_aug / unet_noaug, reference README.md:32-33), then
sweeps BOTH best checkpoints with the 8-perturbation × 10-severity
protocol of `benchmarks/robustness.py`. The report's finding to
reproduce: augmentation buys robustness under perturbation more than
clean-set accuracy (PDF §4.1).

Pseudo-Pet source: variable-size JPEG scenes (noisy textured background,
a color-coded elliptical "pet" with a trimap border ring) written in the
Oxford-Pet download layout (images/ + annotations/trimaps/ + list.txt)
so the prepare script's species parsing, RGB→class conversion, and
split logic all run for real. JPEG encoding + decode noise, online
device augmentation during training, and original-resolution scoring
match the production path.

Run (TPU):
  python benchmarks/robustness_pipeline.py \
      --out benchmarks/robustness_r4.json
"""
from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import tempfile
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from benchmarks.robustness import PERTURBATIONS, robustness_sweep  # noqa: E402


def _load_script(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_REPO, "scripts", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def make_pet_source(src, n, seed=0, lo=120, hi=280):
    """Oxford-Pet-layout download tree of synthetic scenes.

    Scenes are learnable but not trivial: dark textured background, a
    color-tinted pet (cats reddish, dogs greenish) with appearance
    jitter, and a bright border ring (trimap 3). Crucially the species
    is ALSO shape-coded (cats elliptical, dogs diamond-shaped): with a
    color-only cue, photometric perturbations (brightness shifts)
    destroy the class signal itself and neither arm can be robust —
    measured exactly so in an earlier cut. A redundant shape cue gives
    augmentation (grayscale, contrast, noise) something to transfer
    reliance onto, which is the report's mechanism. Stems follow the
    dataset's convention (capitalized = cat) so the prepare script's
    species decoding runs unmodified."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(src, "images")
    tri_dir = os.path.join(src, "annotations", "trimaps")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(tri_dir, exist_ok=True)
    lines = []
    for i in range(n):
        cat = bool(rng.integers(0, 2))
        stem = (f"Synthcat_{i}" if cat else f"synthdog_{i}")
        h, w = int(rng.integers(lo, hi)), int(rng.integers(lo, hi))
        img = rng.uniform(0.05, 0.3, (h, w, 3)).astype(np.float32)
        # low-frequency background texture
        gy = np.linspace(0, 2 * np.pi * rng.uniform(1, 3), h)[:, None]
        gx = np.linspace(0, 2 * np.pi * rng.uniform(1, 3), w)[None, :]
        img += (0.05 * np.sin(gy + gx))[:, :, None]
        tri = np.full((h, w), 2, np.uint8)  # 2 = background
        cy, cx = rng.uniform(0.3, 0.7) * h, rng.uniform(0.3, 0.7) * w
        ry, rx = rng.uniform(0.18, 0.33) * h, rng.uniform(0.18, 0.33) * w
        yy, xx = np.mgrid[0:h, 0:w]
        if cat:  # ellipse (L2 ball)
            d = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2
        else:  # diamond (L1 ball)
            d = np.abs((yy - cy) / ry) + np.abs((xx - cx) / rx)
        blob, ring = d < 1.0, (d >= 1.0) & (d < 1.45)
        tint = (np.array([0.75, 0.25, 0.2]) if cat
                else np.array([0.2, 0.75, 0.25]))
        tint = tint + rng.uniform(-0.1, 0.1, 3)
        img[blob] = tint + rng.uniform(-0.08, 0.08, (int(blob.sum()), 3))
        img[ring] = rng.uniform(0.8, 1.0)
        tri[blob] = 1  # pet
        tri[ring] = 3  # border
        arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, stem + ".jpg"),
                                  quality=92)
        Image.fromarray(tri).save(os.path.join(tri_dir, stem + ".png"))
        lines.append(f"{stem} {i + 1} {1 if cat else 2} 1")
    with open(os.path.join(src, "annotations", "list.txt"), "w") as f:
        f.write("#stem class species breed\n" + "\n".join(lines) + "\n")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=240,
                   help="pseudo-Pet source size (split ~70/15/15)")
    p.add_argument("--epochs", type=int, default=16)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--target-size", type=int, default=256)
    p.add_argument("--workdir", default=None,
                   help="keep the tree + runs here (default: temp dir)")
    p.add_argument("--online-aug", action="store_true",
                   help="online device augmentation for the aug arm "
                        "instead of the reference's offline 8-augmenter "
                        "pipeline (C29). The REPORT's robustness claim "
                        "is about the offline pipeline — grayscale / "
                        "Laplace-noise / blur / linear-contrast "
                        "augmenters are what buy invariance to the "
                        "photometric perturbation families — so "
                        "offline is the default here.")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    import image_segmentation_tpu.config as C
    from image_segmentation_tpu.data.dataset import SegmentationDataset
    from image_segmentation_tpu.data.labels import target_remap
    from image_segmentation_tpu.data.loader import materialize
    from image_segmentation_tpu.train import checkpoint as ckpt

    t_all = time.time()
    work = args.workdir or tempfile.mkdtemp(prefix="robustness_pet_")
    src, tree = os.path.join(work, "src"), os.path.join(work, "tree")
    runs = os.path.join(work, "runs")

    if not os.path.isdir(os.path.join(tree, "Train")):
        make_pet_source(src, args.images)
        prep = _load_script("prepare_oxford_pet")
        prep.main(["--src", src, "--dst", tree,
                   "--val", "0.15", "--test", "0.15"])
    repro = _load_script("reproduce_reference")
    table = repro.main([
        "--data-root", tree, "--save-dir", runs,
        "--rows", "unet_aug,unet_noaug",
        "--epochs", str(args.epochs), "--batch-size", str(args.batch),
        "--target-size", str(args.target_size),
        *([] if args.online_aug else ["--offline-aug"]),
        "--json-out", os.path.join(work, "table.json"),
    ])

    # score both best checkpoints with the 8x10 sweep on the Test split
    test = SegmentationDataset(
        os.path.join(tree, "Test", "color"),
        os.path.join(tree, "Test", "label"),
        target_transform=target_remap,
    )
    val = materialize(test, args.target_size, keep_orig_labels=True)

    curves = {}
    for row in ("unet_aug", "unet_noaug"):
        cfg = C.CONFIGS[row]
        model = C.build_model(cfg, on_tpu=jax.devices()[0].platform != "cpu")
        loaded = ckpt.load_variables_only(os.path.join(runs, row, row))
        forward = jax.jit(
            lambda x, _m=model, _v=loaded: _m.apply(
                {"params": _v["params"],
                 "batch_stats": _v.get("batch_stats", {})},
                x, train=False,
            ).astype(jnp.float32)
        )
        print(f"[sweep] {row}")
        curves[row] = robustness_sweep(forward, val, num_classes=4)

    # summary: per-perturbation mean Dice over severities, and the
    # aug - noaug gap (the report's direction: positive under most
    # perturbations, larger than the clean-set gap)
    mean_aug = {k: float(np.mean(v)) for k, v in curves["unet_aug"].items()}
    mean_no = {k: float(np.mean(v)) for k, v in curves["unet_noaug"].items()}
    gaps = {k: round(mean_aug[k] - mean_no[k], 4) for k in PERTURBATIONS}
    clean_gap = table["unet_aug"]["dice"] - table["unet_noaug"]["dice"]
    out = {
        "device": jax.devices()[0].device_kind,
        "config": {"images": args.images, "epochs": args.epochs,
                   "batch": args.batch, "target_size": args.target_size},
        "clean_test": {r: table[r] for r in ("unet_aug", "unet_noaug")},
        "clean_dice_gap_aug_minus_noaug": round(clean_gap, 4),
        "curves": {r: {k: [round(d, 4) for d in v]
                       for k, v in curves[r].items()} for r in curves},
        "mean_dice_gap_aug_minus_noaug": gaps,
        "perturbations_where_aug_wins":
            sum(1 for g in gaps.values() if g > 0),
        "wall_s": round(time.time() - t_all, 1),
    }
    print(json.dumps({k: out[k] for k in (
        "clean_test", "clean_dice_gap_aug_minus_noaug",
        "mean_dice_gap_aug_minus_noaug",
        "perturbations_where_aug_wins", "wall_s")}, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
