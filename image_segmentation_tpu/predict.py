"""Offline batch prediction CLI: segment a directory (or single file) of
images with a trained or demo model registry and write class-id +
colorized masks.

The reference's only inference surface outside the notebooks is the
interactive webapp (reference segmentation_webapp/app.py:220-326 —
one image per HTTP request). This CLI exposes the same pipeline —
resize+pad to the model's target size, jitted forward, inverse geometry
at original resolution, argmax, colorize — as a batch tool, and can
optionally score predictions against ground-truth labels with the
reference's original-resolution metric protocol (utils/training.py:67-121:
macro Dice/IoU/Acc over classes with the ignore class excluded).

Usage:
  python -m image_segmentation_tpu.predict --models-dir runs/models \
      --model unet --input photos/ --output out/ [--labels labels/]
  python -m image_segmentation_tpu.predict --demo --input photos/ --output out/
  # prompt models: one point prompt applied to every image
  python -m image_segmentation_tpu.predict --demo --model prompt_model \
      --input photos/ --output out/ --point 120,80
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

IMAGE_EXTS = (".jpg", ".jpeg", ".png")


def list_inputs(path: str) -> List[str]:
    """A single image file, or every image in a directory (sorted by
    stem, the reference's dataset ordering — utils/dataset.py:20)."""
    if os.path.isfile(path):
        return [path]
    if not os.path.isdir(path):
        raise FileNotFoundError(path)
    files = [
        os.path.join(path, f)
        for f in sorted(os.listdir(path))
        if f.lower().endswith(IMAGE_EXTS)
    ]
    if not files:
        raise FileNotFoundError(f"no {'/'.join(IMAGE_EXTS)} files in {path}")
    return files


def load_image(path: str) -> np.ndarray:
    """(H, W, 3) float32 [0,1] with the shared channel rules (alpha
    dropped, gray replicated) — identical to the training datasets."""
    from image_segmentation_tpu.data.dataset import (
        _decode_image,
        normalize_image_channels,
    )

    return normalize_image_channels(_decode_image(path)).astype(np.float32) / 255.0


def load_label(path: str, prompt_space: bool = False) -> np.ndarray:
    """(H, W) int32 class ids in the scored model's label space:
    segmentation models get the 255→boundary remap (reference
    utils/dataset.py:131-138); prompt models get the prompt-task remap
    {0 deactivated, 1 bg+boundary, 2 cat, 3 dog} (reference
    augmentation.ipynb cell 23) so GT and predictions share a space."""
    from image_segmentation_tpu.data.dataset import _decode_image
    from image_segmentation_tpu.data.labels import (
        remap_for_prompt_task,
        target_remap,
    )

    arr = _decode_image(path)[..., 0].astype(np.int32)
    return remap_for_prompt_task(arr) if prompt_space else target_remap(arr)


def predict_paths(
    engine,
    model_name: str,
    paths: Sequence[str],
    output_dir: Optional[str] = None,
    labels_dir: Optional[str] = None,
    point: Optional[Tuple[int, int]] = None,
    ignore_index: Optional[int] = 3,
    verbose: bool = True,
) -> Dict:
    """Segment `paths` through `engine`'s `model_name`; write
    `{stem}_mask.png` (class ids) and `{stem}_color.png` into
    output_dir; if labels_dir holds `{stem}.png` ground truth, score
    with the original-resolution protocol. Returns a summary dict."""
    from image_segmentation_tpu.metrics.confusion import MetricsHistory
    from image_segmentation_tpu.serve.render import create_prompt_mask

    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("PIL is required for predict output") from e

    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
    entry = engine.models[model_name]
    if entry.needs_prompt and point is None:
        raise SystemExit(
            f"model {model_name!r} is prompt-based: --point X,Y is required "
            "(an empty prompt would deactivate every pixel)"
        )
    if not entry.needs_prompt and point is not None and verbose:
        print(f"[predict] note: {model_name!r} takes no prompt; "
              "--point is ignored")
    num_classes = len(entry.class_names)
    agg = MetricsHistory(num_classes=num_classes, ignore_index=ignore_index)
    scored = 0
    seg_times: List[float] = []
    for path in paths:
        image = load_image(path)
        prompt_mask = None
        if entry.needs_prompt:
            prompt_mask = create_prompt_mask(
                "points", [{"x": point[0], "y": point[1]}], image.shape[:2]
            )
        t0 = time.perf_counter()
        result = engine.segment(image, model_name, prompt_mask=prompt_mask)
        seg_times.append(time.perf_counter() - t0)
        stem = os.path.splitext(os.path.basename(path))[0]
        if output_dir:
            Image.fromarray(result["mask"], mode="L").save(
                os.path.join(output_dir, f"{stem}_mask.png")
            )
            Image.fromarray(result["color_mask"], mode="RGB").save(
                os.path.join(output_dir, f"{stem}_color.png")
            )
        if labels_dir:
            label_path = os.path.join(labels_dir, f"{stem}.png")
            if os.path.isfile(label_path):
                label = load_label(label_path, prompt_space=entry.needs_prompt)
                if label.shape != result["mask"].shape:
                    raise ValueError(
                        f"{label_path}: label shape {label.shape} does not "
                        f"match image {result['mask'].shape}"
                    )
                bad = (label < 0) | (label >= num_classes)
                if bad.any():
                    raise ValueError(
                        f"{label_path}: label values outside the "
                        f"{num_classes}-class space (found "
                        f"{sorted(np.unique(label[bad]).tolist())[:8]}); "
                        "expected class-id PNGs (0..C-1 with the 255 "
                        "boundary sentinel)"
                    )
                agg.accumulate(result["mask"], label)
                scored += 1
        if verbose:
            print(f"[predict] {stem}: {result['mask'].shape}")
    # steady-state throughput: the first segment() call pays the jit
    # compile, so exclude it whenever there is more than one image
    steady = seg_times[1:] if len(seg_times) > 1 else seg_times
    summary: Dict = {
        "model": model_name,
        "images": len(paths),
        "images_per_sec": round(len(steady) / max(sum(steady), 1e-9), 3),
        "first_image_s": round(seg_times[0], 3),
        "class_names": list(entry.class_names),
    }
    if scored:
        dice, iou, acc = agg.compute_epoch_metrics()

        def _num(v):  # NaN (class absent from GT and preds) → JSON null
            return round(float(v), 4) if np.isfinite(v) else None

        summary.update(
            scored=scored,
            mean_dice=_num(dice),
            mean_iou=_num(iou),
            mean_acc=_num(acc),
            per_class_iou=[_num(v) for v in agg.get_last_per_class_iou()],
        )
    return summary


def main(argv: Optional[Sequence[str]] = None) -> Dict:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--input", required=True,
                   help="image file or directory of .jpg/.png")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--models-dir", default=None,
                   help="directory of trained MO_{name} artifacts")
    p.add_argument("--demo", action="store_true",
                   help="random-weight registry (smoke testing)")
    p.add_argument("--model", default=None,
                   help="registry model name (default: sole model, else 'unet')")
    p.add_argument("--labels", default=None,
                   help="directory of {stem}.png ground-truth class-id labels "
                        "to score against (original-resolution protocol)")
    p.add_argument("--point", default=None,
                   help="X,Y point prompt in original-image pixels "
                        "(prompt models)")
    p.add_argument("--ignore-index", type=int, default=None,
                   help="class excluded from metric macro-averaging. "
                        "Default: 3 (= boundary, the reference eval "
                        "protocol) for segmentation models; none for "
                        "prompt models, whose label space has no boundary "
                        "class (the reference notebooks' ignore_index=3 "
                        "there would exclude 'dog'); -1 disables")
    p.add_argument("--mesh", action="store_true",
                   help="shard each prediction batch across all devices "
                        "(data mesh, same as serve.app --mesh)")
    args = p.parse_args(argv)

    from image_segmentation_tpu.serve.app import (
        build_demo_engine,
        build_engine_from_checkpoints,
    )

    mesh = None
    if args.mesh:
        import jax

        from image_segmentation_tpu.parallel.mesh import get_mesh

        mesh = get_mesh()
        print(f"[predict] mesh over {jax.device_count()} devices")

    if args.demo or not args.models_dir:
        print("[predict] demo mode: random-weight models")
        engine = build_demo_engine(mesh=mesh)
    else:
        engine = build_engine_from_checkpoints(args.models_dir, mesh=mesh)

    names = engine.available()
    model = args.model or ("unet" if "unet" in names else names[0])
    if model not in names:
        raise SystemExit(f"unknown model {model!r}; available: {names}")

    point = None
    if args.point:
        x, y = (int(v) for v in args.point.split(","))
        point = (x, y)

    if args.ignore_index is None:
        needs_prompt = engine.models[model].needs_prompt
        ignore_index = None if needs_prompt else 3
    elif args.ignore_index < 0:
        ignore_index = None
    else:
        ignore_index = args.ignore_index

    summary = predict_paths(
        engine,
        model,
        list_inputs(args.input),
        output_dir=args.output,
        labels_dir=args.labels,
        point=point,
        ignore_index=ignore_index,
    )
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
