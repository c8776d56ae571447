"""Robustness sweep: 8 perturbation types × 10 severities.

Mirrors the reference report's robustness evaluation (PDF §4.1, Fig. 6;
BASELINE.md "Secondary published findings"): apply each perturbation at
increasing severity to the eval set and record mean Dice per
(perturbation, severity).

Perturbations (matched to the report's families):
  gaussian_noise, salt_pepper, blur, contrast_down, brightness_up,
  brightness_down, occlusion, pixelate

Usage (library):
  from benchmarks.robustness import robustness_sweep
  results = robustness_sweep(state, val_data, num_classes=4)
"""
from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from typing import Callable, Dict, List

import numpy as np

from image_segmentation_tpu.metrics import MetricsHistory
from image_segmentation_tpu.ops import geometry as G


def _noise(img, sev, rng):
    return np.clip(img + rng.normal(0, 0.04 * sev, img.shape), 0, 1)


def _salt_pepper(img, sev, rng):
    out = img.copy()
    p = 0.02 * sev
    m = rng.random(img.shape[:2])
    out[m < p / 2] = 0.0
    out[(m >= p / 2) & (m < p)] = 1.0
    return out


def _blur(img, sev, rng):
    from scipy.ndimage import gaussian_filter

    return gaussian_filter(img, sigma=(0.5 * sev, 0.5 * sev, 0))


def _contrast_down(img, sev, rng):
    alpha = 1.0 - 0.095 * sev
    return np.clip(0.5 + alpha * (img - 0.5), 0, 1)


def _brightness_up(img, sev, rng):
    return np.clip(img + 0.08 * sev, 0, 1)


def _brightness_down(img, sev, rng):
    return np.clip(img - 0.08 * sev, 0, 1)


def _occlusion(img, sev, rng):
    out = img.copy()
    h, w = img.shape[:2]
    side = int(min(h, w) * 0.05 * sev)
    if side > 0:
        y = rng.integers(0, h - side + 1)
        x = rng.integers(0, w - side + 1)
        out[y : y + side, x : x + side] = 0.0
    return out


def _pixelate(img, sev, rng):
    h, w = img.shape[:2]
    f = max(1, int(1 + sev))
    small = G.resize_nearest_np(img, (max(1, h // f), max(1, w // f)))
    return G.resize_nearest_np(small, (h, w))


PERTURBATIONS: Dict[str, Callable] = {
    "gaussian_noise": _noise,
    "salt_pepper": _salt_pepper,
    "blur": _blur,
    "contrast_down": _contrast_down,
    "brightness_up": _brightness_up,
    "brightness_down": _brightness_down,
    "occlusion": _occlusion,
    "pixelate": _pixelate,
}


def robustness_sweep(
    forward,
    val_data,
    *,
    num_classes: int = 4,
    eval_ignore_index: int = 3,
    severities: List[int] = list(range(1, 11)),
    seed: int = 0,
    batch_size: int = 8,
    verbose: bool = True,
    workers: int = 0,
    state=None,
    transfer_u8: bool = True,
    families=None,
) -> Dict[str, List[float]]:
    """Mean Dice per (perturbation, severity) on a materialised eval set.

    `forward(images_jnp) -> scores` is a jitted model forward;
    `val_data` a MaterializedDataset with orig_labels kept. Perturbations
    apply to the already-staged fixed-size inputs (protocol as in the
    reference report: perturb, predict, score at original resolution).

    Two scoring paths, identical protocol math:

    * host path (default): fetch per-batch scores, inverse geometry +
      confusion on the host — thread-parallel (`workers`), float64
      aggregation, order-independent (per-image confusions merge into
      one (C, C); perturbation randomness comes from a deterministic
      per-image seed so worker count cannot change results).
    * DEVICE path (`state=...`, a TrainState-like with
      params/batch_stats/apply_fn): the train/fast_eval.py protocol —
      forward, fixed-canvas inverse, argmax and confusion ALL on
      device; the only device→host transfer per batch is a (C, C)
      int32 matrix. At the full-scale receipt (555 test images, 8×10
      sweep, one v5e over a remote link) the host path moved ~580 MB of
      f32 scores per severity and ran ~10+ min per perturbation family;
      the device path removes that transfer entirely. The two paths are
      pinned equal by tests/test_ablations.py.
    """
    import concurrent.futures

    import jax.numpy as jnp

    workers = workers or min(8, os.cpu_count() or 4)
    results: Dict[str, List[float]] = {}
    metas_all = val_data.metas
    n = len(val_data)

    eval_fn = labels_dev = None
    if state is not None:
        import jax

        from image_segmentation_tpu.train.fast_eval import (
            get_eval_batch_fn,
            pack_label_canvases,
        )

        canvases = pack_label_canvases(val_data.orig_labels)
        labels_dev = jax.device_put(canvases)  # uploaded once
        eval_fn = get_eval_batch_fn(canvases.shape[1:3], num_classes)
        metas_dev = jax.device_put(
            G.ResizeMeta(*(jnp.asarray(np.asarray(f)) for f in metas_all))
        )
        if transfer_u8:
            # ship perturbed images as uint8 (4x fewer bytes — a full
            # sweep at 555 test images uploads ~450 MB of f32 per
            # severity over the device link, which measured ~10 min per
            # perturbation family end-to-end); 8-bit is the precision a
            # real perturbed image would have on disk anyway. The
            # wrapped apply dequantizes on device. transfer_u8=False
            # keeps f32 transport for bit-parity with the host path.
            orig_apply = state.apply_fn

            def apply_dequant(variables, *inputs, **kw):
                inputs = [
                    x.astype(jnp.float32) / 255.0
                    if x.dtype == jnp.uint8 else x
                    for x in inputs
                ]
                return orig_apply(variables, *inputs, **kw)

            state = state.replace(apply_fn=apply_dequant)

    def img_confusion(scores_j, i):
        meta = G.ResizeMeta(*(np.asarray(f)[i] for f in metas_all))
        inv = G.invert_resize_padding_np(scores_j, meta)
        pred = inv.argmax(axis=-1)
        label = np.asarray(val_data.orig_labels[i]).reshape(pred.shape)
        idx = label.astype(np.int64) * num_classes + pred.astype(np.int64)
        return np.bincount(
            idx.reshape(-1), minlength=num_classes**2
        ).reshape(num_classes, num_classes)

    chosen = {k: PERTURBATIONS[k] for k in (families or PERTURBATIONS)}
    with concurrent.futures.ThreadPoolExecutor(workers) as pool:
        for name, fn in chosen.items():
            dices = []
            for sev in severities:
                agg = MetricsHistory(num_classes,
                                     ignore_index=eval_ignore_index)

                def perturb(i, _fn=fn, _sev=sev):
                    r = np.random.default_rng(
                        seed * 1_000_003 + _sev * 10_007 + i)
                    return _fn(val_data.images[i], _sev, r)

                if eval_fn is not None:
                    # device protocol: batch index windows, pad the tail
                    confs = []
                    for start in range(0, n, batch_size):
                        idx = list(range(start,
                                         min(start + batch_size, n)))
                        real = np.zeros((batch_size,), bool)
                        real[: len(idx)] = True
                        while len(idx) < batch_size:
                            idx.append(idx[-1])
                        imgs = np.stack(
                            list(pool.map(perturb, idx))
                        ).astype(np.float32)
                        if transfer_u8:
                            imgs = np.clip(
                                np.round(imgs * 255.0), 0, 255
                            ).astype(np.uint8)
                        sel = jnp.asarray(idx)
                        conf, _ = eval_fn(
                            state, (jnp.asarray(imgs),),
                            jax.tree_util.tree_map(
                                lambda f: f[sel], metas_dev),
                            labels_dev[sel], jnp.asarray(real),
                        )
                        confs.append(conf)  # (C, C) device — fetch below
                    for conf in confs:
                        agg.accumulate_confusion(np.asarray(conf))
                else:
                    pending = []  # (device scores, idx) — fetch lazily
                    for start in range(0, n, batch_size):
                        idx = list(range(start,
                                         min(start + batch_size, n)))
                        imgs = np.stack(
                            list(pool.map(perturb, idx))).astype(np.float32)
                        pending.append((forward(jnp.asarray(imgs)), idx))
                    conf_futures = []
                    for scores_dev, idx in pending:
                        scores = np.asarray(scores_dev)
                        conf_futures += [
                            pool.submit(img_confusion, scores[j], i)
                            for j, i in enumerate(idx)
                        ]
                    total = sum(f.result() for f in conf_futures)
                    agg.accumulate_confusion(total)
                dice, _, _ = agg.compute_epoch_metrics()
                dices.append(dice)
            results[name] = dices
            if verbose:
                print(f"{name}: " + " ".join(f"{d:.3f}" for d in dices))
    return results


def main(argv=None):
    """CLI: quick-train a UNet on structured synthetic data, then sweep.

    Produces the report's robustness artifact shape (8 perturbations ×
    10 severities, mean Dice each) with a model that has actually
    learned the task, so degradation curves are meaningful:
    `python benchmarks/robustness.py [--steps N] [--images N]`.
    """
    import argparse
    import json

    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--images", type=int, default=64)
    p.add_argument("--val-images", type=int, default=32)
    p.add_argument("--batch", type=int, default=16)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from image_segmentation_tpu.losses import DiceCELoss
    from image_segmentation_tpu.models import UNet
    from image_segmentation_tpu.run import synthetic_materialized
    from image_segmentation_tpu.train import create_train_state, make_train_step
    from image_segmentation_tpu.train.state import make_adamw

    on_accel = jax.devices()[0].platform != "cpu"
    T = 256 if on_accel else 64
    base = 32 if on_accel else 8
    steps = args.steps if on_accel else 4
    n_tr = args.images if on_accel else 8
    n_va = args.val_images if on_accel else 4

    train = synthetic_materialized(n_tr, T, seed=0)
    val = synthetic_materialized(n_va, T, seed=1, keep_orig_labels=True)

    model = UNet(num_classes=4, base=base,
                 dtype=jnp.bfloat16 if on_accel else jnp.float32)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.asarray(train.images[:1]),
        make_adamw(learning_rate=1e-3),
    )
    step = make_train_step(DiceCELoss(ignore_index=3))
    imgs = jnp.asarray(train.images)
    labs = jnp.asarray(train.labels)
    rng = np.random.default_rng(0)
    for s in range(steps):
        ii = rng.integers(0, n_tr, (args.batch,))
        state, loss = step(state, (imgs[ii], labs[ii]))
    print(f"trained {steps} steps, final loss {float(loss):.4f}")

    forward = jax.jit(
        lambda x: state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False,
        ).astype(jnp.float32)
    )
    results = robustness_sweep(forward, val, num_classes=4)
    print(json.dumps({
        "metric": "robustness_mean_dice_by_perturbation",
        "clean_dice_floor_check": "severity curves should decay from the "
                                  "clean-trained level",
        "results": {k: [round(d, 4) for d in v] for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
