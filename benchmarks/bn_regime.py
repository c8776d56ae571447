"""BatchNorm-regime quality experiment: micro-batch-2 stats vs B=128 stats.

The one untested parity assumption (SURVEY.md §7 "BatchNorm under data
parallelism + gradient accumulation"): the reference computes BN batch
statistics over micro-batches of TWO — batch_size=2 with
accumulation_steps=32 for an effective optimizer batch of 64
(reference utils/training.py:49-56; notebooks set
accumulation = 64 // batch_size). This framework's production fast path
runs B=128 with single-batch BN statistics. The accumulation path here
reproduces reference BN semantics exactly (train/steps.py:96-114, scan
over microbatches updating batch_stats sequentially; schedule pinned by
tests/test_train.py::test_grad_accumulation_schedule_parity) — but until
this experiment nothing MEASURED whether the statistics regime changes
final quality, which is the most plausible mechanism by which the
0.5-pt real-data parity claim could fail.

Three arms on the same converging task (the ablation harness's hard
synthetic set — small low-contrast objects, class imbalance, boundary
rings), >=3 seeds each:

  reference_bn   batch 64, accum_steps=32  -> BN stats over micro-batch 2,
                 optimizer steps on the mean-of-32 gradient
                 (exact reference semantics)
  batch64_bn     batch 64, accum_steps=1   -> BN stats over the full 64;
                 IDENTICAL optimizer schedule to reference_bn (same
                 effective batch, same steps/epoch, same LR) — the pair
                 isolates the statistics regime alone
  production_bn  batch 128, accum_steps=1  -> the production fast path
                 (half the optimizer steps per epoch at the same LR)

Each arm trains with the production whole-epoch trainer (fit()),
weighted Dice+CE, and the reference's original-resolution eval protocol.
Reports best/final val Dice and mIoU per (arm, seed) plus per-arm
mean +/- spread and the reference_bn - batch64_bn delta.

Run (TPU): python benchmarks/bn_regime.py
Artifact:  benchmarks/bn_regime_r4.json (committed)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.ablations import NUM_CLASSES, _dataset, _weights  # noqa: E402


def run_arm(arm, train, val, loss, epochs, batch, accum, base, dtype, seed):
    import jax
    import jax.numpy as jnp

    from image_segmentation_tpu.models import UNet
    from image_segmentation_tpu.train import create_train_state
    from image_segmentation_tpu.train.loop import fit
    from image_segmentation_tpu.train.state import make_adamw

    model = UNet(num_classes=NUM_CLASSES, base=base, dtype=dtype)
    state = create_train_state(
        model, jax.random.PRNGKey(seed), jnp.asarray(train.images[:1]),
        make_adamw(learning_rate=1e-3),
    )
    with tempfile.TemporaryDirectory() as d:
        res = fit(state, train, val, loss_fn=loss, epochs=epochs,
                  batch_size=batch, accum_steps=accum, save_dir=d,
                  name="bn", seed=seed, eval_loss_cfg=loss, verbose=False,
                  save_weights_only_copy=False)
    h = res.history
    et = h["epoch_time_s"]
    row = {
        "arm": arm, "seed": seed, "batch": batch, "accum_steps": accum,
        "micro_batch": batch // accum,
        "best_dice": round(float(res.best["dice"]), 4),
        "best_miou": round(float(res.best["miou"]), 4),
        "final_dice": round(float(h["val_dice"][-1]), 4),
        "final_miou": round(float(h["val_iou"][-1]), 4),
        "steady_epoch_s": round(float(np.median(et[1:]) if len(et) > 2
                                      else et[-1]), 3),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=256)
    p.add_argument("--epochs", type=int, default=24)
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--base", type=int, default=32)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon TPU plugin outranks env-var platform selection; honor
        # a CPU request via the config override (as tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from image_segmentation_tpu.losses import DiceCELoss

    on_accel = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_accel else jnp.float32
    n = args.images if on_accel else 32
    epochs = args.epochs if on_accel else 2
    base = args.base if on_accel else 8
    T = 256 if on_accel else 64
    # reference effective batch is 64 (notebooks: accumulation=64//bs);
    # scale the synthetic arms down on CPU so micro-batches stay >=2
    b_ref = 64 if on_accel else 16
    accum_ref = 32 if on_accel else 8
    b_prod = 128 if on_accel else 32

    train = _dataset(n, T, seed=0)
    val = _dataset(max(32, n // 4), T, seed=100, keep_orig=True)
    loss = DiceCELoss(class_weights=_weights(train, "full"))

    arms = [
        ("reference_bn", b_ref, accum_ref),
        ("batch64_bn", b_ref, 1),
        ("production_bn", b_prod, 1),
    ]
    rows = []
    for arm, batch, accum in arms:
        for seed in range(args.seeds):
            rows.append(run_arm(arm, train, val, loss, epochs, batch,
                                accum, base, dtype, seed))

    summary = {"metric": "bn_regime_quality", "task": "hard_synthetic",
               "images": n, "epochs": epochs, "base": base, "size": T,
               "arms": {}}
    for arm, _, _ in arms:
        rs = [r for r in rows if r["arm"] == arm]
        for k in ("best_dice", "best_miou", "final_dice", "final_miou"):
            vals = [r[k] for r in rs]
            summary["arms"].setdefault(arm, {})[k] = {
                "mean": round(float(np.mean(vals)), 4),
                "std": round(float(np.std(vals)), 4),
                "values": vals,
            }
    a = summary["arms"]
    summary["delta_reference_minus_batch64"] = {
        k: round(a["reference_bn"][k]["mean"] - a["batch64_bn"][k]["mean"], 4)
        for k in ("best_dice", "best_miou")
    }
    summary["delta_reference_minus_production"] = {
        k: round(a["reference_bn"][k]["mean"]
                 - a["production_bn"][k]["mean"], 4)
        for k in ("best_dice", "best_miou")
    }
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"rows": rows, "summary": summary}, f, indent=1)


if __name__ == "__main__":
    main()
