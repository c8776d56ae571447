"""Convergence-parity dress rehearsal at reference-realistic scale.

`tests/test_convergence_parity.py` pins the torch-reference-vs-JAX
multi-epoch trajectory at toy scale (T=32, base=8, 60 optimizer steps).
This harness runs the same experiment one notch up — the scale the
round-3 verdict asked for — so a trainer bug that only compounds with
depth/width/steps would be caught in-env:

  model      base=64 UNet (the reference's width, unet/unet.py:80)
  data       pseudo-Pet expanded by the OFFLINE augmentation pipeline
             (data/augment.py = reference utils/augmentation.ipynb);
             both stacks replay the SAME materialized augmented arrays
  geometry   T=128 resize+pad (geometry is size-agnostic and pinned
             separately; 128 keeps the 1-core torch side tractable)
  schedule   micro-batch 2 + accumulation_steps=4 — the reference's
             ACTUAL regime shape ((loss/k).backward() per micro-batch,
             optimizer step every k; utils/training.py:49-56), which
             also exercises micro-batch-2 BatchNorm statistics
  length     >=200 optimizer steps (13 epochs x 16 steps), eval after
             every epoch with the original-resolution protocol
             (utils/training.py:67-121) on both sides

Torch runs the reference recipe in eager fp32 on CPU; the JAX side runs
this package's jitted accum_steps trainer, forced onto CPU f32 so the
comparison is float32-vs-float32 (parity, not throughput, is the
point). Writes benchmarks/convergence_rehearsal_r4.json with the full
loss curves, per-epoch eval trajectories, drift statistics, and
pass/fail against the stated tolerances; exits nonzero on failure.

Run:  python benchmarks/convergence_rehearsal.py
      (~1 h on one CPU core; --epochs 2 --images 32 for a smoke pass)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Torch always runs eager f32 on CPU (the reference's stack). The JAX
# side runs f32 with HIGHEST matmul/conv precision either on CPU
# (--platform cpu: float32-vs-float32, the tightest comparison; at
# base=64 on this 1-core host the XLA-CPU step is ~100× slower than
# eager torch — measured at ~3 h for compile+epoch-0 — so impractical
# here) or on the TPU (--platform tpu, the default: f32 params with
# 6-pass-bf16 HIGHEST-precision matmuls ≈ f32 to ~1e-6 relative per
# op; epochs take seconds and the rehearsal then ALSO pins the real
# TPU numerics path, the one production uses). Platform must be fixed
# BEFORE the first jax import, hence the pre-parse.
def _preparse_platform(argv):
    for i, a in enumerate(argv):
        if a == "--platform" and i + 1 < len(argv):
            return argv[i + 1]
        if a.startswith("--platform="):
            return a.split("=", 1)[1]
    return "tpu"


_PLATFORM = _preparse_platform(sys.argv)
if _PLATFORM == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

if _PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")
# f32-vs-f32 comparison: on TPU, force every dot/conv through the
# 6-pass bf16 path (~f32 accuracy) instead of the default single-pass
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

NUM_CLASSES = 4
WEIGHTS = (0.2047, 1.0272, 1.2293, 1.5388)  # FullWeight, unet.ipynb cell 0
LR, WD = 1e-3, 0.01
T = 128
MICRO, ACCUM = 2, 4  # effective batch 8


def _pseudo_pet_items(n, seed):
    """Hard variable-size scenes — the ablation harness's family (small
    low-contrast objects, pixel noise, boundary rings labelled 255 and
    remapped to 3 after augmentation, like the reference's on-disk
    flow). A first cut used bright saturated blobs: the base=64 model
    drove the train loss from 1.44 to 0.008 within ONE epoch, leaving
    12 epochs of noise-floor comparison. This task declines gradually
    across the full run, which is what a trajectory comparison needs."""
    from benchmarks.ablations import hard_synthetic_items

    return hard_synthetic_items(n, seed)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=128,
                   help="augmented train-set size (after expansion)")
    p.add_argument("--base-images", type=int, default=48)
    p.add_argument("--epochs", type=int, default=13)
    p.add_argument("--base", type=int, default=64)
    p.add_argument("--platform", default="tpu", choices=("tpu", "cpu"),
                   help="JAX-side device (consumed before jax import)")
    p.add_argument("--out",
                   default=os.path.join(os.path.dirname(__file__),
                                        "convergence_rehearsal_r4.json"))
    args = p.parse_args()

    import torch

    import jax
    import jax.numpy as jnp

    from image_segmentation_tpu.data.augment import generate_augmented_dataset
    from image_segmentation_tpu.data.dataset import ArrayDataset
    from image_segmentation_tpu.data.labels import target_remap
    from image_segmentation_tpu.data.loader import materialize
    from image_segmentation_tpu.losses import DiceCELoss
    from image_segmentation_tpu.models import UNet
    from image_segmentation_tpu.models.torch_import import (
        convert_torch_unet_state_dict,
    )
    from image_segmentation_tpu.train import create_train_state, make_train_step
    from image_segmentation_tpu.train.loop import evaluate
    from image_segmentation_tpu.train.state import make_adamw

    from test_convergence_parity import _torch_reference_eval
    from test_trajectory_parity import _TorchRefUNet, _torch_dice_ce

    if args.platform == "cpu":
        assert jax.devices()[0].platform == "cpu"
    print(f"jax platform: {jax.devices()[0].platform} "
          f"(matmul precision: highest)", flush=True)
    t_all = time.time()

    # ---- data: offline-augmented pseudo-Pet, shared verbatim ----
    base_items = _pseudo_pet_items(args.base_images, seed=11)
    aug = generate_augmented_dataset(
        ArrayDataset(base_items), seed=0, size=T
    )
    order = np.random.default_rng(5).permutation(len(aug))[: args.images]
    train_items = [
        (np.asarray(aug[i][0]), target_remap(np.asarray(aug[i][1])))
        for i in order
    ]
    train = materialize(ArrayDataset(train_items), T)
    val_items = [
        (img, target_remap(lab))
        for img, lab in _pseudo_pet_items(24, seed=99)
    ]
    val = materialize(ArrayDataset(val_items), T, keep_orig_labels=True)
    n = len(train)
    steps_per_epoch = n // (MICRO * ACCUM)
    n_opt_steps = steps_per_epoch * args.epochs
    print(f"train={n} augmented images, {steps_per_epoch} opt-steps/epoch, "
          f"{n_opt_steps} total", flush=True)
    assert n_opt_steps >= 200 or args.epochs < 13

    # one fixed schedule of micro-batches both stacks replay
    rng = np.random.default_rng(7)
    schedule = []  # per epoch: list of (x, y) micro-batches
    for _ in range(args.epochs):
        perm = rng.permutation(n)[: steps_per_epoch * MICRO * ACCUM]
        micros = [
            (train.images[perm[s: s + MICRO]], train.labels[perm[s: s + MICRO]])
            for s in range(0, len(perm), MICRO)
        ]
        schedule.append(micros)

    # ---- identical init: torch default init, converted ----
    tmodel = _TorchRefUNet(base=args.base)
    variables = jax.tree.map(
        jnp.asarray, convert_torch_unet_state_dict(tmodel.state_dict())
    )

    train_cfg = DiceCELoss(class_weights=WEIGHTS)
    eval_cfg = DiceCELoss(class_weights=WEIGHTS, ignore_index=3)
    w = torch.tensor(WEIGHTS)

    # ---- torch reference stack (eager fp32, reference accum schedule) --
    opt = torch.optim.AdamW(tmodel.parameters(), lr=LR, weight_decay=WD)
    t_losses, t_evals = [], []
    t0 = time.time()
    for ei, micros in enumerate(schedule):
        tmodel.train()
        acc = []
        opt.zero_grad()
        for i, (x_np, y_np) in enumerate(micros):
            logits = tmodel(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
            loss = _torch_dice_ce(
                logits, torch.from_numpy(y_np.astype(np.int64)), w
            )
            (loss / ACCUM).backward()
            acc.append(float(loss.detach()))
            if (i + 1) % ACCUM == 0:
                opt.step()
                opt.zero_grad()
                t_losses.append(float(np.mean(acc)))
                acc = []
        t_evals.append(_torch_reference_eval(tmodel, val, eval_cfg))
        print(f"[torch] epoch {ei}: loss={t_losses[-1]:.4f} "
              f"eval={t_evals[-1]} ({time.time() - t0:.0f}s)", flush=True)

    # ---- this stack (jitted accum_steps trainer, f32 CPU) ----
    model = UNet(num_classes=NUM_CLASSES, base=args.base)
    tx = make_adamw(learning_rate=LR, weight_decay=WD)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, T, T, 3)), tx
    ).replace(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
    )
    step = make_train_step(train_cfg, accum_steps=ACCUM)
    j_losses, j_evals = [], []
    t0 = time.time()
    for ei, micros in enumerate(schedule):
        for s in range(0, len(micros), ACCUM):
            xs = np.concatenate([micros[s + j][0] for j in range(ACCUM)])
            ys = np.concatenate([micros[s + j][1] for j in range(ACCUM)])
            state, loss = step(state, (jnp.asarray(xs), jnp.asarray(ys)))
            j_losses.append(float(loss))
        j_evals.append(
            evaluate(state, val, loss_cfg=eval_cfg, protocol="device",
                     verbose=False)
        )
        print(f"[jax]   epoch {ei}: loss={j_losses[-1]:.4f} "
              f"eval={j_evals[-1]} ({time.time() - t0:.0f}s)", flush=True)

    out = {
        "config": {"base": args.base, "T": T, "micro": MICRO,
                   "accum_steps": ACCUM, "epochs": args.epochs,
                   "train_images": n, "opt_steps": int(n_opt_steps),
                   "augmented": True, "lr": LR, "wd": WD,
                   "weights": WEIGHTS},
        "torch_losses": [round(x, 6) for x in t_losses],
        "jax_losses": [round(x, 6) for x in j_losses],
        "torch_evals": [
            {k: round(float(v), 6) for k, v in e.items()} for e in t_evals
        ],
        "jax_evals": [
            {k: (np.round(np.asarray(v), 6).tolist()
                 if np.ndim(v) else round(float(v), 6))
             for k, v in e.items()} for e in j_evals
        ],
        "wall_s": round(time.time() - t_all, 1),
    }
    out.update(analyze(out))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("rel_drift", "eval_deltas", "checks", "ok",
                       "wall_s")}), flush=True)
    sys.exit(0 if out["ok"] else 1)


def analyze(artifact: dict) -> dict:
    """Drift statistics + pass/fail checks, pure over the recorded
    curves (so `--recheck` can re-derive them from a saved artifact).

    What is checkable at this scale, and what is not: with identical
    init and identical batches, the first optimizer step matches to
    float-epsilon and the first epoch tracks to a few percent — that is
    the trainer-correctness evidence (wrong wd coupling, BN leakage,
    optimizer drift would all break it). Past that, training is a
    chaotic dynamical system: a 1e-6 per-step difference (which ANY two
    float implementations have — reordering one f32 reduction suffices)
    amplifies exponentially; by ~step 50 the measured trajectories
    decorrelate no matter how correct both stacks are. The meaningful
    end-to-end check is CONVERGED-QUALITY EQUIVALENCE: both stacks'
    final eval metrics agree within the reference run's own late-epoch
    jitter (2× its last-5-epoch std, floored at 2 pts — the scale of
    effect the ablation experiments care about). The full curves stay
    in the artifact for inspection."""
    t_arr = np.asarray(artifact["torch_losses"])
    j_arr = np.asarray(artifact["jax_losses"])
    t_evals, j_evals = artifact["torch_evals"], artifact["jax_evals"]
    spe = len(t_arr) // len(t_evals)  # steps per epoch
    rel = np.abs(j_arr - t_arr) / (np.abs(t_arr) + 1e-3)

    per_epoch = {
        k: [abs(float(je[k]) - float(te[k]))
            for te, je in zip(t_evals, j_evals)]
        for k in ("dice", "iou", "acc")
    }
    jitter = {
        k: float(np.std([float(e[k]) for e in t_evals[-5:]]))
        for k in ("dice", "iou", "acc")
    }
    final_delta = {k: per_epoch[k][-1] for k in per_epoch}
    last3_delta = {
        k: abs(float(np.mean([float(e[k]) for e in t_evals[-3:]]))
               - float(np.mean([float(e[k]) for e in j_evals[-3:]])))
        for k in ("dice", "iou", "acc")
    }
    tol = {k: max(0.02, 2.0 * jitter[k]) for k in jitter}

    checks = {
        "torch_converged": bool(float(t_evals[-1]["dice"]) > 0.75
                                and t_arr[-1] < 0.5 * t_arr[0]),
        "jax_converged": bool(float(j_evals[-1]["dice"]) > 0.75
                              and j_arr[-1] < 0.5 * j_arr[0]),
        "first_step_rel_lt_1e-3": bool(rel[0] < 1e-3),
        "first_epoch_rel_lt_5e-2": bool(rel[:spe].max() < 5e-2),
        "final_dice_within_ref_jitter": bool(
            final_delta["dice"] < tol["dice"]),
        "final_iou_within_ref_jitter": bool(final_delta["iou"] < tol["iou"]),
        "final_acc_within_ref_jitter": bool(final_delta["acc"] < tol["acc"]),
        "last3_dice_within_ref_jitter": bool(
            last3_delta["dice"] < tol["dice"]),
        "last3_iou_within_ref_jitter": bool(last3_delta["iou"] < tol["iou"]),
    }
    return {
        "rel_drift": {"first_step": float(rel[0]),
                      "first_epoch_max": float(rel[:spe].max()),
                      "max": float(rel.max()),
                      "argmax_step": int(rel.argmax()),
                      "median": float(np.median(rel))},
        "eval_deltas": {"per_epoch_abs": per_epoch,
                        "final_abs": final_delta,
                        "last3_mean_abs": last3_delta,
                        "ref_last5_jitter_std": jitter,
                        "tolerance_2x_jitter_floor_0.02": tol},
        "checks": checks,
        "ok": all(checks.values()),
    }


def recheck(path: str) -> None:
    with open(path) as f:
        artifact = json.load(f)
    artifact.pop("eval_deltas_max_abs", None)
    artifact.pop("eval_loss_rel_max", None)
    artifact.update(analyze(artifact))
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({k: artifact[k] for k in
                      ("rel_drift", "eval_deltas", "checks", "ok")},
                     indent=1))
    sys.exit(0 if artifact["ok"] else 1)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--recheck":
        recheck(sys.argv[2])
    else:
        main()
