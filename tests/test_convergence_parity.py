"""Multi-epoch convergence parity vs the reference stack (torch).

Extends the 3-step trajectory pin (test_trajectory_parity.py) to the
full training contract: identical init + identical pseudo-Pet batches
through the torch reference recipe (eager fp32, train-mode BN, weighted
CE + soft-Dice, AdamW — reference unet.ipynb cell 0 driving
utils/training.py:18-64) and this stack's jitted trainer, for MULTIPLE
EPOCHS with the original-resolution eval protocol
(reference utils/training.py:67-121) after every epoch. Requires:

  1. both stacks CONVERGE (the task is a meaningful regime: color-coded
     blobs, final Dice far above chance), and
  2. the per-step train-loss curves and the per-epoch val
     loss/Dice/IoU/Acc trajectories track each other within stated
     float32-drift tolerances across all epochs.

This is the "same step ⇒ same multi-epoch result" evidence the 3-step
pin could only assert: a trainer bug that compounds (wrong wd coupling,
BN-stat leakage into training, optimizer-state drift) shows up here
even if a single step matches.

The torch side's eval runs the reference protocol re-created in-test
(eval-mode forward → float64 host inverse geometry → MetricsHistory);
our side runs the package's real device-protocol `evaluate`. The two
protocols are pinned to each other elsewhere (test_fast_eval), so any
trajectory mismatch here attributes to the trainer.

A second test pins GRADIENT-ACCUMULATION parity: the reference's actual
schedule ((loss/accumulation_steps).backward() per micro-batch,
optimizer step every k — utils/training.py:49-56) against our
accum_steps microbatch scan, across enough optimizer steps for drift to
compound.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from image_segmentation_tpu.data.dataset import ArrayDataset
from image_segmentation_tpu.data.loader import materialize, train_batches
from image_segmentation_tpu.losses import DiceCELoss
from image_segmentation_tpu.losses.host import dice_ce_loss_np
from image_segmentation_tpu.metrics.confusion import MetricsHistory
from image_segmentation_tpu.ops import geometry as G
from image_segmentation_tpu.train import make_train_step
from image_segmentation_tpu.train.loop import evaluate

from test_trajectory_parity import (
    LR,
    WD,
    WEIGHTS,
    NUM_CLASSES,
    _TorchRefUNet,
    _fixtures,
    _our_state,
    _torch_dice_ce,
)

T = 32          # train/eval target size (reference trains 256; geometry
                # is size-agnostic and pinned separately)
BATCH = 4
EPOCHS = 6


def _pseudo_pet(n, seed, lo=26, hi=54):
    """Learnable variable-size pseudo-Pet items: color-coded blobs.

    Background = dark noise (label 0); a random ellipse is bright red
    (label 1 'cat') or bright green (label 2 'dog'); a ring around it is
    bright white (label 3 'boundary'). Per-pixel color → class is
    learnable, so both stacks converge to high Dice within ~60 steps —
    the 'meaningful regime' a trajectory comparison needs.
    """
    rng = np.random.default_rng(seed)
    items = []
    for i in range(n):
        h = int(rng.integers(lo, hi))
        w = int(rng.integers(lo, hi))
        img = rng.uniform(0.05, 0.25, (h, w, 3)).astype(np.float32)
        lab = np.zeros((h, w), np.int32)
        cy, cx = rng.uniform(0.3, 0.7) * h, rng.uniform(0.3, 0.7) * w
        ry, rx = rng.uniform(0.15, 0.3) * h, rng.uniform(0.15, 0.3) * w
        yy, xx = np.mgrid[0:h, 0:w]
        d = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2
        cls = 1 + int(rng.integers(0, 2))
        ring = (d >= 1.0) & (d < 1.6)
        blob = d < 1.0
        img[ring] = rng.uniform(0.85, 1.0)
        lab[ring] = 3
        color = np.array([0.9, 0.15, 0.1] if cls == 1 else [0.1, 0.9, 0.15],
                         np.float32)
        img[blob] = color + rng.uniform(-0.05, 0.05, 3).astype(np.float32)
        lab[blob] = cls
        items.append((np.clip(img, 0, 1), lab))
    return items


def _shared_batches(train_data, epochs, seed=7):
    """One fixed batch schedule both stacks replay (identical arrays)."""
    rng = np.random.default_rng(seed)
    return [list(train_batches(train_data, BATCH, rng)) for _ in range(epochs)]


def _torch_reference_eval(tmodel, val, loss_cfg):
    """The reference eval protocol (utils/training.py:67-121) on the torch
    model: eval-mode forward on the staged inputs, float64 host inverse
    geometry back to each image's native size, loss + confusion against
    the untouched GT."""
    agg = MetricsHistory(NUM_CLASSES, ignore_index=3)
    losses = []
    tmodel.eval()
    with torch.no_grad():
        out = tmodel(
            torch.from_numpy(val.images.transpose(0, 3, 1, 2))
        ).numpy().transpose(0, 2, 3, 1)
    for i, meta in enumerate(G.metas_to_list(val.metas)):
        inv = G.invert_resize_padding_np(out[i], meta, method="linear")
        lab = val.orig_labels[i]
        losses.append(dice_ce_loss_np(inv, lab, loss_cfg))
        pred = inv.argmax(axis=-1)
        idx = lab.astype(np.int64) * NUM_CLASSES + pred.astype(np.int64)
        conf = np.bincount(
            idx.reshape(-1), minlength=NUM_CLASSES**2
        ).reshape(NUM_CLASSES, NUM_CLASSES)
        agg.accumulate_confusion(conf)
    dice, iou, acc = agg.compute_epoch_metrics()
    return {"loss": float(np.mean(losses)), "dice": dice, "iou": iou,
            "acc": acc}


@pytest.mark.slow
def test_multi_epoch_convergence_parity():
    tmodel, _, variables = _fixtures()
    train_items = _pseudo_pet(40, seed=11)
    val_items = _pseudo_pet(10, seed=99)
    train_data = materialize(ArrayDataset(train_items), T)
    val = materialize(ArrayDataset(val_items), T, keep_orig_labels=True)
    schedule = _shared_batches(train_data, EPOCHS)
    n_steps = sum(len(e) for e in schedule)
    assert n_steps >= 50  # the dress-rehearsal scale VERDICT asked for

    train_cfg = DiceCELoss(class_weights=WEIGHTS)
    eval_cfg = DiceCELoss(class_weights=WEIGHTS, ignore_index=3)
    w = torch.tensor(WEIGHTS)

    # ---- torch reference stack ----
    opt = torch.optim.AdamW(tmodel.parameters(), lr=LR, weight_decay=WD)
    t_losses, t_evals = [], []
    for epoch in schedule:
        tmodel.train()
        for x_np, y_np in epoch:
            opt.zero_grad()
            logits = tmodel(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
            loss = _torch_dice_ce(
                logits, torch.from_numpy(y_np.astype(np.int64)), w
            )
            loss.backward()
            opt.step()
            t_losses.append(float(loss.detach()))
        t_evals.append(_torch_reference_eval(tmodel, val, eval_cfg))

    # ---- this stack ----
    state = _our_state(variables)
    step = make_train_step(train_cfg)
    j_losses, j_evals = [], []
    for epoch in schedule:
        for x_np, y_np in epoch:
            state, loss = step(
                state, (jnp.asarray(x_np), jnp.asarray(y_np))
            )
            j_losses.append(float(loss))
        j_evals.append(
            evaluate(state, val, loss_cfg=eval_cfg, protocol="device",
                     verbose=False)
        )

    t_losses, j_losses = np.asarray(t_losses), np.asarray(j_losses)

    # 1. meaningful regime: the reference recipe converges on this task
    assert t_evals[-1]["dice"] > 0.75, t_evals[-1]
    assert t_losses[-1] < 0.5 * t_losses[0]
    # ... and so do we
    assert j_evals[-1]["dice"] > 0.75, j_evals[-1]
    assert j_losses[-1] < 0.5 * j_losses[0]

    # 2. the train-loss CURVES track. Step 1 is near-exact (the 3-step
    # pin holds it to ~1e-5); float32 drift then compounds through AdamW
    # over 60 steps, and its size depends on XLA's reduction scheduling:
    # measured max relative drift 2.6e-2 (first epoch) / 3.8e-2 (overall)
    # on single-device CPU, and <5e-3 / <5e-2 under the 8-fake-device
    # test platform. Tolerances cover both environments with margin.
    rel = np.abs(j_losses - t_losses) / (np.abs(t_losses) + 1e-3)
    assert rel[0] < 1e-3, rel
    assert rel[: len(schedule[0])].max() < 4e-2, rel
    assert rel.max() < 8e-2, (rel.max(), rel.argmax())

    # 3. per-epoch val trajectories track at every epoch: loss within 5%
    # relative (measured ≤3.1e-2 across both environments), Dice/IoU/Acc
    # within 0.03 absolute (measured ≤1.7e-2)
    for te, je in zip(t_evals, j_evals):
        assert abs(je["loss"] - te["loss"]) / (abs(te["loss"]) + 1e-3) < 5e-2
        for k in ("dice", "iou", "acc"):
            assert abs(float(je[k]) - float(te[k])) < 3e-2, (k, te, je)


@pytest.mark.slow
def test_grad_accumulation_schedule_parity():
    """The reference's ACTUAL schedule — micro-batch b with
    (loss/accumulation_steps).backward() and an optimizer step every k
    micro-batches (utils/training.py:49-56) — against our accum_steps
    microbatch scan, over 12 optimizer steps."""
    tmodel, _, variables = _fixtures()
    items = _pseudo_pet(24, seed=21)
    data = materialize(ArrayDataset(items), T)
    k, micro = 4, 2  # effective batch 8
    rng = np.random.default_rng(3)
    order = rng.permutation(len(data))
    micros = [
        (data.images[order[s : s + micro]], data.labels[order[s : s + micro]])
        for s in range(0, len(data) - micro + 1, micro)
    ]
    micros = micros * 4  # 48 micro-batches → 12 optimizer steps
    w = torch.tensor(WEIGHTS)
    cfg = DiceCELoss(class_weights=WEIGHTS)

    opt = torch.optim.AdamW(tmodel.parameters(), lr=LR, weight_decay=WD)
    tmodel.train()
    t_losses, acc = [], []
    opt.zero_grad()
    for i, (x_np, y_np) in enumerate(micros):
        logits = tmodel(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
        loss = _torch_dice_ce(
            logits, torch.from_numpy(y_np.astype(np.int64)), w
        )
        (loss / k).backward()
        acc.append(float(loss))
        if (i + 1) % k == 0:
            opt.step()
            opt.zero_grad()
            t_losses.append(np.mean(acc))
            acc = []

    state = _our_state(variables)
    step = make_train_step(cfg, accum_steps=k)
    j_losses = []
    for s in range(0, len(micros), k):
        xs = np.concatenate([micros[s + j][0] for j in range(k)])
        ys = np.concatenate([micros[s + j][1] for j in range(k)])
        state, loss = step(state, (jnp.asarray(xs), jnp.asarray(ys)))
        j_losses.append(float(loss))

    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-2)
    # drift stays small through 12 accumulated steps
    rel = np.abs(np.asarray(j_losses) - np.asarray(t_losses)) / (
        np.abs(t_losses) + 1e-3
    )
    assert rel[0] < 1e-4, rel
