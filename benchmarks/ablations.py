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
  skips       ClipUNet vs ClipUNetNoSkips, both frozen on the SAME
              pretrained smoke encoder (report §4: skips > no-skips).
              Stage 0 pretrains the encoder with supervision entering
              only through its final layer (co-trained ClipUNetNoSkips —
              the same shape of signal contrastive CLIP gives its
              blocks), so the frozen comparison runs at non-trivial
              quality instead of the r2 noise regime
  resolution  256px vs 512px UNet (report §4: 512 ≈ 256 quality at ~4×
              step cost)
  prompt_freeze  PromptModel with the ClipUNet branch frozen (reference
              prompt_based/prompt.py:30-31 default) vs fine-tuned
              (webapp segmentation_webapp/prompt_model.py:101-102;
              report PDF §4 Fig 8h: fine-tuning won), both starting
              from the same trained ClipUNet

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
import os
import tempfile

import numpy as np

NUM_CLASSES = 4


def hard_synthetic_items(n: int, seed: int = 0, *, obj_lo: int = 10,
                         obj_hi: int = 4, contrast=(0.15, 0.3),
                         noise: float = 0.08, bg=(0.35, 0.12)):
    """Small low-contrast objects + boundary rings: a task where class
    imbalance and the boundary class actually matter (unlike the smoke
    set in run.py, which any config solves).

    The keyword knobs define SHIFTED distributions of the same family
    (object size via h//obj_lo..h//obj_hi, contrast range, pixel noise,
    background mean/std) — used by the skips ablation to pretrain the
    encoder on a different distribution than the transfer task."""
    rng = np.random.default_rng(seed)
    items = []
    for _ in range(n):
        h = int(rng.integers(160, 320))
        w = int(rng.integers(160, 320))
        img = rng.normal(bg[0], bg[1], (h, w, 3)).astype(np.float32)
        label = np.zeros((h, w), np.int32)
        for _obj in range(int(rng.integers(1, 4))):
            cls = int(rng.integers(1, 3))
            oh = int(rng.integers(h // obj_lo, h // obj_hi))
            ow = int(rng.integers(w // obj_lo, w // obj_hi))
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
            img[inner, cls - 1] += float(rng.uniform(*contrast))
        img += rng.normal(0, noise, img.shape).astype(np.float32)
        items.append((np.clip(img, 0, 1), label))
    return items


def _dataset(n, target, seed, keep_orig=False, items_kw=None):
    from image_segmentation_tpu.data.dataset import ArrayDataset
    from image_segmentation_tpu.data.labels import target_remap
    from image_segmentation_tpu.data.loader import materialize

    items = [(i, target_remap(l))
             for i, l in hard_synthetic_items(n, seed, **(items_kw or {}))]
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


def _run(model, train, val, loss_cfg, epochs, batch, label, *,
         frozen=(), patch=None):
    """Train one variant; returns (result row, final TrainState).

    `patch` injects pretrained subtrees ({'params': {name: tree}, and
    optionally 'batch_stats': {...}}) before training — the ablation
    analogue of loading a converted/pretrained checkpoint. `frozen` are
    subtree prefixes masked out of the optimizer (zero updates AND zero
    AdamW weight decay — same mechanics as run.py's frozen-encoder
    wiring; reference clip/clipunet.py:28-30)."""
    import jax
    import jax.numpy as jnp

    from image_segmentation_tpu.train import create_train_state
    from image_segmentation_tpu.train.loop import fit
    from image_segmentation_tpu.train.state import (
        TrainState,
        make_adamw,
        subtree_mask,
    )

    extra = ()
    if getattr(train, "has_heatmaps", False):
        extra = (jnp.asarray(train.heatmaps[:1]),)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.asarray(train.images[:1]),
        make_adamw(learning_rate=1e-3), extra_inputs=extra,
    )
    if patch or frozen:
        # snapshot the patch to host numpy: the donated whole-epoch
        # trainer consumes its input buffers, so device arrays from a
        # previous run would arrive here already deleted on reuse
        patch = jax.tree_util.tree_map(np.asarray, patch) if patch else None
        params = dict(state.params)
        params.update(patch.get("params", {}) if patch else {})
        batch_stats = dict(state.batch_stats)
        batch_stats.update(patch.get("batch_stats", {}) if patch else {})
        mask = subtree_mask(params, tuple(frozen)) if frozen else None
        tx = make_adamw(learning_rate=1e-3, trainable_mask=mask)
        state = TrainState(
            step=0, params=params, batch_stats=batch_stats,
            opt_state=tx.init(params), apply_fn=model.apply, tx=tx,
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
    return out, res.state


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--experiments",
                   default="loss,weights,skips,resolution,prompt_freeze")
    p.add_argument("--images", type=int, default=128)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--base", type=int, default=32,
                   help="UNet base width (32 separates the configs at a "
                        "fraction of the base-64 cost)")
    p.add_argument("--out", default=None,
                   help="write all rows + per-experiment summaries to "
                        "this JSON file (the committed artifact)")
    p.add_argument("--clip-pre-epochs", type=int, default=None,
                   help="encoder-pretrain epochs (default 10x --epochs: "
                        "a conv-free ViT needs ~an order of magnitude "
                        "more steps than the UNet to leave the noise "
                        "regime on this task)")
    p.add_argument("--clip-epochs", type=int, default=None,
                   help="CLIP/prompt arm epochs (default 3x --epochs)")
    p.add_argument("--vit-hidden", type=int, default=128)
    p.add_argument("--vit-layers", type=int, default=6)
    args = p.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon TPU plugin registers itself ahead of env-var platform
        # selection (sitecustomize), so honoring a CPU request needs the
        # config override too — same dance as tests/conftest.py
        jax.config.update("jax_platforms", "cpu")
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
    # explicit None checks: `args.x or default` would silently turn an
    # intentional 0 back into the default; computed ONCE and reused by
    # the JSON config record below
    pre_epochs = (args.clip_pre_epochs if args.clip_pre_epochs is not None
                  else 10 * epochs) if on_accel else epochs
    clip_epochs = (args.clip_epochs if args.clip_epochs is not None
                   else 3 * epochs) if on_accel else epochs

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
                epochs, batch, ("loss", variant))[0])

    if "weights" in picked:
        for scheme in ("none", "min", "full"):
            results.append(_run(
                UNet(num_classes=NUM_CLASSES, base=base, dtype=dtype),
                train, val,
                DiceCELoss(class_weights=_weights(train, scheme)),
                epochs, batch, ("weights", scheme))[0])

    clip_trained = None  # (state of the trained skips ClipUNet, vit, chans)
    if "skips" in picked or "prompt_freeze" in picked:
        from image_segmentation_tpu.models.clip_unet import (
            ClipUNet,
            ClipUNetNoSkips,
        )
        from image_segmentation_tpu.models.clip_vit import ClipViTConfig

        # Smoke ViT at --smoke-vit's patch/size geometry (capacity via
        # --vit-hidden/--vit-layers) — but NOT random: a random frozen
        # encoder puts both variants in a noise regime (r2 measured
        # 0.067 vs 0.043 mIoU — a 2-point gap between two failing
        # models proves nothing). Stage 0 PRETRAINS the encoder with
        # two properties that make the frozen comparison honest:
        #   1. DECODER-AGNOSTIC supervision: a linear per-patch probe
        #      (1×1 conv on the final 14×14 bottleneck, bilinearly
        #      upsampled for the loss). An earlier cut co-trained a
        #      ClipUNetNoSkips as the pretext head and the comparison
        #      inverted — the encoder's final layer had been optimised
        #      FOR the noskips decoder, a structural bias. The probe
        #      shares no architecture with either arm, and supervision
        #      still enters only through the final layer (contrastive
        #      CLIP likewise never supervises intermediate blocks).
        #   2. DISTRIBUTION SHIFT: pretraining runs on a shifted
        #      distribution of the same family (larger, higher-contrast
        #      objects, calmer background), the ablation arms on the
        #      hard task — mirroring the CLIP pretrain→transfer gap
        #      that makes intermediate features worth tapping at all.
        size = 224 if on_accel else 64
        hid = args.vit_hidden if on_accel else 32
        # >=4 layers always: the skips arm taps hidden states 1..4
        vit = ClipViTConfig(image_size=size, patch_size=16, hidden_size=hid,
                            num_layers=args.vit_layers if on_accel else 4,
                            num_heads=4, mlp_dim=2 * hid)
        chans = tuple(max(8, 64 >> i) for i in range(5))
        t224 = _dataset(n, size, seed=0)
        v224 = _dataset(max(16, n // 4), size, seed=1, keep_orig=True)
        loss = DiceCELoss(class_weights=full_w)
        import flax.linen as nn

        from image_segmentation_tpu.models.clip_unet import tokens_to_grid
        from image_segmentation_tpu.models.clip_vit import ClipViT

        class _PatchProbe(nn.Module):
            """Linear per-patch readout on the ViT bottleneck."""
            vit_cfg: ClipViTConfig
            dtype: object

            @nn.compact
            def __call__(self, x, train: bool = False):
                g = self.vit_cfg.grid_size
                last, _ = ClipViT(self.vit_cfg, self.dtype,
                                  name="encoder")(x)
                grid = tokens_to_grid(last, g).astype(jnp.float32)
                logits = nn.Conv(NUM_CLASSES, (1, 1), name="probe")(grid)
                return jax.image.resize(
                    logits,
                    (x.shape[0], x.shape[1], x.shape[2], NUM_CLASSES),
                    method="bilinear",
                )

        shift = dict(obj_lo=6, obj_hi=3, contrast=(0.3, 0.5),
                     noise=0.05, bg=(0.5, 0.1))
        pre_t = _dataset(n, size, seed=50, items_kw=shift)
        pre_v = _dataset(max(16, n // 4), size, seed=51, keep_orig=True,
                         items_kw=shift)
        _, pre_state = _run(
            _PatchProbe(vit_cfg=vit, dtype=dtype),
            pre_t, pre_v, loss, pre_epochs, batch,
            ("skips", "encoder_pretrain(linear-probe,shifted)"))
        enc = {"params": {"encoder": pre_state.params["encoder"]}}

        for variant, model in (
            ("skips", ClipUNet(num_classes=NUM_CLASSES, vit=vit,
                               skip_indices=(1, 2, 3, 4),
                               decoder_channels=chans, dtype=dtype)),
            ("noskips", ClipUNetNoSkips(num_classes=NUM_CLASSES, vit=vit,
                                        decoder_channels=chans,
                                        dtype=dtype)),
        ):
            row, st = _run(
                model, t224, v224, loss,
                clip_epochs, batch, ("skips", variant),
                frozen=("encoder",), patch=enc)
            if "skips" in picked:
                results.append(row)
            if variant == "skips":
                clip_trained = (st, vit, chans, t224, v224)

    if "prompt_freeze" in picked:
        # Report PDF §4 Fig 8h: prompt model with the ClipUNet branch
        # FROZEN (reference prompt_based/prompt.py:30-31 default) vs
        # FINE-TUNED (webapp variant, segmentation_webapp/
        # prompt_model.py:101-102 — the report's winner). Both arms
        # start from the SAME trained ClipUNet (injected like run.py
        # --clipunet-checkpoint); the inner ViT stays frozen in both
        # (the reference never unfreezes it, clip/clipunet.py:28-30).
        from image_segmentation_tpu.data.dataset import ArrayDataset
        from image_segmentation_tpu.data.loader import materialize
        from image_segmentation_tpu.data.prompts import (
            generate_prompt_dataset,
        )
        from image_segmentation_tpu.losses import DiceNLLLoss
        from image_segmentation_tpu.models.prompt import PromptModel

        st, vit, chans, _, _ = clip_trained
        size = vit.image_size
        pt = materialize(
            generate_prompt_dataset(
                ArrayDataset(hard_synthetic_items(n, seed=0)), seed=0),
            size)
        pv = materialize(
            generate_prompt_dataset(
                ArrayDataset(hard_synthetic_items(max(16, n // 4), seed=1)),
                seed=1),
            size, keep_orig_labels=True)
        clip_patch = {
            "params": {"clip": st.params},
            "batch_stats": ({"clip": st.batch_stats}
                            if st.batch_stats else {}),
        }
        for variant, freeze in (("frozen", True), ("finetuned", False)):
            row, _ = _run(
                PromptModel(num_classes=NUM_CLASSES, freeze_clip=freeze,
                            vit=vit, skip_indices=(1, 2, 3, 4),
                            decoder_channels=chans,
                            unet_base=base if on_accel else 8, dtype=dtype),
                pt, pv, DiceNLLLoss(),
                clip_epochs, batch, ("prompt_freeze", variant),
                frozen=("clip",) if freeze else ("clip/encoder",),
                patch=clip_patch)
            results.append(row)

    if "resolution" in picked and on_accel:
        t512 = _dataset(n, 512, seed=0)
        v512 = _dataset(max(16, n // 4), 512, seed=1, keep_orig=True)
        results.append(_run(
            UNet(num_classes=NUM_CLASSES, base=base, dtype=dtype),
            t512, v512, DiceCELoss(class_weights=full_w),
            epochs, max(4, batch // 4), ("resolution", "512px"))[0])
        # the 256px weights/full run doubles as the 256px arm; rerun it
        # here when the weights experiment was not picked
        if "weights" not in picked:
            results.append(_run(
                UNet(num_classes=NUM_CLASSES, base=base, dtype=dtype),
                train, val, DiceCELoss(class_weights=full_w),
                epochs, batch, ("resolution", "256px"))[0])

    by_exp = {}
    for r in results:
        by_exp.setdefault(r["experiment"], []).append(r)
    summaries = []
    for exp, rs in by_exp.items():
        best = max(rs, key=lambda r: r["best_miou"])
        summaries.append({
            "summary": exp,
            "winner": best["variant"],
            "miou": {r["variant"]: r["best_miou"] for r in rs},
            "epoch_s": {r["variant"]: r["steady_epoch_s"] for r in rs},
        })
        print(json.dumps(summaries[-1]), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({
                "device": jax.devices()[0].device_kind,
                "config": {"images": n, "epochs": epochs, "batch": batch,
                           "base": base, "target": T,
                           "clip_pre_epochs": pre_epochs,
                           "clip_epochs": clip_epochs,
                           "vit_hidden": args.vit_hidden,
                           "vit_layers": args.vit_layers},
                "rows": results,
                "summaries": summaries,
            }, f, indent=1)
        print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, ".")
    main()
