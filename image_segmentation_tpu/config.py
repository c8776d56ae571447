"""Typed experiment configs — one per BASELINE.json entry.

The reference configures experiments via module-level constants in each
notebook's cell 0 (SURVEY.md §5.6: `NUM_CLASSES=4, EVAL_IGNORE_INDEX=3,
TARGET_SIZE=256`, hardcoded FullWeight class weights, AdamW lr 1e-3
wd 0.01, accumulation = 64 // batch_size). Here each experiment is a
frozen dataclass with CLI-overridable fields; `build()` returns the
(model, loss, optimizer, sizes) bundle the training loop consumes.

The five canonical configs (BASELINE.json "configs"):
  unet_noaug     — UNet, no augmentation (CPU-runnable slice)
  autoencoder    — recon pretrain → frozen-encoder segmentation
  unet_aug       — UNet + full augmentation + weighted CE+Dice
  clipunet       — frozen CLIP ViT + U-Net decoder (skips / noskips)
  prompt         — prompt-based interactive segmentation
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# FullWeight inverse-frequency class weights from the reference notebooks
# (unet.ipynb cell 0; computed over the Pet train labels with C8).
FULL_WEIGHTS = (0.2047, 1.0272, 1.2293, 1.5388)

NUM_CLASSES = 4
EVAL_IGNORE_INDEX = 3


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    name: str
    model: str  # unet | autoencoder | clipunet | clipunet_noskips | prompt
    target_size: int = 256
    num_classes: int = NUM_CLASSES
    eval_ignore_index: Optional[int] = EVAL_IGNORE_INDEX
    train_ignore_index: Optional[int] = None  # boundary IS trained on
    class_weights: Optional[Tuple[float, ...]] = FULL_WEIGHTS
    dice_weight: float = 1.0
    ce_weight: float = 1.0
    # reference TRAIN losses use smooth_dice=1 (notebooks cell 0); the val
    # losses keep the 1e-5 default — run.py builds those separately
    smooth_dice: float = 1.0
    learning_rate: float = 1e-3
    weight_decay: float = 0.01
    # the reference plumbs an optional torch scheduler through train_loop
    # and checkpoints its state but every notebook passes scheduler=None
    # (reference utils/training.py:54-55, unet.ipynb "scheduler = None");
    # here the same optionality is an optax schedule: None/"constant", or
    # "cosine" (linear warmup over warmup_steps, cosine decay to 0 across
    # the run). Resume restores the step count with the optimizer state.
    lr_schedule: Optional[str] = None
    warmup_steps: int = 0
    epochs: int = 100
    batch_size: int = 8
    effective_batch: int = 64  # accumulation = effective // batch
    augment: bool = False
    augment_online: bool = True  # online device aug instead of offline
    freeze_encoder: bool = True
    use_pallas_attention: bool = True  # TPU path; ignored on CPU-only runs
    dtype: str = "bfloat16"
    seed: int = 0

    @property
    def accum_steps(self) -> int:
        return max(1, self.effective_batch // self.batch_size)


UNET_NOAUG = ExperimentConfig(
    name="unet_noaug", model="unet", target_size=256, augment=False
)
UNET_AUG = ExperimentConfig(
    name="unet_aug", model="unet", target_size=256, augment=True
)
RECON_AE = ExperimentConfig(
    name="recon_ae", model="recon", target_size=256,
    class_weights=None,  # stage 1: plain MSE reconstruction
)
AUTOENCODER = ExperimentConfig(
    name="autoencoder", model="autoencoder", target_size=256,
    freeze_encoder=True,
)
CLIPUNET = ExperimentConfig(
    name="clipunet", model="clipunet", target_size=224
)
CLIPUNET_NOSKIPS = ExperimentConfig(
    name="clipunet_noskips", model="clipunet_noskips", target_size=224
)
PROMPT = ExperimentConfig(
    name="prompt", model="prompt", target_size=224, freeze_encoder=False,
    # the reference prompt run's final class_weight is uniform [1,1,1,1]
    # (prompt.ipynb cell 0 — the pet-class FULL_WEIGHTS make no sense in
    # the prompt label space {deactivated, bg+boundary, cat, dog})
    class_weights=None,
)

CONFIGS = {
    c.name: c
    for c in (
        UNET_NOAUG, UNET_AUG, RECON_AE, AUTOENCODER, CLIPUNET,
        CLIPUNET_NOSKIPS, PROMPT,
    )
}


def build_model(cfg: ExperimentConfig, on_tpu: bool = True):
    """Instantiate the model for a config."""
    import jax.numpy as jnp

    from image_segmentation_tpu.models import (
        SegmentationAutoencoder,
        UNet,
    )
    from image_segmentation_tpu.models.clip_unet import ClipUNet, ClipUNetNoSkips
    from image_segmentation_tpu.models.prompt import PromptModel

    dtype = jnp.bfloat16 if (cfg.dtype == "bfloat16" and on_tpu) else jnp.float32
    pallas = cfg.use_pallas_attention and on_tpu
    if cfg.model == "recon":
        from image_segmentation_tpu.models import ReconstructionAutoencoder

        return ReconstructionAutoencoder(dtype=dtype)
    if cfg.model == "unet":
        return UNet(num_classes=cfg.num_classes, dtype=dtype)
    if cfg.model == "autoencoder":
        return SegmentationAutoencoder(num_classes=cfg.num_classes, dtype=dtype)
    if cfg.model == "clipunet":
        return ClipUNet(
            num_classes=cfg.num_classes,
            freeze_encoder=cfg.freeze_encoder,
            dtype=dtype,
            use_pallas_attention=pallas,
        )
    if cfg.model == "clipunet_noskips":
        return ClipUNetNoSkips(
            num_classes=cfg.num_classes,
            freeze_encoder=cfg.freeze_encoder,
            dtype=dtype,
            use_pallas_attention=pallas,
        )
    if cfg.model == "prompt":
        return PromptModel(
            num_classes=cfg.num_classes,
            freeze_clip=cfg.freeze_encoder, dtype=dtype,
            use_pallas_attention=pallas,
        )
    raise ValueError(f"unknown model {cfg.model!r}")


def build_loss(cfg: ExperimentConfig):
    from image_segmentation_tpu.losses import make_dice_ce_loss, make_dice_nll_loss

    if cfg.model == "prompt":
        # the reference uses Dice+NLL on probabilities (train
        # ignore_index=None — everything trains, prompt.ipynb cell 0)
        return make_dice_nll_loss(
            dice_weight=cfg.dice_weight,
            nll_weight=cfg.ce_weight,
            class_weights=cfg.class_weights,
            ignore_index=cfg.train_ignore_index,
            smooth_dice=cfg.smooth_dice,
        )
    return make_dice_ce_loss(
        dice_weight=cfg.dice_weight,
        ce_weight=cfg.ce_weight,
        class_weights=cfg.class_weights,
        ignore_index=cfg.train_ignore_index,
        smooth_dice=cfg.smooth_dice,
    )


def build_optimizer(
    cfg: ExperimentConfig, trainable_mask=None, total_steps: int = 0
):
    from image_segmentation_tpu.train.state import make_adamw

    return make_adamw(
        learning_rate=cfg.learning_rate,
        weight_decay=cfg.weight_decay,
        schedule=build_lr_schedule(cfg, total_steps),
        trainable_mask=trainable_mask,
    )


def build_lr_schedule(cfg: ExperimentConfig, total_steps: int):
    """optax schedule for cfg.lr_schedule, or None for constant LR.
    `total_steps` is the decay horizon in OPTIMIZER steps (i.e. after
    gradient accumulation)."""
    if cfg.lr_schedule in (None, "constant"):
        return None
    import optax

    if cfg.lr_schedule == "cosine":
        if total_steps <= 0:
            raise ValueError("cosine schedule needs total_steps > 0")
        # the cosine leg is (total - warmup) steps and must be non-empty;
        # short smoke runs can ask for more warmup than the whole run
        warmup = min(cfg.warmup_steps, max(0, total_steps - 1))
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warmup else cfg.learning_rate,
            peak_value=cfg.learning_rate,
            warmup_steps=warmup,
            decay_steps=total_steps,
        )
    raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")


def override(cfg: ExperimentConfig, **kw) -> ExperimentConfig:
    """CLI-style field overrides."""
    return dataclasses.replace(cfg, **kw)
