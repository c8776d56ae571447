"""Prompt-based interactive segmentation model
(reference prompt_based/prompt.py:6-56).

Composite of two branches:
  * a ClipUNet whose softmax gives 4-class probabilities (frozen by
    default; the fine-tuning variant — which the report found better —
    trains its DECODER while the inner ViT stays frozen, reference
    segmentation_webapp/prompt_model.py:101-102 + clip/clipunet.py:28-30);
  * a "selection network" U-Net over concat(image, heatmap) (4→1
    channels) whose sigmoid gives a point-selection mask.

Output is a 4-channel PROBABILITY map (not logits):
  ch0 'deactivated' = 1 − mask
  ch1 bg            = mask·p(bg) + mask·p(boundary)  (boundary folded in)
  ch2 cat           = mask·p(cat)
  ch3 dog           = mask·p(dog)

Probability algebra runs in float32 regardless of branch dtype — the
downstream log(x+1e-9) NLL is bf16-hostile (SURVEY.md §7).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_segmentation_tpu.models.clip_unet import ClipUNet
from image_segmentation_tpu.models.clip_vit import ClipViTConfig
from image_segmentation_tpu.models.unet import UNet


class PromptModel(nn.Module):
    num_classes: int = 4
    freeze_clip: bool = True
    vit: ClipViTConfig = ClipViTConfig()
    skip_indices: tuple = (3, 5, 7, 9)
    decoder_channels: tuple = (1024, 512, 256, 128, 64)
    unet_base: int = 64
    dtype: Any = jnp.float32
    use_pallas_attention: bool = False

    @nn.compact
    def __call__(self, x, heatmap, train: bool = False):
        # freeze_clip=True: the whole branch is frozen (stop_gradient
        # below). freeze_clip=False is the reference's "fine-tuned"
        # variant (segmentation_webapp/prompt_model.py:101-102, the
        # branch-level requires_grad freeze commented out): the ClipUNet
        # DECODER trains, but the inner ViT stays frozen either way —
        # the reference's ClipViTEncoder freezes itself by default
        # (clip/clipunet.py:28-30) and no reference code ever unfreezes
        # it. The clip branch runs with the caller's `train` flag in both
        # variants: torch's frozen module still runs BatchNorm in
        # batch-stats mode and updates running stats during training
        # (requires_grad only stops parameter gradients).
        clip_logits = ClipUNet(
            num_classes=self.num_classes,
            decoder_channels=self.decoder_channels,
            skip_indices=self.skip_indices,
            freeze_encoder=True,
            vit=self.vit,
            dtype=self.dtype,
            use_pallas_attention=self.use_pallas_attention,
            name="clip",
        )(x, train=train)
        if self.freeze_clip:
            clip_logits = jax.lax.stop_gradient(clip_logits)
        clip_prob = nn.softmax(clip_logits.astype(jnp.float32), axis=-1)

        mask_logit = UNet(
            num_classes=1, base=self.unet_base, dtype=self.dtype, name="mask"
        )(jnp.concatenate([x, heatmap], axis=-1), train=train)
        mask_prob = nn.sigmoid(mask_logit.astype(jnp.float32))  # (N,H,W,1)

        selected = mask_prob * clip_prob  # (N,H,W,4)
        final = jnp.concatenate(
            [
                1.0 - mask_prob,                       # ch0 deactivated
                selected[..., 0:1] + selected[..., 3:4],  # ch1 bg + boundary
                selected[..., 1:3],                    # ch2 cat, ch3 dog
            ],
            axis=-1,
        )
        return final
