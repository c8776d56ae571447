"""Frozen-encoder feature caching for ClipUNet training.

With `freeze_encoder=True` (the reference's default configuration,
clip/clipunet.py:28-30) the ViT features of each training image are
constant across epochs, so they can be computed ONCE and the training
step reduced to the decoder — the encoder's ~70% of the forward FLOPs
disappears from every step after the first pass (SURVEY.md §7
'Frozen-CLIP efficiency'; legitimate because the loss/optimizer
trajectory is bit-identical to running the frozen encoder in-line).

Applicability: incompatible with ONLINE image augmentation (the features
would change per epoch); the reference's augmentation is OFFLINE
materialisation, which composes fine — cache features of the augmented
set.

Packing: (N, 1 + num_skips, G, G, H) float arrays — bottleneck first,
skips in ascending layer order — consumed by
models.clip_unet.ClipUNetDecoderOnly, whose parameter tree matches
ClipUNet's decoder subtree verbatim.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from image_segmentation_tpu.models.clip_vit import (
    ClipViT,
    ClipViTConfig,
    tokens_to_grid,
)


def make_encoder_forward(
    vit: ClipViTConfig,
    skip_indices: Sequence[int],
    dtype=jnp.float32,
    use_pallas: bool = False,
):
    """Jitted (params, images) -> packed features (N, 1+S, G, G, H)."""
    model = ClipViT(vit, dtype, use_pallas)
    g = vit.grid_size
    idx = sorted(skip_indices)

    @jax.jit
    def forward(encoder_params, images):
        last, hidden = model.apply({"params": encoder_params}, images)
        feats = [tokens_to_grid(last, g)] + [
            tokens_to_grid(hidden[i], g) for i in idx
        ]
        return jnp.stack(feats, axis=1).astype(jnp.float32)

    return forward


def encode_clip_features(
    encoder_params,
    images: np.ndarray,
    vit: ClipViTConfig,
    skip_indices: Sequence[int] = (3, 5, 7, 9),
    batch_size: int = 32,
    dtype=jnp.float32,
    use_pallas: bool = False,
    verbose: bool = False,
) -> np.ndarray:
    """Materialise packed encoder features for a whole image array
    (N, H, W, 3) in fixed-size device batches (last batch padded)."""
    forward = make_encoder_forward(vit, skip_indices, dtype, use_pallas)
    n = images.shape[0]
    out = []
    for start in range(0, n, batch_size):
        idx = list(range(start, min(start + batch_size, n)))
        count = len(idx)
        while len(idx) < batch_size:
            idx.append(idx[-1])
        feats = np.asarray(
            forward(encoder_params, jnp.asarray(images[np.asarray(idx)]))
        )
        out.append(feats[:count])
        if verbose:
            print(f"  encoded {min(start + batch_size, n)}/{n}")
    if not out:  # empty split: shape-correct empty feature array
        probe = np.asarray(
            forward(encoder_params, jnp.asarray(np.zeros((1,) + images.shape[1:],
                                                         images.dtype)))
        )
        return np.zeros((0,) + probe.shape[1:], probe.dtype)
    return np.concatenate(out, axis=0)


def decoder_params_from_clipunet(params):
    """ClipUNet params -> ClipUNetDecoderOnly params (drop 'encoder')."""
    return {k: v for k, v in params.items() if k != "encoder"}


def clipunet_params_from_decoder(decoder_params, encoder_params):
    """Merge decoder-only params back with encoder params → full ClipUNet."""
    out = dict(decoder_params)
    out["encoder"] = encoder_params
    return out
