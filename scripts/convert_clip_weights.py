"""Offline CLIP ViT weight conversion: HF torch checkpoint → .npz.

One-time step (the training environment has no network access —
SURVEY.md §7 "HF checkpoint conversion"). Run it wherever the HF cache
or a downloaded checkpoint exists, then ship the .npz:

  python scripts/convert_clip_weights.py \
      --model openai/clip-vit-base-patch16 --out clip_vit_b16.npz

Training then uses:  --clip-weights clip_vit_b16.npz
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="openai/clip-vit-base-patch16")
    p.add_argument("--out", required=True)
    p.add_argument("--local-only", action="store_true", default=True)
    args = p.parse_args()

    from transformers import CLIPVisionModel

    import flax

    from image_segmentation_tpu.models.clip_vit import (
        convert_hf_vision_state_dict,
    )

    model = CLIPVisionModel.from_pretrained(
        args.model, local_files_only=args.local_only
    )
    params = convert_hf_vision_state_dict(model.state_dict())
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    np.savez(args.out, **{k: np.asarray(v) for k, v in flat.items()})
    print(f"wrote {args.out}: {len(flat)} arrays, "
          f"{sum(v.size for v in flat.values())/1e6:.1f}M params")


if __name__ == "__main__":
    main()
