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


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="openai/clip-vit-base-patch16")
    p.add_argument("--out", required=True)
    p.add_argument("--local-only", action="store_true", default=True)
    p.add_argument("--torch-state-dict", default=None,
                   help="convert a torch-saved HF vision state dict file "
                        "instead of from_pretrained (no HF cache needed)")
    p.add_argument("--safetensors", default=None,
                   help="convert an HF .safetensors checkpoint (e.g. the "
                        "model.safetensors of openai/clip-vit-base-patch16) "
                        "— pure numpy parse, needs NEITHER torch nor the "
                        "safetensors package on the host")
    p.add_argument("--from-config", action="store_true",
                   help="build the model locally from CLIPVisionConfig "
                        "(random init) — exercises the full conversion "
                        "pipeline without any downloaded checkpoint")
    p.add_argument("--config-json", default=None,
                   help="JSON dict of CLIPVisionConfig overrides for "
                        "--from-config (e.g. a small ViT matching "
                        "run.py --smoke-vit geometry)")
    args = p.parse_args(argv)

    import flax

    from image_segmentation_tpu.models.clip_vit import (
        convert_hf_vision_state_dict,
    )

    if args.safetensors:
        from image_segmentation_tpu.utils.safetensors_io import (
            read_safetensors,
        )

        # keep only the vision tower (the full CLIP checkpoint also
        # carries the text tower + projections, which the ClipUNet
        # encoder never consumes — reference clip/clipunet.py:7-65)
        state_dict = read_safetensors(args.safetensors,
                                      prefix="vision_model.")
        if not state_dict:
            sys.exit(f"{args.safetensors}: no 'vision_model.*' tensors — "
                     "not an HF CLIP vision checkpoint?")
    elif args.torch_state_dict:
        import torch

        state_dict = torch.load(args.torch_state_dict, map_location="cpu",
                                weights_only=True)
    elif args.from_config:
        # ViT-B/16 geometry from local config defaults — no network.
        import json

        from transformers import CLIPVisionConfig, CLIPVisionModel

        overrides = json.loads(args.config_json) if args.config_json else {}
        model = CLIPVisionModel(CLIPVisionConfig(patch_size=16, **overrides))
        state_dict = model.state_dict()
    else:
        from transformers import CLIPVisionModel

        model = CLIPVisionModel.from_pretrained(
            args.model, local_files_only=args.local_only
        )
        state_dict = model.state_dict()
    params = convert_hf_vision_state_dict(state_dict)
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    np.savez(args.out, **{k: np.asarray(v) for k, v in flat.items()})
    print(f"wrote {args.out}: {len(flat)} arrays, "
          f"{sum(v.size for v in flat.values())/1e6:.1f}M params")


if __name__ == "__main__":
    main()
