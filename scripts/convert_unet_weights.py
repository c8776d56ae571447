"""Convert a reference-trained torch UNet checkpoint for this framework.

Accepts either artifact the reference writes (utils/training.py:564-609):
a full checkpoint {'model_state_dict': ..., 'optimizer_state_dict': ...}
or a weights-only MO_ state dict. Writes this framework's weights-only
artifact (params + BN running stats, Orbax) — drop it in a --models-dir
as MO_unet and `python -m image_segmentation_tpu.serve.app` serves it.

    python scripts/convert_unet_weights.py \
        --torch-checkpoint /path/MO_UNet_... --out runs/pet/MO_unet
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--torch-checkpoint", required=True,
                   help=".pth file: full reference checkpoint or bare "
                        "MO_ state dict")
    p.add_argument("--out", required=True,
                   help="output checkpoint directory (Orbax weights-only "
                        "artifact; name it MO_unet / MO_autoencoder for "
                        "the serving app)")
    p.add_argument("--arch", default="unet",
                   choices=["unet", "autoencoder", "clipunet", "prompt"],
                   help="source architecture: unet (reference "
                        "unet/unet.py), autoencoder (either stage of "
                        "autoencoder/autoencoder.py, auto-detected), "
                        "clipunet (clip/clipunet.py or the noskips "
                        "variant, auto-detected), prompt "
                        "(prompt_based/prompt.py)")
    args = p.parse_args(argv)

    import torch

    from image_segmentation_tpu.models import torch_import as TI
    from image_segmentation_tpu.train.checkpoint import save_params_only

    sd = torch.load(args.torch_checkpoint, map_location="cpu",
                    weights_only=False)
    convert = {
        "unet": TI.convert_torch_unet_state_dict,
        "autoencoder": TI.convert_torch_autoencoder_state_dict,
        "clipunet": TI.convert_torch_clipunet_state_dict,
        "prompt": TI.convert_torch_prompt_state_dict,
    }[args.arch]
    variables = convert(sd)
    save_params_only(args.out, variables["params"], variables["batch_stats"])
    import jax

    n = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"wrote {args.out}: {n / 1e6:.1f}M params + BN stats")


if __name__ == "__main__":
    main()
