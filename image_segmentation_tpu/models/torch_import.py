"""Import trained reference checkpoints (torch state dicts) into this
framework.

Migration path for users of the reference repo: models trained with
reference unet/unet.py (state-dict keys `down1.doubleConvReLU.0.weight`,
`down2.maxpool_doubleConv.1...`, `up1.upsample...`, `output...` —
layout defined at reference unet/unet.py:67-105) or with either stage of
reference autoencoder/autoencoder.py (Reconstruction / Segmentation
autoencoder, auto-detected from the key layout) convert into this
package's flax variables ({'params', 'batch_stats'}) and produce
matching eval-mode predictions (tests/test_torch_import.py pins every
forward against functional torch oracles).

Transforms:
- Conv2d weight (O, I, kH, kW)         -> flax kernel (kH, kW, I, O)
- ConvTranspose2d weight (I, O, kH, kW)-> spatial FLIP then transpose to
  flax kernel (kH, kW, I, O): torch's transposed conv is the conv
  gradient (correlation transpose), while flax's ConvTranspose is a
  fractionally-strided convolution of the kernel as stored — the flip
  reconciles them (verified numerically against F.conv_transpose2d)
- BatchNorm weight/bias                -> scale/bias (params)
  running_mean/var                     -> mean/var  (batch_stats)

The reference saves full checkpoints as {'model_state_dict': ...}
(reference utils/training.py:564-609) and weights-only `MO_` copies as
the bare state dict; both are accepted.
"""
from __future__ import annotations

import numpy as np


def _np(v):
    # Always copy: torch's .numpy() is a view of the tensor's storage, and
    # the JAX CPU backend zero-copies aligned numpy arrays — without the
    # copy, a converted tree aliases the live torch model and later
    # in-place torch updates (opt.step()) silently mutate the JAX params.
    return np.array(v.detach().cpu().numpy() if hasattr(v, "detach") else v)


def _conv(sd, prefix):
    return {
        "kernel": _np(sd[prefix + ".weight"]).transpose(2, 3, 1, 0),
        "bias": _np(sd[prefix + ".bias"]),
    }


def _conv_transpose(sd, prefix):
    w = _np(sd[prefix + ".weight"])[:, :, ::-1, ::-1]
    return {
        "kernel": np.ascontiguousarray(w.transpose(2, 3, 0, 1)),
        "bias": _np(sd[prefix + ".bias"]),
    }


def _bn(sd, prefix):
    params = {
        "scale": _np(sd[prefix + ".weight"]),
        "bias": _np(sd[prefix + ".bias"]),
    }
    stats = {
        "mean": _np(sd[prefix + ".running_mean"]),
        "var": _np(sd[prefix + ".running_var"]),
    }
    return params, stats


def _double_conv(sd, prefix):
    """reference DoubleConvReLU: Sequential(Conv, BN, ReLU, Conv, BN, ReLU)
    (unet/unet.py:4-25) -> DoubleConv_0/ConvBNRelu_{0,1}."""
    params, stats = {}, {}
    for i, seq_conv, seq_bn in ((0, 0, 1), (1, 3, 4)):
        bn_p, bn_s = _bn(sd, f"{prefix}.{seq_bn}")
        params[f"ConvBNRelu_{i}"] = {
            "Conv_0": _conv(sd, f"{prefix}.{seq_conv}"),
            "BatchNorm_0": bn_p,
        }
        stats[f"ConvBNRelu_{i}"] = {"BatchNorm_0": bn_s}
    return params, stats


def _conv_nobias(sd, prefix):
    return {"kernel": _np(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)}


def _encoder_block(sd, prefix):
    """reference EncoderBlock: conv1/bn1/conv2/bn2, bias-free convs
    (autoencoder/autoencoder.py:6-33) -> EncoderBlock_i/ConvBNRelu_{0,1}."""
    params, stats = {}, {}
    for i, c, n in ((0, "conv1", "bn1"), (1, "conv2", "bn2")):
        bn_p, bn_s = _bn(sd, f"{prefix}.{n}")
        params[f"ConvBNRelu_{i}"] = {
            "Conv_0": _conv_nobias(sd, f"{prefix}.{c}"),
            "BatchNorm_0": bn_p,
        }
        stats[f"ConvBNRelu_{i}"] = {"BatchNorm_0": bn_s}
    return params, stats


def _decoder_block(sd, prefix):
    """reference DecoderBlock{With,No}Skips: up (ConvTranspose2d) +
    convs Sequential(Conv, BN, ReLU, Conv, BN, ReLU), bias-free convs
    (autoencoder/autoencoder.py:57-146)."""
    params, stats = {
        "UpConv_0": {"ConvTranspose_0": _conv_transpose(sd, f"{prefix}.up")}
    }, {}
    for i, seq_conv, seq_bn in ((0, 0, 1), (1, 3, 4)):
        bn_p, bn_s = _bn(sd, f"{prefix}.convs.{seq_bn}")
        params[f"ConvBNRelu_{i}"] = {
            "Conv_0": _conv_nobias(sd, f"{prefix}.convs.{seq_conv}"),
            "BatchNorm_0": bn_p,
        }
        stats[f"ConvBNRelu_{i}"] = {"BatchNorm_0": bn_s}
    return params, stats


def convert_torch_autoencoder_state_dict(state_dict) -> dict:
    """Reference torch autoencoder (either stage) -> flax variables.

    Detects the stage from the state dict itself:
    - SegmentationAutoencoder (autoencoder/autoencoder.py:271-305):
      keys `encoder.encoder.encoderPartK...` (the SegmentationEncoder
      wrapper adds a level), `decoder.decoderBlockK...`, `finalConv.*`
      -> models/autoencoder.py SegmentationAutoencoder.
    - ReconstructionAutoencoder (:171-200): keys `encoder.encoderPartK...`,
      `decoder.decoderBlockK...`, `decoderOut.0.*`
      -> ReconstructionAutoencoder.
    """
    sd = state_dict.get("model_state_dict", state_dict)
    seg = any(k.startswith("encoder.encoder.") for k in sd)
    enc_prefix = "encoder.encoder" if seg else "encoder"
    block = "DecoderBlockWithSkips" if seg else "DecoderBlockNoSkips"

    params, stats = {"encoder": {}}, {"encoder": {}}
    for k in range(1, 4):
        p, s = _encoder_block(sd, f"{enc_prefix}.encoderPart{k}")
        params["encoder"][f"EncoderBlock_{k - 1}"] = p
        stats["encoder"][f"EncoderBlock_{k - 1}"] = s
    for k in range(1, 4):
        p, s = _decoder_block(sd, f"decoder.decoderBlock{k}")
        params[f"{block}_{k - 1}"] = p
        stats[f"{block}_{k - 1}"] = s
    head = "finalConv" if seg else "decoderOut.0"
    params["Conv_0"] = _conv(sd, head)
    return {"params": params, "batch_stats": stats}


def convert_torch_clipunet_state_dict(state_dict) -> dict:
    """Reference torch ClipUNet / ClipUNetNoSkips -> flax variables for
    models/clip_unet.py (variant auto-detected: the skips decoder has
    `skip_conv` keys, clip/clipunet.py:85 vs clipunet_noskips.py:66).

    The HF CLIP vision tower inside (`encoder.clip_vit.vision_model...`,
    clip/clipunet.py:26) converts through the existing
    convert_hf_vision_state_dict; decoder: init_conv (1x1), per block
    upsample -> UpConv_0/ConvTranspose_0, skip_conv -> skip_proj (1x1),
    conv_block.{0,1,3,4} (bias-free) -> ConvBNRelu_{0,1}; output_layer ->
    head."""
    from image_segmentation_tpu.models.clip_vit import (
        convert_hf_vision_state_dict,
    )

    sd = state_dict.get("model_state_dict", state_dict)
    enc_sd = {
        k[len("encoder.clip_vit."):]: v
        for k, v in sd.items()
        if k.startswith("encoder.clip_vit.")
    }
    params = {"encoder": convert_hf_vision_state_dict(enc_sd)}
    stats = {}

    params["init_conv"] = _conv(sd, "decoder.init_conv")
    n_blocks = 1 + max(
        int(k.split(".")[2])
        for k in sd
        if k.startswith("decoder.decoder_blocks.")
    )
    for i in range(n_blocks):
        p = f"decoder.decoder_blocks.{i}"
        block = {
            "UpConv_0": {"ConvTranspose_0": _conv_transpose(sd, p + ".upsample")}
        }
        if p + ".skip_conv.weight" in sd:
            block["skip_proj"] = _conv(sd, p + ".skip_conv")
        bstats = {}
        for j, seq_conv, seq_bn in ((0, 0, 1), (1, 3, 4)):
            bn_p, bn_s = _bn(sd, f"{p}.conv_block.{seq_bn}")
            block[f"ConvBNRelu_{j}"] = {
                "Conv_0": _conv_nobias(sd, f"{p}.conv_block.{seq_conv}"),
                "BatchNorm_0": bn_p,
            }
            bstats[f"ConvBNRelu_{j}"] = {"BatchNorm_0": bn_s}
        params[f"dec_{i}"] = block
        stats[f"dec_{i}"] = bstats
    params["head"] = _conv(sd, "output_layer")
    return {"params": params, "batch_stats": stats}


def convert_torch_prompt_state_dict(state_dict) -> dict:
    """Reference torch PromptModel -> flax variables for models/prompt.py:
    `clip.*` is a full ClipUNet, `mask.*` a 4-in/1-out UNet
    (reference prompt_based/prompt.py:15-16)."""
    sd = state_dict.get("model_state_dict", state_dict)
    clip = convert_torch_clipunet_state_dict(
        {k[len("clip."):]: v for k, v in sd.items() if k.startswith("clip.")}
    )
    mask = convert_torch_unet_state_dict(
        {k[len("mask."):]: v for k, v in sd.items() if k.startswith("mask.")}
    )
    return {
        "params": {"clip": clip["params"], "mask": mask["params"]},
        "batch_stats": {
            "clip": clip["batch_stats"],
            "mask": mask["batch_stats"],
        },
    }


def convert_torch_unet_state_dict(state_dict) -> dict:
    """Reference torch UNet state dict -> {'params', 'batch_stats'} for
    models/unet.py UNet (any `base`; the reference trains base=64)."""
    sd = state_dict.get("model_state_dict", state_dict)
    params, stats = {}, {}

    p, s = _double_conv(sd, "down1.doubleConvReLU")
    params["DoubleConv_0"], stats["DoubleConv_0"] = {**p}, {**s}

    for k in range(2, 6):  # down2..down5 -> Down_0..Down_3
        p, s = _double_conv(sd, f"down{k}.maxpool_doubleConv.1.doubleConvReLU")
        params[f"Down_{k - 2}"] = {"DoubleConv_0": p}
        stats[f"Down_{k - 2}"] = {"DoubleConv_0": s}

    for k in range(1, 5):  # up1..up4 -> Up_0..Up_3
        p, s = _double_conv(sd, f"up{k}.doubleConv.doubleConvReLU")
        params[f"Up_{k - 1}"] = {
            "UpConv_0": {
                "ConvTranspose_0": _conv_transpose(sd, f"up{k}.upsample")
            },
            "DoubleConv_0": p,
        }
        stats[f"Up_{k - 1}"] = {"DoubleConv_0": s}

    params["Conv_0"] = _conv(sd, "output")
    return {"params": params, "batch_stats": stats}
