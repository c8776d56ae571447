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
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)


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
