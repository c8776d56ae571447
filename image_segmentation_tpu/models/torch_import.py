"""Import trained reference checkpoints (torch state dicts) into this
framework.

Migration path for users of the reference repo: a UNet trained with
reference unet/unet.py (state-dict keys `down1.doubleConvReLU.0.weight`,
`down2.maxpool_doubleConv.1...`, `up1.upsample...`, `output...` —
layout defined at reference unet/unet.py:67-105) converts into
models/unet.py's flax variables ({'params', 'batch_stats'}) and produces
bit-identical eval-mode predictions (tests/test_torch_import.py pins the
forward against a functional torch oracle).

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
