"""Tensor-parallel sharding rules for the CLIP ViT encoder.

Megatron-style TP expressed purely as sharding annotations (the GSPMD
way — no collectives in user code): the attention q/k/v projections and
the MLP fc1 split their OUTPUT features across the 'model' axis (heads /
hidden shards stay device-local), while out_proj and fc2 split their
INPUT features, so XLA inserts exactly one all-reduce per attention and
per MLP block over ICI. Everything else (layernorms, embeddings, the
conv decoder) replicates.

At the reference's model sizes (ViT-B/16, 86M frozen) pure data
parallelism is the right default (SURVEY.md §2.3); the TP rules exist
for scale-out (e.g. serving many streams on one slice with big batch,
or larger ViTs) and are exercised by __graft_entry__.dryrun_multichip
on a (data × model) mesh.
"""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from image_segmentation_tpu.parallel.mesh import MODEL_AXIS

import flax


def clip_tp_spec(path: str) -> P:
    """PartitionSpec for one ViT parameter, by '/'-joined path suffix."""
    parts = path.split("/")
    name = parts[-1]
    parent = parts[-2] if len(parts) >= 2 else ""
    if parent in ("q_proj", "k_proj", "v_proj", "fc1"):
        return P(None, MODEL_AXIS) if name == "kernel" else P(MODEL_AXIS)
    if parent in ("out_proj", "fc2"):
        return P(MODEL_AXIS, None) if name == "kernel" else P()
    return P()


def shard_params_tp(
    params,
    mesh: Mesh,
    encoder_prefix: Optional[str] = "encoder",
):
    """device_put a params pytree with TP sharding on the ViT subtree
    (everything under `encoder_prefix`) and replication elsewhere.

    The ViT hidden/mlp dims must be divisible by the 'model' axis size.
    """
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    out = {}
    for k, v in flat.items():
        in_encoder = encoder_prefix is None or k.startswith(
            encoder_prefix + "/"
        ) or ("/" + encoder_prefix + "/") in ("/" + k)
        spec = clip_tp_spec(k) if in_encoder else P()
        # skip sharding specs that don't divide the dim evenly
        axis = mesh.shape[MODEL_AXIS]
        ok = True
        for dim, name in zip(getattr(v, "shape", ()), spec):
            if name == MODEL_AXIS and dim % axis != 0:
                ok = False
        if not ok:
            spec = P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return flax.traverse_util.unflatten_dict(out, sep="/")
