"""Checkpoint / resume — the reference's most developed subsystem
(SURVEY.md §5.4), rebuilt on Orbax.

Contract being reproduced (reference utils/training.py:453-618):
  * full checkpoint: step/epoch + model params + batch stats + optimizer
    state + best-metric scalars + metrics history + free-form notes;
  * a weights-only copy ("MO_{name}", utils/training.py:585-589) for
    deployment;
  * per-epoch metrics-history file;
  * selection criterion: best validation mIoU (utils/training.py:564);
  * graceful resume: missing pieces fall back without crashing
    (utils/training.py:513-533);
  * cross-model weight surgery: load an encoder subtree by key prefix
    (autoencoder/autoencoder.py:229-241), inject a full ClipUNet
    checkpoint into the prompt model's clip branch
    (prompt_based/prompt.py:20-27) — `load_subtree` covers both.

Orbax handles the array storage (async-capable, TPU-host friendly);
metadata/history ride along as a msgpack blob.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import flax
import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str,
    state,
    *,
    epoch: int,
    best: Optional[Dict[str, float]] = None,
    history: Optional[Dict[str, Any]] = None,
    notes: str = "",
) -> None:
    """Write a full checkpoint directory at `path` (overwrites)."""
    path = os.path.abspath(path)
    # to_state_dict flattens optax NamedTuple states into plain dicts so the
    # restore side can rebuild them onto a live-state template.
    payload = flax.serialization.to_state_dict(
        {
            "params": _to_host(state.params),
            "batch_stats": _to_host(state.batch_stats),
            "opt_state": _to_host(state.opt_state),
            "step": int(state.step),
        }
    )
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    meta = {
        "epoch": int(epoch),
        "best": dict(best or {}),
        "history": history or {},
        "notes": notes,
    }
    with open(os.path.join(path, "meta.msgpack"), "wb") as f:
        f.write(flax.serialization.msgpack_serialize(meta))


def save_params_only(path: str, params) -> None:
    """Weights-only copy — the reference's MO_{name} artifact."""
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), {"params": _to_host(params)}, force=True)


def load_params_only(path: str):
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path))["params"]


def restore_checkpoint(path: str, state):
    """Restore a full checkpoint into `state`. Returns (state, meta dict).

    Mirrors the reference's tolerant resume: missing meta / pieces degrade
    gracefully (utils/training.py:513-533)."""
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        raw = ckptr.restore(path)
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": 0,
    }
    payload = flax.serialization.from_state_dict(template, raw)
    state = state.replace(
        params=payload["params"],
        batch_stats=payload.get("batch_stats", state.batch_stats),
        opt_state=payload.get("opt_state", state.opt_state),
        step=int(payload.get("step", 0)),
    )
    meta_path = os.path.join(path, "meta.msgpack")
    meta = {"epoch": 0, "best": {}, "history": {}, "notes": ""}
    if os.path.exists(meta_path):
        try:
            with open(meta_path, "rb") as f:
                meta.update(flax.serialization.msgpack_restore(f.read()))
        except Exception as e:  # tolerate corrupt meta, keep the weights
            print(f"Warning: could not read checkpoint meta ({e}); "
                  "resuming with fresh history.")
    return state, meta


def load_subtree(
    checkpoint_path: str,
    params,
    *,
    src_prefix: str = "",
    dst_prefix: str = "",
    params_key: str = "params",
) -> Any:
    """Graft a parameter subtree from a checkpoint into `params`.

    src_prefix/dst_prefix are '/'-joined key paths; '' means the whole
    tree. Examples:
      * AE encoder transfer: src_prefix='encoder', dst_prefix='encoder'
        (reference autoencoder/autoencoder.py:229-241 key-prefix strip);
      * ClipUNet → PromptModel: src_prefix='', dst_prefix='clip'
        (reference prompt_based/prompt.py:20-27).
    Shapes must match; raises KeyError/ValueError on mismatch like the
    reference's strict load.
    """
    with ocp.PyTreeCheckpointer() as ckptr:
        payload = ckptr.restore(os.path.abspath(checkpoint_path))
    src = payload[params_key] if params_key in payload else payload
    flat_src = flax.traverse_util.flatten_dict(src, sep="/")
    flat_dst = dict(flax.traverse_util.flatten_dict(params, sep="/"))

    sp = src_prefix.rstrip("/")
    dp = dst_prefix.rstrip("/")
    grafted = 0
    for k, v in flat_src.items():
        if sp and not (k == sp or k.startswith(sp + "/")):
            continue
        suffix = k[len(sp) :].lstrip("/") if sp else k
        dk = (dp + "/" + suffix).strip("/") if dp else suffix
        if dk not in flat_dst:
            raise KeyError(f"checkpoint key {k!r} has no destination {dk!r}")
        if tuple(np.shape(v)) != tuple(np.shape(flat_dst[dk])):
            raise ValueError(
                f"shape mismatch grafting {k!r}->{dk!r}: "
                f"{np.shape(v)} vs {np.shape(flat_dst[dk])}"
            )
        flat_dst[dk] = v
        grafted += 1
    if grafted == 0:
        raise KeyError(
            f"no keys under src_prefix={src_prefix!r} in {checkpoint_path}"
        )
    return flax.traverse_util.unflatten_dict(flat_dst, sep="/")
