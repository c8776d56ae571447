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
    (prompt_based/prompt.py:20-27) — `load_subtree_variables` covers
    both, grafting params AND BatchNorm running stats the way torch's
    load_state_dict does (`load_subtree` is the params-only primitive).

Orbax handles the array storage (async-capable, TPU-host friendly);
metadata/history ride along as a msgpack blob.
"""
from __future__ import annotations

import os
import threading
from typing import Any, Dict, Optional

import flax
import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


# ---------------------------------------------------------------------------
# Async save machinery: WRITE-BEHIND with latest-wins slots.
#
# The expensive half of a save is the device→host fetch of the whole
# TrainState (hundreds of MB; over a slow device link it can dwarf the
# epoch itself — measured ~20 s of fetch vs 1.1 s of compute per epoch
# on the v5e tunnel). fit() donates the state each epoch, so the async
# path first snapshots every array on device (an HBM→HBM copy,
# microseconds to dispatch), then a background worker fetches + writes
# while training continues. Submissions NEVER block: each carries a slot
# name, and a newer submission to the same slot replaces an unstarted
# older one — dropping a superseded '_last' preemption point is safe (a
# newer state replaces it), and a superseded 'best' save is only ever
# replaced by a strictly better one. In-flight memory is bounded at one
# running + one pending snapshot per slot.
# ---------------------------------------------------------------------------

_SAVE_LOCK = threading.Lock()
_SAVE_STATE: Dict[str, Any] = {"thread": None, "pending": {}, "error": None}


def _worker(first_fn):
    fn = first_fn
    while True:
        try:
            fn()
        except BaseException as e:  # surfaced at the next wait_for_saves()
            with _SAVE_LOCK:
                if _SAVE_STATE["error"] is None:  # keep the FIRST failure
                    _SAVE_STATE["error"] = e
        with _SAVE_LOCK:
            if _SAVE_STATE["pending"]:
                slot = next(iter(_SAVE_STATE["pending"]))
                fn = _SAVE_STATE["pending"].pop(slot)
                continue
            _SAVE_STATE["thread"] = None
            return


def _submit_save(fn, slot: str = "default") -> None:
    """Queue `fn` on the save worker without blocking; a newer fn in the
    same slot replaces an unstarted older one (latest wins)."""
    with _SAVE_LOCK:
        t = _SAVE_STATE["thread"]
        if t is not None and t.is_alive():
            # pop-then-insert so a replaced slot moves to the queue tail,
            # keeping cross-slot submission order
            _SAVE_STATE["pending"].pop(slot, None)
            _SAVE_STATE["pending"][slot] = fn
            return
        t = threading.Thread(
            target=_worker, args=(fn,), name="ckpt-save", daemon=True
        )
        _SAVE_STATE["thread"] = t
    t.start()


def wait_for_saves() -> None:
    """Block until every queued async save completes; re-raise the first
    error. fit() calls this before returning and before any restore."""
    while True:
        with _SAVE_LOCK:
            t = _SAVE_STATE["thread"]
        if t is None:
            break
        t.join()
        with _SAVE_LOCK:
            done = _SAVE_STATE["thread"] is None and not _SAVE_STATE["pending"]
        if done:
            break
    with _SAVE_LOCK:
        err, _SAVE_STATE["error"] = _SAVE_STATE["error"], None
    if err is not None:
        raise err


def _snapshot_device(tree):
    """Un-donatable device-side copies of every array in the tree."""
    return jax.tree_util.tree_map(
        lambda x: jax.numpy.array(x, copy=True)
        if isinstance(x, jax.Array) else x,
        tree,
    )


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
    # Multi-process runs (train/multihost_loop.py) call this COLLECTIVELY
    # — orbax's save carries an internal cross-process barrier, so every
    # process must enter it; orbax writes array data from the primary
    # host only, and the side files are ours to gate the same way.
    if jax.process_index() == 0:
        meta = {
            "epoch": int(epoch),
            "best": dict(best or {}),
            "history": history or {},
            "notes": notes,
        }
        with open(os.path.join(path, "meta.msgpack"), "wb") as f:
            f.write(flax.serialization.msgpack_serialize(meta))


def save_checkpoint_async(
    path: str,
    state,
    *,
    epoch: int,
    best: Optional[Dict[str, float]] = None,
    history: Optional[Dict[str, Any]] = None,
    notes: str = "",
    params_only_path: Optional[str] = None,
    extra_paths: tuple = (),
    slot: str = "default",
) -> None:
    """Non-blocking save_checkpoint: snapshot the state on device, then
    fetch ONCE + write in a background thread overlapped with training.
    `extra_paths` get byte-identical copies of the same checkpoint from
    the single host fetch (e.g. writing 'best' and '_last' together —
    the device→host fetch, not the disk write, is the expensive part).
    Optionally also writes the weights-only copy from the same fetch.
    `slot` is the latest-wins queue key (see _submit_save). Call
    `wait_for_saves()` before reading any of them back."""
    snap_params = _snapshot_device(state.params)
    snap_bs = _snapshot_device(state.batch_stats)
    snap_opt = _snapshot_device(state.opt_state)
    step = int(state.step)
    best = dict(best or {})
    history = {k: list(v) if isinstance(v, list) else v
               for k, v in (history or {}).items()}

    class _Host:
        pass

    def do_save():
        host = _Host()
        host.params = _to_host(snap_params)  # the one device→host fetch
        host.batch_stats = _to_host(snap_bs)
        host.opt_state = _to_host(snap_opt)
        host.step = step
        for p in (path,) + tuple(extra_paths):
            save_checkpoint(p, host, epoch=epoch, best=best,
                            history=history, notes=notes)
        if params_only_path is not None:
            save_params_only(params_only_path, host.params,
                             host.batch_stats)

    _submit_save(do_save, slot=slot)


def save_params_only(path: str, params, batch_stats=None) -> None:
    """Weights-only copy — the reference's MO_{name} artifact. Like the
    reference's (a torch state_dict, which carries BN running stats),
    it stores batch_stats alongside params: a BN model restored from it
    must run eval with its TRAINED running statistics, not init ones."""
    payload = {"params": _to_host(params)}
    if batch_stats is not None:
        payload["batch_stats"] = _to_host(batch_stats)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), payload, force=True)


def load_params_only(path: str):
    return load_variables_only(path)["params"]


def load_variables_only(path: str) -> dict:
    """Restore a weights-only artifact as an apply-ready variables dict
    ({'params'} plus {'batch_stats'} when the artifact has it; artifacts
    written before batch_stats were stored restore params alone)."""
    wait_for_saves()
    with ocp.PyTreeCheckpointer() as ckptr:
        raw = ckptr.restore(os.path.abspath(path))
    out = {"params": raw["params"]}
    if raw.get("batch_stats"):
        out["batch_stats"] = raw["batch_stats"]
    return out


def restore_checkpoint(path: str, state):
    """Restore a full checkpoint into `state`. Returns (state, meta dict).

    Mirrors the reference's tolerant resume: missing meta / pieces degrade
    gracefully (utils/training.py:513-533)."""
    wait_for_saves()
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
    wait_for_saves()
    with ocp.PyTreeCheckpointer() as ckptr:
        payload = ckptr.restore(os.path.abspath(checkpoint_path))
    src = payload[params_key] if params_key in payload else payload
    return _graft(src, params, src_prefix, dst_prefix)


def _graft(src, dst, src_prefix: str, dst_prefix: str,
           allow_empty: bool = False):
    flat_src = flax.traverse_util.flatten_dict(src, sep="/")
    flat_dst = dict(flax.traverse_util.flatten_dict(dst, sep="/"))

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
    if grafted == 0 and not allow_empty:
        raise KeyError(f"no keys under src_prefix={src_prefix!r}")
    return flax.traverse_util.unflatten_dict(flat_dst, sep="/")


def load_subtree_variables(
    checkpoint_path: str,
    variables: dict,
    *,
    src_prefix: str = "",
    dst_prefix: str = "",
) -> dict:
    """Graft a checkpoint subtree into a variables dict — BOTH params and
    batch_stats.

    `load_subtree` moves parameters only; models whose grafted subtree
    contains BatchNorm (the AE encoder transfer, the ClipUNet→PromptModel
    injection) also need the checkpoint's batch statistics, exactly as
    the reference's torch load_state_dict carries running_mean/var
    (reference autoencoder/autoencoder.py:229-241, prompt_based/
    prompt.py:20-27) — a frozen branch restored without them would run
    its BN layers on init statistics forever. batch_stats grafting is
    skipped quietly when either side has none under the prefix (e.g. a
    pure-LayerNorm ViT subtree)."""
    wait_for_saves()
    with ocp.PyTreeCheckpointer() as ckptr:
        payload = ckptr.restore(os.path.abspath(checkpoint_path))
    out = dict(variables)
    src_params = payload["params"] if "params" in payload else payload
    out["params"] = _graft(
        src_params, variables["params"], src_prefix, dst_prefix
    )
    src_bs = payload.get("batch_stats") or {}
    dst_bs = variables.get("batch_stats") or {}
    if src_bs and dst_bs:
        try:
            out["batch_stats"] = _graft(
                src_bs, dst_bs, src_prefix, dst_prefix, allow_empty=True
            )
        except KeyError:
            # src has stats the destination subtree lacks (different
            # architecture under the prefix) — params grafting above
            # already vouched for compatibility of what matters
            pass
    return out
