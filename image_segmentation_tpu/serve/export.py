"""AOT model export: the serving forward, weights baked in, as one
portable serialized-StableHLO artifact.

The reference deploys models as torch ``state_dict`` checkpoints that
need the model *class* (and torch) re-imported at load time — the
webapp duplicates the whole model layer for exactly that reason
(reference segmentation_webapp/app.py:38-94 + its clipunet.py /
prompt_model.py copies). The TPU-native replacement: lower the jitted
inference forward ONCE with ``jax.export`` — weights folded in as
constants, batch dimension symbolic, lowered for cpu+tpu — and
serialize it. The artifact then serves on any JAX runtime with **no
model code, no flax, no checkpoint loading**: deserialize and call.
That is the deployment contract a production fleet wants (ship one
self-contained compiled program, not a Python package version matrix).

Artifact format (``{name}.istpu`` — a zip):
  meta.json  — name, target_size, class_names, needs_prompt,
               input dtype/layout contract, platforms, format version
  fn.bin     — ``jax.export.Exported.serialize()`` bytes

Producer: :func:`export_model` / the CLI
(``python -m image_segmentation_tpu.serve.export``).
Consumer: :func:`load_exported` /
:meth:`InferenceEngine.register_exported` (serve without model code).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import zipfile
from typing import Optional, Sequence, Tuple

import numpy as np

ARTIFACT_VERSION = 1
ARTIFACT_EXT = ".istpu"


def export_model(
    model,
    variables,
    target_size: int,
    *,
    needs_prompt: bool = False,
    fast_transfer: bool = True,
    platforms: Sequence[str] = ("cpu", "tpu"),
):
    """Lower + serialize the serving forward. Returns
    (serialized bytes, meta dict).

    The batch dimension is symbolic ("b"), so ONE artifact serves any
    request batch — single requests and BatchingEngine buckets alike —
    without per-shape re-export."""
    import jax
    import jax.numpy as jnp

    from image_segmentation_tpu.serve.engine import make_serving_forward

    in_dtype = jnp.uint8 if fast_transfer else jnp.float32
    shapes = [(1, target_size, target_size, 3)]
    if needs_prompt:
        shapes.append((1, target_size, target_size, 1))
    args = [jax.ShapeDtypeStruct(s, in_dtype) for s in shapes]
    specs = jax.export.symbolic_args_specs(args, "b, _, _, _")
    fwd = make_serving_forward(model, variables, fast_transfer=fast_transfer)
    exported = jax.export.export(jax.jit(fwd), platforms=tuple(platforms))(
        *specs
    )
    meta = {
        "version": ARTIFACT_VERSION,
        "target_size": int(target_size),
        "needs_prompt": bool(needs_prompt),
        "input_dtype": "uint8" if fast_transfer else "float32",
        "output_dtype": "bfloat16" if fast_transfer else "float32",
        "num_inputs": len(shapes),
        "platforms": list(platforms),
        "jax_version": jax.__version__,
    }
    return exported.serialize(), meta


def save_exported(
    path: str,
    model,
    variables,
    target_size: int,
    *,
    name: str,
    class_names: Sequence[str],
    needs_prompt: bool = False,
    fast_transfer: bool = True,
    platforms: Sequence[str] = ("cpu", "tpu"),
) -> dict:
    """Export and write a ``{name}.istpu`` artifact. Returns its meta."""
    blob, meta = export_model(
        model,
        variables,
        target_size,
        needs_prompt=needs_prompt,
        fast_transfer=fast_transfer,
        platforms=platforms,
    )
    meta.update(name=name, class_names=list(class_names))
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("meta.json", json.dumps(meta, indent=1))
        z.writestr("fn.bin", blob)
    return meta


def load_exported(path: str):
    """Read an artifact → (callable, meta). The callable has the SAME
    contract as a live jitted serving forward (ModelEntry.forward):
    staging arrays ((B, T, T, 3) [+ (B, T, T, 1) heatmap]) in ANY of
    uint8 / float [0,1] in, a DEVICE array of (B, T, T, C) scores out
    (bfloat16 for fast-transfer artifacts) — dtype adaptation to the
    artifact's baked-in input contract runs on device, and the output
    stays on device so batched callers slice padding off before any
    host transfer. No model code or flax involved."""
    import jax
    import jax.numpy as jnp

    from image_segmentation_tpu.serve.engine import quantize_uint8

    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
        blob = z.read("fn.bin")
    if meta.get("version") != ARTIFACT_VERSION:
        raise ValueError(
            f"{path}: artifact version {meta.get('version')} != "
            f"{ARTIFACT_VERSION} (re-export with this build)"
        )
    exported = jax.export.deserialize(blob)
    wants_uint8 = meta["input_dtype"] == "uint8"

    def _adapt(x):
        x = jnp.asarray(x)
        if wants_uint8 and x.dtype != jnp.uint8:
            return quantize_uint8(x, xp=jnp)
        if not wants_uint8 and x.dtype == jnp.uint8:
            return x.astype(jnp.float32) / 255.0
        return x

    def call(*inputs):
        return exported.call(*[_adapt(x) for x in inputs])

    return call, meta


def export_registry(
    models_dir: str,
    out_dir: str,
    *,
    only: Optional[str] = None,
    platforms: Sequence[str] = ("cpu", "tpu"),
    fast_transfer: bool = True,
    demo: bool = False,
) -> list:
    """Export every (or one) trained family checkpoint in `models_dir`
    to ``{out_dir}/{name}.istpu``. `demo` exports the random-weight
    demo registry instead (pipeline smoke-testing)."""
    os.makedirs(out_dir, exist_ok=True)
    written = []
    if demo:
        from image_segmentation_tpu.serve.app import demo_model_specs

        entries = demo_model_specs(only=only)
    else:
        from image_segmentation_tpu.serve.app import load_family_models

        entries = load_family_models(models_dir, only=only)
    from image_segmentation_tpu.serve.engine import (
        PROMPT_CLASS_NAMES,
        SEG_CLASS_NAMES,
    )

    for name, model, variables, tsize, needs_prompt in entries:
        path = os.path.join(out_dir, f"{name}{ARTIFACT_EXT}")
        meta = save_exported(
            path,
            model,
            variables,
            tsize,
            name=name,
            class_names=(
                PROMPT_CLASS_NAMES if needs_prompt else SEG_CLASS_NAMES
            ),
            needs_prompt=needs_prompt,
            fast_transfer=fast_transfer,
            platforms=platforms,
        )
        size_kb = os.path.getsize(path) / 1024
        print(f"[export] {path} ({size_kb:.0f} KiB, "
              f"platforms={','.join(meta['platforms'])})")
        written.append(path)
    if not written:
        raise SystemExit(
            f"nothing exported from {models_dir!r}"
            + (f" for model {only!r}" if only else "")
        )
    return written


def main(argv: Optional[Sequence[str]] = None):
    p = argparse.ArgumentParser(
        description="Export trained models as self-contained serialized-"
                    "StableHLO serving artifacts (no model code at load)"
    )
    p.add_argument("--models-dir", default=None,
                   help="directory of trained MO_{name} checkpoints")
    p.add_argument("--demo", action="store_true",
                   help="export the random-weight demo registry")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--model", default=None, help="export only this model")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering targets (default cpu,tpu)")
    p.add_argument("--float32", action="store_true",
                   help="float32 in/out instead of the uint8-in/bf16-out "
                        "fast-transfer contract")
    args = p.parse_args(argv)
    if not args.demo and not args.models_dir:
        sys.exit("--models-dir or --demo required")
    return export_registry(
        args.models_dir or "",
        args.out,
        only=args.model,
        platforms=tuple(args.platforms.split(",")),
        fast_transfer=not args.float32,
        demo=args.demo,
    )


if __name__ == "__main__":
    main()
