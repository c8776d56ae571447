"""HTTP serving app (stdlib http.server; Flask isn't in this image).

API mirrors the reference webapp (reference segmentation_webapp/app.py):
  GET  /            — interactive frontend (canvas point picking)
  GET  /static/*    — frontend assets
  GET  /models      — registry listing (addition: used by the frontend)
  POST /segment     — JSON {image: b64, model: name, [prompt_type,
                      prompt_data], [label: b64]} →
                      {output_mask: b64 PNG, [output_label: b64 PNG],
                      class_names}

Startup loads a model registry: either trained checkpoints from
--models-dir (UNet / autoencoder / ClipUNet / prompt, the reference's 4,
app.py:91-94) or --demo random-weight models for smoke-testing the
serving path end to end.

Run: python -m image_segmentation_tpu.serve.app [--port 8000] [--demo]
"""
from __future__ import annotations

import argparse
import base64
import io
import json
import os
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from image_segmentation_tpu.data.labels import colorize_mask, target_remap
from image_segmentation_tpu.serve.engine import InferenceEngine
from image_segmentation_tpu.serve.render import create_prompt_mask

STATIC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "static")
TEMPLATE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "templates"
)


def _strip_data_url(data: str) -> bytes:
    if "," in data[:64] and data.lstrip().startswith("data:"):
        data = data.split(",", 1)[1]
    return base64.b64decode(data)


def _decode_upload(raw: bytes) -> np.ndarray:
    """(H, W, C) uint8 from PNG/JPEG bytes — native codec
    (ops/native_codec.py) with PIL fallback for formats it declines
    (CMYK JPEGs, GIF/BMP uploads)."""
    try:
        from image_segmentation_tpu.ops import native_codec as nc

        if nc.available():
            return nc.decode_bytes(raw)
    except Exception:
        pass
    from PIL import Image

    with Image.open(io.BytesIO(raw)) as im:
        return np.asarray(im.convert("RGBA") if im.mode == "P" else im)


def decode_base64_image(data: str) -> np.ndarray:
    """b64 (optionally data-URL) → (H, W, 3) float32 [0,1], alpha dropped
    (reference app.py:97-114)."""
    from image_segmentation_tpu.data.dataset import normalize_image_channels

    arr = normalize_image_channels(_decode_upload(_strip_data_url(data)))
    return arr.astype(np.float32) / 255.0


def decode_base64_gray(data: str) -> np.ndarray:
    from PIL import Image

    raw = _strip_data_url(data)
    try:
        from image_segmentation_tpu.ops import native_codec as nc

        # header-only probe gates the native path: decode natively only
        # for single-channel images (labels, heatmaps); multichannel
        # needs PIL's luma conversion, so don't pay a throwaway decode
        if nc.available() and nc.probe_bytes(raw)[2] == 1:
            return nc.decode_bytes(raw)[:, :, 0]
    except Exception:
        pass
    with Image.open(io.BytesIO(raw)) as im:
        return np.asarray(im.convert("L"))


def encode_png_base64(arr: np.ndarray) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def demo_model_specs(seed: int = 0, only: str | None = None):
    """(name, model, variables, target_size, needs_prompt) for the
    random-weight reduced-size families — ONE definition consumed by
    both the demo registry (build_demo_engine) and the AOT exporter
    (serve/export.py --demo), so demo artifacts always match the demo
    engine. `only` skips construction of non-matching families."""
    import jax
    import jax.numpy as jnp

    from image_segmentation_tpu.models import SegmentationAutoencoder, UNet
    from image_segmentation_tpu.models.clip_unet import ClipUNet
    from image_segmentation_tpu.models.clip_vit import ClipViTConfig
    from image_segmentation_tpu.models.prompt import PromptModel

    key = jax.random.PRNGKey(seed)
    vit = ClipViTConfig(
        image_size=64, patch_size=16, hidden_size=64, num_layers=3,
        num_heads=4, mlp_dim=128,
    )
    # grid 4 needs FOUR up-blocks to reach 64px output
    builders = {
        "unet": lambda: (UNet(num_classes=4, base=8), False),
        "autoencoder": lambda: (
            SegmentationAutoencoder(num_classes=4, base=8), False,
        ),
        "clip": lambda: (
            ClipUNet(num_classes=4, vit=vit, skip_indices=(0, 1, 2, 3),
                     decoder_channels=(64, 32, 16, 8, 8)),
            False,
        ),
        "prompt_model": lambda: (
            PromptModel(vit=vit, skip_indices=(0, 1, 2, 3),
                        decoder_channels=(64, 32, 16, 8, 8), unet_base=8),
            True,
        ),
    }
    for name, build in builders.items():
        if only and name != only:
            continue
        model, needs_prompt = build()
        sample = [jnp.zeros((1, 64, 64, 3))]
        if needs_prompt:
            sample.append(jnp.zeros((1, 64, 64, 1)))
        variables = model.init(key, *sample, train=False)
        yield name, model, variables, 64, needs_prompt


def register_families(eng: InferenceEngine, families) -> None:
    """Register (name, model, variables, target_size, needs_prompt)
    specs, composing the prompt family through the clip family's shared
    ClipUNet program when both are present
    (InferenceEngine.register_prompt_composed — one compiled
    ViT/ClipUNet serves both families; the reference registry compiles
    nothing and runs the composite eagerly per request,
    segmentation_webapp/app.py:91-94)."""
    for name, model, variables, tsize, needs_prompt in families:
        if needs_prompt and "clip" in eng.models:
            eng.register_prompt_composed(
                name, model, variables, via="clip", target_size=tsize)
        else:
            eng.register(name, model, variables, tsize,
                         needs_prompt=needs_prompt)


def build_demo_engine(seed: int = 0, mesh=None) -> InferenceEngine:
    """Random-weight registry with all four model families at reduced
    size — exercises the full serving path without checkpoints."""
    eng = InferenceEngine(mesh=mesh)
    register_families(eng, demo_model_specs(seed))
    return eng


def load_family_models(models_dir: str, only: str | None = None):
    """Load trained weights-only checkpoints (the MO_{name} artifacts)
    from models_dir for whichever of the 4 model families are present.
    Yields (name, model, variables, target_size, needs_prompt) — shared
    by the serving registry and the AOT exporter (serve/export.py).
    `only` skips the init+restore work for non-matching families."""
    import jax
    import jax.numpy as jnp

    from image_segmentation_tpu.models import SegmentationAutoencoder, UNet
    from image_segmentation_tpu.models.clip_unet import ClipUNet
    from image_segmentation_tpu.models.prompt import PromptModel
    from image_segmentation_tpu.train.checkpoint import load_variables_only

    specs = {
        "unet": (UNet(num_classes=4), 256, False, (jnp.zeros((1, 256, 256, 3)),)),
        "autoencoder": (
            SegmentationAutoencoder(num_classes=4), 256, False,
            (jnp.zeros((1, 256, 256, 3)),),
        ),
        "clip": (ClipUNet(num_classes=4), 224, False, (jnp.zeros((1, 224, 224, 3)),)),
        "prompt_model": (
            PromptModel(), 224, True,
            (jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 224, 224, 1))),
        ),
    }
    # per family: the serving alias itself plus every training config
    # name that writes an MO_{cfg.name} artifact (config.py CONFIGS) —
    # the documented train-then-serve flow uses the config names
    candidates = {
        "unet": ("MO_unet", "MO_unet_aug", "MO_unet_noaug"),
        "autoencoder": ("MO_autoencoder",),
        "clip": ("MO_clip", "MO_clipunet", "MO_clipunet_noskips"),
        "prompt_model": ("MO_prompt_model", "MO_prompt"),
    }
    for name, (model, tsize, needs_prompt, sample) in specs.items():
        if only and name != only:
            continue
        path = next(
            (
                os.path.join(models_dir, c)
                for c in candidates[name]
                if os.path.isdir(os.path.join(models_dir, c))
            ),
            None,
        )
        if path is None:
            print(f"[serve] no checkpoint for {name} in {models_dir} "
                  f"(tried {', '.join(candidates[name])}); skipping")
            continue
        variables = model.init(jax.random.PRNGKey(0), *sample, train=False)
        # the artifact carries trained BN running stats (batch_stats);
        # merging over init matters — eval with init stats is wrong
        variables = {**variables, **load_variables_only(path)}
        yield name, model, variables, tsize, needs_prompt


def build_engine_from_checkpoints(models_dir: str, mesh=None) -> InferenceEngine:
    """Serving registry over whichever trained family checkpoints exist."""
    eng = InferenceEngine(mesh=mesh)

    def _loaded():
        for spec in load_family_models(models_dir):
            print(f"[serve] loaded {spec[0]}")
            yield spec

    register_families(eng, _loaded())
    if not eng.models:
        raise RuntimeError(f"no model checkpoints found in {models_dir}")
    return eng


def handle_segment(engine: InferenceEngine, payload: dict) -> dict:
    """Core of POST /segment (reference app.py:220-401)."""
    model_name = payload.get("model")
    if not model_name:
        return {"error": "missing 'model'"}
    if model_name not in engine.models:
        return {
            "error": f"unknown model {model_name!r}",
            "available": engine.available(),
        }
    if "image" not in payload:
        return {"error": "missing 'image'"}
    try:
        image = decode_base64_image(payload["image"])
    except Exception as e:
        return {"error": f"could not decode image: {e}"}

    prompt_mask = None
    if engine.models[model_name].needs_prompt:
        ptype = payload.get("prompt_type", "points")
        pdata = payload.get("prompt_data")
        if ptype == "scribble" and isinstance(pdata, str):
            try:
                pdata = decode_base64_gray(pdata)
            except Exception as e:
                return {"error": f"could not decode scribble: {e}"}
        try:
            prompt_mask = create_prompt_mask(ptype, pdata, image.shape[:2])
        except (TypeError, KeyError, ValueError, IndexError) as e:
            # malformed client input (missing bbox fields, wrong types) —
            # a validation error, not a server fault
            return {"error": f"invalid prompt_data for {ptype!r}: {e}"}

    result = engine.segment(image, model_name, prompt_mask)
    out = {
        "output_mask": encode_png_base64(result["color_mask"]),
        "class_names": result["class_names"],
    }

    # Optional ground-truth label colourisation (reference app.py:338-386)
    if payload.get("label"):
        try:
            lab = decode_base64_gray(payload["label"])
            lab = target_remap(lab)
            out["output_label"] = encode_png_base64(colorize_mask(lab))
        except Exception as e:
            out["label_error"] = str(e)
    return out


def make_handler(engine: InferenceEngine):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, obj, code: int = 200):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                with open(os.path.join(TEMPLATE_DIR, "index.html"), "rb") as f:
                    self._send(200, f.read(), "text/html")
            elif self.path == "/models":
                self._send_json({"models": engine.available()})
            elif self.path.startswith("/static/"):
                rel = self.path[len("/static/") :]
                full = os.path.normpath(os.path.join(STATIC_DIR, rel))
                if (
                    not full.startswith(STATIC_DIR + os.sep)
                    or not os.path.isfile(full)
                ):
                    self._send_json({"error": "not found"}, 404)
                    return
                ctype = {
                    ".js": "application/javascript",
                    ".css": "text/css",
                    ".html": "text/html",
                }.get(os.path.splitext(full)[1], "application/octet-stream")
                with open(full, "rb") as f:
                    self._send(200, f.read(), ctype)
            else:
                self._send_json({"error": "not found"}, 404)

        def do_POST(self):
            if self.path != "/segment":
                self._send_json({"error": "not found"}, 404)
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
            except Exception as e:
                self._send_json({"error": f"bad request: {e}"}, 400)
                return
            try:
                out = handle_segment(engine, payload)
            except Exception as e:  # pragma: no cover
                self._send_json({"error": f"internal error: {e}"}, 500)
                return
            self._send_json(out, 400 if "error" in out else 200)

        def log_message(self, fmt, *args):
            print(f"[serve] {self.address_string()} {fmt % args}")

    return Handler


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--models-dir", default=None)
    p.add_argument("--exports-dir", default=None,
                   help="serve .istpu AOT artifacts (serve/export.py) from "
                        "this directory — no model code or checkpoint "
                        "restore at startup; combinable with --models-dir")
    p.add_argument("--demo", action="store_true",
                   help="random-weight registry (no checkpoints needed)")
    p.add_argument("--max-batch", type=int, default=0,
                   help="enable request micro-batching with this batch size "
                        "(serve/batching.py); 0 = per-request forwards")
    p.add_argument("--mesh", action="store_true",
                   help="serve the whole slice: replicate weights over "
                        "all visible devices and shard batched requests "
                        "across them (pairs with --max-batch)")
    p.add_argument("--compile-cache", default=None, metavar="DIR",
                   help="persistent XLA compilation cache directory: "
                        "restarts of the same server (same models/shapes) "
                        "skip their first-compile / warmup compile stalls")
    args = p.parse_args()

    if args.compile_cache:
        from image_segmentation_tpu.utils import enable_compilation_cache

        enable_compilation_cache(args.compile_cache)

    mesh = None
    if args.mesh:
        import jax

        from image_segmentation_tpu.parallel.mesh import get_mesh

        mesh = get_mesh()
        print(f"[serve] mesh serving over {jax.device_count()} devices")
    if args.exports_dir:
        from image_segmentation_tpu.serve.export import ARTIFACT_EXT

        if not os.path.isdir(args.exports_dir):
            raise SystemExit(f"--exports-dir {args.exports_dir!r} is not "
                             "a directory")
        engine = InferenceEngine(mesh=mesh)
        if args.models_dir:
            engine = build_engine_from_checkpoints(args.models_dir, mesh=mesh)
        n_artifacts = 0
        for f in sorted(os.listdir(args.exports_dir)):
            if f.endswith(ARTIFACT_EXT):
                name = engine.register_exported(
                    os.path.join(args.exports_dir, f)
                )
                print(f"[serve] loaded AOT artifact {name} ({f})")
                n_artifacts += 1
        if not n_artifacts:
            raise SystemExit(f"no {ARTIFACT_EXT} artifacts in "
                             f"{args.exports_dir}")
    elif args.demo or not args.models_dir:
        print("[serve] demo mode: random-weight models")
        engine = build_demo_engine(mesh=mesh)
    else:
        engine = build_engine_from_checkpoints(args.models_dir, mesh=mesh)
    if args.max_batch > 1:
        from image_segmentation_tpu.serve.batching import BatchingEngine

        engine = BatchingEngine(engine, max_batch=args.max_batch)
        print(f"[serve] request batching enabled (max_batch={args.max_batch}); "
              "warming up bucket shapes …")
        t0 = time.time()
        engine.warmup()
        print(f"[serve] warmup done in {time.time() - t0:.1f}s — no live "
              "request pays a compile stall")

    server = ThreadingHTTPServer((args.host, args.port), make_handler(engine))
    print(f"[serve] listening on http://{args.host}:{args.port} "
          f"models={engine.available()}")
    server.serve_forever()


if __name__ == "__main__":
    main()
