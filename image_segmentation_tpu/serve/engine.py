"""Inference engine: a formal model registry over jitted forwards.

The reference webapp loads 4 models into a dict at startup and runs them
eagerly on CPU per request (reference segmentation_webapp/app.py:38-94,
220-288, and duplicates the whole model/geometry layer as local copies —
SURVEY.md §1 wart). Here serving shares the EXACT same model modules and
geometry library as training, each model gets one jitted forward compiled
at registration, and requests run: host resize+pad → device forward →
host inverse geometry → argmax → colorized mask.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from image_segmentation_tpu.data.labels import COLOR_MAP, colorize_mask
from image_segmentation_tpu.ops import geometry as G

SEG_CLASS_NAMES = ("background", "cat", "dog", "boundary")
PROMPT_CLASS_NAMES = ("deactivated", "background", "cat", "dog")


def quantize_uint8(arr, xp=np):
    """THE uint8 quantization contract for [0,1] float staging arrays —
    one definition shared by host packing (xp=np) and the AOT artifact
    dtype adapter (xp=jnp, on device; serve/export.py) so the two can
    never drift."""
    return xp.clip(xp.round(arr * 255.0), 0, 255).astype(xp.uint8)


def _pack_transfer(arr: np.ndarray, fast_transfer: bool) -> np.ndarray:
    """Transfer packing for a [0,1] float staging array (uint8 when
    fast_transfer — the input is 8-bit at the source)."""
    if fast_transfer:
        return quantize_uint8(arr)
    return arr.astype(np.float32)


def make_serving_forward(model, variables, fast_transfer: bool = True):
    """THE serving forward contract, shared by live registration and AOT
    export (serve/export.py lowers it): uint8 inputs decode to [0,1]
    float on device; scores come back bfloat16 when fast_transfer
    (≈2.5× less host↔device traffic), float32 otherwise.

    This closure-capturing form embeds `variables` as HLO constants —
    exactly right for AOT export (the artifact must carry its weights),
    but wrong for live jit over a remote-compile tunnel: the compile
    request would ship every weight as a literal (an 86M-param ViT
    f32 = 344 MB of constants ⇒ HTTP 413 over the axon tunnel).
    Live registration therefore jits `make_serving_forward_params`
    below and passes the weights as a device-resident argument."""

    def fwd(*inputs):
        inputs = [
            x.astype(jnp.float32) / 255.0 if x.dtype == jnp.uint8 else x
            for x in inputs
        ]
        out = model.apply(variables, *inputs, train=False)
        return out.astype(jnp.bfloat16) if fast_transfer else out

    return fwd


def make_serving_forward_params(model, fast_transfer: bool = True):
    """The same serving contract with `variables` as the first ARGUMENT
    (what InferenceEngine.register jits): the compiled program takes the
    weights as parameters, so compile requests carry only the HLO and
    one program serves any weight set of the same structure."""

    def fwd(variables, *inputs):
        return make_serving_forward(model, variables, fast_transfer)(*inputs)

    return fwd


def stage_request(image, entry, prompt_mask, fast_transfer: bool):
    """Host-side staging shared by InferenceEngine and BatchingEngine:
    resize+pad the image (and the prompt heatmap, defaulting to zeros
    for prompt models given none) to the model's target size and pack
    for transfer. Returns (inputs tuple of (T, T, C) arrays, meta)."""
    t = entry.target_size
    staged, meta = G.resize_with_padding_np(
        image.astype(np.float32), t, method="linear", antialias=True
    )
    inputs = [_pack_transfer(staged, fast_transfer)]
    if entry.needs_prompt:
        pm = (
            prompt_mask
            if prompt_mask is not None
            else np.zeros(image.shape[:2], np.float32)
        )
        pm_staged, _ = G.resize_with_padding_np(
            pm[..., None].astype(np.float32), t, method="linear",
            antialias=True,
        )
        inputs.append(_pack_transfer(pm_staged, fast_transfer))
    return tuple(inputs), meta


def unstage_result(scores: np.ndarray, meta, entry) -> dict:
    """Shared un-staging: validate the score shape, inverse geometry back
    to the original resolution, argmax, colourise (reference
    app.py:291-326)."""
    t = entry.target_size
    if scores.shape[:2] != (t, t):
        raise ValueError(
            f"model {entry.name!r} emitted {scores.shape[:2]} scores for "
            f"target_size {t} — registration mismatch"
        )
    restored = G.invert_resize_padding_np(scores, meta, method="linear")
    mask = restored.argmax(axis=-1).astype(np.uint8)
    return {
        "mask": mask,
        "color_mask": colorize_mask(mask, COLOR_MAP),
        "class_names": list(entry.class_names),
    }


def make_prompt_head_forward(mask_model, fast_transfer: bool = True):
    """The selection-head half of the prompt model as a standalone
    serving program: given the CLIP branch's 4-class scores (already
    computed — by the SHARED ClipUNet serving program), run only the
    mask U-Net and the probability composition
    (reference prompt_based/prompt.py:33-55).

    Same transfer contract as make_serving_forward: uint8 inputs decode
    on device, bf16 scores out under fast_transfer. `clip_scores` is a
    DEVICE array handed straight from the clip program's output — the
    composition never round-trips through the host."""

    def fwd(variables, x, heatmap, clip_scores):
        x, heatmap = (
            a.astype(jnp.float32) / 255.0 if a.dtype == jnp.uint8 else a
            for a in (x, heatmap)
        )
        # float32 probability algebra regardless of branch dtype
        # (models/prompt.py: the downstream log(x+1e-9) is bf16-hostile)
        clip_prob = jax.nn.softmax(clip_scores.astype(jnp.float32), axis=-1)
        mask_logit = mask_model.apply(variables, jnp.concatenate(
            [x, heatmap], axis=-1), train=False)
        mask_prob = jax.nn.sigmoid(mask_logit.astype(jnp.float32))
        selected = mask_prob * clip_prob
        final = jnp.concatenate(
            [
                1.0 - mask_prob,                          # ch0 deactivated
                selected[..., 0:1] + selected[..., 3:4],  # ch1 bg + boundary
                selected[..., 1:3],                       # ch2 cat, ch3 dog
            ],
            axis=-1,
        )
        return final.astype(jnp.bfloat16) if fast_transfer else final

    return fwd


class _ScoreCache:
    """Small thread-safe LRU of DEVICE-resident clip-branch scores keyed
    by staged-image bytes. Interactive prompt sessions (the reference
    webapp's UX: upload one image, click many points —
    segmentation_webapp/static/script.js:198-283) re-run the identical
    frozen CLIP branch per click; a hit reduces the request to the small
    mask-U-Net head program."""

    def __init__(self, capacity: int = 16):
        import collections
        import threading

        self._d = collections.OrderedDict()
        self._lock = threading.Lock()
        self.capacity = capacity
        self.hits = 0
        self.misses = 0

    @staticmethod
    def key(arr: np.ndarray):
        import hashlib

        return (arr.shape, str(arr.dtype),
                hashlib.blake2b(arr.tobytes(), digest_size=16).digest())

    def get(self, key):
        with self._lock:
            v = self._d.get(key)
            if v is None:
                self.misses += 1
            else:
                self._d.move_to_end(key)
                self.hits += 1
            return v

    def put(self, key, value):
        with self._lock:
            self._d[key] = value
            self._d.move_to_end(key)
            while len(self._d) > self.capacity:
                self._d.popitem(last=False)


@dataclasses.dataclass
class ModelEntry:
    name: str
    forward: Callable  # jitted: (image (1,T,T,3)[, heatmap (1,T,T,1)]) -> scores
    target_size: int
    class_names: tuple
    needs_prompt: bool = False
    # params-as-argument jitted program + its device variables — kept so
    # other registrations can SHARE the compiled executable (the prompt
    # family rides the clip family's ClipUNet program with its own
    # weights, register_prompt_composed)
    jitted: Optional[Callable] = None
    variables: Any = None
    score_cache: Optional[_ScoreCache] = None


class InferenceEngine:
    def __init__(self, fast_transfer: bool = True, mesh=None):
        """fast_transfer compresses host↔device traffic (uint8 inputs,
        bfloat16 score outputs — ~2.5× fewer bytes per request). Inputs
        originate from 8-bit images so the quantisation is at the source
        precision; disable for bit-exact float32 transport.

        `mesh`: optional jax.sharding.Mesh for serving a whole slice —
        variables replicate across it and batched requests (from
        BatchingEngine) shard their leading dim over 'data', so XLA
        splits each forward across the chips over ICI. Batches not
        divisible by the device count run replicated (the single-chip
        plan); the reference has no equivalent (one eager CPU forward
        per request, segmentation_webapp/app.py:281-288)."""
        self.models: Dict[str, ModelEntry] = {}
        self.fast_transfer = fast_transfer
        self.mesh = mesh
        self._batch_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            from image_segmentation_tpu.parallel.mesh import DATA_AXIS

            self._batch_sharding = NamedSharding(
                mesh, PartitionSpec(DATA_AXIS)
            )
            self._n_mesh_devices = int(np.prod(list(mesh.shape.values())))

    def register(
        self,
        name: str,
        model,
        variables,
        target_size: int,
        needs_prompt: bool = False,
        class_names: Optional[tuple] = None,
    ) -> None:
        """Register a flax model + variables under `name` with one jitted
        inference forward."""
        if self.mesh is not None:
            from image_segmentation_tpu.parallel.mesh import replicate

            variables = replicate(variables, self.mesh)
        else:
            # device-resident weights passed as a jit ARGUMENT (not a
            # closure constant): the compile request carries only the
            # HLO — closure capture shipped every weight as a literal
            # and blew the remote-compile body limit on the big models
            variables = jax.device_put(variables)

        jitted = jax.jit(
            make_serving_forward_params(model, self.fast_transfer)
        )

        if self.mesh is None:
            def forward(*inputs, _v=variables, _j=jitted):
                return _j(_v, *inputs)
        else:
            sharding = self._batch_sharding
            n_dev = self._n_mesh_devices

            def forward(*inputs, _v=variables, _j=jitted):
                if inputs[0].shape[0] % n_dev == 0:
                    inputs = tuple(
                        jax.device_put(jnp.asarray(x), sharding)
                        for x in inputs
                    )
                return _j(_v, *inputs)

        self.models[name] = ModelEntry(
            name=name,
            forward=forward,
            target_size=target_size,
            class_names=tuple(
                class_names
                or (PROMPT_CLASS_NAMES if needs_prompt else SEG_CLASS_NAMES)
            ),
            needs_prompt=needs_prompt,
            jitted=jitted,
            variables=variables,
        )

    def register_prompt_composed(
        self,
        name: str,
        prompt_model,
        variables,
        via: str,
        target_size: int,
        class_names: Optional[tuple] = None,
        score_cache_capacity: int = 16,
    ) -> None:
        """Register a PromptModel that SHARES the already-registered
        ClipUNet serving program `via` instead of compiling its own copy
        of the whole composite.

        The reference's PromptModel re-runs the full ClipUNet forward
        inside every prompt request (prompt_based/prompt.py:33-55;
        registry segmentation_webapp/app.py:91-94). Decomposed serving:

          1. clip scores  = the `via` entry's params-as-argument jitted
             program, called with THE PROMPT MODEL'S clip-branch weights
             (same executable — weights are an argument, so the two
             families share one compiled ViT/ClipUNet);
          2. final scores = a small mask-U-Net head program
             (make_prompt_head_forward) taking the clip scores as a
             device-resident argument — no host round-trip between 1+2.

        Clip scores are LRU-cached by staged-image bytes: an interactive
        session clicking N points on one image pays the CLIP branch once
        and the (~40× cheaper) head program N times.

        Falls back to plain `register` under a mesh (sharded serving
        keeps the monolithic program) or when `via` has no shareable
        jitted program (AOT artifacts)."""
        base = self.models.get(via)
        if base is not None and base.target_size != target_size:
            base = None  # different canvas — scores would be misshaped
        if self.mesh is not None or base is None or base.jitted is None:
            self.register(name, prompt_model, variables, target_size,
                          needs_prompt=True, class_names=class_names)
            return

        # split the composite's variables into the two branch programs'
        # trees (flax nests by submodule name: 'clip' / 'mask')
        clip_vars = {"params": variables["params"]["clip"]}
        mask_vars = {"params": variables["params"]["mask"]}
        bs = variables.get("batch_stats", {})
        if bs:
            clip_vars["batch_stats"] = bs.get("clip", {})
            mask_vars["batch_stats"] = bs.get("mask", {})

        # the via program applies ITS module with the prompt's clip
        # weights — only sound when the two trees agree leaf-for-leaf
        def _spec(tree):
            return jax.tree_util.tree_map(
                lambda a: (jnp.shape(a), jnp.result_type(a)), tree)

        if _spec(clip_vars) != _spec(base.variables):
            self.register(name, prompt_model, variables, target_size,
                          needs_prompt=True, class_names=class_names)
            return
        clip_vars = jax.device_put(clip_vars)
        mask_vars = jax.device_put(mask_vars)

        from image_segmentation_tpu.models.unet import UNet

        mask_model = UNet(num_classes=1, base=prompt_model.unet_base,
                          dtype=prompt_model.dtype)
        head = jax.jit(make_prompt_head_forward(
            mask_model, self.fast_transfer))
        cache = _ScoreCache(capacity=score_cache_capacity)
        via_jitted = base.jitted

        def forward(x, heatmap, _cv=clip_vars, _mv=mask_vars):
            key = scores = None
            if isinstance(x, np.ndarray):
                key = _ScoreCache.key(x)
                scores = cache.get(key)
            if scores is None:
                scores = via_jitted(_cv, jnp.asarray(x))
                if key is not None:
                    cache.put(key, scores)
            return head(_mv, jnp.asarray(x), jnp.asarray(heatmap), scores)

        self.models[name] = ModelEntry(
            name=name,
            forward=forward,
            target_size=target_size,
            class_names=tuple(class_names or PROMPT_CLASS_NAMES),
            needs_prompt=True,
            score_cache=cache,
        )

    def register_exported(self, path: str, name: Optional[str] = None) -> str:
        """Register a ``.istpu`` AOT artifact (serve/export.py): the
        deserialized serialized-StableHLO forward serves directly — no
        model code, flax module, or checkpoint restore involved. The
        artifact's symbolic batch dimension serves both single requests
        and BatchingEngine buckets. Input dtype adaptation to the
        artifact's baked-in contract happens inside the loaded callable,
        so it composes with either fast_transfer setting. Returns the
        registered name."""
        from image_segmentation_tpu.serve.export import load_exported

        call, meta = load_exported(path)
        name = name or meta["name"]
        if name in self.models:
            print(f"[serve] note: AOT artifact {path} replaces the "
                  f"already-registered model {name!r}")
        if self.mesh is not None:
            print(f"[serve] note: mesh serving does not apply to AOT "
                  f"artifacts — {name!r} runs single-device")
        self.models[name] = ModelEntry(
            name=name,
            forward=call,
            target_size=int(meta["target_size"]),
            class_names=tuple(meta["class_names"]),
            needs_prompt=bool(meta["needs_prompt"]),
        )
        return name

    def available(self):
        return sorted(self.models.keys())

    def segment(
        self,
        image: np.ndarray,
        model_name: str,
        prompt_mask: Optional[np.ndarray] = None,
    ):
        """Run one image through a registered model.

        image: (H, W, 3) float [0,1] (alpha already dropped).
        Returns dict with 'mask' (H, W) uint8 class ids, 'color_mask'
        (H, W, 3) uint8, 'class_names'.
        Mirrors reference app.py:220-326: resize+pad to the model's target
        size, forward, inverse geometry on the scores (bilinear), argmax.
        """
        if model_name not in self.models:
            raise KeyError(
                f"unknown model {model_name!r}; available: {self.available()}"
            )
        entry = self.models[model_name]
        inputs, meta = stage_request(
            image, entry, prompt_mask, self.fast_transfer
        )
        # HOST arrays go to forward (jit device-puts them itself): the
        # composed prompt path keys its clip-score cache on the staged
        # bytes, which only exist host-side here
        host_inputs = [x[None] for x in inputs]
        scores = np.asarray(entry.forward(*host_inputs), dtype=np.float32)[0]
        return unstage_result(scores, meta, entry)
