"""Serving tests: prompt rendering, engine registry, and the /segment
handler (reference segmentation_webapp/app.py behavioral contracts)."""
import base64
import io
import os

import jax
import jax.numpy as jnp

import numpy as np
import pytest

from image_segmentation_tpu.serve.app import (
    build_demo_engine,
    decode_base64_image,
    encode_png_base64,
    handle_segment,
)
from image_segmentation_tpu.serve.render import (
    create_prompt_mask,
    render_bbox,
    render_points,
    render_scribble,
)


@pytest.fixture(scope="module")
def engine():
    return build_demo_engine()


def _b64_image(h=50, w=70, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


class TestRender:
    def test_points_circle_then_blur(self):
        m = render_points([{"x": 32, "y": 32}], (64, 64))
        assert m.shape == (64, 64)
        assert m.max() == 1.0
        assert m[32, 32] > 0.9
        assert m[0, 0] < 0.05
        # blur makes it smooth: value at radius ~20 still nonzero
        assert m[32, 52] > 0.1

    def test_multiple_points(self):
        m = render_points([{"x": 10, "y": 10}, {"x": 54, "y": 54}], (64, 64))
        assert m[10, 10] > 0.5 and m[54, 54] > 0.5

    def test_bbox(self):
        m = render_bbox({"x": 10, "y": 20, "width": 30, "height": 10}, (64, 64))
        assert m[25, 20] == 1.0
        assert m[25, 45] == 0.0
        assert m[19, 20] == 0.0

    def test_bbox_negative_origin_clips_not_shifts(self):
        """A box starting off-canvas is CLIPPED (PIL rectangle
        semantics), not translated to the edge with its full width."""
        m = render_bbox({"x": -10, "y": 5, "width": 20, "height": 10},
                        (100, 100))
        assert m[10, 5] == 1.0   # visible part [0, 10)
        assert m[10, 9] == 1.0
        assert m[10, 10] == 0.0  # NOT extended to x=20 by the clamp
        # fully off-canvas: empty mask
        m2 = render_bbox({"x": -50, "y": -50, "width": 20, "height": 20},
                         (100, 100))
        assert m2.sum() == 0

    def test_scribble_threshold(self):
        s = np.zeros((64, 64), np.uint8)
        s[5:10, 5:10] = 200
        s[20:25, 20:25] = 5  # below threshold 10
        m = render_scribble(s, (64, 64))
        assert m[7, 7] == 1.0
        assert m[22, 22] == 0.0

    def test_text_prompt_empty(self):
        m = create_prompt_mask("text", "a cat", (32, 32))
        assert m.sum() == 0.0


class TestEngine:
    def test_all_four_models_registered(self, engine):
        assert engine.available() == ["autoencoder", "clip", "prompt_model", "unet"]

    def test_segment_returns_original_size(self, engine):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (50, 70, 3)).astype(np.float32)
        out = engine.segment(img, "unet")
        assert out["mask"].shape == (50, 70)
        assert out["color_mask"].shape == (50, 70, 3)
        assert out["class_names"] == ["background", "cat", "dog", "boundary"]

    def test_prompt_model_uses_heatmap(self, engine):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
        hm = render_points([{"x": 32, "y": 32}], (64, 64))
        out = engine.segment(img, "prompt_model", prompt_mask=hm)
        assert out["class_names"] == ["deactivated", "background", "cat", "dog"]
        assert out["mask"].shape == (64, 64)

    def test_unknown_model_raises(self, engine):
        with pytest.raises(KeyError):
            engine.segment(np.zeros((10, 10, 3), np.float32), "nope")

    def test_prompt_composed_shares_clip_program(self, engine):
        """build_demo_engine registers the prompt family COMPOSED through
        the clip family's ClipUNet program (register_prompt_composed):
        the entry carries a score cache instead of its own monolithic
        jitted composite, and repeat clicks on one image hit the cache —
        the interactive-session contract the decomposition exists for
        (reference webapp UX: many clicks per uploaded image,
        segmentation_webapp/static/script.js:198-283)."""
        from image_segmentation_tpu.serve.render import render_points

        entry = engine.models["prompt_model"]
        assert entry.score_cache is not None, (
            "demo prompt family should register via "
            "register_prompt_composed (matching clip architecture)")
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 1, (60, 60, 3)).astype(np.float32)
        h0 = entry.score_cache.hits
        outs = [
            engine.segment(img, "prompt_model",
                           prompt_mask=render_points([{"x": x, "y": 30}],
                                                     (60, 60)))
            for x in (10, 30, 50)
        ]
        assert entry.score_cache.hits >= h0 + 2  # clicks 2 and 3 hit
        assert all(o["mask"].shape == (60, 60) for o in outs)

    def test_prompt_composed_matches_monolithic(self):
        """Decomposed prompt serving (shared clip program + head
        program) must produce the same segmentation as the monolithic
        PromptModel registration — float32 transport for exactness."""
        from image_segmentation_tpu.serve.app import demo_model_specs
        from image_segmentation_tpu.serve.engine import InferenceEngine
        from image_segmentation_tpu.serve.render import render_points

        specs = {s[0]: s for s in demo_model_specs()}
        mono = InferenceEngine(fast_transfer=False)
        comp = InferenceEngine(fast_transfer=False)
        for eng in (mono, comp):
            name, model, v, tsize, _ = specs["clip"]
            eng.register(name, model, v, tsize)
        _, pm, pv, pt, _ = specs["prompt_model"]
        mono.register("prompt_model", pm, pv, pt, needs_prompt=True)
        comp.register_prompt_composed("prompt_model", pm, pv,
                                      via="clip", target_size=pt)
        assert comp.models["prompt_model"].score_cache is not None

        rng = np.random.default_rng(2)
        img = rng.uniform(0, 1, (48, 72, 3)).astype(np.float32)
        hm = render_points([{"x": 36, "y": 24}], (48, 72))
        a = mono.segment(img, "prompt_model", prompt_mask=hm)
        b = comp.segment(img, "prompt_model", prompt_mask=hm)
        np.testing.assert_array_equal(a["mask"], b["mask"])
        # and through the cache-hit path (second request, same image)
        c = comp.segment(img, "prompt_model", prompt_mask=hm)
        np.testing.assert_array_equal(a["mask"], c["mask"])

    def test_registered_forward_does_not_embed_weights(self):
        """The live serving forward must take weights as a jit ARGUMENT,
        not closure constants: closure capture embeds every weight as an
        HLO literal, and a big model's compile request then exceeds the
        remote-compile tunnel's body limit (measured: full-geometry
        ClipUNet -> HTTP 413). Lowering the params-form forward must
        produce an HLO whose size does not scale with the weights."""
        import jax
        import jax.numpy as jnp

        from image_segmentation_tpu.models import UNet
        from image_segmentation_tpu.serve.engine import (
            make_serving_forward,
            make_serving_forward_params,
        )

        model = UNet(num_classes=4, base=16)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
        )
        n_weight_bytes = sum(
            np.asarray(x).nbytes for x in jax.tree.leaves(variables)
        )
        assert n_weight_bytes > 4_000_000  # the experiment is meaningful

        x = jnp.zeros((1, 32, 32, 3))
        params_text = jax.jit(
            make_serving_forward_params(model)
        ).lower(variables, x).as_text()
        # weights-as-arguments: HLO is structure-only, orders of
        # magnitude below the weight bytes
        assert len(params_text) < n_weight_bytes / 4, len(params_text)

        # the closure form (AOT export's contract) embeds them — that is
        # its documented job, and what register() must never lower
        closure_text = jax.jit(
            make_serving_forward(model, variables)
        ).lower(x).as_text()
        assert len(closure_text) > len(params_text) * 5, (
            len(closure_text), len(params_text)
        )


class TestHandler:
    def test_segment_happy_path(self, engine):
        out = handle_segment(engine, {"image": _b64_image(), "model": "unet"})
        assert "output_mask" in out
        png = base64.b64decode(out["output_mask"])
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        assert out["class_names"][1] == "cat"

    def test_segment_with_point_prompt(self, engine):
        out = handle_segment(
            engine,
            {
                "image": _b64_image(64, 64),
                "model": "prompt_model",
                "prompt_type": "points",
                "prompt_data": [{"x": 30, "y": 30}],
            },
        )
        assert "output_mask" in out
        assert out["class_names"][0] == "deactivated"

    def test_segment_with_label(self, engine):
        from PIL import Image

        lab = np.zeros((50, 70), np.uint8)
        lab[:, 35:] = 1
        lab[0] = 255  # boundary remaps to 3 -> blue
        buf = io.BytesIO()
        Image.fromarray(lab).save(buf, format="PNG")
        out = handle_segment(
            engine,
            {
                "image": _b64_image(),
                "model": "unet",
                "label": base64.b64encode(buf.getvalue()).decode(),
            },
        )
        assert "output_label" in out

    def test_segment_with_bbox_prompt(self, engine):
        """bbox payload exactly as the frontend builds it
        (static/script.js promptPayload): {x, y, width, height} in
        original-image pixels."""
        out = handle_segment(
            engine,
            {
                "image": _b64_image(64, 64),
                "model": "prompt_model",
                "prompt_type": "bbox",
                "prompt_data": {"x": 10, "y": 12, "width": 30, "height": 24},
            },
        )
        assert "output_mask" in out
        assert out["class_names"][0] == "deactivated"

    def test_segment_with_scribble_prompt(self, engine):
        """scribble payload as the frontend ships it: a data-URL PNG of
        the stroke canvas (white strokes on black)."""
        from PIL import Image

        strokes = np.zeros((64, 64), np.uint8)
        strokes[20:26, 8:56] = 255  # one horizontal stroke
        buf = io.BytesIO()
        Image.fromarray(strokes).save(buf, format="PNG")
        data_url = ("data:image/png;base64,"
                    + base64.b64encode(buf.getvalue()).decode())
        out = handle_segment(
            engine,
            {
                "image": _b64_image(64, 64),
                "model": "prompt_model",
                "prompt_type": "scribble",
                "prompt_data": data_url,
            },
        )
        assert "output_mask" in out
        assert out["class_names"][0] == "deactivated"

    def test_frontend_exposes_all_three_prompt_modes(self):
        """The shipped UI must exercise every prompt type the backend
        renders (VERDICT r2 item 8) — contract on the static assets."""
        import image_segmentation_tpu.serve as serve_pkg

        base = os.path.dirname(serve_pkg.__file__)
        with open(os.path.join(base, "static", "script.js")) as f:
            js = f.read()
        for needle in ('"points"', '"bbox"', '"scribble"',
                       "toDataURL", "prompt_type"):
            assert needle in js, needle
        with open(os.path.join(base, "templates", "index.html")) as f:
            html = f.read()
        for mode in ("point", "bbox", "scribble"):
            assert f'value="{mode}"' in html, mode

    def test_missing_fields(self, engine):
        assert "error" in handle_segment(engine, {})
        assert "error" in handle_segment(engine, {"model": "unet"})
        bad = handle_segment(engine, {"image": _b64_image(), "model": "zzz"})
        assert "error" in bad and "available" in bad

    def test_bad_image_data(self, engine):
        out = handle_segment(engine, {"image": "!!!notbase64", "model": "unet"})
        assert "error" in out

    def test_decode_data_url(self):
        b64 = _b64_image(20, 30)
        img = decode_base64_image("data:image/png;base64," + b64)
        assert img.shape == (20, 30, 3)
        assert 0 <= img.min() and img.max() <= 1

    def test_encode_roundtrip(self):
        arr = np.random.default_rng(0).integers(0, 255, (16, 16, 3), dtype=np.uint8)
        b64 = encode_png_base64(arr)
        back = decode_base64_image(b64)
        np.testing.assert_allclose(back * 255, arr, atol=0.5)


class TestBatchingEngine:
    def test_concurrent_results_match_direct(self, engine):
        import threading

        from image_segmentation_tpu.serve.batching import BatchingEngine

        be = BatchingEngine(engine, max_batch=4, max_wait_ms=20)
        try:
            rng = np.random.default_rng(0)
            imgs = [
                rng.uniform(0, 1, (40 + i, 50 + i, 3)).astype(np.float32)
                for i in range(6)
            ]
            want = [engine.segment(im, "unet")["mask"] for im in imgs]
            got = [None] * len(imgs)

            def run(i):
                got[i] = be.segment(imgs[i], "unet")["mask"]

            threads = [
                threading.Thread(target=run, args=(i,)) for i in range(len(imgs))
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            for i in range(len(imgs)):
                np.testing.assert_array_equal(got[i], want[i])
        finally:
            be.close()

    def test_single_request_works(self, engine):
        from image_segmentation_tpu.serve.batching import BatchingEngine

        be = BatchingEngine(engine, max_batch=8)
        try:
            img = np.random.default_rng(1).uniform(0, 1, (30, 40, 3)).astype(
                np.float32
            )
            out = be.segment(img, "clip")
            assert out["mask"].shape == (30, 40)
        finally:
            be.close()

    def test_prompt_without_data_is_client_error(self, engine):
        """Malformed prompt payloads are validation errors, not 500s."""
        from image_segmentation_tpu.serve.app import handle_segment

        out = handle_segment(engine, {
            "image": _b64_image(16, 16),
            "model": "prompt_model",
            "prompt_type": "bbox",  # no prompt_data
        })
        assert "error" in out and "prompt_data" in out["error"]

    def test_checkpoint_dir_accepts_config_names(self, tmp_path):
        """The train-then-serve flow writes MO_{cfg.name} (MO_unet_noaug
        etc.); build_engine_from_checkpoints must find those, not just
        the serving aliases."""
        import jax
        import jax.numpy as jnp

        from image_segmentation_tpu.models import UNet
        from image_segmentation_tpu.serve.app import (
            build_engine_from_checkpoints,
        )
        from image_segmentation_tpu.train.checkpoint import save_params_only

        model = UNet(num_classes=4)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
        )
        save_params_only(
            str(tmp_path / "MO_unet_noaug"), variables["params"],
            batch_stats=variables.get("batch_stats"),
        )
        eng = build_engine_from_checkpoints(str(tmp_path))
        assert eng.available() == ["unet"]

    def test_segment_after_close_raises(self, engine):
        from image_segmentation_tpu.serve.batching import BatchingEngine

        be = BatchingEngine(engine, max_batch=4)
        be.close()
        img = np.zeros((16, 16, 3), np.float32)
        with pytest.raises(RuntimeError, match="closed"):
            be.segment(img, "unet")
        be.close()  # idempotent

    def test_two_models_both_served(self, engine):
        """Round-robin: concurrent requests to two models both complete
        (the old first-non-empty-queue pick could starve the second)."""
        import threading

        from image_segmentation_tpu.serve.batching import BatchingEngine

        be = BatchingEngine(engine, max_batch=2, max_wait_ms=2)
        try:
            rng = np.random.default_rng(2)
            imgs = [rng.uniform(0, 1, (24, 24, 3)).astype(np.float32)
                    for _ in range(8)]
            results = {}

            def run(i, name):
                # generous deadline: up to 4 jit compiles (2 models × 2
                # batch buckets) behind one worker, possibly under xdist
                # CPU contention — 30 s flaked on a loaded host
                results[(i, name)] = be.segment(imgs[i], name,
                                                timeout=180)["mask"]

            threads = [
                threading.Thread(target=run, args=(i, name))
                for i in range(4) for name in ("unet", "clip")
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert len(results) == 8
            for (i, name), mask in results.items():
                assert mask.shape == (24, 24)
        finally:
            be.close()

    def test_unknown_model_raises(self, engine):
        from image_segmentation_tpu.serve.batching import BatchingEngine

        be = BatchingEngine(engine)
        try:
            with pytest.raises(KeyError):
                be.segment(np.zeros((8, 8, 3), np.float32), "nope")
        finally:
            be.close()


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 fake devices")
class TestMeshServing:
    def test_mesh_engine_matches_single_device(self):
        """InferenceEngine(mesh=...) replicates weights over the slice and
        shards divisible batches over 'data'; outputs must equal the
        single-device engine bit-for-bit-ish, for both a divisible batch
        (sharded plan) and an odd batch (replicated fallback)."""
        import numpy as np

        from image_segmentation_tpu.models import UNet
        from image_segmentation_tpu.parallel.mesh import get_mesh
        from image_segmentation_tpu.serve.engine import InferenceEngine

        model = UNet(num_classes=4, base=8)
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                       train=False)
        plain = InferenceEngine(fast_transfer=False)
        plain.register("unet", model, v, target_size=32)
        mesh = get_mesh(jax.devices()[:8])
        meshed = InferenceEngine(fast_transfer=False, mesh=mesh)
        meshed.register("unet", model, v, target_size=32)

        rng = np.random.default_rng(0)
        for batch in (8, 3):
            x = jnp.asarray(rng.uniform(0, 1, (batch, 32, 32, 3)),
                            jnp.float32)
            want = np.asarray(plain.models["unet"].forward(x))
            got = np.asarray(meshed.models["unet"].forward(x))
            np.testing.assert_allclose(got, want, atol=2e-5)

        # the divisible batch really is sharded across the mesh
        x8 = jax.device_put(
            jnp.asarray(rng.uniform(0, 1, (8, 32, 32, 3)), jnp.float32))
        out = meshed.models["unet"].forward(x8)
        assert len(out.sharding.device_set) == 8

    def test_segment_through_mesh_engine(self):
        import numpy as np

        from image_segmentation_tpu.models import UNet
        from image_segmentation_tpu.parallel.mesh import get_mesh
        from image_segmentation_tpu.serve.engine import InferenceEngine

        model = UNet(num_classes=4, base=8)
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                       train=False)
        eng = InferenceEngine(mesh=get_mesh(jax.devices()[:8]))
        eng.register("unet", model, v, target_size=32)
        img = np.random.default_rng(1).uniform(0, 1, (41, 57, 3)).astype(
            np.float32)
        res = eng.segment(img, "unet")
        assert res["mask"].shape == (41, 57)
