"""Native image codec + pipeline (ops/native_codec.py,
data/native_pipeline.py) pinned against the PIL/numpy path.

The native library is the C++ data-loader runtime (native/imagecodec.cpp);
the PIL + resize_with_padding_np path is the parity oracle — every test
here asserts the two produce the same arrays and metas (reference
semantics: utils/dataset.py:6-103 decode, utils/utils.py:13-49 geometry).
"""
import os

import numpy as np
import pytest
from PIL import Image

from image_segmentation_tpu.data import loader as L
from image_segmentation_tpu.data.dataset import (
    PromptDataset,
    SegmentationDataset,
)
from image_segmentation_tpu.data.labels import target_remap
from image_segmentation_tpu.data import native_pipeline as NP
from image_segmentation_tpu.ops import geometry as G
from image_segmentation_tpu.ops import native_codec as nc

pytestmark = pytest.mark.skipif(
    not nc.available(), reason="native codec did not build"
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def _write_tree(tmp_path, rng, n=4, heatmaps=False):
    """A tiny file dataset with varied sizes/formats."""
    img_dir = tmp_path / "color"
    lab_dir = tmp_path / "label"
    img_dir.mkdir(exist_ok=True)
    lab_dir.mkdir(exist_ok=True)
    heat_dir = tmp_path / "point_prompt"
    if heatmaps:
        heat_dir.mkdir(exist_ok=True)
    sizes = [(37, 53), (64, 64), (81, 30), (45, 90)][:n]
    for i, (h, w) in enumerate(sizes):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(img_dir / f"img{i}.jpg", quality=92)
        lab = rng.integers(0, 3, (h, w), dtype=np.uint8)
        lab[0, 0] = 255  # boundary sentinel
        Image.fromarray(lab, mode="L").save(lab_dir / f"img{i}.png")
        if heatmaps:
            hm = rng.integers(0, 256, (h, w), dtype=np.uint8)
            Image.fromarray(hm, mode="L").save(heat_dir / f"img{i}.png")
    return str(img_dir), str(lab_dir), str(heat_dir)


class TestDecode:
    def test_png_bit_exact(self, tmp_path, rng):
        img = rng.integers(0, 256, (21, 33, 3), dtype=np.uint8)
        p = tmp_path / "a.png"
        Image.fromarray(img).save(p)
        dec = nc.decode_bytes(p.read_bytes())
        np.testing.assert_array_equal(dec, img)

    def test_jpeg_matches_pil(self, tmp_path, rng):
        img = rng.integers(0, 256, (40, 28, 3), dtype=np.uint8)
        p = tmp_path / "a.jpg"
        Image.fromarray(img).save(p, quality=88)
        pil = np.asarray(Image.open(p))
        dec = nc.decode_bytes(p.read_bytes())
        # same libjpeg on this image ⇒ bit-exact; allow 1 LSB headroom
        # for IDCT variation across libjpeg builds
        assert np.abs(dec.astype(int) - pil.astype(int)).max() <= 1

    def test_rgba_and_gray_png(self, tmp_path, rng):
        rgba = rng.integers(0, 256, (17, 19, 4), dtype=np.uint8)
        p = tmp_path / "rgba.png"
        Image.fromarray(rgba, mode="RGBA").save(p)
        np.testing.assert_array_equal(nc.decode_bytes(p.read_bytes()), rgba)
        gray = rng.integers(0, 256, (17, 19), dtype=np.uint8)
        q = tmp_path / "gray.png"
        Image.fromarray(gray, mode="L").save(q)
        np.testing.assert_array_equal(
            nc.decode_bytes(q.read_bytes())[:, :, 0], gray
        )

    def test_palette_png_expands_to_rgb(self, tmp_path, rng):
        img = rng.integers(0, 4, (15, 15), dtype=np.uint8) * 60
        pal = Image.fromarray(img, mode="L").convert("P")
        p = tmp_path / "pal.png"
        pal.save(p)
        ref = np.asarray(pal.convert("RGB"))
        np.testing.assert_array_equal(nc.decode_bytes(p.read_bytes()), ref)

    def test_probe(self, tmp_path, rng):
        img = rng.integers(0, 256, (23, 31, 3), dtype=np.uint8)
        p = tmp_path / "a.jpg"
        Image.fromarray(img).save(p)
        assert nc.probe(str(p)) == (23, 31, 3)

    def test_corrupt_raises(self, tmp_path):
        p = tmp_path / "bad.png"
        p.write_bytes(b"\x89PNG\r\n\x1a\n garbage")
        with pytest.raises(nc.CodecError):
            nc.decode_bytes(p.read_bytes())
        with pytest.raises(nc.CodecError):
            nc.probe(str(p))

    def test_non_png_jpeg_rejected(self, tmp_path):
        p = tmp_path / "x.bin"
        p.write_bytes(b"not an image at all")
        with pytest.raises(nc.CodecError) as ei:
            nc.decode_bytes(p.read_bytes())
        assert ei.value.rc == -2

    def test_truncated_jpeg_rejected(self, tmp_path, rng):
        """libjpeg gray-fills truncated streams with only a WARNING; the
        codec must surface that as a decode error like PIL does."""
        img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        p = tmp_path / "t.jpg"
        Image.fromarray(img).save(p, quality=90)
        data = p.read_bytes()
        with pytest.raises(nc.CodecError) as ei:
            nc.decode_bytes(data[: len(data) // 2])
        assert ei.value.rc == -3

    def test_16bit_png_declined(self, tmp_path):
        """16-bit PNGs decode to uint16 under PIL; the codec declines
        them (it would truncate to the high byte) so the PIL fallback —
        the parity oracle — handles them."""
        arr16 = (np.arange(64, dtype=np.uint16).reshape(8, 8) * 1000)
        p = tmp_path / "d16.png"
        Image.fromarray(arr16, mode="I;16").save(p)
        with pytest.raises(nc.CodecError) as ei:
            nc.decode_bytes(p.read_bytes())
        assert ei.value.rc == -2

    def test_probe_bytes(self, tmp_path, rng):
        img = rng.integers(0, 256, (12, 34, 3), dtype=np.uint8)
        p = tmp_path / "a.png"
        Image.fromarray(img).save(p)
        assert nc.probe_bytes(p.read_bytes()) == (12, 34, 3)


class TestFusedLoads:
    def test_load_image_matches_numpy_path(self, tmp_path, rng):
        img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
        p = tmp_path / "a.png"
        Image.fromarray(img).save(p)
        out, meta = nc.load_image(str(p), 64)
        ref, rmeta = G.resize_with_padding_np(
            img.astype(np.float32) / 255.0, 64, method="linear",
            antialias=True,
        )
        assert meta == rmeta
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_load_image_gray_replicates(self, tmp_path, rng):
        gray = rng.integers(0, 256, (30, 20), dtype=np.uint8)
        p = tmp_path / "g.png"
        Image.fromarray(gray, mode="L").save(p)
        out, _ = nc.load_image(str(p), 32)
        np.testing.assert_allclose(out[:, :, 0], out[:, :, 1])
        np.testing.assert_allclose(out[:, :, 0], out[:, :, 2])

    def test_load_image_rgba_drops_alpha(self, tmp_path, rng):
        rgba = rng.integers(0, 256, (30, 20, 4), dtype=np.uint8)
        p = tmp_path / "r.png"
        Image.fromarray(rgba, mode="RGBA").save(p)
        out, meta = nc.load_image(str(p), 32)
        ref, _ = G.resize_with_padding_np(
            rgba[:, :, :3].astype(np.float32) / 255.0, 32,
            method="linear", antialias=True,
        )
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_load_label_exact_with_orig(self, tmp_path, rng):
        lab = rng.integers(0, 3, (41, 29), dtype=np.uint8)
        lab[:3, :3] = 255
        p = tmp_path / "l.png"
        Image.fromarray(lab, mode="L").save(p)
        out, meta, orig = nc.load_label(str(p), 64, orig_hw=(41, 29))
        ref, rmeta = G.resize_with_padding_np(
            lab[:, :, None].astype(np.float32), 64, method="nearest"
        )
        assert meta == rmeta
        np.testing.assert_array_equal(out, ref[:, :, 0].astype(np.int32))
        np.testing.assert_array_equal(orig, lab.astype(np.int32))
        # want_orig discovers the dims from the decode — no probe call
        out2, meta2, orig2 = nc.load_label(str(p), 64, want_orig=True)
        assert meta2 == meta
        np.testing.assert_array_equal(out2, out)
        np.testing.assert_array_equal(orig2, orig)

    def test_load_label_want_orig_capacity_retry(self, tmp_path, rng):
        """A label larger than the speculative buffer triggers the
        meta-guided exact retry (C contract: CODEC_ERR_SIZE with valid
        meta6)."""
        h, w = 800, 900  # > _DEFAULT_ORIG_CAP = 768*768
        lab = rng.integers(0, 4, (h, w), dtype=np.uint8)
        p = tmp_path / "big.png"
        Image.fromarray(lab, mode="L").save(p)
        out, meta, orig = nc.load_label(str(p), 64, want_orig=True)
        assert meta["original_size"] == (h, w)
        np.testing.assert_array_equal(orig, lab.astype(np.int32))

    def test_load_heatmap_matches_numpy_path(self, tmp_path, rng):
        hm = rng.integers(0, 256, (50, 22), dtype=np.uint8)
        p = tmp_path / "h.png"
        Image.fromarray(hm, mode="L").save(p)
        out, _ = nc.load_heatmap(str(p), 48)
        ref, _ = G.resize_with_padding_np(
            hm[:, :, None].astype(np.float32) / 255.0, 48,
            method="linear", antialias=True,
        )
        assert out.shape == (48, 48, 1)
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestPipeline:
    def test_materialize_matches_python_path(self, tmp_path, rng):
        img_dir, lab_dir, _ = _write_tree(tmp_path, rng)
        ds = SegmentationDataset(img_dir, lab_dir,
                                 target_transform=target_remap)
        fast = L.materialize(ds, 64, keep_orig_labels=True)
        slow = L.materialize(ds, 64, keep_orig_labels=True, native=False)
        np.testing.assert_allclose(fast.images, slow.images, atol=2e-2)
        # JPEG loss makes decode byte-identical only per-library; the
        # labels and geometry must be EXACT
        np.testing.assert_array_equal(fast.labels, slow.labels)
        for f in G.ResizeMeta._fields:
            np.testing.assert_allclose(
                getattr(fast.metas, f), getattr(slow.metas, f)
            )
        for a, b in zip(fast.orig_labels, slow.orig_labels):
            np.testing.assert_array_equal(a, b)
        # remap applied: no 255s survive
        assert fast.labels.max() <= 3
        assert all(o.max() <= 3 for o in fast.orig_labels)

    def test_materialize_prompt_triplets(self, tmp_path, rng):
        img_dir, lab_dir, heat_dir = _write_tree(tmp_path, rng,
                                                 heatmaps=True)
        # PromptDataset expects shared stems with .jpg/.png
        ds = PromptDataset(img_dir, heat_dir, lab_dir)
        fast = L.materialize(ds, 48)
        slow = L.materialize(ds, 48, native=False)
        assert fast.has_heatmaps
        np.testing.assert_allclose(fast.images, slow.images, atol=2e-2)
        np.testing.assert_allclose(fast.heatmaps, slow.heatmaps, atol=1e-5)
        np.testing.assert_array_equal(fast.labels, slow.labels)

    def test_gate_declines_image_transform(self, tmp_path, rng):
        img_dir, lab_dir, _ = _write_tree(tmp_path, rng, n=1)
        ds = SegmentationDataset(img_dir, lab_dir,
                                 transform=lambda x: x * 0.5)
        assert NP.try_materialize_dataset(ds, 32) is None

    def test_gate_declines_unknown_label_transform(self, tmp_path, rng):
        img_dir, lab_dir, _ = _write_tree(tmp_path, rng, n=1)
        ds = SegmentationDataset(img_dir, lab_dir,
                                 target_transform=lambda y: y[::-1])
        assert NP.try_materialize_dataset(ds, 32) is None
        # ... but an opt-in elementwise marker is accepted
        def shift(y):
            return y + 0

        shift.elementwise = True
        ds2 = SegmentationDataset(img_dir, lab_dir, target_transform=shift)
        assert NP.try_materialize_dataset(ds2, 32) is not None

    def test_fallback_on_undecodable_file(self, tmp_path, rng):
        """A BMP saved under .jpg: native codec declines, PIL fallback
        still materialises the item."""
        img_dir, lab_dir, _ = _write_tree(tmp_path, rng, n=2)
        img = rng.integers(0, 256, (25, 25, 3), dtype=np.uint8)
        Image.fromarray(img).save(os.path.join(img_dir, "img0.jpg"),
                                  format="BMP")
        ds = SegmentationDataset(img_dir, lab_dir)
        fast = L.materialize(ds, 32)
        slow = L.materialize(ds, 32, native=False)
        np.testing.assert_allclose(fast.images, slow.images, atol=2e-2)
        np.testing.assert_array_equal(fast.labels, slow.labels)

    def test_la_png_materialises_on_both_paths(self, tmp_path, rng):
        """Gray+alpha (LA) PNGs: the codec declines c==2 for images; the
        fallback (and the pure-Python path) drop alpha and replicate
        gray — both paths must agree and produce (T, T, 3)."""
        img_dir, lab_dir, _ = _write_tree(tmp_path, rng, n=2)
        la = rng.integers(0, 256, (25, 31, 2), dtype=np.uint8)
        Image.fromarray(la, mode="LA").save(
            os.path.join(img_dir, "img0.jpg"), format="PNG"
        )
        ds = SegmentationDataset(img_dir, lab_dir)
        fast = L.materialize(ds, 32)
        slow = L.materialize(ds, 32, native=False)
        assert fast.images.shape == (2, 32, 32, 3)
        np.testing.assert_allclose(fast.images, slow.images, atol=2e-2)
        # the LA item is gray in all three channels
        np.testing.assert_allclose(fast.images[0, :, :, 0],
                                   fast.images[0, :, :, 1])

    def test_16bit_label_falls_back_to_pil(self, tmp_path, rng):
        """A 16-bit label PNG must round-trip through the PIL fallback
        with its (uint16) values preserved, not byte-truncated."""
        img_dir, lab_dir, _ = _write_tree(tmp_path, rng, n=1)
        lab16 = (rng.integers(0, 4, (37, 53), dtype=np.uint16) * 1000)
        Image.fromarray(lab16, mode="I;16").save(
            os.path.join(lab_dir, "img0.png")
        )
        ds = SegmentationDataset(img_dir, lab_dir)
        fast = L.materialize(ds, 32)
        slow = L.materialize(ds, 32, native=False)
        np.testing.assert_array_equal(fast.labels, slow.labels)
        assert fast.labels.max() >= 256  # 16-bit values survived

    def test_single_worker_path(self, tmp_path, rng):
        img_dir, lab_dir, _ = _write_tree(tmp_path, rng, n=2)
        md = NP.materialize_paths(
            [os.path.join(img_dir, f"img{i}.jpg") for i in range(2)],
            [os.path.join(lab_dir, f"img{i}.png") for i in range(2)],
            40, workers=1,
        )
        assert md.images.shape == (2, 40, 40, 3)


class TestServeDecode:
    def test_upload_roundtrip_native(self, rng):
        import base64
        import io

        from image_segmentation_tpu.serve.app import (
            decode_base64_gray,
            decode_base64_image,
        )

        img = rng.integers(0, 256, (19, 23, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()
        out = decode_base64_image("data:image/png;base64," + b64)
        np.testing.assert_allclose(out, img.astype(np.float32) / 255.0)

        gray = rng.integers(0, 256, (19, 23), dtype=np.uint8)
        buf2 = io.BytesIO()
        Image.fromarray(gray, mode="L").save(buf2, format="PNG")
        g64 = base64.b64encode(buf2.getvalue()).decode()
        np.testing.assert_array_equal(decode_base64_gray(g64), gray)

        # RGB scribble upload → PIL luma conversion (native path is
        # probe-gated to single-channel images)
        rgb64 = base64.b64encode(buf.getvalue()).decode()
        pil_luma = np.asarray(
            Image.open(io.BytesIO(buf.getvalue())).convert("L")
        )
        np.testing.assert_array_equal(decode_base64_gray(rgb64), pil_luma)

    def test_la_upload_gets_three_channels(self, rng):
        import base64
        import io

        from image_segmentation_tpu.serve.app import decode_base64_image

        la = rng.integers(0, 256, (9, 11, 2), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(la, mode="LA").save(buf, format="PNG")
        out = decode_base64_image(base64.b64encode(buf.getvalue()).decode())
        assert out.shape == (9, 11, 3)
        np.testing.assert_allclose(out[:, :, 0], out[:, :, 2])
