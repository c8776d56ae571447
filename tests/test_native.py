"""Native C++ resampler tests: bit-parity with the numpy reference path
and correct wiring into the geometry module."""
import numpy as np
import pytest

from image_segmentation_tpu.ops import geometry as G

native = pytest.importorskip("image_segmentation_tpu.ops.native")

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain to build the library"
)


def _img(h=93, w=157, c=3, seed=0):
    return np.random.default_rng(seed).uniform(0, 1, (h, w, c)).astype(np.float32)


class TestNativeParity:
    @pytest.mark.parametrize(
        "out_hw,antialias",
        [((256, 256), True), ((64, 48), True), ((300, 500), False)],
    )
    def test_linear_matches_numpy(self, out_hw, antialias):
        img = _img()
        a = native.resize_linear(img, out_hw, antialias=antialias)
        b = G.resize_linear_np(img, out_hw, antialias=antialias)
        np.testing.assert_allclose(a, b, atol=5e-6)

    def test_crop_resize_matches_numpy_crop(self):
        img = _img(200, 300, 4)
        a = native.resize_linear(img, (120, 80), crop=(15, 25, 100, 180))
        b = G.resize_linear_np(img[15:115, 25:205], (120, 80), antialias=False)
        np.testing.assert_allclose(a, b, atol=5e-6)

    @pytest.mark.parametrize("exact", [True, False])
    def test_nearest_matches_numpy(self, exact):
        img = _img(77, 41)
        a = native.resize_nearest(img, (100, 100), exact=exact)
        b = G.resize_nearest_np(img, (100, 100), exact=exact)
        np.testing.assert_array_equal(a, b.astype(np.float32))

    def test_batch_matches_single(self):
        imgs = np.stack([_img(64, 64, 3, s) for s in range(5)])
        batch = native.resize_batch_linear(imgs, (96, 96), antialias=False)
        for i in range(5):
            single = native.resize_linear(imgs[i], (96, 96), antialias=False)
            np.testing.assert_allclose(batch[i], single, atol=1e-6)

    def test_identity_is_exact(self):
        img = _img(64, 64)
        out = native.resize_linear(img, (64, 64), antialias=True)
        np.testing.assert_array_equal(out, img)


class TestGeometryUsesNative:
    def test_forward_and_inverse_roundtrip(self):
        img = _img(150, 100)
        out, meta = G.resize_with_padding_np(img, 64)
        inv = G.invert_resize_padding_np(
            np.repeat(out, 1, axis=2), meta, method="linear"
        )
        assert inv.shape == (150, 100, 3)
        assert np.isfinite(inv).all()

    def test_inverse_matches_pure_numpy_fallback(self):
        logits = _img(64, 64, c=4, seed=1)
        _, meta = G.resize_with_padding_np(_img(90, 61), 64)
        fast = G.invert_resize_padding_np(logits, meta, method="linear")
        pl_, pt, _, _ = meta["pad"]
        nh, nw = meta["new_size"]
        slow = G.resize_linear_np(
            logits[pt : pt + nh, pl_ : pl_ + nw], (90, 61), antialias=False
        )
        np.testing.assert_allclose(fast, slow, atol=5e-6)
