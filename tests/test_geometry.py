"""Geometry parity tests.

The inverse path must match the reference's F.interpolate semantics
bit-for-bit-ish (torch CPU is the oracle); forward device path must match
the host path and preserve the reference's meta contract
(reference utils/utils.py:13-115).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from image_segmentation_tpu.ops import geometry as G


def _rand_img(h, w, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, size=(h, w, c)).astype(np.float32)


class TestMeta:
    @pytest.mark.parametrize(
        "h,w,t", [(375, 500, 256), (500, 375, 256), (224, 224, 224), (100, 30, 64)]
    )
    def test_meta_matches_reference_formula(self, h, w, t):
        m = G.compute_meta(h, w, t)
        scale = min(t / w, t / h)
        new_w = int(round(w * scale))
        new_h = int(round(h * scale))
        assert int(m.new_h) == new_h
        assert int(m.new_w) == new_w
        assert int(m.pad_left) == (t - new_w) // 2
        assert int(m.pad_top) == (t - new_h) // 2
        assert max(new_h, new_w) == t


class TestHostForward:
    def test_padding_is_zero_and_centered(self):
        img = _rand_img(100, 200) + 1.0  # strictly positive content
        out, meta = G.resize_with_padding_np(img, 64)
        assert out.shape == (64, 64, 3)
        nh, nw = meta["new_size"]
        pl_, pt, pr, pb = meta["pad"]
        assert nw == 64 and pl_ == 0 and pr == 0
        # Padding rows exactly zero
        assert np.all(out[:pt] == 0)
        assert np.all(out[pt + nh :] == 0)
        # Content strictly positive
        assert np.all(out[pt : pt + nh] > 0)

    def test_forward_matches_torch_antialiased_resize(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        img = _rand_img(93, 157)
        out, meta = G.resize_with_padding_np(img, 64, antialias=True)
        nh, nw = meta["new_size"]
        ref = F.interpolate(
            torch.from_numpy(img).permute(2, 0, 1)[None].double(),
            size=(nh, nw),
            mode="bilinear",
            align_corners=False,
            antialias=True,
        )[0].permute(1, 2, 0).numpy()
        pl_, pt, _, _ = meta["pad"]
        np.testing.assert_allclose(out[pt : pt + nh, pl_ : pl_ + nw], ref, atol=2e-5)


class TestInverse:
    @pytest.mark.parametrize("h,w,t", [(375, 500, 256), (90, 61, 64)])
    def test_inverse_matches_torch_interpolate_bilinear(self, h, w, t):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        logits = _rand_img(t, t, c=4, seed=1)
        _, meta = G.resize_with_padding_np(_rand_img(h, w), t)
        inv = G.invert_resize_padding_np(logits, meta, method="linear")
        assert inv.shape == (h, w, 4)

        pl_, pt, _, _ = meta["pad"]
        nh, nw = meta["new_size"]
        crop = logits[pt : pt + nh, pl_ : pl_ + nw]
        ref = F.interpolate(
            torch.from_numpy(np.ascontiguousarray(crop)).permute(2, 0, 1)[None].double(),
            size=(h, w),
            mode="bilinear",
            align_corners=False,
        )[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(inv, ref, atol=1e-6)

    def test_inverse_nearest_matches_torch(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        h, w, t = 123, 77, 64
        label = np.random.default_rng(2).integers(0, 4, size=(t, t, 1)).astype(np.float32)
        _, meta = G.resize_with_padding_np(_rand_img(h, w), t)
        inv = G.invert_resize_padding_np(label, meta, method="nearest")
        pl_, pt, _, _ = meta["pad"]
        nh, nw = meta["new_size"]
        crop = label[pt : pt + nh, pl_ : pl_ + nw]
        ref = F.interpolate(
            torch.from_numpy(np.ascontiguousarray(crop)).permute(2, 0, 1)[None],
            size=(h, w),
            mode="nearest",
        )[0].permute(1, 2, 0).numpy()
        np.testing.assert_array_equal(inv, ref)

    def test_roundtrip_recovers_smooth_image(self):
        # Smooth content should survive resize→pad→unpad→resize closely.
        yy, xx = np.mgrid[0:120, 0:200]
        img = np.stack(
            [np.sin(yy / 25.0), np.cos(xx / 40.0), (yy + xx) / 320.0], axis=-1
        ).astype(np.float32)
        out, meta = G.resize_with_padding_np(img, 96)
        back = G.invert_resize_padding_np(out, meta)
        assert np.abs(back - img).mean() < 0.02


class TestDeviceForward:
    def test_batched_matches_host_linear(self):
        sizes = [(100, 200), (131, 77), (64, 64)]
        S, T = 256, 64
        bufs, sz = [], []
        imgs = []
        for i, (h, w) in enumerate(sizes):
            img = _rand_img(h, w, seed=i)
            imgs.append(img)
            bufs.append(G.stage_image_np(img, S))
            sz.append((h, w))
        bufs = jnp.asarray(np.stack(bufs))
        sz = jnp.asarray(np.array(sz, dtype=np.int32))
        out, metas = G.batched_resize_with_padding(bufs, sz, T, method="linear")
        out = np.asarray(out)
        for i, img in enumerate(imgs):
            host, meta = G.resize_with_padding_np(img, T, antialias=True)
            np.testing.assert_allclose(out[i], host, atol=2e-4)
            m = G.metas_to_list(metas)[i]
            assert (int(m.new_h), int(m.new_w)) == meta["new_size"]
            assert int(m.pad_top) == meta["pad"][1]
            assert int(m.pad_left) == meta["pad"][0]

    def test_batched_nearest_labels_preserve_classes(self):
        S, T = 128, 64
        rng = np.random.default_rng(3)
        label = rng.integers(0, 4, size=(100, 80, 1)).astype(np.float32)
        buf = G.stage_image_np(label, S)
        out, metas = G.batched_resize_with_padding(
            jnp.asarray(buf[None]), jnp.asarray([[100, 80]], dtype=np.int32), T,
            method="nearest",
        )
        out = np.asarray(out)[0]
        # Nearest must only produce values present in the input (plus 0 pad)
        assert set(np.unique(out)).issubset({0.0, 1.0, 2.0, 3.0})
        m = G.metas_to_list(metas)[0]
        pt, pl_ = int(m.pad_top), int(m.pad_left)
        nh, nw = int(m.new_h), int(m.new_w)
        # host oracle
        host, _ = G.resize_with_padding_np(label, T, method="nearest")
        np.testing.assert_array_equal(out[pt:pt+nh, pl_:pl_+nw], host[pt:pt+nh, pl_:pl_+nw])

    def test_oversized_image_staging(self):
        img = _rand_img(300, 500)  # larger than buffer
        buf = G.stage_image_np(img, 256)
        assert buf.shape == (256, 256, 3)
