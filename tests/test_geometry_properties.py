"""Property-based geometry tests (hypothesis): the resize+pad contract
must hold for ARBITRARY image sizes, not just the hand-picked ones."""
import numpy as np
from hypothesis import given, settings, strategies as st

from image_segmentation_tpu.ops import geometry as G

sizes = st.integers(min_value=3, max_value=300)
targets = st.sampled_from([32, 64, 96, 224, 256])


@settings(max_examples=40, deadline=None)
@given(h=sizes, w=sizes, t=targets)
def test_forward_meta_invariants(h, w, t):
    img = np.full((h, w, 3), 0.5, np.float32)
    out, meta = G.resize_with_padding_np(img, t)
    nh, nw = meta["new_size"]
    pl_, pt, pr, pb = meta["pad"]
    assert out.shape == (t, t, 3)
    # longer side fills the target exactly
    assert max(nh, nw) == t
    # padding accounts for the rest
    assert pl_ + nw + pr == t and pt + nh + pb == t
    assert pl_ >= 0 and pt >= 0
    # exact rounding contract: new = max(1, round(orig * scale)) with
    # scale = min(t/h, t/w)  (reference semantics, utils/utils.py:24-38)
    scale = min(t / h, t / w)
    assert nh == max(1, round(h * scale))
    assert nw == max(1, round(w * scale))
    # equivalently: each side is within half a pixel of the ideal
    # aspect-preserving size (unless clamped to 1)
    if nh > 1:
        assert abs(nh - h * scale) <= 0.5
    if nw > 1:
        assert abs(nw - w * scale) <= 0.5


@settings(max_examples=30, deadline=None)
@given(h=sizes, w=sizes, t=targets)
def test_inverse_restores_original_shape(h, w, t):
    img = np.random.default_rng(0).uniform(0, 1, (h, w, 3)).astype(np.float32)
    out, meta = G.resize_with_padding_np(img, t)
    back = G.invert_resize_padding_np(out.astype(np.float32), meta)
    assert back.shape == (h, w, 3)
    assert np.isfinite(back).all()


@settings(max_examples=30, deadline=None)
@given(h=sizes, w=sizes, t=targets)
def test_nearest_never_invents_classes(h, w, t):
    rng = np.random.default_rng(1)
    label = rng.choice([0.0, 1.0, 2.0, 3.0], size=(h, w, 1)).astype(np.float32)
    out, meta = G.resize_with_padding_np(label, t, method="nearest")
    assert set(np.unique(out)).issubset({0.0, 1.0, 2.0, 3.0})
    inv = G.invert_resize_padding_np(out, meta, method="nearest")
    assert set(np.unique(inv)).issubset({0.0, 1.0, 2.0, 3.0})
    assert inv.shape == (h, w, 1)


@settings(max_examples=20, deadline=None)
@given(h=sizes, w=sizes)
def test_constant_image_stays_constant_in_content(h, w):
    img = np.full((h, w, 3), 0.7, np.float32)
    out, meta = G.resize_with_padding_np(img, 64)
    nh, nw = meta["new_size"]
    pl_, pt, _, _ = meta["pad"]
    content = out[pt : pt + nh, pl_ : pl_ + nw]
    np.testing.assert_allclose(content, 0.7, atol=1e-5)
