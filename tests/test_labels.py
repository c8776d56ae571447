"""Label semantics tests (reference utils/dataset.py:131-138,
utils/utils.py:117-250)."""
import numpy as np

from image_segmentation_tpu.data.labels import (
    COLOR_MAP,
    calculate_class_weights,
    colorize_mask,
    convert_rgb_label_to_classes,
    remap_for_prompt_task,
    target_remap,
)


def test_target_remap():
    label = np.array([[0, 1], [2, 255]], dtype=np.uint8)
    out = target_remap(label)
    np.testing.assert_array_equal(out, [[0, 1], [2, 3]])
    # original untouched (pure function, unlike the reference's in-place)
    assert label[1, 1] == 255


def test_rgb_conversion():
    rgb = np.zeros((2, 3, 3), dtype=np.uint8)
    rgb[0, 0] = (128, 0, 0)     # cat
    rgb[0, 1] = (0, 128, 0)     # dog
    rgb[0, 2] = (255, 255, 255) # white -> bg
    rgb[1, 0] = (0, 0, 0)       # black -> bg
    rgb[1, 1] = (12, 34, 56)    # other -> ignore
    rgb[1, 2] = (128, 0, 0)
    out = convert_rgb_label_to_classes(rgb)
    np.testing.assert_array_equal(out, [[1, 2, 0], [0, 255, 1]])


def test_prompt_remap():
    label = np.array([[0, 1], [2, 255]], dtype=np.uint8)
    out = remap_for_prompt_task(label)
    # bg->1, cat->2, dog->3, boundary->bg->1
    np.testing.assert_array_equal(out, [[1, 2], [3, 1]])


def test_class_weights_formula():
    # 3 classes with pixel counts 80 / 15 / 5 over a single label
    label = np.concatenate(
        [np.zeros(80), np.ones(15), np.full(5, 2)]
    ).astype(np.int64)
    w = calculate_class_weights([label], num_classes=3)
    freq = np.array([0.8, 0.15, 0.05])
    expected = 1.0 / (freq + 1e-6)
    expected = expected / expected.sum() * 3.0
    np.testing.assert_allclose(w, expected, rtol=1e-5)


def test_class_weights_minweight_scheme():
    label = np.concatenate([np.zeros(90), np.ones(9), np.full(1, 2)]).astype(np.int64)
    w = calculate_class_weights(
        [label], num_classes=3, unimportant_class_indices=[2]
    )
    # class 2 down-weighted to the minimum raw weight (class 0's)
    assert w[2] == w.min()
    np.testing.assert_allclose(w.sum(), 3.0, rtol=1e-6)


def test_class_weights_ignore_index():
    label = np.array([0, 0, 1, 255, 255], dtype=np.int64)
    w_ign = calculate_class_weights([label], num_classes=2, ignore_index=255)
    # With ignore: counts 2/1. Without: 255 clamps to class 1 -> counts 2/3.
    w_no = calculate_class_weights([label], num_classes=2)
    assert w_ign[1] > w_ign[0]
    assert w_no[1] < w_ign[1]


def test_colorize():
    mask = np.array([[0, 1], [2, 3]])
    rgb = colorize_mask(mask)
    np.testing.assert_array_equal(rgb[0, 0], COLOR_MAP[0])
    np.testing.assert_array_equal(rgb[1, 1], COLOR_MAP[3])
