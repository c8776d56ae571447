"""Metrics tests: confusion-matrix accumulation and Dice/IoU/Acc formulas
(reference utils/MetricsHistory.py:55-128 as the behavioral contract)."""
import numpy as np
import jax.numpy as jnp

from image_segmentation_tpu.metrics import (
    MetricsHistory,
    confusion_counts,
    confusion_counts_masked,
)
from image_segmentation_tpu.metrics.confusion import (
    counts_from_confusion,
    metrics_from_counts,
)


def test_confusion_counts_toy():
    labels = jnp.asarray([[0, 0], [1, 2]])
    preds = jnp.asarray([[0, 1], [1, 1]])
    conf = np.asarray(confusion_counts(preds, labels, 3))
    expected = np.array([[1, 1, 0], [0, 1, 0], [0, 1, 0]], dtype=np.float32)
    np.testing.assert_array_equal(conf, expected)


def test_confusion_masked_excludes_padding():
    labels = jnp.asarray([[0, 0], [1, 2]])
    preds = jnp.asarray([[0, 1], [1, 1]])
    valid = jnp.asarray([[True, False], [True, True]])
    conf = np.asarray(confusion_counts_masked(preds, labels, valid, 3))
    expected = np.array([[1, 0, 0], [0, 1, 0], [0, 1, 0]], dtype=np.float32)
    np.testing.assert_array_equal(conf, expected)


def test_counts_from_confusion():
    conf = np.array([[5, 1, 0], [2, 7, 1], [0, 0, 4]], dtype=np.float64)
    tp, fp, fn, tn = counts_from_confusion(conf)
    np.testing.assert_array_equal(tp, [5, 7, 4])
    np.testing.assert_array_equal(fp, [2, 1, 1])
    np.testing.assert_array_equal(fn, [1, 3, 0])
    assert np.all(tp + fp + fn + tn == conf.sum())


def test_metrics_hand_computed():
    # 1 class problem embedded in 2 classes: tp=3 fp=1 fn=2 tn=4
    tp = np.array([3.0, 4.0])
    fp = np.array([1.0, 2.0])
    fn = np.array([2.0, 1.0])
    tn = np.array([4.0, 3.0])
    m = metrics_from_counts(tp, fp, fn, tn)
    np.testing.assert_allclose(m["per_class_iou"], [3 / 6, 4 / 7])
    np.testing.assert_allclose(m["per_class_dice"], [6 / 9, 8 / 11])
    np.testing.assert_allclose(m["per_class_acc"], [7 / 10, 7 / 10])


def test_history_accumulate_matches_manual():
    rng = np.random.default_rng(0)
    agg = MetricsHistory(num_classes=4, ignore_index=3)
    total_correct = 0
    total_pixels = 0
    for i in range(5):
        h, w = rng.integers(10, 40, size=2)
        label = rng.integers(0, 4, size=(h, w))
        scores = rng.normal(size=(h, w, 4))
        agg.accumulate(scores, label)
        pred = scores.argmax(-1)
        total_correct += (pred == label).sum()
        total_pixels += label.size
    dice, iou, acc = agg.compute_epoch_metrics()
    assert 0 <= iou <= dice <= 1  # dice >= iou always
    assert agg.confusion.sum() == total_pixels
    assert np.trace(agg.confusion) == total_correct


def test_history_ignore_index_excluded_from_mean():
    agg = MetricsHistory(num_classes=4, ignore_index=3)
    # Perfect on classes 0-2, catastrophic on 3: mean must still be 1.0
    label = np.array([[0, 1, 2, 3]])
    pred_scores = np.eye(4)[np.array([[0, 1, 2, 0]])]  # class 3 predicted as 0
    agg.accumulate(pred_scores, label)
    dice, iou, acc = agg.compute_epoch_metrics()
    # class 0 has fp from the class-3 pixel → not perfect; classes 1,2 perfect
    assert dice < 1.0
    agg2 = MetricsHistory(num_classes=4, ignore_index=3)
    agg2.accumulate(np.eye(4)[np.array([[0, 1, 2, 3]])], label)
    dice2, iou2, acc2 = agg2.compute_epoch_metrics()
    assert dice2 == iou2 == acc2 == 1.0


def test_device_confusion_equals_host_accumulate():
    rng = np.random.default_rng(1)
    label = rng.integers(0, 4, size=(16, 16))
    scores = rng.normal(size=(16, 16, 4))
    pred = scores.argmax(-1)

    host = MetricsHistory(4, ignore_index=3)
    host.accumulate(scores, label)

    dev = MetricsHistory(4, ignore_index=3)
    conf = confusion_counts(jnp.asarray(pred), jnp.asarray(label), 4)
    dev.accumulate_confusion(conf)

    np.testing.assert_array_equal(host.confusion, dev.confusion)


def test_reset_and_history():
    agg = MetricsHistory(4, ignore_index=3)
    label = np.zeros((4, 4), dtype=np.int64)
    agg.accumulate(np.eye(4)[label], label)
    agg.compute_epoch_metrics()
    agg.reset()
    assert agg.confusion.sum() == 0
    assert len(agg.get_mean_dice_history()) == 1


def test_absent_class_does_not_poison_macro_means():
    """A class absent from pred AND GT stays nan per-class (reference
    parity) but the macro means average the classes actually present —
    otherwise one empty class blocks best-mIoU checkpointing forever."""
    agg = MetricsHistory(4, ignore_index=3)
    label = np.zeros((8, 8), dtype=np.int64)
    label[:4] = 1  # classes 0 and 1 present; class 2 absent
    agg.accumulate(np.eye(4)[label], label)
    dice, iou, acc = agg.compute_epoch_metrics()
    per = agg.get_last_per_class_iou()
    assert np.isnan(per[2])           # reference per-class semantics
    assert np.isfinite(iou) and iou == 1.0   # classes 0,1 perfect
    assert np.isfinite(dice) and np.isfinite(acc)


def test_state_dict_roundtrip():
    agg = MetricsHistory(4, ignore_index=3)
    label = np.zeros((4, 4), dtype=np.int64)
    agg.accumulate(np.eye(4)[label], label)
    agg.compute_epoch_metrics()
    d = agg.state_dict()
    agg2 = MetricsHistory(4, ignore_index=3)
    agg2.load_state_dict(d)
    np.testing.assert_array_equal(agg.confusion, agg2.confusion)
    assert agg2.get_mean_dice_history() == agg.get_mean_dice_history()
    # the last-per-class getters answer after a restore (reference's
    # pickled MetricsHistory kept them implicitly)
    np.testing.assert_array_equal(
        agg2.get_last_per_class_dice(), agg.get_last_per_class_dice()
    )
    np.testing.assert_array_equal(
        agg2.get_last_per_class_iou(), agg.get_last_per_class_iou()
    )
    np.testing.assert_array_equal(
        agg2.get_last_per_class_acc(), agg.get_last_per_class_acc()
    )
