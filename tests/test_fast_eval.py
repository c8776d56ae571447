"""Device-protocol original-resolution eval vs the float64 host protocol.

The two implementations of the reference eval protocol
(utils/training.py:67-121) must agree: same confusion-matrix metrics,
same per-image val loss, on a synthetic variable-size dataset.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_segmentation_tpu.data.dataset import ArrayDataset
from image_segmentation_tpu.data.loader import materialize
from image_segmentation_tpu.losses import DiceCELoss, DiceNLLLoss
from image_segmentation_tpu.losses.host import dice_ce_loss_np
from image_segmentation_tpu.models import UNet
from image_segmentation_tpu.ops import geometry as G
from image_segmentation_tpu.train import create_train_state
from image_segmentation_tpu.train.fast_eval import (
    FILL,
    get_eval_batch_fn,
    make_masked_loss,
    pack_label_canvases,
    plan_size_buckets,
)
from image_segmentation_tpu.train.loop import evaluate
from image_segmentation_tpu.train.state import make_adamw


def _synthetic_val(n=9, lo=24, hi=70, seed=0):
    rng = np.random.default_rng(seed)
    items = []
    for i in range(n):
        h, w = int(rng.integers(lo, hi)), int(rng.integers(lo, hi))
        img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
        # structured labels so predictions aren't argmax near-ties
        lab = np.zeros((h, w), np.int32)
        lab[h // 3 :, : w // 2] = 1 + (i % 2)
        lab[: h // 4, w // 2 :] = 3
        items.append((img, lab))
    return materialize(ArrayDataset(items), 32, keep_orig_labels=True)


def test_pack_label_canvases_layout():
    labs = [np.ones((5, 9), np.int32), np.zeros((12, 4), np.int32)]
    c = pack_label_canvases(labs, multiple=8)
    assert c.shape == (2, 16, 16)
    assert c.dtype == np.uint8
    assert (c[0, :5, :9] == 1).all()
    assert (c[0, 5:, :] == FILL).all() and (c[0, :, 9:] == FILL).all()
    assert (c[1, :12, :4] == 0).all()
    assert (c[1, 12:, :] == FILL).all()


class TestSizeBuckets:
    def test_bimodal_sizes_split_into_two_buckets(self):
        labs = [np.zeros((32, 32), np.int32)] * 12 + [
            np.zeros((300, 280), np.int32)
        ] * 12
        plan = plan_size_buckets(labs, min_bucket=8)
        assert len(plan) == 2
        # small images together, large together, all covered exactly once
        all_idx = np.sort(np.concatenate(plan))
        np.testing.assert_array_equal(all_idx, np.arange(24))
        small = plan[0] if len(plan[0]) and plan[0][0] < 12 else plan[1]
        assert set(small.tolist()) == set(range(12))

    def test_uniform_sizes_stay_one_bucket(self):
        labs = [np.zeros((64, 64), np.int32)] * 30
        assert len(plan_size_buckets(labs, min_bucket=8)) == 1

    def test_min_bucket_respected(self):
        # one outlier can't form its own bucket
        labs = [np.zeros((32, 32), np.int32)] * 20 + [
            np.zeros((400, 400), np.int32)
        ]
        plan = plan_size_buckets(labs, min_bucket=8)
        for idx in plan:
            assert len(idx) >= 8

    def test_tiny_sets_single_bucket(self):
        labs = [np.zeros((32, 32), np.int32),
                np.zeros((300, 300), np.int32)]
        assert len(plan_size_buckets(labs, min_bucket=8)) == 1


def test_bucketed_eval_bit_identical_to_host_protocol(tiny_state):
    """A bimodal-size val set (≥16 images → bucketing active) must
    produce metrics IDENTICAL to the float64 host oracle — bucketing
    only changes wasted canvas pixels, never the per-image math."""
    rng = np.random.default_rng(5)
    items = []
    for i in range(20):
        big = i >= 10
        h = int(rng.integers(90, 120)) if big else int(rng.integers(24, 40))
        w = int(rng.integers(90, 120)) if big else int(rng.integers(24, 40))
        img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
        lab = np.zeros((h, w), np.int32)
        lab[h // 3:, : w // 2] = 1 + (i % 2)
        lab[: h // 4, w // 2:] = 3
        items.append((img, lab))
    val = materialize(ArrayDataset(items), 32, keep_orig_labels=True)
    state = tiny_state

    cfg = DiceCELoss(ignore_index=3, class_weights=(0.2, 1.0, 1.2, 1.5))
    dev = evaluate(state, val, loss_cfg=cfg, protocol="device",
                   verbose=False, batch_size=4)
    assert val.bucket_views, "bucketing should trigger on bimodal sizes"

    # vs the UNBUCKETED device protocol: confusion-based metrics are
    # BIT-IDENTICAL (integer counts; the per-pixel inverse + argmax don't
    # depend on canvas size). The masked loss reduces over a different
    # canvas shape, so XLA reassociates its f32 sums differently —
    # observed ~2e-6; anything beyond float reassociation would mean the
    # protocol math changed.
    val_single = materialize(ArrayDataset(items), 32, keep_orig_labels=True)
    val_single.bucket_views = []  # force the single dataset-max canvas
    single = evaluate(state, val_single, loss_cfg=cfg, protocol="device",
                      verbose=False, batch_size=4)
    for k in ("dice", "iou", "acc"):
        assert float(dev[k]) == float(single[k]), (k, dev, single)
    assert abs(dev["loss"] - single["loss"]) < 1e-5

    # vs the float64 host oracle: the usual f32-vs-f64 near-tie envelope
    host = evaluate(state, val,
                    host_loss_fn=lambda s, l: dice_ce_loss_np(s, l, cfg),
                    protocol="host", verbose=False, batch_size=4)
    for k in ("dice", "iou", "acc"):
        assert abs(float(dev[k]) - float(host[k])) < 5e-4, (k, dev, host)
    assert abs(dev["loss"] - host["loss"]) < 1e-4


def test_confusion_counts_int32_and_drop_semantics():
    """The batched confusion sum must be exact int32 and must DROP
    out-of-range label values (not clamp them into class C-1, as the old
    bincount formulation did). Labels on packed canvases are only ever
    0..C-1 or FILL, but the contract is pinned here in case malformed
    label data ever reaches the evaluator."""
    from image_segmentation_tpu.train.state import TrainState

    t, C = 16, 4
    # identity geometry: orig == new == canvas == t, no padding
    meta = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x)[None],
        G.compute_meta(t, t, t),
    )
    # scores whose argmax is a fixed known class map
    pred_map = np.zeros((t, t), np.int32)
    pred_map[:, t // 2 :] = 2
    scores = np.full((1, t, t, C), -5.0, np.float32)
    for c in range(C):
        scores[0][pred_map == c, c] = 5.0

    labels = np.zeros((1, t, t), np.uint8)
    labels[0, : t // 2, :] = 1
    labels[0, 0, 0] = 200          # valid (≠ FILL) but out of range
    labels[0, -1, -1] = FILL       # canvas padding

    state = TrainState(
        step=0, params={}, batch_stats={}, opt_state=None,
        apply_fn=lambda variables, x, train: x, tx=None,
    )
    fn = get_eval_batch_fn((t, t), C, None)
    conf, _ = fn(state, (jnp.asarray(scores),), meta,
                 jnp.asarray(labels), jnp.ones((1,), bool))
    conf = np.asarray(conf)
    assert conf.dtype == np.int32
    # the 200-label pixel and the FILL pixel are both absent
    assert conf.sum() == t * t - 2
    # nothing was clamped into the last label row beyond true class-3 count
    assert conf[3, :].sum() == 0


def test_masked_loss_matches_host_on_full_canvas():
    """With no padding (valid everywhere) the masked device loss must equal
    the float64 host mirror."""
    rng = np.random.default_rng(1)
    scores = rng.normal(size=(20, 24, 4)).astype(np.float32)
    labels = rng.integers(0, 4, (20, 24)).astype(np.int32)
    cfg = DiceCELoss(ignore_index=3, class_weights=(0.2, 1.0, 1.2, 1.5),
                     smooth_dice=1e-5)
    dev = float(
        make_masked_loss(cfg)(
            jnp.asarray(scores), jnp.asarray(labels),
            jnp.ones((20, 24), bool),
        )
    )
    host = dice_ce_loss_np(scores, labels, cfg)
    assert abs(dev - host) < 1e-5


def test_masked_loss_ignores_fill_region():
    """Padding the canvas with garbage scores must not change the loss."""
    rng = np.random.default_rng(2)
    scores = rng.normal(size=(16, 16, 4)).astype(np.float32)
    labels = rng.integers(0, 4, (16, 16)).astype(np.int32)
    cfg = DiceCELoss(ignore_index=3, smooth_dice=1e-5)
    loss_fn = make_masked_loss(cfg)
    base = float(loss_fn(jnp.asarray(scores), jnp.asarray(labels),
                         jnp.ones((16, 16), bool)))
    big_scores = np.full((24, 24, 4), 1e6, np.float32)
    big_scores[:16, :16] = scores
    big_labels = np.full((24, 24), FILL, np.int32)
    big_labels[:16, :16] = labels
    valid = big_labels != FILL
    padded = float(loss_fn(jnp.asarray(big_scores), jnp.asarray(big_labels),
                           jnp.asarray(valid)))
    assert abs(base - padded) < 1e-6


def test_masked_loss_dice_nll_dispatch():
    rng = np.random.default_rng(3)
    probs = rng.dirichlet(np.ones(4), size=(8, 8)).astype(np.float32)
    labels = rng.integers(0, 4, (8, 8)).astype(np.int32)
    cfg = DiceNLLLoss(ignore_index=3, smooth_dice=1e-5)
    from image_segmentation_tpu.losses.host import dice_nll_loss_np

    dev = float(make_masked_loss(cfg)(jnp.asarray(probs), jnp.asarray(labels),
                                      jnp.ones((8, 8), bool)))
    host = dice_nll_loss_np(probs, labels, cfg)
    assert abs(dev - host) < 1e-5


def test_masked_loss_honors_custom_nll_nonlin():
    """The device mirror must evaluate the loss's OWN nll_nonlin, not a
    hard-coded log(x + 1e-9) — and the host mirror must follow."""
    rng = np.random.default_rng(4)
    probs = rng.dirichlet(np.ones(4), size=(8, 8)).astype(np.float32)
    labels = rng.integers(0, 4, (8, 8)).astype(np.int32)

    def sharp_log(x):
        return jnp.log(x + 1e-3)  # materially different eps

    cfg = DiceNLLLoss(ignore_index=3, smooth_dice=1e-5, nll_nonlin=sharp_log)
    default = DiceNLLLoss(ignore_index=3, smooth_dice=1e-5)
    from image_segmentation_tpu.losses.host import dice_nll_loss_np

    ones = jnp.ones((8, 8), bool)
    dev = float(make_masked_loss(cfg)(jnp.asarray(probs),
                                      jnp.asarray(labels), ones))
    dev_default = float(make_masked_loss(default)(
        jnp.asarray(probs), jnp.asarray(labels), ones))
    assert dev != dev_default  # the nonlin actually took effect
    # training loss (the loss object itself) agrees with the device mirror
    train = float(cfg(jnp.asarray(probs), jnp.asarray(labels)))
    assert abs(dev - train) < 1e-5
    # host mirror follows the custom nonlin too (f32 tolerance)
    host = dice_nll_loss_np(probs, labels, cfg)
    assert abs(dev - host) < 1e-4


@pytest.fixture(scope="module")
def tiny_state():
    model = UNet(num_classes=4, base=8, dtype=jnp.float32)
    return create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
        make_adamw(1e-3),
    )


def test_device_protocol_matches_host_protocol(tiny_state):
    val = _synthetic_val()
    cfg = DiceCELoss(ignore_index=3, smooth_dice=1e-5)
    host = evaluate(
        tiny_state, val,
        host_loss_fn=lambda lg, lb: dice_ce_loss_np(lg, lb, cfg),
        protocol="host", batch_size=4, verbose=False,
    )
    dev = evaluate(
        tiny_state, val, loss_cfg=cfg, protocol="device",
        batch_size=4, verbose=False,
    )
    # identical protocol, float32-vs-float64 resampling: tolerance covers
    # occasional argmax flips at near-ties
    assert abs(host["dice"] - dev["dice"]) < 5e-4
    assert abs(host["iou"] - dev["iou"]) < 5e-4
    assert abs(host["acc"] - dev["acc"]) < 5e-4
    assert abs(host["loss"] - dev["loss"]) < 1e-5
    np.testing.assert_allclose(
        host["per_class_iou"], dev["per_class_iou"], atol=5e-4
    )


def test_device_protocol_padded_last_batch(tiny_state):
    """n not divisible by batch_size: the repeated tail must not count."""
    val = _synthetic_val(n=7, seed=4)
    cfg = DiceCELoss(ignore_index=3, smooth_dice=1e-5)
    a = evaluate(tiny_state, val, loss_cfg=cfg, protocol="device",
                 batch_size=4, verbose=False)
    b = evaluate(tiny_state, val, loss_cfg=cfg, protocol="device",
                 batch_size=7, verbose=False)
    assert abs(a["iou"] - b["iou"]) < 1e-6
    assert abs(a["loss"] - b["loss"]) < 1e-6


def test_device_protocol_no_loss_cfg(tiny_state):
    """Metrics-only eval (loss_cfg=None) returns nan loss, real metrics."""
    val = _synthetic_val(n=4, seed=5)
    out = evaluate(tiny_state, val, protocol="device", batch_size=4,
                   verbose=False)
    assert np.isnan(out["loss"])
    assert 0.0 <= out["iou"] <= 1.0


class TestDistributedEval:
    """Mesh-sharded original-resolution eval (loop._evaluate_device with
    mesh) must reproduce the single-device protocol exactly: integer
    confusion counts are communicated via one GSPMD psum and each
    per-image loss is computed wholly on one device, so there is no
    cross-device float reassociation to tolerate."""

    def _mesh(self, n):
        from image_segmentation_tpu.parallel.mesh import get_mesh

        return get_mesh(jax.devices()[:n])

    def test_sharded_epoch_matches_single_device(self, tiny_state):
        from image_segmentation_tpu.parallel.mesh import replicate

        cfg = DiceCELoss(ignore_index=3, smooth_dice=1e-5)
        ref = evaluate(tiny_state, _synthetic_val(n=11, seed=7),
                       loss_cfg=cfg, protocol="device", batch_size=4,
                       verbose=False)
        mesh = self._mesh(4)
        out = evaluate(replicate(tiny_state, mesh),
                       _synthetic_val(n=11, seed=7), loss_cfg=cfg,
                       protocol="device", batch_size=4, verbose=False,
                       mesh=mesh)
        assert abs(ref["loss"] - out["loss"]) < 1e-6
        assert ref["dice"] == pytest.approx(out["dice"], abs=1e-9)
        assert ref["iou"] == pytest.approx(out["iou"], abs=1e-9)
        np.testing.assert_allclose(ref["per_class_iou"],
                                   out["per_class_iou"], atol=1e-9)

    def test_sharded_batchsize_rounds_to_data_axis(self, tiny_state):
        """A batch size that does not divide the data axis is rounded to a
        multiple; padded rows stay out of the counts."""
        from image_segmentation_tpu.parallel.mesh import replicate

        cfg = DiceCELoss(ignore_index=3, smooth_dice=1e-5)
        ref = evaluate(tiny_state, _synthetic_val(n=9, seed=8),
                       loss_cfg=cfg, protocol="device", batch_size=3,
                       verbose=False)
        mesh = self._mesh(8)
        out = evaluate(replicate(tiny_state, mesh),
                       _synthetic_val(n=9, seed=8), loss_cfg=cfg,
                       protocol="device", batch_size=3, verbose=False,
                       mesh=mesh)  # rounds up to B=8
        assert abs(ref["loss"] - out["loss"]) < 1e-6
        assert ref["iou"] == pytest.approx(out["iou"], abs=1e-9)

    def test_sharded_streaming_fallback(self, tiny_state, monkeypatch):
        """Oversized val sets stream per-batch; under a mesh each batch is
        device_put with the 'data' sharding and must score identically."""
        from image_segmentation_tpu.parallel.mesh import replicate

        cfg = DiceCELoss(ignore_index=3, smooth_dice=1e-5)
        ref = evaluate(tiny_state, _synthetic_val(n=10, seed=9),
                       loss_cfg=cfg, protocol="device", batch_size=4,
                       verbose=False)
        monkeypatch.setenv("ISTPU_EVAL_DEVICE_CACHE_MB", "0")
        mesh = self._mesh(4)
        out = evaluate(replicate(tiny_state, mesh),
                       _synthetic_val(n=10, seed=9), loss_cfg=cfg,
                       protocol="device", batch_size=4, verbose=False,
                       mesh=mesh)
        assert abs(ref["loss"] - out["loss"]) < 1e-6
        assert ref["iou"] == pytest.approx(out["iou"], abs=1e-9)

    def test_sharded_prompt_eval_matches_single_device(self):
        """Heatmap (prompt) datasets shard both input streams; the DiceNLL
        masked-loss mirror must dispatch identically under the mesh."""
        from image_segmentation_tpu.models.prompt import PromptModel
        from image_segmentation_tpu.models.clip_vit import ClipViTConfig
        from image_segmentation_tpu.parallel.mesh import replicate

        def _prompt_val(n=6, seed=11):
            rng = np.random.default_rng(seed)
            items = []
            for i in range(n):
                h, w = int(rng.integers(28, 52)), int(rng.integers(28, 52))
                img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
                heat = rng.uniform(0, 1, (h, w, 1)).astype(np.float32)
                lab = np.zeros((h, w), np.int32)
                lab[h // 2:, :] = 1 + (i % 3)
                items.append((img, heat, lab))
            return materialize(ArrayDataset(items), 32,
                               keep_orig_labels=True)

        vit = ClipViTConfig(image_size=32, patch_size=16, hidden_size=64,
                            num_layers=3, num_heads=4, mlp_dim=128)
        model = PromptModel(num_classes=4, vit=vit, unet_base=4,
                            skip_indices=(0, 1, 2, 3),
                            decoder_channels=(32, 16, 8, 8, 8))
        state = create_train_state(
            model, jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)),
            make_adamw(1e-3), extra_inputs=(jnp.zeros((1, 32, 32, 1)),),
        )
        cfg = DiceNLLLoss(ignore_index=3, apply_softmax=False,
                          smooth_dice=1e-5)
        ref = evaluate(state, _prompt_val(), loss_cfg=cfg,
                       protocol="device", batch_size=4, verbose=False)
        mesh = self._mesh(4)
        out = evaluate(replicate(state, mesh), _prompt_val(), loss_cfg=cfg,
                       protocol="device", batch_size=4, verbose=False,
                       mesh=mesh)
        assert abs(ref["loss"] - out["loss"]) < 1e-6
        assert ref["iou"] == pytest.approx(out["iou"], abs=1e-9)
