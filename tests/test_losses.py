"""Loss parity tests against torch (the reference's backend).

The torch reference expressions are re-stated inline from the reference's
documented behavior (utils/weighted_loss.py) using stock torch ops —
not copied code — and serve as the oracle.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from image_segmentation_tpu.losses import (
    DiceCELoss,
    DiceNLLLoss,
    soft_dice_loss,
)
from image_segmentation_tpu.losses.cross_entropy import (
    cross_entropy_loss,
    log_with_eps,
    nll_loss,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _data(n=2, h=8, w=8, c=4, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(n, h, w, c)).astype(np.float32)
    targets = rng.integers(0, c, size=(n, h, w)).astype(np.int32)
    return logits, targets


def _torch_soft_dice(logits, targets, ignore_index=None, class_weights=None,
                     smooth=1e-5):
    """Oracle: batch-aggregated soft dice per reference semantics."""
    x = torch.from_numpy(logits).permute(0, 3, 1, 2)  # NCHW
    y = torch.from_numpy(targets.astype(np.int64))
    probs = F.softmax(x, dim=1)
    onehot = F.one_hot(y, x.shape[1]).permute(0, 3, 1, 2).float()
    intersect = (probs * onehot).sum(dim=(0, 2, 3))
    sum_pred = probs.sum(dim=(0, 2, 3))
    sum_gt = onehot.sum(dim=(0, 2, 3))
    dc = (2 * intersect + smooth) / torch.clip(sum_pred + sum_gt + smooth, min=1e-8)
    valid = torch.ones_like(dc, dtype=torch.bool)
    if ignore_index is not None:
        valid[ignore_index] = False
    dc_valid = dc[valid]
    if class_weights is not None:
        wv = torch.tensor(class_weights)[valid]
        return -float((dc_valid * wv).sum() / wv.sum())
    return -float(dc_valid.mean())


class TestDice:
    def test_matches_oracle_plain(self):
        logits, targets = _data()
        ours = soft_dice_loss(jnp.asarray(logits), jnp.asarray(targets))
        assert np.isclose(float(ours), _torch_soft_dice(logits, targets), atol=1e-6)

    def test_matches_oracle_ignore_index(self):
        logits, targets = _data(seed=1)
        ours = soft_dice_loss(
            jnp.asarray(logits), jnp.asarray(targets), ignore_index=3
        )
        assert np.isclose(
            float(ours), _torch_soft_dice(logits, targets, ignore_index=3), atol=1e-6
        )

    def test_matches_oracle_weighted(self):
        logits, targets = _data(seed=2)
        w = [0.2047, 1.0272, 1.2293, 1.5388]  # FullWeight from notebooks
        ours = soft_dice_loss(
            jnp.asarray(logits),
            jnp.asarray(targets),
            ignore_index=3,
            class_weights=jnp.asarray(w),
        )
        assert np.isclose(
            float(ours),
            _torch_soft_dice(targets=targets, logits=logits, ignore_index=3, class_weights=w),
            atol=1e-6,
        )

    def test_perfect_prediction_approaches_minus_one(self):
        _, targets = _data(seed=3)
        logits = (
            np.eye(4, dtype=np.float32)[targets] * 100.0
        )  # one-hot * large → softmax ≈ 1
        ours = soft_dice_loss(jnp.asarray(logits), jnp.asarray(targets))
        assert float(ours) < -0.999


class TestCrossEntropy:
    def test_matches_torch_plain(self):
        logits, targets = _data(seed=4)
        ours = cross_entropy_loss(jnp.asarray(logits), jnp.asarray(targets))
        ref = F.cross_entropy(
            torch.from_numpy(logits).permute(0, 3, 1, 2),
            torch.from_numpy(targets.astype(np.int64)),
        )
        assert np.isclose(float(ours), float(ref), atol=1e-6)

    def test_matches_torch_weighted_ignore(self):
        logits, targets = _data(seed=5)
        w = [0.2047, 1.0272, 1.2293, 1.5388]
        ours = cross_entropy_loss(
            jnp.asarray(logits),
            jnp.asarray(targets),
            class_weights=jnp.asarray(w),
            ignore_index=3,
        )
        ref = F.cross_entropy(
            torch.from_numpy(logits).permute(0, 3, 1, 2),
            torch.from_numpy(targets.astype(np.int64)),
            weight=torch.tensor(w),
            ignore_index=3,
        )
        assert np.isclose(float(ours), float(ref), atol=1e-6)


class TestNLL:
    def test_matches_torch_with_prompt_nonlin(self):
        rng = np.random.default_rng(6)
        probs = rng.dirichlet(np.ones(4), size=(2, 8, 8)).astype(np.float32)
        targets = rng.integers(0, 4, size=(2, 8, 8)).astype(np.int32)
        ours = nll_loss(
            jnp.asarray(probs),
            jnp.asarray(targets),
            ignore_index=0,
            nonlin=log_with_eps,
        )
        ref = F.nll_loss(
            torch.log(torch.from_numpy(probs).permute(0, 3, 1, 2) + 1e-9),
            torch.from_numpy(targets.astype(np.int64)),
            ignore_index=0,
        )
        assert np.isclose(float(ours), float(ref), atol=1e-6)


class TestCombos:
    def test_dice_ce_is_weighted_sum(self):
        logits, targets = _data(seed=7)
        loss = DiceCELoss(dice_weight=0.5, ce_weight=2.0, ignore_index=3)
        got = float(loss(jnp.asarray(logits), jnp.asarray(targets)))
        d = float(
            soft_dice_loss(jnp.asarray(logits), jnp.asarray(targets), ignore_index=3)
        )
        ce = float(
            cross_entropy_loss(jnp.asarray(logits), jnp.asarray(targets), ignore_index=3)
        )
        assert np.isclose(got, 0.5 * d + 2.0 * ce, atol=1e-6)

    def test_dice_nll_on_probabilities(self):
        rng = np.random.default_rng(8)
        probs = rng.dirichlet(np.ones(4), size=(2, 8, 8)).astype(np.float32)
        targets = rng.integers(0, 4, size=(2, 8, 8)).astype(np.int32)
        loss = DiceNLLLoss(ignore_index=0)
        got = float(loss(jnp.asarray(probs), jnp.asarray(targets)))
        assert np.isfinite(got)

    def test_grads_flow(self):
        import jax

        logits, targets = _data(seed=9)
        loss = DiceCELoss(ignore_index=3, class_weights=(0.2, 1.0, 1.2, 1.5))
        g = jax.grad(lambda x: loss(x, jnp.asarray(targets)))(jnp.asarray(logits))
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).max()) > 0
