"""Ablation harness (benchmarks/ablations.py): the reference report's
controlled comparisons as a reproducible artifact.

CPU smoke: the hard synthetic task materialises, the harness runs one
experiment end-to-end, and its JSON rows carry the contract fields.
The measured TPU table lives in the harness docstring / PERFORMANCE.md.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_ROOT, "benchmarks"))

from ablations import hard_synthetic_items  # noqa: E402


def test_hard_synthetic_items_contract():
    items = hard_synthetic_items(8, seed=0)
    assert len(items) == 8
    sentinel_seen = False
    fg = 0
    total = 0
    for img, label in items:
        assert img.dtype == np.float32 and img.min() >= 0 and img.max() <= 1
        assert label.shape == img.shape[:2]
        vals = set(np.unique(label).tolist())
        assert vals <= {0, 1, 2, 255}
        sentinel_seen |= 255 in vals
        fg += int(np.isin(label, (1, 2)).sum())
        total += label.size
    assert sentinel_seen, "no boundary sentinel produced"
    # the task is imbalanced by design: foreground well under half
    assert 0.01 < fg / total < 0.35


@pytest.mark.slow
def test_loss_experiment_runs_end_to_end():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "benchmarks/ablations.py", "--experiments", "loss"],
        cwd=_ROOT, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rows = [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]
    runs = [x for x in rows if "experiment" in x]
    summaries = [x for x in rows if "summary" in x]
    assert {x["variant"] for x in runs} == {"ce", "dice_ce"}
    for x in runs:
        assert 0.0 <= x["best_dice"] <= 1.0
        assert 0.0 <= x["best_miou"] <= 1.0
        assert x["steady_epoch_s"] > 0
    assert summaries and summaries[0]["summary"] == "loss"
    assert summaries[0]["winner"] in ("ce", "dice_ce")


@pytest.mark.slow
def test_skips_and_prompt_freeze_experiments_run_end_to_end():
    """The CLIP-family arms: encoder pretrain (decoder-agnostic linear
    patch probe on a shifted distribution) → frozen skips/noskips
    comparison → prompt frozen-vs-finetuned, all chained inside the
    harness (VERDICT r2 item 3; pretext redesigned in r4)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "benchmarks/ablations.py",
         "--experiments", "skips,prompt_freeze"],
        cwd=_ROOT, env=env, capture_output=True, text=True, timeout=2400,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rows = [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]
    runs = [x for x in rows if "experiment" in x]
    variants = {(x["experiment"], x["variant"]) for x in runs}
    assert ("skips", "encoder_pretrain(linear-probe,shifted)") in variants
    assert ("skips", "skips") in variants
    assert ("skips", "noskips") in variants
    assert ("prompt_freeze", "frozen") in variants
    assert ("prompt_freeze", "finetuned") in variants
    summaries = {x["summary"]: x for x in rows if "summary" in x}
    assert set(summaries) == {"skips", "prompt_freeze"}
    for x in runs:
        assert 0.0 <= x["best_miou"] <= 1.0


def test_robustness_sweep_device_path_matches_host():
    """The robustness sweep's two scoring paths — host (threaded
    per-image inverse + float64 confusion) and device (the
    train/fast_eval.py canvas protocol, state=...) — must agree: same
    perturbation draws (deterministic per-image seeds), same protocol
    math, (C, C) counts only differing in where they're summed."""
    import jax
    import jax.numpy as jnp

    from benchmarks.robustness import robustness_sweep
    from image_segmentation_tpu.losses import DiceCELoss
    from image_segmentation_tpu.models import UNet
    from image_segmentation_tpu.run import synthetic_materialized
    from image_segmentation_tpu.train import create_train_state
    from image_segmentation_tpu.train.state import make_adamw

    val = synthetic_materialized(6, 32, seed=3, keep_orig_labels=True)
    model = UNet(num_classes=4, base=8, dtype=jnp.float32)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.asarray(val.images[:1]),
        make_adamw(learning_rate=1e-3),
    )
    fwd = jax.jit(
        lambda x: model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False,
        ).astype(jnp.float32)
    )
    sev = [1, 6]
    host = robustness_sweep(fwd, val, num_classes=4, severities=sev,
                            verbose=False)
    dev = robustness_sweep(None, val, num_classes=4, severities=sev,
                           verbose=False, state=state, batch_size=4,
                           transfer_u8=False)
    for k in host:
        np.testing.assert_allclose(dev[k], host[k], atol=2e-4, err_msg=k)
    # uint8 transport (the full-scale default — 4× less upload): same
    # curves to 8-bit-quantization tolerance
    dev8 = robustness_sweep(None, val, num_classes=4, severities=sev,
                            verbose=False, state=state, batch_size=4)
    for k in host:
        np.testing.assert_allclose(dev8[k], host[k], atol=5e-3, err_msg=k)
