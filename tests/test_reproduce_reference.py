"""End-to-end test of scripts/reproduce_reference.py at tiny scale.

The one-command reference-table reproduction (reference README.md:30-37)
is exercised on the deterministic pseudo-Pet tree from
test_real_data_fixture: all six rows — including the chained pipelines
(recon pretrain → encoder transfer; augmented clipunet → prompt
injection) — train for one epoch, evaluate on the Test split at
original resolution, and land in the emitted markdown/JSON table. The
moment real Pet data (and converted CLIP weights) are available, the
full-scale parity run is this same command with real --epochs.
"""
import importlib.util
import json
import os

import numpy as np
import pytest

from test_real_data_fixture import (  # noqa: F401 (pet_tree fixture)
    REPO,
    _load_prepare_module,
    _make_fake_pet_source,
    pet_tree,
)

pytestmark = pytest.mark.slow


def _load_repro_module():
    spec = importlib.util.spec_from_file_location(
        "reproduce_reference",
        os.path.join(REPO, "scripts", "reproduce_reference.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_reproduce_reference_all_rows(pet_tree, tmp_path, capsys):
    repro = _load_repro_module()
    out_json = str(tmp_path / "table.json")
    results = repro.main([
        "--data-root", pet_tree,
        "--save-dir", str(tmp_path / "runs"),
        "--epochs", "1", "--batch-size", "2", "--target-size", "32",
        "--max-devices", "1",
        "--json-out", out_json,
    ])

    # every README row produced finite original-resolution Test metrics
    assert set(results) == set(repro.ROW_ORDER)
    for row, m in results.items():
        for k in ("acc", "dice", "iou", "loss"):
            assert np.isfinite(m[k]), (row, m)
        assert 0.0 <= m["iou"] <= m["dice"] <= 1.0, (row, m)

    # the emitted table carries all six reference row names and marks the
    # smoke-ViT CLIP rows as not comparable
    printed = capsys.readouterr().out
    for row in repro.ROW_ORDER:
        assert repro.REFERENCE_TABLE[row][0] in printed
    assert "smoke ViT" in printed

    # JSON artifact round-trips
    with open(out_json) as f:
        payload = json.load(f)
    assert payload["smoke_clip"] is True
    assert set(payload["rows"]) == set(repro.ROW_ORDER)

    # the chained artifacts exist: recon checkpoint consumed by the AE
    # transfer, augmented clipunet checkpoint consumed by the prompt row
    assert os.path.isdir(tmp_path / "runs" / "autoencoder" / "recon_ae")
    assert os.path.isdir(tmp_path / "runs" / "clip_aug" / "clipunet")
    assert os.path.isdir(tmp_path / "runs" / "prompt" / "prompt")


def test_row_subset_and_prompt_dependency(pet_tree, tmp_path):
    """--rows subsetting works, and the prompt row without its clip_aug
    dependency is skipped with a pointer instead of crashing."""
    repro = _load_repro_module()
    results = repro.main([
        "--data-root", pet_tree,
        "--save-dir", str(tmp_path / "runs"),
        "--epochs", "1", "--batch-size", "2", "--target-size", "32",
        "--max-devices", "1",
        "--rows", "prompt",
    ])
    assert results == {}
