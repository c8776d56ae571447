"""Contention-guard gate logic (bench.py ContentionGuard), CPU-only.

The guard defends benchmark timing windows against host/tunnel
contention (the round-4 benchmark of record was captured entirely
inside one episode and under-reported by 22%). The probe itself needs
the accelerator; the GATE logic — median anchor, best-of-two readings,
bounded backoff, receipts — is pinned here with a scripted probe.
"""
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import bench  # noqa: E402


def _scripted_guard(monkeypatch, script):
    """A guard whose _probe returns `script` values in order (appending
    to .readings like the real one), with no jax involvement."""
    g = bench.ContentionGuard(enabled=False)
    g.enabled = True  # enable gate logic only
    it = iter(script)

    def fake_probe():
        v = next(it)
        g.readings.append(v)
        return v

    monkeypatch.setattr(g, "_probe", fake_probe)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    return g


def test_disabled_guard_is_noop():
    g = bench.ContentionGuard(enabled=False)
    g.wait_until_quiet()  # must not touch jax
    assert g.report() == {}


def test_quiet_session_passes_first_gate(monkeypatch):
    g = _scripted_guard(monkeypatch, [100.0, 99.0])
    g.anchor = 100.0
    g.wait_until_quiet()  # max(100, 99) >= 0.92 * 100
    assert g.waits == 0


def test_noise_spike_on_one_probe_does_not_block(monkeypatch):
    # best-of-two: a single depressed reading (noise) must not back off
    g = _scripted_guard(monkeypatch, [70.0, 99.0])
    g.anchor = 100.0
    g.wait_until_quiet()
    assert g.waits == 0


def test_contention_blocks_then_recovers(monkeypatch):
    # both probes low twice (real contention), then recovery
    g = _scripted_guard(monkeypatch, [70.0, 72.0, 71.0, 69.0, 98.0, 97.0])
    g.anchor = 100.0
    g.wait_until_quiet()
    assert g.waits == 2
    assert g.report()["probe_waits"] == 2


def test_retry_budget_bounds_the_wait(monkeypatch):
    g = _scripted_guard(monkeypatch, [50.0] * 100)
    g.anchor = 100.0
    g.max_retries = 3
    g.wait_until_quiet()  # must terminate despite low probes
    assert g.waits == 3


def test_report_carries_receipts(monkeypatch):
    g = _scripted_guard(monkeypatch, [98.0, 97.0])
    g.anchor = 100.0
    g.wait_until_quiet()
    r = g.report()
    assert r["probe_anchor_tflops"] == 100.0
    assert r["probe_tflops"] == [98.0, 97.0]
