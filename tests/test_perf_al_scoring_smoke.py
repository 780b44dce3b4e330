"""Smoke for tools/perf_al_scoring.py — the official BASELINE config #5
(AL pool acquisition scoring) benchmark harness. Tiny CPU mode runs the
full path (pool TFRecords → InferImages MC serve → 11-strategy scoring →
selection); the committed on-chip artifact's schema is pinned."""

import json
import os
import sys

import pytest

pytestmark = pytest.mark.slow

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")


def test_perf_al_scoring_tiny(tmp_path, monkeypatch):
    monkeypatch.syspath_prepend(TOOLS)
    import perf_al_scoring

    out = str(tmp_path / "al.json")
    monkeypatch.setattr(sys, "argv",
                        ["perf_al_scoring", "--tiny", "--out", out])
    perf_al_scoring.main()

    with open(out) as f:
        report = json.load(f)["arrays"]
    assert report["img_per_s"] > 0
    assert report["n_detection_rows"] > 0
    assert len(report["strategies"]) == 11
    for s, r in report["strategies"].items():
        assert r["n_scored"] == report["pool"], s
        assert r["n_picked"] >= 1, s


def test_committed_onchip_report_schema():
    path = os.path.join(os.path.dirname(TOOLS), "docs",
                        "AL_SCORING_BENCH.json")
    if not os.path.exists(path):
        pytest.skip("on-chip AL scoring bench not committed")
    with open(path) as f:
        data = json.load(f)
    report = data["arrays"] if "arrays" in data else data
    assert report["pool"] >= 256
    assert report["img_per_s"] > 10
    assert len(report["strategies"]) == 11
    if "dict" in data:
        # the array-native redesign must beat the per-dict shim
        assert report["img_per_s"] > data["dict"]["img_per_s"]
