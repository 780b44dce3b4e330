"""Smoke for tools/perf_family.py — the model-family (d0-d4) MC-serving
sweep. Runs the tiny CPU mode and checks the committed on-chip report's
schema so docs/FAMILY_BENCH.json can't bit-rot."""

import json
import os
import sys

import pytest

pytestmark = pytest.mark.slow

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")


def test_perf_family_tiny(tmp_path, monkeypatch):
    sys.path.insert(0, TOOLS)
    import perf_family

    out = str(tmp_path / "family.json")
    monkeypatch.setattr(sys, "argv",
                        ["perf_family", "--tiny", "--out", out])
    perf_family.main()

    with open(out) as f:
        report = json.load(f)
    assert report["rows"][0]["model"] == "efficientdet-d0"
    assert report["rows"][0]["img_per_s"] > 0


def test_committed_family_report_schema():
    path = os.path.join(os.path.dirname(TOOLS), "docs",
                        "FAMILY_BENCH.json")
    if not os.path.exists(path):
        pytest.skip("on-chip family sweep not committed")
    with open(path) as f:
        report = json.load(f)
    models = [r["model"] for r in report["rows"]]
    assert "efficientdet-d0" in models and len(models) >= 4
    for r in report["rows"]:
        assert r["img_per_s"] > 0
        assert r["params_m"] > 0
