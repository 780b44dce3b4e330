"""Smoke for tools/perf_ensemble.py — the official BASELINE config #3
(deep-ensemble) benchmark harness. Runs the tiny CPU mode end to end
(vmapped-member path + sequential-member baseline + report schema) so the
judged artifact (docs/ENSEMBLE_BENCH.json) can't bit-rot between on-chip
runs."""

import json
import os
import sys

import pytest

pytestmark = pytest.mark.slow

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")


def test_perf_ensemble_tiny(tmp_path, monkeypatch):
    sys.path.insert(0, TOOLS)
    import perf_ensemble

    out = str(tmp_path / "ens.json")
    monkeypatch.setattr(sys, "argv",
                        ["perf_ensemble", "--tiny", "--out", out])
    perf_ensemble.main()

    with open(out) as f:
        report = json.load(f)
    assert report["members"] == 2
    assert report["value"] > 0
    assert report["baseline_ips"] > 0
    assert report["vs_baseline"] == pytest.approx(
        report["value"] / report["baseline_ips"], rel=0.02)


def test_committed_onchip_result_schema():
    path = os.path.join(os.path.dirname(TOOLS), "docs",
                        "ENSEMBLE_BENCH.json")
    if not os.path.exists(path):
        pytest.skip("on-chip ensemble bench not committed")
    with open(path) as f:
        report = json.load(f)
    assert report["members"] == 5
    assert report["value"] > 50          # committed on-chip: 79.08 img/s
    assert report["vs_baseline"] >= 1.0  # vmapped >= sequential schedule
