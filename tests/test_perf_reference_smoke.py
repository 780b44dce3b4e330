"""Smoke for tools/perf_reference.py — the direct same-host A/B of the live
reference TF serving program vs udal_tpu's (the BASELINE.md north-star
denominator). Runs both sections at a tiny op point so the judged artifact
(docs/REFERENCE_BENCH.json) can't bit-rot, and sanity-checks the committed
full-op-point result when present."""

import json
import os
import sys

import pytest

pytestmark = pytest.mark.slow

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")


def test_perf_reference_tiny(tmp_path, monkeypatch):
    pytest.importorskip("tensorflow")
    monkeypatch.syspath_prepend(TOOLS)
    import perf_reference

    out = str(tmp_path / "ref.json")
    monkeypatch.setattr(sys, "argv", [
        "perf_reference", "--batch", "1", "--height", "128", "--width",
        "128", "--mc-samples", "2", "--warmup", "1", "--bm-runs", "1",
        "--out", out])
    perf_reference.main()

    with open(out) as f:
        report = json.load(f)
    assert report["reference_tf_cpu"]["img_per_s"] > 0
    assert report["udal_tpu_jax_cpu"]["img_per_s"] > 0
    assert report["ratio_same_cpu"] == pytest.approx(
        report["udal_tpu_jax_cpu"]["img_per_s"]
        / report["reference_tf_cpu"]["img_per_s"], rel=0.02)


def test_committed_fullop_result_schema():
    path = os.path.join(os.path.dirname(TOOLS), "docs",
                        "REFERENCE_BENCH.json")
    if not os.path.exists(path):
        pytest.skip("full-op-point reference bench not committed")
    with open(path) as f:
        report = json.load(f)
    assert report["reference_tf_cpu"]["img_per_s"] > 0
    # Same-silicon architecture win: the vmapped one-program design must
    # beat the reference's sequential-MC-loop program on the same CPU.
    assert report["ratio_same_cpu"] > 1.0
