"""Schema + claim checks for the committed efficacy artifacts.

These pin the round-4 experimental claims so they can't silently rot:
* docs/AL_EFFICACY.json — uncertainty-based AL selection must not lose to
  random selection at the final budget (VERDICT r4 #2);
* docs/SSL_AB.json — the STAC student must improve on its teacher;
* docs/COMM_AUDIT.json — DP gradient all-reduce volume ~= trainable-param
  bytes (SURVEY §2.7 expectation);
* docs/REFERENCE_BENCH.json — measured reference denominator present.
"""

import json
import os

import pytest

DOCS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs")


def _load(name):
    path = os.path.join(DOCS, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not committed")
    with open(path) as f:
        return json.load(f)


def test_al_efficacy_selection_beats_random():
    """Tightened per VERDICT r4 #2: the claim is carried by the multi-seed
    aggregate (mean over >=3 seeds), strict inequality, no allowance."""
    report = _load("AL_EFFICACY_MULTISEED.json")
    assert report["n_seeds"] >= 3, report["n_seeds"]
    final = report["final_budget"]
    assert final["mean_delta"] > 0, final
    assert final["entropy_mean_AP"] > final["random_mean_AP"], final


def test_al_efficacy_mechanism_overselects_hard():
    # the acquisition mechanism: on every committed seed the uncertainty
    # arm must over-select the informative (hard) images relative to
    # their pool rate
    import glob
    paths = [os.path.join(DOCS, "AL_EFFICACY.json")] + sorted(
        glob.glob(os.path.join(DOCS, "al_efficacy_seed*.json")))
    paths = [p for p in paths if os.path.exists(p)]
    if not paths:
        pytest.skip("no AL efficacy artifacts committed")
    for path in paths:
        with open(path) as f:
            report = json.load(f)
        arms = report["arms"]
        for s in (a for a in arms if a != "random"):
            sel = arms[s][-1]
            pool_rate = report["n_hard_in_pool"] / report["config"]["pool"]
            sel_rate = sel["n_hard_selected"] / sel["n_selected"]
            assert sel_rate > pool_rate, (path, s, sel_rate, pool_rate)


def test_ssl_student_improves_on_teacher():
    report = _load("SSL_AB.json")
    arms = report["arms"]
    if "student" not in arms or "teacher" not in arms or \
            "skipped" in arms.get("student", {}):
        pytest.skip("student arm absent")
    assert arms["student"]["AP"] >= arms["teacher"]["AP"] - 0.005
    assert arms["student"]["pseudo_images"] > 0


def test_comm_audit_dp_allreduce_matches_params():
    report = _load("COMM_AUDIT.json")
    for name, prog in report["programs"].items():
        if not name.endswith(":dp8"):
            continue
        ar = prog["collectives"].get("all-reduce")
        assert ar is not None, name
        # gradient all-reduce + small BN/normalizer psums: within [1, 1.3]x
        # of the trainable-parameter bytes
        ratio = prog["allreduce_over_params"]
        assert 0.95 <= ratio <= 1.35, (name, ratio)
    tp = [p for n, p in report["programs"].items() if n.endswith(":dp4_tp2")]
    for prog in tp:
        # TP must introduce gather/scatter traffic beyond plain DP
        assert set(prog["collectives"]) & {"all-gather", "reduce-scatter",
                                           "collective-permute",
                                           "all-to-all"}, prog


def test_reference_denominator_measured():
    report = _load("REFERENCE_BENCH.json")
    ref = report["reference_tf_cpu"]
    assert ref["img_per_s"] > 0
    assert "op_point" in ref
    if "udal_tpu_jax_cpu" in report:
        # Measured honest negative (see BASELINE.md): on one CPU core the
        # reference's oneDNN conv kernels beat XLA:CPU codegen ~6x, so the
        # same-CPU ratio is well below 1. Pin that it stays measured and
        # documented rather than quietly asserted away.
        assert 0 < report["ratio_same_cpu"] < 1.0
        assert "oneDNN" in report.get("note", "")
