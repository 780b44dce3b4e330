import numpy as np
import pytest

from udal_tpu.apps import thresholding as thr


def _failure_data(n=4000, seed=0):
    """Two uncertainties: u0 informative about failures, u1 noise."""
    rng = np.random.RandomState(seed)
    correct = rng.rand(n) < 0.7
    ious = np.where(correct, rng.uniform(0.55, 1.0, n),
                    rng.uniform(0.0, 0.45, n))
    tps_class = correct.astype(int)
    u_good = np.where(correct, rng.gamma(2, 0.5, n), rng.gamma(6, 0.7, n))
    u_noise = rng.gamma(3, 0.5, n)
    classes = rng.randint(1, 4, n)
    return classes, tps_class, ious, [u_good, u_noise]


def test_roc_metrics_budget():
    _, tps, ious, (u, _) = _failure_data()
    correct = ((ious >= 0.5) * tps).astype(int)
    t, err, auc_v = thr.roc_metrics(u, correct, fpr_tpr=0.95, fix_cd=True)
    assert 0 < t
    assert 0 <= err < 0.5          # informative uncertainty -> low FD@CD
    assert auc_v > 0.8
    # budget on FD instead
    t2, err2, _ = thr.roc_metrics(u, correct, fpr_tpr=0.95, fix_cd=False)
    assert t2 > 0


def test_optimizer_prefers_informative_uncertainty(tmp_path):
    classes, tps, ious, uncert = _failure_data()
    uo = thr.UncertOptimal(gt_classes=classes, tps_class=tps, ious=ious,
                           uncert=uncert, source_path=str(tmp_path), seed=1)
    params = uo.optimize(max_evals=200)
    assert params.shape == (2,)
    # informative uncertainty should dominate the combination
    assert params[0] > params[1]
    # files persisted with reference naming
    assert (tmp_path / "optimal_params_cd_0.95_iou_0.5_0.75.txt").exists()
    assert (tmp_path / "optimal_thrs_cd_0.95_iou_0.5_0.75.txt").exists()
    thrs = thr.read_optimal_thresholds(str(tmp_path))
    assert thrs.shape == (6,)


def test_cached_params_are_reused(tmp_path):
    classes, tps, ious, uncert = _failure_data(n=500)
    uo = thr.UncertOptimal(gt_classes=classes, tps_class=tps, ious=ious,
                           uncert=uncert, source_path=str(tmp_path))
    p1 = uo.optimize(max_evals=50)
    uo2 = thr.UncertOptimal(gt_classes=classes, tps_class=tps, ious=ious,
                            uncert=uncert, source_path=str(tmp_path))
    p2 = uo2.get_optimal_uncertainty()
    np.testing.assert_allclose(p1, p2, rtol=1e-5)


def test_per_class_optimization(tmp_path):
    classes, tps, ious, uncert = _failure_data(n=1000)
    uo = thr.UncertOptimal(gt_classes=classes, tps_class=tps, ious=ious,
                           uncert=uncert, source_path=str(tmp_path),
                           per_cls=True, seed=0)
    params = uo.optimize(max_evals=100)
    assert params.shape == (2 * 3,)


def test_metric_table(tmp_path):
    classes, tps, ious, (u_good, u_noise) = _failure_data()
    table = thr.threshold_metrics({"ALBOX": u_good, "ENT": u_noise},
                                  tps, ious)
    assert table["ALBOX"]["auroc"] > table["ENT"]["auroc"]
    assert table["ALBOX"]["jsd"] > table["ENT"]["jsd"]
    assert table["ALBOX"]["FD@CD(0.95)"] < table["ENT"]["FD@CD(0.95)"]
    path = str(tmp_path / "thr_metrics_test.txt")
    thr.write_threshold_metrics(path, table)
    assert "ALBOX" in open(path).read()


def test_smbo_finds_quadratic_minimum():
    f = lambda x: float(np.sum((x - 0.3) ** 2))
    x, y = thr.minimize_smbo(f, 3, max_evals=400, seed=0)
    assert y < 0.01
    np.testing.assert_allclose(x, 0.3, atol=0.1)


def test_per_class_optimization_with_fixing(tmp_path):
    """Per-class weights are kept only where they beat the global optimum
    on that class's own FD@CD (ref `uncertainty_analysis.py:412-500`)."""
    import numpy as np

    from udal_tpu.apps.thresholding import UncertOptimal

    rng = np.random.RandomState(0)
    n = 600
    quality = rng.beta(2.0, 1.0, n)
    ious = np.clip(quality + rng.randn(n) * 0.1, 0, 1)
    tps = np.ones(n)
    gt_classes = rng.randint(1, 4, n)
    # class 2's informative channel is different from the global one
    u0 = np.where(gt_classes == 2, np.abs(rng.randn(n)),
                  1 - quality + rng.randn(n) * 0.1)
    u1 = np.where(gt_classes == 2, 1 - quality + rng.randn(n) * 0.1,
                  np.abs(rng.randn(n)))
    glob = UncertOptimal(gt_classes, tps, ious, [u0, u1],
                         source_path=str(tmp_path / "g"))
    gw = glob.optimize(max_evals=150)
    per = UncertOptimal(gt_classes, tps, ious, [u0, u1], per_cls=True,
                        source_path=str(tmp_path / "p"))
    fixed = per.per_class_fixed_params(gw, max_evals=250)
    assert fixed.shape == (2 * 3,)
    import os
    assert any(f.startswith("optimal_params_clsoptfix")
               for f in os.listdir(tmp_path / "p"))
    # fixing never makes any class worse than the global weights
    for c in range(3):
        mask = gt_classes == c + 1
        fd_fixed = per._fdcd_subset(fixed[c * 2:(c + 1) * 2], mask)
        fd_glob = per._fdcd_subset(gw, mask)
        assert fd_fixed <= fd_glob + 1e-9
