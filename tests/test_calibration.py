import numpy as np
import pytest

from udal_tpu.apps import calibration as cal


def _regression_data(n=2000, seed=0, miscal=2.0):
    """Synthetic residuals where true sigma = miscal * predicted sigma."""
    rng = np.random.RandomState(seed)
    sigma_pred = rng.uniform(0.5, 3.0, (n, 4))
    gt = rng.uniform(0, 100, (n, 4))
    pred = gt + rng.randn(n, 4) * sigma_pred * miscal
    classes = rng.randint(1, 4, n)
    return gt, pred, sigma_pred, classes


def test_temperature_regression_recovers_scale():
    gt, pred, sigma, _ = _regression_data(miscal=2.0)
    res = np.abs(pred - gt)
    t = cal.fit_temperature_regression(res, sigma, loss="mse", steps=1000,
                                       lr=0.05)
    # MSE-optimal: sigma/T = E[res*sigma]/E[sigma^2]
    expected = 1.0 / (np.mean(res * sigma) / np.mean(sigma ** 2))
    assert abs(t - expected) / expected < 0.1


def test_regression_calib_improves_ece():
    gt, pred, sigma, classes = _regression_data(miscal=2.5)
    rc = cal.RegressionCalib(gt, pred, sigma, classes, num_classes=3)
    calibs = rc.fit_all()
    assert set(calibs) == set(cal.REGRESSION_CALIBRATORS)
    m = rc.metrics_before_after(calibs)
    assert m["iso_all"]["ece"] < m["raw"]["ece"]
    assert m["ts_all"]["ece"] < m["raw"]["ece"]


def test_apply_box_calibrators_shapes():
    gt, pred, sigma, classes = _regression_data(n=500)
    rc = cal.RegressionCalib(gt, pred, sigma, classes, num_classes=3)
    calibs = rc.fit_all()
    apply = cal.CalibrateBoxUncert(calibs, num_classes=3)
    out = apply(sigma[:50], classes[:50], pred[:50])
    for name in cal.REGRESSION_CALIBRATORS:
        assert out[name].shape == (50, 4), name
        assert np.all(np.isfinite(out[name]))


def _classification_data(n=3000, c=4, temp=3.0, seed=0):
    rng = np.random.RandomState(seed)
    true = rng.randint(1, c + 1, n)
    # well-separated logits then overconfidence-scale them by `temp`
    logits = rng.randn(n, c) * 0.5
    logits[np.arange(n), true - 1] += 1.0
    return true, logits * temp


def test_classification_ts_reduces_ece():
    true, logits = _classification_data()
    cc = cal.ClassificationCalib(true, logits, None, num_classes=4)
    calibs = cc.fit_all()
    assert set(calibs) == {"ts_all", "ts_percls", "iso_all", "iso_percls"}
    onehot = np.eye(4)[true - 1]
    before = cal.classification_metrics(onehot, cal.stable_softmax(logits))
    apply = cal.CalibrateClass(calibs, num_classes=4)
    out = apply(logits)
    after = cal.classification_metrics(onehot, out["ts_all"]["probs"])
    assert after["ece"] < before["ece"]
    assert out["iso_percls"]["probs"].shape == logits.shape
    assert np.all(out["ts_all"]["entropy"] >= 0)


def test_uncertainty_aware_variants_fitted():
    true, logits = _classification_data(n=500)
    sig = np.abs(np.random.RandomState(1).randn(*logits.shape)) * 0.5
    cc = cal.ClassificationCalib(true, logits, sig, num_classes=4)
    calibs = cc.fit_all()
    assert "unc_ts_all" in calibs and "unc_iso_percls" in calibs


def test_save_load_roundtrip(tmp_path):
    gt, pred, sigma, classes = _regression_data(n=300)
    rc = cal.RegressionCalib(gt, pred, sigma, classes, num_classes=3)
    true, logits = _classification_data(n=300)
    cc = cal.ClassificationCalib(true, logits, None, num_classes=4)
    cal.save_calibrators(str(tmp_path), rc.fit_all(), cc.fit_all())
    reg, cls = cal.load_calibrators(str(tmp_path))
    assert set(reg) == set(cal.REGRESSION_CALIBRATORS)
    assert "ts_all" in cls
    out = cal.CalibrateBoxUncert(reg, 3)(sigma[:10], classes[:10], pred[:10])
    assert out["iso_all"].shape == (10, 4)


def test_gt_box_assigner():
    gt = np.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], float)
    preds = np.asarray([[49, 49, 61, 61], [1, 1, 11, 11]], float)
    idx, iou = cal.gt_box_assigner(gt, preds, "IoU")
    np.testing.assert_array_equal(idx, [1, 0])
    assert np.all(iou > 0.5)


def test_ece_regression_zero_for_perfect_calibration():
    rng = np.random.RandomState(0)
    sigma = np.full((20000,), 2.0)
    gt = np.zeros(20000)
    pred = rng.randn(20000) * 2.0
    ece = cal.calc_ece_regression(gt, pred, sigma)
    assert ece < 0.02
