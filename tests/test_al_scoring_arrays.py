"""Parity: array-native AL pool scoring (`apps.al_scoring`) vs the
per-detection dict path (`apps.active_learning.score_images`).

The array path is the TPU-first redesign of the reference's host scoring
loop (`/root/reference/src/active_learning_loop.py:528-840`); the dict path
is the artifact-compatible shim already parity-tested against the live
reference (`tests/test_artifact_interop.py`). Identical scores/selections
here transitively prove the array path against the reference.
"""

import numpy as np
import pytest

from udal_tpu.apps import active_learning as al
from udal_tpu.apps import al_scoring as als

STRATEGIES = [
    "entropy", "mean_entropy", "norm_mcbox", "norm_albox", "mcclass",
    "mean_mcbox", "combo", "mean_combo", "ental", "alluncert",
    "mean_epuncert", "sota", "alluncert_highep_lowal", "perc_entropy",
    "bottomk_entropy", "nee_entropy",
]

CALIB_STRATEGIES = ["calib_combo", "calib_ental", "calib_alluncert",
                    "calib_mean_epuncert", "calib_sota"]


def _rows(n_images=24, seed=0, n_classes=4):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_images):
        name = f"img{i:03d}.png"
        for _ in range(int(rng.randint(1, 7))):
            y1, x1 = rng.uniform(0, 100, 2)
            h, w = rng.uniform(10, 80, 2)
            logits = rng.randn(n_classes) * 2
            p = np.exp(logits - logits.max())
            p = p / p.sum()
            rows.append({
                "image_name": name,
                "det_score": float(rng.uniform(0.05, 1.0)),
                "bbox": [float(y1), float(x1), float(y1 + h), float(x1 + w)],
                "class": float(rng.randint(1, n_classes + 1)),
                "entropy": float(-np.sum(p * np.log(p))),
                "logits": [float(x) for x in logits],
                "probab": [float(x) for x in p],
                "uncalib_albox": list(rng.gamma(2, 0.5, 4)),
                "uncalib_mcbox": list(rng.gamma(2, 0.5, 4)),
                "uncalib_mcclass": list(rng.gamma(2, 0.2, n_classes)),
                "iso_perclscoo_albox": list(rng.gamma(2, 0.4, 4)),
                "iso_perclscoo_mcbox": list(rng.gamma(2, 0.4, 4)),
                "iso_percls_entropy": float(rng.gamma(2, 0.2)),
                "iso_percls_mcclass": list(rng.gamma(2, 0.2, n_classes)),
            })
    return rows


@pytest.mark.parametrize("strategy", STRATEGIES + CALIB_STRATEGIES)
def test_rows_pool_score_parity(strategy):
    rows = _rows()
    pool = als.pool_from_rows(rows)
    d_scores, d_classes, d_names = al.score_images(rows, strategy,
                                                   opt_params=[0.4, 0.6])
    a_scores, a_classes, a_names = als.score_pool(pool, strategy,
                                                  opt_params=[0.4, 0.6])
    assert d_names == a_names
    np.testing.assert_allclose(np.asarray(d_scores, float), a_scores,
                               rtol=1e-10, atol=1e-12)
    for dc, ac in zip(d_classes, a_classes):
        np.testing.assert_array_equal(np.asarray(dc, float), ac)


@pytest.mark.parametrize("strategy",
                         ["entropy", "perc_entropy", "bottomk_entropy",
                          "nee_entropy", "alluncert", "sota"])
def test_rows_pool_selection_parity(strategy):
    rows = _rows(seed=3)
    pool = als.pool_from_rows(rows)
    d = al.select_images(rows, strategy, 7, opt_params=[0.4, 0.6],
                         rng=np.random.RandomState(1))
    a = als.select_pool(pool, strategy, 7, opt_params=[0.4, 0.6],
                        rng=np.random.RandomState(1))
    assert d == a


def test_random_selection_parity():
    rows = _rows(seed=5)
    pool = als.pool_from_rows(rows)
    d = al.select_images(rows, "random", 5, rng=np.random.RandomState(7))
    a = als.select_pool(pool, "random", 5, rng=np.random.RandomState(7))
    assert d == a


# ---------------------------------------------------------------------------
# End-to-end: fake serve outputs -> InferImages dict rows vs collect_pool
# ---------------------------------------------------------------------------

class _FakeDriver:
    """Replays pre-generated packed serving outputs (the real packing
    contract: boxes 4+4+4, classes 1+C, logits)."""

    def __init__(self, config, outputs):
        self.config = config
        self._outputs = list(outputs)
        self._i = 0

    def serve(self, images):
        out = self._outputs[self._i % len(self._outputs)]
        self._i += 1
        return out


def _fake_outputs(rng, batch, k, c):
    y1 = rng.uniform(0, 200, (batch, k))
    x1 = rng.uniform(0, 400, (batch, k))
    boxes = np.stack([y1, x1, y1 + rng.uniform(10, 100, (batch, k)),
                      x1 + rng.uniform(10, 100, (batch, k))], -1)
    sig_al = rng.gamma(2, 2.0, (batch, k, 4))
    sig_mc = rng.gamma(2, 2.0, (batch, k, 4))
    boxes = np.concatenate([boxes, sig_al, sig_mc], -1).astype(np.float32)
    scores = np.sort(rng.uniform(0.05, 1, (batch, k)))[:, ::-1].copy()
    cls_ids = rng.randint(1, c + 1, (batch, k)).astype(np.float32)
    sig_cls = rng.gamma(2, 0.3, (batch, k, c))
    classes = np.concatenate([cls_ids[..., None], sig_cls],
                             -1).astype(np.float32)
    valid = rng.randint(0, k + 1, batch)
    valid[0] = 0   # one detection-less image per batch: dropped by both paths
    logits = (rng.randn(batch, k, c) * 2).astype(np.float32)
    return (boxes, scores.astype(np.float32), classes,
            valid.astype(np.int32), logits)


def _fitted_calibrators(c, seed=0):
    from udal_tpu.apps import calibration as cal

    rng = np.random.RandomState(seed)
    n = 400
    gt = rng.uniform(0, 100, (n, 4))
    pred = gt + rng.randn(n, 4) * 3
    sigma = np.abs(rng.randn(n, 4)) * 3 + 0.1
    classes = rng.randint(1, c + 1, n)
    reg = cal.RegressionCalib(gt, pred, sigma, classes,
                              num_classes=c).fit_all()
    true = rng.randint(1, c + 1, n)
    logits = rng.randn(n, c) * 2
    logits[np.arange(n), true - 1] += 1.5
    sig = np.abs(rng.randn(n, c)) * 0.4
    cls = cal.ClassificationCalib(true, logits, sig, num_classes=c).fit_all()
    return (cal.CalibrateBoxUncert(reg, c), cal.CalibrateClass(cls, c))


def test_collect_pool_matches_dict_path(tmp_path):
    from udal_tpu.apps.infer import InferImages
    from udal_tpu.config import get_detection_config

    c = 4
    cfg = get_detection_config("efficientdet-d0")
    cfg.num_classes = c
    cfg.loss_attenuation = True
    cfg.mc_dropout = True
    cfg.mc_dropoutrate = 0.05
    cfg.enable_softmax = True
    cfg.is_training_bn = False

    rng = np.random.RandomState(11)
    n_batches, batch, k = 3, 4, 6
    outputs = [_fake_outputs(rng, batch, k, c) for _ in range(n_batches)]
    box_calib, cls_calib = _fitted_calibrators(c)

    def batches():
        for b in range(n_batches):
            names = [f"img{b * batch + i:03d}.png" for i in range(batch)]
            yield np.zeros((batch, 8, 8, 3), np.float32), names

    drv = _FakeDriver(cfg, outputs)
    app = InferImages(drv, str(tmp_path), min_score=0.0)
    app.box_calib, app.cls_calib = box_calib, cls_calib
    rows = app.run(batches())

    drv2 = _FakeDriver(cfg, outputs)
    pool = als.collect_pool(drv2, batches(), min_score=0.0,
                            box_calib=box_calib, cls_calib=cls_calib)

    assert pool.n_detections == len(rows)
    assert pool.names == [r["image_name"] for r in rows
                          if r["image_name"] not in
                          {q["image_name"] for q in rows[:rows.index(r)]}] \
        or pool.names == list(dict.fromkeys(r["image_name"] for r in rows))

    for strategy in STRATEGIES + CALIB_STRATEGIES:
        d_scores, _, d_names = al.score_images(rows, strategy,
                                               opt_params=[0.4, 0.6])
        a_scores, _, a_names = als.score_pool(pool, strategy,
                                              opt_params=[0.4, 0.6])
        assert d_names == a_names, strategy
        np.testing.assert_allclose(np.asarray(d_scores, float), a_scores,
                                   rtol=1e-6, atol=1e-9, err_msg=strategy)
        d_sel = al.select_images(rows, strategy, 4, opt_params=[0.4, 0.6])
        a_sel = als.select_pool(pool, strategy, 4, opt_params=[0.4, 0.6])
        assert d_sel == a_sel, strategy


def test_degenerate_box_relativization_finite_and_parity():
    """Boxes clipped to zero area must not poison scores with NaN/inf
    (regression: the ensemble-efficacy run fed NaN into roc_curve)."""
    rows = _rows(n_images=6, seed=11)
    rows[0]["bbox"] = [10.0, 20.0, 10.0, 50.0]   # h == 0
    rows[1]["bbox"] = [5.0, 7.0, 5.0, 7.0]       # h == w == 0
    pool = als.pool_from_rows(rows)
    for strategy in ["alluncert", "sota", "combo", "mean_mcbox"]:
        d_scores, _, d_names = al.score_images(rows, strategy,
                                               opt_params=[0.4, 0.6])
        a_scores, _, a_names = als.score_pool(pool, strategy,
                                              opt_params=[0.4, 0.6])
        assert d_names == a_names
        assert np.all(np.isfinite(a_scores)), strategy
        np.testing.assert_allclose(np.asarray(d_scores, float), a_scores,
                                   rtol=1e-10, atol=1e-12)
    # degenerate boxes rank as maximally uncertain, not as NaN
    plane = als._rel_box_plane(pool.boxes, pool.feats["uncalib_mcbox"],
                               pool.mask)
    assert np.all(np.isfinite(plane))
