"""Visual-artifact tail tests (VERDICT r1 item 9)."""

import os

import numpy as np
import pytest


def test_reliability_diagram_metrics(tmp_path):
    from udal_tpu.utils.uncert_plots import reliability_diagram

    rng = np.random.RandomState(0)
    conf = rng.rand(500)
    correct = (rng.rand(500) < conf).astype(float)   # near-calibrated
    m = reliability_diagram(correct, conf, str(tmp_path / "rel.png"))
    assert os.path.exists(tmp_path / "rel.png")
    assert 0 <= m["ECE"] < 0.15 and m["MCE"] >= m["ECE"]
    # badly calibrated: overconfident everywhere
    m2 = reliability_diagram(np.zeros(500), np.full(500, 0.95),
                             str(tmp_path / "rel2.png"))
    assert m2["ECE"] > 0.8


def test_regression_calibration_plot(tmp_path):
    from udal_tpu.utils.uncert_plots import regression_calibration_plot

    rng = np.random.RandomState(1)
    sigma = rng.rand(2000) + 0.2
    res = rng.randn(2000) * sigma        # perfectly calibrated
    m = regression_calibration_plot(res, sigma, str(tmp_path / "c.png"))
    assert m["miscal_area"] < 0.05
    m2 = regression_calibration_plot(res * 3, sigma,
                                     str(tmp_path / "c2.png"))
    assert m2["miscal_area"] > m["miscal_area"]


def test_spider_heatmap_top10(tmp_path):
    from udal_tpu.utils.uncert_plots import (metric_heatmap, spider_plot,
                                             top10_panel)

    table = {"ENT": {"auc": 0.8, "fdcd": 30.0, "jsd": 0.2},
             "ALBOX": {"auc": 0.7, "fdcd": 40.0, "jsd": 0.1}}
    p = spider_plot(table, str(tmp_path / "spider.png"))
    assert os.path.exists(p)
    p = metric_heatmap(np.random.rand(2, 6), [f"i{i}" for i in range(6)],
                       ["a", "b"], str(tmp_path / "hm.png"))
    assert os.path.exists(p)
    imgs = [np.zeros((20, 30, 3), np.uint8)] * 3
    p = top10_panel(imgs, ["x", "y", "z"], str(tmp_path / "t10.png"))
    assert os.path.exists(p)


def test_brisque_like_score_orders_quality():
    from udal_tpu.utils.uncert_plots import brisque_like_score

    rng = np.random.RandomState(2)
    # natural-ish image: smooth structure + spatially correlated texture
    # (i.i.d. pixel noise would itself read as a distortion — correctly)
    x, y = np.meshgrid(np.linspace(0, 4, 128), np.linspace(0, 4, 128))
    tex = __import__("cv2").GaussianBlur(
        rng.randn(128, 128) * 25, (0, 0), 1.5)
    clean = np.sin(x * 3) * np.cos(y * 2) * 60 + 120 + tex
    clean = np.clip(clean, 0, 255).astype(np.uint8)
    blurred = np.asarray(
        __import__("cv2").GaussianBlur(clean, (15, 15), 6))
    s_clean = brisque_like_score(clean)
    s_blur = brisque_like_score(blurred)
    assert s_blur > s_clean   # heavy blur = more distorted


def test_quadrant_crop_export(tmp_path):
    from udal_tpu.apps.uncertainty_analysis import export_quadrant_crops

    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (64, 96, 3), np.uint8)
    rows = []
    for i in range(30):
        rows.append({
            "image_name": "im.png",
            "bbox": [5.0, 5.0, 40.0, 60.0],
            "gt_bbox": [5.0, 5.0, 40.0, 60.0],
            "class": 1.0, "gt_class": 1.0, "iou": 0.9,
            "uncalib_mcbox": list(rng.rand(4)),
            "uncalib_albox": list(rng.rand(4)),
        })
    res = export_quadrant_crops(rows, lambda name: img, str(tmp_path),
                                n_cells=2, per_cell=2)
    assert "quality_epistemic_corr" in res
    saved = sum(res["crop_counts"].values())
    assert saved > 0
    assert any(p.startswith("cell_") for p in os.listdir(tmp_path))


def test_infer_overlays_and_buckets(tmp_path):
    """InferImages saves per-image overlay PNGs and top/bottom-10%
    uncertainty buckets (ref `infer_model.py:476-552,962-1059`)."""
    from udal_tpu.apps.infer import InferImages
    from udal_tpu.apps.serving import ServingDriver

    d = ServingDriver.create(
        "efficientdet-d0", batch_size=2,
        overrides={"image_size": 128, "num_classes": 8,
                   "loss_attenuation": True, "enable_softmax": True})
    app = InferImages(d, str(tmp_path / "out"), save_visualizations=True,
                      bucket_fraction=0.5)
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (2, 96, 160, 3), np.uint8).astype(np.float32)
    app.run([(imgs, ["a.png", "b.png"])])
    out = tmp_path / "out"
    assert (out / "prediction_data.txt").exists()
    vis = list((out / "visualizations").glob("*.png")) \
        if (out / "visualizations").exists() else []
    assert len(vis) >= 1
    assert (out / "top10" / "images.txt").exists()
    assert (out / "bottom10" / "images.txt").exists()


def _ladder_images():
    """Two disjoint synthetic scene families for the monotonicity check."""
    import cv2

    ims = []
    rng = np.random.RandomState(42)
    for i in range(3):   # family A: smooth harmonic structure + texture
        h, w = 192, 256
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        base = (128 + 60 * np.sin(xx / (10 + 5 * i)) *
                np.cos(yy / (14 + 3 * i)) + 40 * np.sin((xx + yy) / (25 + 4 * i)))
        tex = cv2.GaussianBlur(rng.randn(h, w).astype(np.float32) * 30,
                               (0, 0), 1.5 + 0.3 * i)
        g = np.clip(base + tex, 0, 255)
        ims.append(np.stack([g, g * 0.9 + 10, g * 0.8 + 20], -1)
                   .astype(np.uint8))
    rng = np.random.RandomState(7)
    for _ in range(3):   # family B: hard-edged boxes over a gradient sky
        h, w = 160, 224
        img = np.tile(np.linspace(180, 90, h)[:, None, None],
                      (1, w, 3)).astype(np.float32)
        for _ in range(12):
            x0, y0 = rng.randint(0, w - 20), rng.randint(0, h - 20)
            x1, y1 = x0 + rng.randint(8, 80), y0 + rng.randint(8, 60)
            img[y0:min(y1, h), x0:min(x1, w)] = rng.rand(3) * 200 + 20
        img += cv2.GaussianBlur(rng.randn(h, w, 3).astype(np.float32) * 12,
                                (0, 0), 1.0)
        img = cv2.GaussianBlur(img, (3, 3), 0)
        ims.append(np.clip(img, 0, 255).astype(np.uint8))
    return ims


def test_brisque_like_score_monotone_on_corruption_ladders():
    """Rank validity of the no-reference proxy (docs/BRISQUE_PROXY.md).

    The reference correlates a trained-SVR BRISQUE with uncertainty
    (`/root/reference/src/uncertainty_ep_vs_al.py:35-590`); that package is
    unavailable here, so the proxy's validity claim is per-image rank
    monotonicity with distortion severity — the property the quadrant
    analysis consumes. Guards the regression where the pristine-distance
    score alone was perfectly ANTI-correlated with noise severity.
    """
    from scipy.stats import spearmanr

    from udal_tpu.data.augment import apply_corruption
    from udal_tpu.utils.uncert_plots import brisque_like_score

    sev = np.linspace(0.05, 0.95, 7)
    for kind in ("bl", "ns", "mb", "ct", "br"):
        rhos = []
        for im in _ladder_images():
            scores = [brisque_like_score(c)
                      for c in apply_corruption(kind, im, sev)]
            rhos.append(spearmanr(sev, scores).statistic)
        assert np.mean(rhos) >= 0.8, (kind, rhos)
        assert min(rhos) >= 0.3, (kind, rhos)


def test_infer_overlay_boxes_in_image_frame(tmp_path, monkeypatch):
    """Reader-batch (3-tuple) path: serve_preprocessed returns boxes in the
    ORIGINAL frame, but overlays draw on the network-size image — the boxes
    passed to _save_overlay must be mapped back by 1/scale (regression:
    overlays were drawn ~scale× too large for any image_scales != 1)."""
    from udal_tpu.apps.infer import InferImages
    from udal_tpu.apps.serving import ServingDriver
    from udal_tpu.data.dataloader import normalize_image

    d = ServingDriver.create(
        "efficientdet-d0", batch_size=1,
        overrides={"image_size": 128, "num_classes": 8})
    app = InferImages(d, str(tmp_path / "out"), save_visualizations=True)

    captured = {}

    def fake_overlay(image, name, boxes, classes, scores, rel_al):
        captured["boxes"] = np.asarray(boxes)

    monkeypatch.setattr(app, "_save_overlay", fake_overlay)
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 255, (1, 128, 128, 3), np.uint8).astype(np.float32)
    images = normalize_image(raw, d.config.mean_rgb, d.config.stddev_rgb)
    scale = 2.5
    rows = app.run([(images, ["a.png"], np.asarray([scale], np.float32))])
    det_rows = [r for r in rows if r["image_name"] == "a.png"]
    if not det_rows or "boxes" not in captured:
        import pytest
        pytest.skip("no detections above threshold on random input")
    # prediction rows are original-frame; overlay boxes are image-frame
    row_boxes = np.asarray([r["bbox"] for r in det_rows])[: len(captured["boxes"])]
    np.testing.assert_allclose(captured["boxes"] * scale,
                               row_boxes[:, :4], rtol=1e-5)


def test_infer_uncertainty_panels_and_kind_buckets(tmp_path):
    """With MC dropout + loss attenuation + softmax active, inference writes
    one overlay panel per decoded uncertainty (plain, _mean_albox,
    _mean_epbox, _max_epcls, _entropy — ref `infer_model.py:962-1059`) and
    per-kind lower/upper uncertainty buckets with contact sheets
    (ref `infer_model.py:476-552`)."""
    from udal_tpu.apps.infer import InferImages
    from udal_tpu.apps.serving import ServingDriver

    d = ServingDriver.create(
        "efficientdet-d0", batch_size=2,
        overrides={"image_size": 128, "num_classes": 8,
                   "loss_attenuation": True, "enable_softmax": True,
                   "mc_dropout": True, "mc_dropoutrate": 0.05,
                   "mc_dropoutsamp": 2, "fpn_cell_repeats": 1,
                   "box_class_repeats": 1, "is_training_bn": False})
    app = InferImages(d, str(tmp_path / "out"), save_visualizations=True,
                      bucket_fraction=0.5)
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (2, 96, 160, 3), np.uint8).astype(np.float32)
    app.run([(imgs, ["a.png", "b.png"])])
    out = tmp_path / "out"
    vis = {p.name for p in (out / "visualizations").glob("*.png")}
    assert "a.png"[:-4] + ".png" in vis
    for suffix in ("_mean_albox", "_mean_epbox", "_max_epcls", "_entropy"):
        assert any(n.endswith(suffix + ".png") for n in vis), suffix
    for kind in ("albox", "mcbox", "mcclass", "entropy"):
        for tag in ("lower_uncert", "upper_uncert"):
            bd = out / "uncert" / tag / kind
            assert (bd / "images.txt").exists(), (tag, kind)
            assert (bd / "contact_sheet.png").exists(), (tag, kind)
