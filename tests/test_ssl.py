import numpy as np
import pytest

from udal_tpu.apps import ssl, ssl_utils
from udal_tpu.data import tfrecord as tfr
from udal_tpu.data.example_codec import parse_example
from udal_tpu.data.synthetic import make_image_with_boxes


def _rows(n_images=6, seed=0):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_images):
        name = f"img{i:03d}.png"
        for _ in range(3):
            rows.append({
                "image_name": name,
                "det_score": float(rng.uniform(0.1, 1.0)),
                "bbox": [10.0, 10.0, 60.0, 80.0],
                "class": float(rng.randint(1, 4)),
                "entropy": float(rng.gamma(2, 0.2)),
                "uncalib_albox": list(rng.gamma(2, 0.5, 4)),
                "uncalib_mcbox": list(rng.gamma(2, 0.5, 4)),
                "uncalib_mcclass": list(rng.gamma(2, 0.2, 3)),
            })
    return rows


def test_score_filter_keeps_confident():
    rows = _rows()
    names, classes, boxes = ssl.select_pseudo_labels(rows, "score", tau=0.5)
    assert len(names) == len(classes) == len(boxes)
    for r in rows:
        if r["det_score"] > 0.9:
            assert r["image_name"] in names


def test_uncertainty_strategies_run():
    rows = _rows()
    for strat in ("alluncert", "epuncert", "ental", "combo"):
        out = ssl.select_pseudo_labels(rows, strat, tau=0.1,
                                       opt_thrs=np.asarray([1e9]),
                                       opt_params=[0.5, 0.5],
                                       with_scores=True)
        names, classes, boxes, scores = out
        assert len(names) == len(scores)


def test_stac_orchestration(tmp_path):
    rng = np.random.RandomState(0)
    pool_images = {}
    for i in range(6):
        img, _, _ = make_image_with_boxes(rng, 64, 96, 2, 3)
        pool_images[f"img{i:03d}.png"] = img
    stages = []

    def train_fn(stage, pseudo_path, round_idx):
        stages.append((stage, round_idx, pseudo_path))

    def infer_fn(round_idx):
        return _rows(seed=round_idx)

    def images_fn(names):
        return {n: pool_images[n] for n in names}

    stac = ssl.STAC(str(tmp_path), tau=0.3, selection_strategy="score",
                    activate_pseudoscore=True, train_fn=train_fn,
                    infer_fn=infer_fn, images_fn=images_fn,
                    selftrain_rounds=1)
    artifacts = stac.run()
    assert len(artifacts) == 2
    assert stages[0][0] == "teacher"
    assert [s[0] for s in stages[1:]] == ["student", "student"]
    # pseudo TFRecord has pseudo_score feature
    rec = next(iter(tfr.iterate_tfrecord(artifacts[0])))
    feats = parse_example(rec)
    assert "image/object/pseudo_score" in feats
    assert len(feats["image/object/pseudo_score"]) > 0


def test_csd_split(tmp_path):
    rng = np.random.RandomState(0)
    from udal_tpu.data.synthetic import make_example
    records = []
    for i in range(10):
        img, boxes, classes = make_image_with_boxes(rng, 48, 64, 2, 3)
        records.append(make_example(img, boxes, classes, str(i), f"{i}.png"))
    seen = {}

    def train_fn(labeled, unlabeled, overrides):
        seen["overrides"] = overrides

    csd = ssl.CSD(str(tmp_path), ratio=0.6, train_fn=train_fn)
    labeled, unlabeled = csd.run(records)
    assert seen["overrides"]["ssl_method"] == "CSD"
    n_lab = len(list(tfr.iterate_tfrecord(labeled)))
    n_unl = len(list(tfr.iterate_tfrecord(unlabeled)))
    assert n_lab == 6 and n_unl == 4
    # unlabeled records have no object annotations
    rec = next(iter(tfr.iterate_tfrecord(unlabeled)))
    feats = parse_example(rec)
    assert feats.get("image/object/class/label", []) == []
    assert len(feats["image/encoded"][0]) > 0


def test_class_weights_and_curriculum():
    w = ssl_utils.class_distribution_weights({1: 1000, 2: 50, 3: 5})
    assert w[3] > w[2] > w[1]
    names = [f"i{k}" for k in range(6)]
    classes = [[1], [1], [1], [3], [3], [2]]
    common, rare = ssl_utils.rcf_curriculum_split(names, classes, w,
                                                  rare_fraction=0.34)
    assert set(rare) <= {"i3", "i4", "i5"}


def test_pls_scores():
    w = {1: 1.0, 2: 10.0}
    scores = ssl_utils.pls_image_scores([[0.9], [0.2]], [[1], [2]], w,
                                        beta=0.5)
    assert scores.shape == (2,)
    top = ssl_utils.pls_split(["a", "b"], scores, 0.5, "top")
    assert len(top) == 1


def test_glc_modes():
    gt = np.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], float)
    gtc = np.asarray([1, 2])
    preds = np.asarray([[1, 1, 11, 11], [100, 100, 120, 120]], float)
    predc = np.asarray([1, 3])
    scores = np.asarray([0.9, 0.8])
    consist = np.asarray([0.95, 0.95])
    # md: adds the non-intersecting confident prediction
    b, c = ssl_utils.glc_clean_labels(gt, gtc, preds, predc, scores, consist,
                                      mode="md")
    assert len(b) == 3 and c[-1] == 3
    # mistakes: drops GT with no matching prediction
    b, c = ssl_utils.glc_clean_labels(gt, gtc, preds, predc, scores, consist,
                                      mode="mistakes")
    assert len(b) == 1 and c[0] == 1
    # noisy: replaces matched GT coords
    b, c = ssl_utils.glc_clean_labels(gt, gtc, preds, predc, scores, consist,
                                      mode="noisy")
    np.testing.assert_allclose(b[0], [1, 1, 11, 11])


def test_fault_injection():
    rng = np.random.RandomState(0)
    gt = np.tile(np.asarray([[10.0, 10.0, 50.0, 50.0]]), (100, 1))
    cls = np.ones(100, int)
    b, c = ssl_utils.inject_label_faults(gt, cls, 3, drop_fraction=0.3,
                                         box_noise_fraction=0.5,
                                         class_mistake_fraction=0.2, rng=rng)
    assert len(b) < 100
    assert np.any(c != 1)


def test_rcc_collage():
    rng = np.random.RandomState(0)
    bg = rng.randint(0, 255, (100, 150, 3), np.uint8)
    crop = rng.randint(0, 255, (20, 30, 3), np.uint8)
    img, boxes, classes = ssl_utils.rcc_collage(bg, [(crop, 2)], rng=rng)
    assert img.shape == bg.shape
    assert boxes.shape == (1, 4) and classes[0] == 2


def test_pseudo_vs_gt_analysis_md_fd():
    """Per-class MD/FD pseudo-label analysis (ref parent.py:1567-1812)."""
    import numpy as np

    from udal_tpu.apps.ssl_utils import pseudo_vs_gt_analysis

    gt = [(np.asarray([[0, 0, 10, 10], [20, 20, 40, 40]], float),
           np.asarray([1, 2]))]
    # pseudo: matches GT#0 with right class, misses GT#1, adds a false det
    pseudo = [(np.asarray([[1, 1, 11, 11], [60, 60, 80, 80]], float),
               np.asarray([1, 1]))]
    res = pseudo_vs_gt_analysis(gt, pseudo)
    assert res["per_class"][1]["matched"] == 1
    assert res["per_class"][1]["acc"] == 1.0
    assert res["per_class"][2]["md_rate"] == 1.0
    assert res["md_rate"] == 0.5          # 1 of 2 GT missed
    assert res["fd_rate"] == 0.5          # 1 of 2 pseudo false


def test_augment_collage_crops():
    import numpy as np

    from udal_tpu.apps.ssl_utils import augment_collage_crops

    rng = np.random.RandomState(0)
    crops = [(rng.randint(0, 255, (20, 30, 3), np.uint8), 3)]
    out = augment_collage_crops(crops, rng)
    assert len(out) == 1 and out[0][1] == 3
    assert out[0][0].shape == (20, 30, 3) and out[0][0].dtype == np.uint8


def test_stac_training_crash_resume(tmp_path):
    """STAC relaunches training until the done-probe passes — parity with
    the reference's retry-until-ckpt loops (`SSL_stac.py:673-708`)."""
    import numpy as np

    from udal_tpu.apps.ssl import STAC

    calls = []
    done_after = {"teacher": 2, "student": 1}   # teacher crashes once

    def train_fn(stage, pseudo_path, round_idx):
        calls.append(stage)

    def train_done(stage, round_idx):
        return calls.count(stage) >= done_after[stage]

    rng = np.random.RandomState(0)

    def infer_fn(r):
        return [{"image_name": "a.png", "det_score": 0.9,
                 "bbox": [1.0, 1.0, 20.0, 20.0], "class": 1.0}]

    def images_fn(names):
        return {n: rng.randint(0, 255, (32, 48, 3), np.uint8)
                for n in names}

    stac = STAC(str(tmp_path), train_fn=train_fn, infer_fn=infer_fn,
                images_fn=images_fn, train_done_fn=train_done)
    stac.run()
    assert calls.count("teacher") == 2          # retried once, then done
    assert calls.count("student") == 1

    # a probe that never passes raises after max retries
    stac2 = STAC(str(tmp_path / "x"), train_fn=train_fn, infer_fn=infer_fn,
                 images_fn=images_fn,
                 train_done_fn=lambda *a: False, max_train_retries=2)
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        stac2.run()
