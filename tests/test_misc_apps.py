import json
import os

import numpy as np
import pytest

from udal_tpu.apps import al_eval
from udal_tpu.apps.uncertainty_analysis import (MainUncertAnalysis,
                                                epistemic_vs_aleatoric,
                                                select_uncertainties)
from udal_tpu.data import tfrecord as tfr
from udal_tpu.data.dataloader import parse_detection_example
from udal_tpu.data.dataset_creators import (bdd_to_tfrecord,
                                            kitti_to_tfrecord,
                                            parse_kitti_label_file)
from udal_tpu.utils.visualize import visualize_boxes_and_labels


def _val_rows(n=600, seed=0):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        correct = rng.rand() < 0.7
        boost = 1.0 if correct else 4.0
        rows.append({
            "image_name": f"im{i}.png",
            "score": float(rng.uniform(0.2, 1.0)),
            "bbox": [10.0, 10.0, 60.0, 90.0],
            "gt_bbox": [11.0, 11.0, 61.0, 91.0],
            "class": 1.0 if correct else 2.0,
            "gt_class": 1.0,
            "iou": float(rng.uniform(0.55, 0.95)) if correct else
            float(rng.uniform(0.0, 0.45)),
            "entropy": float(rng.gamma(2, 0.2) * boost),
            "uncalib_albox": [float(x) for x in rng.gamma(2, 0.4, 4) * boost],
            "uncalib_mcbox": [float(x) for x in rng.gamma(2, 0.4, 4) * boost],
        })
    return rows


def test_main_uncert_analysis(tmp_path):
    rows = _val_rows()
    path = str(tmp_path / "validate_results.txt")
    with open(path, "w") as f:
        for r in rows:
            f.write(repr(r) + "\n")
    out = MainUncertAnalysis(path, str(tmp_path / "thr")).run(max_evals=80)
    assert len(out["opt_params"]) == 2
    assert out["metrics"]["COMBO"]["auroc"] > 0.6
    files = os.listdir(tmp_path / "thr")
    assert any(f.startswith("optimal_params_cd") for f in files)
    assert any(f.startswith("thr_metrics") for f in files)


def test_epistemic_vs_aleatoric():
    rows = _val_rows(200)
    out = epistemic_vs_aleatoric(rows)
    assert sum(c["count"] for c in out["cells"].values()) == 200
    assert -1 <= out["correlation"] <= 1


def test_select_uncertainties_keys():
    rows = _val_rows(5)
    u = select_uncertainties(rows, "ENTALBOXMCBOX")
    assert set(u) == {"ENT", "ALBOX", "MCBOX"}


def test_visualize_boxes():
    img = np.zeros((100, 150, 3), np.uint8)
    boxes = np.asarray([[10, 10, 50, 60], [20, 70, 80, 140]], float)
    classes = np.asarray([1, 2])
    scores = np.asarray([0.9, 0.7])
    out = visualize_boxes_and_labels(img, boxes, classes, scores,
                                     uncertainties=np.asarray([0.1, 0.9]))
    assert out.shape == img.shape
    assert out.sum() > 0


def test_kitti_creator_roundtrip(tmp_path):
    import cv2

    img_dir = tmp_path / "image_2"
    lbl_dir = tmp_path / "label_2"
    img_dir.mkdir(); lbl_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        img = rng.randint(0, 255, (80, 120, 3), np.uint8)
        cv2.imwrite(str(img_dir / f"{i:06d}.png"), img)
        with open(lbl_dir / f"{i:06d}.txt", "w") as f:
            f.write("Car 0.0 0 0.0 10.0 20.0 60.0 70.0 "
                    "0 0 0 0 0 0 0\n")
            f.write("Pedestrian 0.0 0 0.0 5.0 5.0 25.0 40.0 "
                    "0 0 0 0 0 0 0\n")
            f.write("DontCare -1 -1 -10 500 150 600 180 "
                    "-1 -1 -1 -1000 -1000 -1000 -10\n")
    out = str(tmp_path / "kitti.tfrecord")
    n = kitti_to_tfrecord(str(img_dir), str(lbl_dir), out)
    assert n == 3
    ex = parse_detection_example(next(iter(tfr.iterate_tfrecord(out))))
    assert len(ex.classes) == 2              # DontCare filtered
    assert set(ex.classes) == {1, 4}         # car=1, pedestrian=4
    np.testing.assert_allclose(ex.boxes[0], [20, 10, 70, 60], atol=0.5)
    # AL subset variant
    n = kitti_to_tfrecord(str(img_dir), str(lbl_dir),
                          str(tmp_path / "subset.tfrecord"),
                          indices=["000001"])
    assert n == 1


def test_kitti_label_parse_with_scores(tmp_path):
    p = tmp_path / "x.txt"
    p.write_text("Car 0.0 0 0.0 1 2 3 4 0 0 0 0 0 0 0 0.77\n")
    boxes, ids, texts, scores = parse_kitti_label_file(str(p),
                                                       with_scores=True)
    assert scores == [0.77]


def test_bdd_creator(tmp_path):
    import cv2

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    cv2.imwrite(str(img_dir / "a.jpg"),
                rng.randint(0, 255, (60, 90, 3), np.uint8))
    ann = [{"name": "a.jpg", "labels": [
        {"category": "car", "box2d": {"x1": 5, "y1": 6, "x2": 40, "y2": 40}},
        {"category": "unknown", "box2d": {"x1": 0, "y1": 0, "x2": 5, "y2": 5}},
    ]}]
    jp = tmp_path / "bdd.json"
    jp.write_text(json.dumps(ann))
    out = str(tmp_path / "bdd.tfrecord")
    assert bdd_to_tfrecord(str(jp), str(img_dir), out) == 1
    ex = parse_detection_example(next(iter(tfr.iterate_tfrecord(out))))
    assert list(ex.classes) == [3]           # bdd car = 3


def test_dataset_similarity_and_rank():
    rng = np.random.RandomState(0)

    def make_set(shift):
        samples = []
        for _ in range(6):
            img = rng.randint(shift, shift + 100, (60, 80, 3), np.uint8)
            boxes = np.asarray([[5, 5, 40, 50]], float)
            classes = np.asarray([1])
            samples.append((img, boxes, classes))
        return al_eval.collect_metrics(samples)

    a, b, c = make_set(0), make_set(10), make_set(150)
    sim_ab = al_eval.calculate_set_similarity(a, b)
    sim_ac = al_eval.calculate_set_similarity(a, c)
    assert sim_ab > sim_ac
    tau, _ = al_eval.rank_correlation({"m1": 0.9, "m2": 0.5, "m3": 0.1},
                                      {"m1": 0.4, "m2": 0.3, "m3": 0.2})
    assert tau == pytest.approx(1.0)


def test_plot_gt_and_metrics_writer(tmp_path):
    from udal_tpu.data.plot_gt import plot_tfrecord_groundtruth
    from udal_tpu.data.synthetic import write_synthetic_dataset
    from udal_tpu.utils.metrics_writer import MetricsWriter

    path = str(tmp_path / "d.tfrecord")
    write_synthetic_dataset(path, num_images=3, height=64, width=96)
    n = plot_tfrecord_groundtruth(path, str(tmp_path / "plots"))
    assert n == 3
    assert len(os.listdir(tmp_path / "plots")) == 3

    mw = MetricsWriter(str(tmp_path / "logs"), use_tensorboard=False)
    mw.write(1, {"loss": 0.5})
    mw.write(2, {"loss": 0.4, "ap": 0.1})
    mw.close()
    lines = open(tmp_path / "logs" / "metrics.jsonl").read().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[1])["ap"] == 0.1


def test_efficientdet_model_wrapper():
    import jax
    import jax.numpy as jnp

    from udal_tpu.config import get_detection_config
    from udal_tpu.models.efficientdet import EfficientDetModel

    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = 64
    cfg.num_classes = 8
    model = EfficientDetModel(cfg)
    x = jnp.zeros((1, 48, 80, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False))()
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    boxes, scores, classes, valid = out
    assert boxes.shape == (1, 100, 4)


def _mini_kitti(tmp_path, n=4):
    import cv2

    img_dir = tmp_path / "image_2"
    lbl_dir = tmp_path / "label_2"
    img_dir.mkdir(exist_ok=True); lbl_dir.mkdir(exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        cv2.imwrite(str(img_dir / f"{i:06d}.png"),
                    rng.randint(0, 255, (60, 90, 3), np.uint8))
        with open(lbl_dir / f"{i:06d}.txt", "w") as f:
            f.write("Car 0.0 0 0.0 10.0 20.0 60.0 50.0 0 0 0 0 0 0 0\n")
    return str(img_dir), str(lbl_dir)


def test_kitti_active_and_csd_creators(tmp_path):
    """AL-subset / CSD-split / custom creator variants
    (ref `kitti_tf_creator.py:84-320`)."""
    from udal_tpu.data import tfrecord as tfr
    from udal_tpu.data.dataloader import parse_detection_example
    from udal_tpu.data.dataset_creators import (kitti_active_tfrecords,
                                                kitti_csd_tfrecords,
                                                kitti_custom_to_tfrecords)

    img_dir, lbl_dir = _mini_kitti(tmp_path)
    out = str(tmp_path / "tf")

    n = kitti_active_tfrecords(img_dir, lbl_dir, out, [0, 2], 1)
    assert n == 2
    import os
    assert os.path.exists(os.path.join(out, "_train_1.tfrecord"))

    # pseudo labels with scores
    pseudo = tmp_path / "pseudo"
    pseudo.mkdir()
    (pseudo / "000000.txt").write_text(
        "Car 0.0 0 0.0 10.0 20.0 60.0 50.0 0 0 0 0 0 0 0 0.88\n")
    n = kitti_active_tfrecords(img_dir, lbl_dir, out, [0], 2,
                               pseudo=str(pseudo))
    assert n == 1
    rec = next(iter(tfr.iterate_tfrecord(
        os.path.join(out, "_train_2.tfrecord"))))
    ex = parse_detection_example(rec)
    assert ex.pseudo_scores is not None
    np.testing.assert_allclose(ex.pseudo_scores, [0.88], atol=1e-6)

    n_lab, n_unl = kitti_csd_tfrecords(img_dir, lbl_dir, out, 2,
                                       [0, 1, 2, 3], saving_name="_x")
    assert (n_lab, n_unl) == (2, 2)
    rec = next(iter(tfr.iterate_tfrecord(
        os.path.join(out, "_train_unlabeled_x.tfrecord"))))
    assert len(parse_detection_example(rec).classes) == 0  # boxes stripped

    n_tr, n_val = kitti_custom_to_tfrecords(
        img_dir, lbl_dir, str(tmp_path / "cust"), [0, 1], [2])
    assert (n_tr, n_val) == (2, 1)


def test_bdd_active_and_csd_creators(tmp_path):
    import json

    import cv2

    from udal_tpu.data import tfrecord as tfr
    from udal_tpu.data.dataloader import parse_detection_example
    from udal_tpu.data.dataset_creators import (bdd_active_tfrecords,
                                                bdd_csd_tfrecords)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(1)
    data = []
    for i in range(4):
        name = f"b{i}.jpg"
        cv2.imwrite(str(img_dir / name),
                    rng.randint(0, 255, (50, 70, 3), np.uint8))
        data.append({"name": name, "labels": [
            {"category": "car",
             "box2d": {"x1": 5.0, "y1": 6.0, "x2": 40.0, "y2": 30.0}}]})
    jp = tmp_path / "labels.json"
    jp.write_text(json.dumps(data))

    out = str(tmp_path / "tf")
    n = bdd_active_tfrecords(str(jp), str(img_dir), out, [1, 3], 0)
    assert n == 2
    n_lab, n_unl = bdd_csd_tfrecords(str(jp), str(img_dir), out, 1,
                                     [0, 1, 2], saving_name="_y")
    assert (n_lab, n_unl) == (1, 2)
    import os
    rec = next(iter(tfr.iterate_tfrecord(
        os.path.join(out, "_train_unlabeled_y.tfrecord"))))
    assert len(parse_detection_example(rec).classes) == 0


def test_similarity_pipeline_and_eval_scraping(tmp_path):
    """AL-eval breadth: config rewriting, metric scraping, Similarity
    ranking + Kendall tau (ref `active_learning_eval.py:105-189,586-944`)."""
    import json
    import os

    import yaml

    from udal_tpu.apps.al_eval import (Similarity, extract_eval_metrics,
                                       update_eval_config)

    # eval-config rewriting
    cfg = tmp_path / "eval.yaml"
    cfg.write_text(yaml.safe_dump({
        "model_dir": "old", "eval_samples": 10,
        "val_file_pattern": "data/_val.tfrecord"}))
    update_eval_config(str(cfg), "newdir", update_name=3, eval_samples=7)
    data = yaml.safe_load(cfg.read_text())
    assert data["model_dir"] == "newdir"
    assert data["val_file_pattern"].endswith("_val_set3.tfrecord")
    assert data["eval_samples"] == 7

    # metric scraping from the JSONL stream
    rng = np.random.RandomState(0)
    method_dirs = {}
    ap_truth = {"m0": 0.4, "m1": 0.2, "m2": 0.6}
    for name, ap in ap_truth.items():
        d = tmp_path / name / "logs"
        os.makedirs(d)
        with open(d / "metrics.jsonl", "w") as f:
            f.write(json.dumps({"step": 1, "AP": ap / 2}) + "\n")
            f.write(json.dumps({"step": 2, "AP": ap, "val_loss": 1.0}) + "\n")
        method_dirs[name] = str(tmp_path / name)
    assert extract_eval_metrics(str(tmp_path / "m0" / "logs"))["AP"] == 0.4

    # similarity vs AP ranking: method sets drawn closer/farther from ref
    def make_samples(shift):
        out = []
        for _ in range(6):
            img = rng.randint(0, 255, (40, 60, 3), np.uint8)
            img = np.clip(img.astype(int) + shift, 0, 255).astype(np.uint8)
            out.append((img, np.asarray([[5.0, 5.0, 30.0, 40.0]]),
                        np.asarray([1])))
        return out

    ref = make_samples(0)
    samples = {"m0": make_samples(40), "m1": make_samples(120),
               "m2": make_samples(5)}
    sim = Similarity("k", method_dirs)
    res = sim.run(samples, ref)
    assert res["ranking"][0] == "m2"                  # highest AP first
    assert set(res["similarities"]) == {"m0", "m1", "m2"}
    # closer pixel statistics => higher similarity
    assert res["similarities"]["m2"] > res["similarities"]["m1"]
    assert np.isfinite(res["kendall_tau"])
