import os

import numpy as np
import pytest

from udal_tpu.apps.infer import (InferImages, read_prediction_data,
                                 split_serve_outputs, write_kitti_labels)
from udal_tpu.apps.serving import ServingDriver
from udal_tpu.apps.validate import Validator, read_validate_results
from udal_tpu.config import get_detection_config
from udal_tpu.data.dataloader import InputReader
from udal_tpu.data.label_maps import KITTI
from udal_tpu.data.synthetic import write_synthetic_dataset


@pytest.fixture(scope="module")
def driver():
    return ServingDriver.create(
        "efficientdet-d0",
        overrides={"image_size": 128, "num_classes": 8,
                   "loss_attenuation": True, "enable_softmax": True,
                   "nms_configs": {"score_thresh": 1e-5}},
        batch_size=2)


@pytest.fixture(scope="module")
def synth_batches(tmp_path_factory, driver):
    d = tmp_path_factory.mktemp("val")
    path = str(d / "val.tfrecord")
    write_synthetic_dataset(path, num_images=4, height=96, width=160,
                            num_classes=7, seed=3)
    reader = InputReader(path, is_training=False, names=True)
    return list(reader(driver.config, batch_size=2))


def test_split_serve_outputs(driver):
    imgs = np.random.RandomState(0).randint(0, 255, (2, 96, 160, 3), np.uint8)
    out = split_serve_outputs(driver.config, driver.serve(imgs))
    assert out["boxes"].shape == (2, 100, 4)
    assert out["sigma_al"].shape == (2, 100, 4)
    assert out["entropy"].shape == (2, 100)
    assert "sigma_mc" not in out


def test_split_serve_outputs_infers_ensemble_sigma_columns(driver):
    """A deep-ensemble serve packs mc sigma columns even with
    config.mc_dropout=False (the postprocess keys on the sample axis,
    `ops/postprocess.py:162-166`); the splitter must infer presence from
    the packed widths, not the MC config flags."""
    cfg = driver.config
    b, k, c = 2, 10, cfg.num_classes
    boxes = np.arange(b * k * 12, dtype=np.float32).reshape(b, k, 12)
    scores = np.zeros((b, k), np.float32)
    classes = np.zeros((b, k, 1 + c), np.float32)
    classes[..., 1:] = 0.25
    valid = np.full((b,), k, np.int32)
    logits = np.zeros((b, k, c), np.float32)
    out = split_serve_outputs(cfg, (boxes, scores, classes, valid, logits))
    assert out["sigma_al"].shape == (b, k, 4)
    assert out["sigma_mc"].shape == (b, k, 4)
    np.testing.assert_array_equal(out["sigma_mc"], boxes[..., 8:12])
    assert out["sigma_cls"].shape == (b, k, c)
    # plain single-model serve (no sample axis) still has no mc columns
    out1 = split_serve_outputs(cfg, (boxes[..., :8], scores,
                                     classes[..., 0], valid, logits))
    assert "sigma_mc" not in out1 and "sigma_cls" not in out1


def test_infer_writes_prediction_data(tmp_path, driver):
    app = InferImages(driver, str(tmp_path), min_score=-1.0)
    imgs = np.random.RandomState(0).randint(0, 255, (2, 96, 160, 3), np.uint8)
    rows = app.run([(imgs, ["a.png", "b.png"])])
    path = str(tmp_path / "prediction_data.txt")
    assert os.path.exists(path)
    parsed = read_prediction_data(path)
    assert len(parsed) == len(rows)
    if parsed:
        assert {"image_name", "det_score", "bbox", "class",
                "uncalib_albox", "entropy"} <= set(parsed[0])


def test_auto_label_gate(tmp_path, driver):
    app = InferImages(driver, str(tmp_path), auto_labeling=True,
                      opt_params=[0.5, 0.5], min_score=-1.0)
    app.opt_thrs = np.asarray([1e9])   # everything below threshold
    imgs = np.random.RandomState(1).randint(0, 255, (2, 96, 160, 3), np.uint8)
    app.run([(imgs, ["x.png", "y.png"])])
    assert app.count_auto == 2 and app.count_skip == 0
    labeled = open(tmp_path / "labeled" / "images.txt").read().split()
    assert set(labeled) == {"x.png", "y.png"}
    app2 = InferImages(driver, str(tmp_path), auto_labeling=True,
                       opt_params=[0.5, 0.5], min_score=-1.0)
    app2.opt_thrs = np.asarray([-1e9])  # nothing passes
    app2.run([(imgs, ["x.png", "y.png"])])
    assert app2.count_skip == 2


def test_validator_artifacts(tmp_path, driver, synth_batches):
    v = Validator(driver, str(tmp_path))
    rows = v.run(synth_batches)
    for fname in ["validate_results.txt", "model_performance.txt",
                  "average_score.txt", "validationstep_runtime.txt"]:
        assert os.path.exists(tmp_path / fname), fname
    parsed = read_validate_results(str(tmp_path / "validate_results.txt"))
    assert len(parsed) == len(rows)
    if parsed:
        assert {"image_name", "score", "bbox", "gt_bbox", "class",
                "gt_class", "iou"} <= set(parsed[0])
        assert all(r["iou"] > 0 for r in parsed)
    perf = open(tmp_path / "model_performance.txt").read()
    assert "mIoU" in perf and "RMSE" in perf


def test_write_kitti_labels(tmp_path):
    path = str(tmp_path / "000001.txt")
    write_kitti_labels(path, np.asarray([[1.0, 2.0, 30.0, 40.0]]),
                       np.asarray([1]), np.asarray([0.9]), KITTI)
    line = open(path).read().strip().split()
    assert line[0] == "car"
    assert float(line[4]) == 2.0 and float(line[5]) == 1.0
    assert float(line[-1]) == 0.9


def test_validator_infer_augment(tmp_path, driver, synth_batches):
    v = Validator(driver, str(tmp_path), infer_augment=["heq", "flip"])
    rows = v.run(synth_batches[:1])
    tags = {r["image_name"].split("@")[1] for r in rows
            if "@" in r["image_name"]}
    # augmented variants contributed rows alongside the clean pass
    assert tags <= {"histeq", "vflip", "hflip"}
    assert any("@" not in r["image_name"] for r in rows)


def test_get_ocl_trc_kitti_and_fallback(tmp_path):
    """Occlusion/truncation GT metadata readers (ref dataset_data.py:25-84);
    validate_results rows carry real values when a dataset root is given."""
    import os

    from udal_tpu.data.label_maps import get_ocl_trc

    root = tmp_path / "KITTI"
    lbl = root / "training" / "label_2"
    os.makedirs(lbl)
    (lbl / "000001.txt").write_text(
        "Car 0.10 1 -1 0 0 10 10 0 0 0 0 0 0 0\n"
        "Pedestrian 0.50 2 -1 0 0 10 10 0 0 0 0 0 0 0\n"
        "DontCare -1 -1 -1 0 0 0 0 0 0 0 0 0 0 0\n")
    occl, trcs = get_ocl_trc(str(root), ["000001.png", "missing.png"])
    assert occl[0] == [1.0, 2.0] and trcs[0] == [0.10, 0.50]
    assert occl[1] == [-1.0] * 100          # missing file placeholder
    # unknown dataset → placeholders
    occl, trcs = get_ocl_trc("/elsewhere", ["a.png"])
    assert occl[0][0] == -1.0


def test_get_ocl_trc_bdd(tmp_path):
    import json
    import os

    from udal_tpu.data.label_maps import get_ocl_trc

    root = tmp_path / "BDD100K"
    lbl = root / "bdd100k" / "labels"
    os.makedirs(lbl)
    data = [{"name": "img1.jpg", "labels": [
        {"category": "car", "attributes": {"occluded": True,
                                           "truncated": False}},
        {"category": "drivable area", "attributes": {"occluded": False,
                                                     "truncated": False}},
    ]}]
    (lbl / "bdd100k_labels_images_val.json").write_text(json.dumps(data))
    occl, trcs = get_ocl_trc(str(root), ["img1.jpg"])
    assert occl[0] == [1.0] and trcs[0] == [0.0]
