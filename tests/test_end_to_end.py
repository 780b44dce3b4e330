"""Flagship integration test: the full uncertainty pipeline on synthetic data.

Mirrors BASELINE config #4 end-to-end: train briefly with loss attenuation →
serve with uncertainty → fit calibrators → validate → optimize thresholds →
auto-label a pool → feed AL selection. Every stage consumes the previous
stage's real artifacts (checkpoints, pickled calibrators,
validate_results.txt, optimal_* files, prediction_data.txt).
"""

import os

import jax
import numpy as np
import pytest

from udal_tpu.apps.calibrate_model import Calibrate
from udal_tpu.apps.infer import InferImages, read_prediction_data
from udal_tpu.apps.serving import ServingDriver
from udal_tpu.apps.thresholding import read_optimal_thresholds
from udal_tpu.apps.uncertainty_analysis import MainUncertAnalysis
from udal_tpu.apps.validate import Validator
from udal_tpu.apps.active_learning import select_images
from udal_tpu.config import get_detection_config
from udal_tpu.data.dataloader import InputReader
from udal_tpu.data.synthetic import write_synthetic_dataset
from udal_tpu.train.loop import train_and_evaluate
from udal_tpu.utils.checkpoint import restore_checkpoint, swap_in_ema
from udal_tpu.train.train_lib import create_train_state


pytestmark = pytest.mark.slow  # heavy model tier: compile-bound, run nightly


@pytest.mark.slow
def test_full_uncertainty_pipeline(tmp_path):
    cfg = get_detection_config("efficientdet-d0")
    cfg.override({
        "image_size": 64, "num_classes": 8, "loss_attenuation": True,
        "enable_softmax": True, "num_epochs": 1, "mixed_precision": False,
        "nms_configs": {"score_thresh": 1e-6},
    })
    cfg.override({"batch_size": 4}, allow_new_keys=True)

    data = str(tmp_path / "train.tfrecord")
    write_synthetic_dataset(data, num_images=12, height=64, width=96,
                            num_classes=7, seed=0)

    # 1. train one epoch, checkpoint
    model_dir = str(tmp_path / "model")
    reader = InputReader(data, is_training=True)
    hist = train_and_evaluate(cfg, reader(cfg, 4), steps_per_epoch=2,
                              model_dir=model_dir, log_fn=lambda s: None)
    assert np.isfinite(hist["loss"][-1])
    assert os.path.exists(os.path.join(model_dir, "logs", "metrics.jsonl"))

    # 2. restore into a serving driver
    model, state, _, _ = create_train_state(cfg, jax.random.PRNGKey(0), 2)
    state, epoch = restore_checkpoint(model_dir, state)
    assert epoch == 1
    driver = ServingDriver(cfg, swap_in_ema(state), batch_size=4)

    # 3. fit calibrators from GT-assigned detections
    calib_dir = str(tmp_path / "calibration")
    val_reader = InputReader(data, is_training=False, names=True)
    Calibrate(driver, calib_dir, val_split=0.8).run(val_reader(cfg, 4))

    # 4. validate with calibrators applied
    val_dir = str(tmp_path / "validate")
    rows = Validator(driver, val_dir, calib_dir=calib_dir).run(
        val_reader(cfg, 4))
    assert os.path.exists(os.path.join(val_dir, "validate_results.txt"))

    if len(rows) >= 10:
        # 5. optimize uncertainty thresholds from validate_results
        thr_dir = str(tmp_path / "thresholds")
        out = MainUncertAnalysis(
            os.path.join(val_dir, "validate_results.txt"), thr_dir
        ).run(max_evals=40)
        opt_params = out["opt_params"]
        thrs = read_optimal_thresholds(thr_dir)
        assert thrs.shape == (6,)

        # 6. auto-label the pool using the optimized gate
        infer_dir = str(tmp_path / "infer")
        app = InferImages(driver, infer_dir, calib_dir=calib_dir,
                          auto_labeling=True, opt_params=opt_params,
                          opt_thrs_path=thr_dir, min_score=0.0)
        batches = ((imgs, labels["image_names"], labels["image_scales"])
                   for imgs, labels in val_reader(cfg, 4))
        pred_rows = app.run(batches)
        assert app.count_auto + app.count_skip == 12
        assert os.path.exists(os.path.join(infer_dir, "prediction_data.txt"))

        # 7. AL acquisition from the prediction artifacts
        parsed = read_prediction_data(
            os.path.join(infer_dir, "prediction_data.txt"))
        if parsed:
            picked = select_images(parsed, "entropy", 3)
            assert 0 < len(picked) <= 3
