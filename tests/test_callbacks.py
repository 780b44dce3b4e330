"""Per-epoch COCO callback + TB image suite tests (VERDICT r1 item 6)."""

import glob
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_coco_callback_writes_panels_during_training(tmp_path):
    from udal_tpu.config import get_detection_config
    from udal_tpu.data.dataloader import InputReader
    from udal_tpu.data.synthetic import write_synthetic_dataset
    from udal_tpu.train.loop import train_and_evaluate

    path = str(tmp_path / "train.tfrecord")
    write_synthetic_dataset(path, num_images=8, height=96, width=160,
                            num_classes=7, seed=0)

    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = 128
    cfg.num_classes = 8
    cfg.fpn_cell_repeats = 1
    cfg.box_class_repeats = 1
    cfg.num_epochs = 1
    cfg.map_freq = 1
    cfg.save_freq = 1
    cfg.label_map = "kitti"
    cfg.batch_size = 4

    reader = InputReader(path, is_training=True, seed=0)
    val_reader = InputReader(path, is_training=False)
    model_dir = str(tmp_path / "model")
    os.makedirs(model_dir)
    hist = train_and_evaluate(
        cfg, reader(cfg, 4), steps_per_epoch=2, model_dir=model_dir,
        val_iter_fn=lambda: val_reader(cfg, 4), val_steps=1)

    assert "AP" in hist and len(hist["AP"]) == 1
    panels = glob.glob(os.path.join(model_dir, "logs", "panels", "*.png"))
    names = {os.path.basename(p).split("_epoch")[0] for p in panels}
    assert {"ap_vs_iou", "confusion_matrix", "nms_grid"} <= names, names


def test_panel_plot_helpers():
    from udal_tpu.train.callbacks import (_plot_ap_vs_iou, _plot_confusion,
                                          _plot_roc)

    res = {f"AP@{t:.2f}": max(0.0, 1 - t) for t in np.arange(0.05, 1.0, 0.05)}
    img = _plot_ap_vs_iou(res)
    assert img is not None and img.ndim == 3 and img.shape[-1] == 3
    cm = np.random.RandomState(0).randint(0, 10, (4, 4))
    img = _plot_confusion(cm, ["bg", "a", "b", "c"])
    assert img.ndim == 3
    rng = np.random.RandomState(1)
    scores = rng.rand(200)
    hits = (scores + rng.randn(200) * 0.2 > 0.5).astype(float)
    img = _plot_roc(scores, hits)
    assert img is not None and img.ndim == 3
