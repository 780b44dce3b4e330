import numpy as np
import pytest

from udal_tpu.config import get_detection_config
from udal_tpu.data.composition import ssl_batch_split, zip_readers
from udal_tpu.data.dataloader import InputReader
from udal_tpu.data.synthetic import write_synthetic_dataset


def test_ssl_batch_split():
    assert ssl_batch_split(None, 8, 0.5) == 4
    assert ssl_batch_split(None, 8, 0.01) == 1
    assert ssl_batch_split(None, 8, 0.99) == 7


def test_zip_readers_concat(tmp_path):
    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = 64
    cfg.num_classes = 8
    labeled = str(tmp_path / "lab.tfrecord")
    pseudo = str(tmp_path / "pse.tfrecord")
    write_synthetic_dataset(labeled, num_images=6, height=64, width=64,
                            seed=0)
    write_synthetic_dataset(pseudo, num_images=6, height=64, width=64,
                            seed=1, pseudo_scores=True)
    ra = InputReader(labeled, is_training=True, seed=0)
    rb = InputReader(pseudo, is_training=True, seed=1)
    it = zip_readers(ra, rb, cfg, batch_a=2, batch_b=2)
    images, labels = next(it)
    assert images.shape == (4, 64, 64, 3)
    assert labels["cls_targets_3"].shape[0] == 4
    # pseudo half carries the extra score column, padded on the labeled half
    assert labels["groundtruth_data"].shape == (4, 100, 8)
    assert np.all(labels["groundtruth_data"][:2, :, 7] == -1)


def test_consistency_check():
    from udal_tpu.apps.infer import consistency_check, split_serve_outputs
    from udal_tpu.apps.serving import ServingDriver

    driver = ServingDriver.create(
        "efficientdet-d0",
        overrides={"image_size": 64, "num_classes": 8,
                   "nms_configs": {"score_thresh": 1e-6}}, batch_size=1)
    rng = np.random.RandomState(0)
    images = rng.randint(0, 255, (1, 64, 64, 3), np.uint8)
    out = split_serve_outputs(driver.config, driver.serve(images))
    miou, agree = consistency_check(driver, images.astype(np.float32),
                                    out["boxes"], out["classes"],
                                    modes=("flip",))
    assert miou.shape == out["classes"].shape
    assert agree.dtype == bool
