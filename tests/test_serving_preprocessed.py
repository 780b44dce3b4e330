"""Double-normalization / frame-consistency regression tests.

Round-3 finding: every app that fed eval `InputReader` batches (already
normalized+resized, `dataloader.py` classic path) into `ServingDriver.serve`
normalized a SECOND time, and detection boxes stayed in the network-input
frame while GT was scaled to the original-image frame. These tests pin the
fixed contract:

* `serve_preprocessed` / `serve_detections_preprocessed` on a reader batch
  must equal `serve` / `serve_detections` on the raw pixels;
* passing the reader's `image_scales` puts boxes in the original frame.

Reference analog: the reference never feeds its dataloader output to its
serving driver (`infer_lib.py` reads raw files; eval runs the train net
model-direct, `eval.py:50-166`), so this hazard is unique to the rebuild's
batch-fed app design.
"""

import numpy as np
import pytest

from udal_tpu.apps.serving import ServingDriver
from udal_tpu.config import get_detection_config
from udal_tpu.data.dataloader import InputReader, denormalize_image
from udal_tpu.data.synthetic import write_synthetic_dataset
from udal_tpu.models.efficientdet import preprocess_images

pytestmark = pytest.mark.slow  # compile-bound (d0 serving programs)


def _driver(**overrides):
    ov = {"image_size": 128, "num_classes": 8, "mc_dropout": False}
    ov.update(overrides)
    return ServingDriver.create("efficientdet-d0", overrides=ov, batch_size=2)


def test_preprocessed_equals_raw_at_identity_size(tmp_path):
    """Reader batch (classic path, images already at output size) served via
    the preprocessed entry must match serving the raw pixels — catches the
    double-normalization bug byte-for-byte."""
    d = _driver()
    path = str(tmp_path / "val.tfrecord")
    # identity op point: records exactly at image_size → reader resize and
    # pad are no-ops, scales are 1 → serve(raw) sees identical pixels
    write_synthetic_dataset(path, num_images=2, height=128, width=128,
                            num_classes=7, seed=0)
    reader = InputReader(path, is_training=False, prefetch=0)
    images, labels = next(iter(reader(d.config, 2)))
    assert np.allclose(np.asarray(labels["image_scales"]), 1.0)

    # reconstruct the raw pixels the reader decoded (exact at identity size:
    # normalize is affine and round-trips uint8 exactly in f32)
    raw = denormalize_image(images, d.config.mean_rgb, d.config.stddev_rgb)

    det_raw = d.serve_detections(raw)
    det_pre = d.serve_detections_preprocessed(images,
                                              labels["image_scales"])
    assert np.array_equal(np.asarray(det_raw.valid_len),
                          np.asarray(det_pre.valid_len))
    np.testing.assert_allclose(np.asarray(det_raw.scores),
                               np.asarray(det_pre.scores), atol=1e-5)
    np.testing.assert_allclose(np.asarray(det_raw.boxes),
                               np.asarray(det_pre.boxes), atol=1e-2)
    assert np.array_equal(np.asarray(det_raw.classes),
                          np.asarray(det_pre.classes))


def test_preprocessed_scales_roundtrip_non_identity():
    """At a non-identity size, feeding the driver's OWN preprocessing output
    (+ its scales) through the preprocessed entry must reproduce serve(raw)
    exactly — pins the image_scales plumbing end to end."""
    d = _driver()
    rng = np.random.RandomState(1)
    raw = rng.randint(0, 255, (2, 96, 160, 3), np.uint8)
    images, scales = preprocess_images(raw, d.config.image_size,
                                       d.config.mean_rgb, d.config.stddev_rgb)

    out_raw = d.serve(raw)
    out_pre = d.serve_preprocessed(np.asarray(images), np.asarray(scales))
    for a, b in zip(out_raw, out_pre):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # boxes come back in the ORIGINAL image frame (not the 128 input frame)
    boxes, scores, _, valid = out_pre[:4]
    n = int(np.asarray(valid)[0])
    if n:
        assert float(np.max(np.asarray(boxes)[0, :n, 3])) <= 160.0 + 1e-3


def test_packed_and_structured_preprocessed_agree():
    d = _driver(loss_attenuation=True)
    rng = np.random.RandomState(2)
    images = rng.randn(2, 128, 128, 3).astype(np.float32)
    packed = d.serve_preprocessed(images)
    det = d.serve_detections_preprocessed(images)
    np.testing.assert_allclose(np.asarray(packed[1]),
                               np.asarray(det.scores), atol=1e-6)
    np.testing.assert_allclose(np.asarray(packed[0])[..., :4],
                               np.asarray(det.boxes), atol=1e-6)


def test_serve_uint8_matches_preprocessed(tmp_path):
    """Fast-input serving entry: resized uint8 + valid_hw + scales through
    `serve_preprocessed_uint8` must equal normalizing/masking on host and
    calling `serve_preprocessed` (the on-device normalization is fused into
    the serving program, mirroring train_lib.prepare_batch)."""
    d = _driver()
    rng = np.random.RandomState(3)
    u8 = rng.randint(0, 255, (2, 128, 128, 3), np.uint8)
    valid_hw = np.asarray([[128, 128], [96, 112]], np.int32)
    scales = np.asarray([1.0, 1.6], np.float32)

    # host-side twin of the fused normalization
    x = (u8.astype(np.float32) - np.asarray(d.config.mean_rgb)) \
        / np.asarray(d.config.stddev_rgb)
    for i in range(2):
        x[i, valid_hw[i, 0]:] = 0.0
        x[i, :, valid_hw[i, 1]:] = 0.0

    # same MC key for both calls
    key0 = d._mc_key
    out_u8 = [np.asarray(t) for t in
              d.serve_preprocessed_uint8(u8, valid_hw, scales)]
    d._mc_key = key0
    out_f32 = [np.asarray(t) for t in d.serve_preprocessed(x, scales)]
    for a, b in zip(out_u8, out_f32):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
