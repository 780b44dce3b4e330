import numpy as np
import pytest

from udal_tpu.config import get_detection_config
from udal_tpu.ops import anchors as anchor_lib
from udal_tpu.ops import target_assign
from udal_tpu.ops.boxes import pairwise_iou


def _random_gt(rng, m, image_size=256):
    y1 = rng.uniform(0, image_size - 40, m)
    x1 = rng.uniform(0, image_size - 40, m)
    h = rng.uniform(8, 120, m)
    w = rng.uniform(8, 120, m)
    boxes = np.stack([y1, x1, np.minimum(y1 + h, image_size),
                      np.minimum(x1 + w, image_size)], axis=1).astype(np.float32)
    classes = rng.randint(1, 8, m).astype(np.int32)
    return boxes, classes


def _small_anchors(image_size=256):
    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = image_size
    return anchor_lib.from_config(cfg)


def test_every_gt_gets_an_anchor():
    rng = np.random.RandomState(0)
    a = _small_anchors()
    gt, cls = _random_gt(rng, 5)
    valid = np.ones(5, bool)
    cls_t, box_t, num_pos = target_assign.label_anchors(a.boxes, gt, cls, valid)
    cls_t = np.asarray(cls_t)
    assert num_pos >= 5  # force-match guarantees every GT matched
    matched_classes = set(cls_t[cls_t >= 0].tolist())
    assert matched_classes == set((cls - 1).tolist())


def test_padded_rows_are_ignored():
    rng = np.random.RandomState(1)
    a = _small_anchors()
    gt, cls = _random_gt(rng, 3)
    gt_pad = np.concatenate([gt, np.zeros((7, 4), np.float32)])
    cls_pad = np.concatenate([cls, np.zeros(7, np.int32)])
    valid = np.array([True] * 3 + [False] * 7)
    cls_a, box_a, np_a = target_assign.label_anchors(a.boxes, gt_pad, cls_pad, valid)
    cls_b, box_b, np_b = target_assign.label_anchors(a.boxes, gt, cls, np.ones(3, bool))
    np.testing.assert_array_equal(np.asarray(cls_a), np.asarray(cls_b))
    np.testing.assert_allclose(np.asarray(box_a), np.asarray(box_b))
    assert float(np_a) == float(np_b)


def test_no_valid_gt():
    a = _small_anchors()
    gt = np.zeros((4, 4), np.float32)
    cls = np.zeros(4, np.int32)
    valid = np.zeros(4, bool)
    cls_t, box_t, num_pos = target_assign.label_anchors(a.boxes, gt, cls, valid)
    assert float(num_pos) == 0.0
    assert np.all(np.asarray(cls_t) == -1)
    assert np.all(np.asarray(box_t) == 0.0)


def test_unmatched_anchor_is_background():
    rng = np.random.RandomState(2)
    a = _small_anchors()
    gt, cls = _random_gt(rng, 2)
    valid = np.ones(2, bool)
    cls_t, _, _ = target_assign.label_anchors(a.boxes, gt, cls, valid)
    iou = np.asarray(pairwise_iou(gt, a.boxes))
    # anchors with max IoU < 0.5 and not force-matched must be background (-1)
    best_anchor_per_gt = iou.argmax(axis=1)
    low = (iou.max(axis=0) < 0.5)
    low[best_anchor_per_gt] = False
    assert np.all(np.asarray(cls_t)[low] == -1)


@pytest.mark.parametrize("seed,m", [(0, 1), (1, 4), (2, 12)])
def test_parity_with_reference_labeler(seed, m):
    from tests.reference_util import import_reference
    ref_anchors = import_reference("anchors")
    import tensorflow as tf

    rng = np.random.RandomState(seed)
    image_size = 256
    gt, cls = _random_gt(rng, m, image_size)

    ref_a = ref_anchors.Anchors(3, 7, 3, [1.0, 2.0, 0.5], 4.0, image_size)
    labeler = ref_anchors.AnchorLabeler(ref_a, num_classes=8)
    ref_cls, ref_box, ref_np = labeler.label_anchors(
        tf.constant(gt), tf.constant(cls[:, None].astype(np.float32)))

    ours_a = _small_anchors(image_size)
    cls_d, box_d, num_pos = target_assign.label_anchors_multilevel(
        ours_a, gt, cls, np.ones(m, bool))

    assert float(num_pos) == pytest.approx(float(ref_np.numpy()))
    for level in range(3, 8):
        np.testing.assert_array_equal(
            np.asarray(cls_d[level]).reshape(-1),
            ref_cls[level].numpy().reshape(-1),
            err_msg=f"cls targets differ at level {level}")
        np.testing.assert_allclose(
            np.asarray(box_d[level]).reshape(-1),
            ref_box[level].numpy().reshape(-1),
            atol=1e-4, err_msg=f"box targets differ at level {level}")
