import numpy as np
import pytest

from udal_tpu.ops import nms as nms_lib


def _random_boxes(rng, n, size=256):
    y1 = rng.uniform(0, size - 30, n)
    x1 = rng.uniform(0, size - 30, n)
    h = rng.uniform(10, 80, n)
    w = rng.uniform(10, 80, n)
    boxes = np.stack([y1, x1, y1 + h, x1 + w], 1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    return boxes, scores


def test_hard_nms_basic():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    res = nms_lib.soft_nms(boxes, scores, max_output_size=3, sigma=0.0,
                           iou_threshold=0.5, score_threshold=float("-inf"))
    assert int(res.valid_len) == 2
    kept = np.asarray(res.indices)[np.asarray(res.valid)]
    assert set(kept.tolist()) == {0, 2}


def test_soft_nms_decays_but_keeps():
    # IoU ~0.43 — below the 0.5 hard cutoff, so gaussian decay applies
    boxes = np.array([[0, 0, 10, 10], [4, 0, 14, 10]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    res = nms_lib.soft_nms(boxes, scores, max_output_size=2, sigma=0.5,
                           iou_threshold=0.5, score_threshold=0.001)
    # overlapping box decayed but above threshold -> both kept
    assert int(res.valid_len) == 2
    assert float(np.asarray(res.scores)[1]) < 0.8


@pytest.mark.parametrize("method,sigma", [("hard", 0.0), ("gaussian", 0.5)])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_parity_with_tf_nonmaxsuppressionv5(method, sigma, seed):
    tf = pytest.importorskip("tensorflow")
    rng = np.random.RandomState(seed)
    boxes, scores = _random_boxes(rng, 80)

    iou_thr = 0.5
    score_thr = 0.001 if method == "gaussian" else float("-inf")
    idx, tf_scores, valid = tf.raw_ops.NonMaxSuppressionV5(
        boxes=tf.constant(boxes), scores=tf.constant(scores),
        max_output_size=20, iou_threshold=iou_thr,
        score_threshold=score_thr,
        soft_nms_sigma=sigma / 2,  # TF's sigma is 2x the paper's
        pad_to_max_output_size=True)

    res = nms_lib.soft_nms(boxes, scores, max_output_size=20,
                           iou_threshold=iou_thr, score_threshold=score_thr,
                           sigma=sigma)
    n_tf = int(valid.numpy())
    assert int(res.valid_len) == n_tf
    np.testing.assert_array_equal(np.asarray(res.indices)[:n_tf],
                                  idx.numpy()[:n_tf])
    np.testing.assert_allclose(np.asarray(res.scores)[:n_tf],
                               tf_scores.numpy()[:n_tf], rtol=1e-4, atol=1e-5)


def test_batched_nms_shapes():
    rng = np.random.RandomState(0)
    boxes = np.stack([_random_boxes(rng, 50)[0] for _ in range(4)])
    scores = rng.uniform(0, 1, (4, 50)).astype(np.float32)
    res = nms_lib.batched_soft_nms(boxes, scores, 10)
    assert res.indices.shape == (4, 10)
    assert res.valid_len.shape == (4,)


def test_per_class_nms_keeps_cross_class_overlaps():
    import jax.numpy as jnp

    from udal_tpu.config import get_detection_config
    from udal_tpu.ops.postprocess import per_class_nms, postprocess_global

    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = 64
    cfg.num_classes = 8
    cfg.nms_configs["method"] = "hard"
    cfg.nms_configs["score_thresh"] = 1e-4

    # craft per-level outputs where two overlapping anchors carry two
    # different confident classes
    levels = [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]
    cls_outputs = [jnp.full((1, h, w, 72), -9.0) for h, w in levels]
    box_outputs = [jnp.zeros((1, h, w, 36)) for h, w in levels]
    c0 = np.array(cls_outputs[0])
    c0[0, 4, 4, 0 * 8 + 1] = 4.0   # anchor 0, class idx 1
    c0[0, 4, 4, 1 * 8 + 2] = 3.5   # anchor 1 (overlapping), class idx 2
    cls_outputs[0] = jnp.asarray(c0)

    g = postprocess_global(cfg, cls_outputs, box_outputs)
    p = per_class_nms(cfg, cls_outputs, box_outputs)
    # global NMS suppresses the overlap; per-class keeps both classes
    assert int(p.valid_len[0]) >= int(g.valid_len[0])
    kept_classes = set(np.asarray(p.classes[0])[:int(p.valid_len[0])].tolist())
    assert {2.0, 3.0} <= kept_classes
