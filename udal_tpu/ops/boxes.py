"""Box geometry primitives: IoU family, pairwise IoU, box utilities (JAX).

Parity targets: `/root/reference/src/iou_utils.py:63-199` (iou/giou/diou/ciou
losses) and `src/object_detection_efficientdet/region_similarity_calculator.py`
(pairwise IoU matrix used by anchor labeling). All functions are pure,
jittable, and broadcast over arbitrary leading axes.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def _safe_div(a, b):
    """a/b with 0 where b == 0 (TF divide_no_nan semantics)."""
    return jnp.where(b != 0, a / jnp.where(b != 0, b, 1), jnp.zeros_like(a))


def iou_per_anchor(pred_boxes: jnp.ndarray, target_boxes: jnp.ndarray,
                   iou_type: str = "iou") -> jnp.ndarray:
    """Elementwise IoU between aligned boxes [..., 4] (y1, x1, y2, x2)."""
    t_ymin, t_xmin, t_ymax, t_xmax = jnp.moveaxis(target_boxes, -1, 0)
    p_ymin, p_xmin, p_ymax, p_xmax = jnp.moveaxis(pred_boxes, -1, 0)

    p_width = jnp.maximum(0.0, p_xmax - p_xmin)
    p_height = jnp.maximum(0.0, p_ymax - p_ymin)
    t_width = jnp.maximum(0.0, t_xmax - t_xmin)
    t_height = jnp.maximum(0.0, t_ymax - t_ymin)
    p_area = p_width * p_height
    t_area = t_width * t_height

    i_ymin = jnp.maximum(p_ymin, t_ymin)
    i_xmin = jnp.maximum(p_xmin, t_xmin)
    i_ymax = jnp.minimum(p_ymax, t_ymax)
    i_xmax = jnp.minimum(p_xmax, t_xmax)
    i_area = jnp.maximum(0.0, i_xmax - i_xmin) * jnp.maximum(0.0, i_ymax - i_ymin)

    union = p_area + t_area - i_area
    iou_v = _safe_div(i_area, union)
    if iou_type == "iou":
        return iou_v

    e_ymin = jnp.minimum(p_ymin, t_ymin)
    e_xmin = jnp.minimum(p_xmin, t_xmin)
    e_ymax = jnp.maximum(p_ymax, t_ymax)
    e_xmax = jnp.maximum(p_xmax, t_xmax)

    if iou_type == "giou":
        e_area = jnp.maximum(0.0, e_xmax - e_xmin) * jnp.maximum(0.0, e_ymax - e_ymin)
        return iou_v - _safe_div(e_area - union, e_area)

    center_dist_sq = (((t_ymin + t_ymax) - (p_ymin + p_ymax)) ** 2 +
                      ((t_xmin + t_xmax) - (p_xmin + p_xmax)) ** 2) / 4.0
    diag_sq = (e_ymax - e_ymin) ** 2 + (e_xmax - e_xmin) ** 2
    diou_v = iou_v - _safe_div(center_dist_sq, diag_sq)
    if iou_type == "diou":
        return diou_v

    if iou_type == "ciou":
        arctan = (jnp.arctan(_safe_div(t_width, t_height)) -
                  jnp.arctan(_safe_div(p_width, p_height)))
        v = 4.0 * (arctan / math.pi) ** 2
        alpha = _safe_div(v, (1.0 - iou_v) + v)
        return diou_v - alpha * v

    raise ValueError(f"Unknown iou_type {iou_type!r}")


def iou_loss(pred_boxes: jnp.ndarray, target_boxes: jnp.ndarray,
             iou_type: str = "iou") -> jnp.ndarray:
    """Sum over anchors of masked (1 - IoU) — parity `iou_utils.py:134-199`.

    Inputs are [..., 4k] tensors holding k boxes per row; rows whose target
    is all-zero are masked out.
    """
    if iou_type not in ("iou", "ciou", "diou", "giou"):
        raise ValueError(f"Unknown loss_type {iou_type!r}")
    shape = pred_boxes.shape
    pred = pred_boxes.reshape(shape[:-1] + (-1, 4))
    tgt = target_boxes.reshape(shape[:-1] + (-1, 4))
    mask = jnp.any(tgt != 0.0, axis=-1).astype(pred.dtype)
    per = iou_per_anchor(pred, tgt, iou_type)
    return jnp.sum(mask * (1.0 - per), axis=tuple(range(pred.ndim - 2 - (len(shape) - 2), per.ndim)))


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix [N, M] between two corner-encoded box sets.

    Parity: `region_similarity_calculator.py` IouSimilarity (used by the
    anchor labeler). Rows with zero union get IoU 0.
    """
    area1 = jnp.maximum(0.0, boxes1[:, 2] - boxes1[:, 0]) * \
        jnp.maximum(0.0, boxes1[:, 3] - boxes1[:, 1])
    area2 = jnp.maximum(0.0, boxes2[:, 2] - boxes2[:, 0]) * \
        jnp.maximum(0.0, boxes2[:, 3] - boxes2[:, 1])
    yx1 = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    yx2 = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    inter = jnp.prod(jnp.maximum(0.0, yx2 - yx1), axis=-1)
    union = area1[:, None] + area2[None, :] - inter
    return _safe_div(inter, union)


def clip_boxes(boxes: jnp.ndarray, image_size) -> jnp.ndarray:
    """Clip y1x1y2x2 boxes to [0, H) x [0, W)."""
    h, w = image_size
    lo = jnp.zeros((4,), boxes.dtype)
    hi = jnp.asarray([h, w, h, w], boxes.dtype)
    return jnp.clip(boxes, lo, hi)
