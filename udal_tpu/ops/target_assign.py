"""Anchor→groundtruth target assignment in pure JAX (fixed shapes, jittable).

Behavioral parity with the reference OD-API stack
(`/root/reference/src/object_detection_efficientdet/argmax_matcher.py:101-185`,
`target_assigner.py:80-240`, `src/anchors.py:269-307`) redesigned for TPU:

* fixed-size padded GT (``[max_instances, 4]`` + validity mask) instead of
  dynamic shapes, so the whole assignment jits and vmaps over the batch;
* tie-breaking matches TF ``argmax`` (first maximum wins) including the
  ``force_match_for_each_row`` one-hot scatter trick;
* runs on device inside the input pipeline's ``jit`` or on host CPU — no
  tf.data per-sample python.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from udal_tpu.ops import anchors as anchor_lib
from udal_tpu.ops.boxes import pairwise_iou


def argmax_match(similarity: jnp.ndarray, row_valid: jnp.ndarray,
                 matched_threshold: float = 0.5,
                 unmatched_threshold: float = 0.5,
                 negatives_lower_than_unmatched: bool = True,
                 force_match_for_each_row: bool = True) -> jnp.ndarray:
    """Match each column (anchor) to a row (GT) of the similarity matrix.

    Returns int32 [N] match results: >=0 row index, -1 unmatched (negative),
    -2 ignored (between thresholds). Parity: `argmax_matcher.py:101-185`.
    """
    num_gt, num_anchors = similarity.shape
    neg_inf = jnp.asarray(-1.0, similarity.dtype)
    sim = jnp.where(row_valid[:, None], similarity, neg_inf)

    matches = jnp.argmax(sim, axis=0).astype(jnp.int32)
    matched_vals = jnp.max(sim, axis=0)
    below = unmatched_threshold > matched_vals
    between = (matched_vals >= unmatched_threshold) & (matched_threshold > matched_vals)
    if negatives_lower_than_unmatched:
        matches = jnp.where(below, -1, matches)
        matches = jnp.where(between, -2, matches)
    else:
        matches = jnp.where(below, -2, matches)
        matches = jnp.where(between, -1, matches)

    if force_match_for_each_row:
        # Per GT row: its best anchor. One-hot + argmax reproduces the TF tie
        # rule (lowest row index wins when two rows pick the same anchor).
        force_cols = jnp.argmax(sim, axis=1)                       # [M]
        ind = jax.nn.one_hot(force_cols, num_anchors, dtype=jnp.float32)
        ind = ind * row_valid[:, None].astype(jnp.float32)
        force_rows = jnp.argmax(ind, axis=0).astype(jnp.int32)     # [N]
        force_mask = jnp.max(ind, axis=0) > 0
        matches = jnp.where(force_mask, force_rows, matches)
    return matches


def _gather_based_on_match(match_results: jnp.ndarray, values: jnp.ndarray,
                           unmatched_value, ignored_value) -> jnp.ndarray:
    """Gather per-anchor values by match with sentinel fills.

    Parity: `matcher.py:168-194` (prepend [ignored, unmatched] rows then
    gather at match+2).
    """
    ignored = jnp.broadcast_to(jnp.asarray(ignored_value, values.dtype),
                               values.shape[1:])[None]
    unmatched = jnp.broadcast_to(jnp.asarray(unmatched_value, values.dtype),
                                 values.shape[1:])[None]
    table = jnp.concatenate([ignored, unmatched, values], axis=0)
    return jnp.take(table, jnp.maximum(match_results + 2, 0), axis=0)


def label_anchors(anchor_boxes: jnp.ndarray, gt_boxes: jnp.ndarray,
                  gt_classes: jnp.ndarray, gt_valid: jnp.ndarray,
                  match_threshold: float = 0.5
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Assign class/box targets to every anchor (flat layout).

    Args:
      anchor_boxes: [N, 4] anchors.
      gt_boxes: [M, 4] padded GT (y1, x1, y2, x2), absolute pixels.
      gt_classes: [M] int labels (reference convention: real classes >= 1).
      gt_valid: [M] bool validity of each padded row.
      match_threshold: IoU threshold (matched == unmatched, reference default).

    Returns:
      cls_targets: [N] int32; real class - 1, background -1, ignored -2.
      box_targets: [N, 4] float32 FasterRCNN-encoded regression targets
        (zeros for unmatched anchors).
      num_positives: scalar float — anchors with match != -1.

    Parity: `anchors.py:269-307` + `target_assigner.py:80-240`.
    """
    sim = pairwise_iou(gt_boxes.astype(jnp.float32), anchor_boxes)
    matches = argmax_match(sim, gt_valid, match_threshold, match_threshold)

    cls = _gather_based_on_match(matches, gt_classes.astype(jnp.float32), 0.0, 0.0)
    cls_targets = cls.astype(jnp.int32) - 1

    matched_gt = _gather_based_on_match(matches, gt_boxes.astype(jnp.float32),
                                        0.0, 0.0)
    encoded = anchor_lib.encode_box_targets(matched_gt, anchor_boxes)
    box_targets = jnp.where((matches >= 0)[:, None], encoded,
                            jnp.zeros_like(encoded))

    num_positives = jnp.sum((matches != -1).astype(jnp.float32))
    return cls_targets, box_targets, num_positives


def unpack_labels(flat: jnp.ndarray, anchors: anchor_lib.Anchors) -> Dict[int, jnp.ndarray]:
    """Reshape flat per-anchor labels to per-level [H, W, A*k] maps."""
    out = {}
    a = anchors.get_anchors_per_location()
    trailing = flat.shape[1:] if flat.ndim > 1 else ()
    k = 1
    for d in trailing:
        k *= d
    for level, (start, end) in anchors.level_slices().items():
        fs = anchors.feat_sizes[level]
        out[level] = flat[start:end].reshape(fs["height"], fs["width"], a * k)
    return out


def label_anchors_multilevel(anchors: anchor_lib.Anchors, gt_boxes, gt_classes,
                             gt_valid, match_threshold: float = 0.5):
    """label_anchors + per-level unpacking, mirroring the reference output
    contract (dicts keyed by level)."""
    cls_t, box_t, num_pos = label_anchors(anchors.boxes, gt_boxes, gt_classes,
                                          gt_valid, match_threshold)
    return (unpack_labels(cls_t, anchors), unpack_labels(box_t, anchors), num_pos)
