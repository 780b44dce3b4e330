"""Training-label construction: anchors → per-level target dicts.

Produces the same label dictionary contract as the reference input pipeline
(`/root/reference/src/dataloader.py:424-485` process_example): per-level
``cls_targets_<l>`` / ``box_targets_<l>`` maps, ``mean_num_positives``, and
the padded ``groundtruth_data`` tensor
[y1, x1, y2, x2, is_crowd, area, class(, pseudo_score)].

TPU-first: the per-sample anchor labeling is a jitted, vmapped JAX function
(`udal_tpu.ops.target_assign`) instead of a per-example tf.data map — it can
run batched on host CPU cores or on-device.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from udal_tpu.ops import anchors as anchor_lib
from udal_tpu.ops import target_assign


@functools.partial(jax.jit, static_argnums=(0,))
def _label_batch(config_key, anchor_boxes, gt_boxes, gt_classes, gt_valid):
    fn = functools.partial(target_assign.label_anchors, anchor_boxes)
    return jax.vmap(fn)(gt_boxes, gt_classes, gt_valid)


def build_labels(config, gt_boxes: np.ndarray, gt_classes: np.ndarray,
                 pseudo_scores: Optional[np.ndarray] = None
                 ) -> Dict[str, jnp.ndarray]:
    """Build the training label dict for a padded batch of groundtruth.

    Args:
      config: detection Config.
      gt_boxes: [B, M, 4] float (y1, x1, y2, x2) absolute pixels; padded rows
        are all-zero.
      gt_classes: [B, M] int; padded rows <= 0 (reference uses -1 padding;
        real classes start at 1).
      pseudo_scores: optional [B, M] per-detection scores (STAC column).

    Returns:
      labels dict: cls_targets_<l> [B,H,W,A] int32, box_targets_<l>
      [B,H,W,4A] f32, mean_num_positives [B] (replicated batch mean, parity
      with the reference's batched mean), groundtruth_data [B,M,7(+1)].
    """
    anchors = anchor_lib.from_config(config)
    gt_boxes = jnp.asarray(gt_boxes, jnp.float32)
    gt_classes = jnp.asarray(gt_classes, jnp.int32)
    gt_valid = gt_classes > 0

    cache_key = (config.min_level, config.max_level, config.num_scales,
                 str(config.image_size))
    cls_flat, box_flat, num_pos = _label_batch(cache_key, anchors.boxes,
                                               gt_boxes, gt_classes, gt_valid)

    labels: Dict[str, jnp.ndarray] = {}
    a = anchors.get_anchors_per_location()
    for level, (s, e) in anchors.level_slices().items():
        fs = anchors.feat_sizes[level]
        h, w = fs["height"], fs["width"]
        labels[f"cls_targets_{level}"] = cls_flat[:, s:e].reshape(-1, h, w, a)
        labels[f"box_targets_{level}"] = box_flat[:, s:e].reshape(-1, h, w, a * 4)

    batch = gt_boxes.shape[0]
    mean_pos = jnp.full((batch,), jnp.mean(num_pos), jnp.float32)
    labels["mean_num_positives"] = mean_pos

    area = ((gt_boxes[..., 2] - gt_boxes[..., 0]) *
            (gt_boxes[..., 3] - gt_boxes[..., 1]))
    cols = [gt_boxes[..., 0], gt_boxes[..., 1], gt_boxes[..., 2],
            gt_boxes[..., 3], jnp.zeros_like(area), area,
            gt_classes.astype(jnp.float32)]
    if pseudo_scores is not None:
        cols.append(jnp.asarray(pseudo_scores, jnp.float32))
    labels["groundtruth_data"] = jnp.stack(cols, axis=-1)
    return labels
