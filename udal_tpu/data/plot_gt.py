"""Ground-truth visualization from TFRecords.

Parity with the reference GT plotters (`/root/reference/datasets/
plot_gt_kitti.py`, `plot_gt_bdd.py`, `datasets/plot_tf_test.py:68`):
sanity-render annotated boxes from a TFRecord shard.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

from udal_tpu.data import tfrecord as tfr
from udal_tpu.data.dataloader import parse_detection_example
from udal_tpu.utils.visualize import visualize_boxes_and_labels


def plot_tfrecord_groundtruth(tfrecord_path: str, out_dir: str,
                              label_map: Optional[Dict[int, str]] = None,
                              max_images: int = 16) -> int:
    """Write per-image PNGs with GT boxes drawn; returns image count."""
    import cv2
    import numpy as np

    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for record in tfr.iterate_tfrecord(tfrecord_path):
        if n >= max_images:
            break
        ex = parse_detection_example(record)
        vis = visualize_boxes_and_labels(
            ex.image, ex.boxes, ex.classes,
            scores=np.ones(len(ex.classes)), label_map=label_map,
            min_score_thresh=0.0)
        name = ex.filename or f"{ex.source_id}.png"
        cv2.imwrite(os.path.join(out_dir, os.path.basename(name)),
                    cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))
        n += 1
    return n
