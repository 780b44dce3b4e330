"""SSL building blocks: class weighting, curricula, pseudo-label scoring,
label cleaning and fault injection (TMLR 2025 components).

Parity with `/root/reference/src/ssl_utils/`:

* class-distribution image weights: per-class score 1/log(count), scaled to
  [lowest, highest]; per-image score = mean over present classes
  (`parent.py:1485-1557`);
* RCF curriculum: sort images by class-weight score, split common/rare
  (`parent.py:1454-1483`, `rcf.py`);
* PLS pseudo-label image scoring: d_i = (1 - beta) * s_i + beta * c_i,
  correlated with the missing-detection rate; top/bottom/random splits
  (`pls.py:102-292`);
* GLC ground-truth cleaning via consistency-filtered predictions
  (modes mistakes/md/noisy) and the 3D ablation's synthetic label fault
  injection (missing dets, box noise, class mistakes —
  `glc.py:24-76`, `3d.py:20-80`);
* RCC rare-class collage synthesis (`rcc.py:15`, `parent.py:317-885`).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from udal_tpu.apps.calibration import iou_matrix_corners


# ---------------------------------------------------------------------------
# Class-distribution weighting + RCF curriculum
# ---------------------------------------------------------------------------

def class_distribution_weights(class_counts: Dict[int, int],
                               lowest_weight: float = 1.0,
                               highest_weight: float = 10.0
                               ) -> Dict[int, float]:
    """Per-class weight 1/log(count) scaled to [lowest, highest].

    Classes with count <= 1 get the highest weight (log undefined) —
    parity `parent.py:1508-1527`.
    """
    classes = sorted(class_counts)
    counts = np.asarray([class_counts[c] for c in classes], np.float64)
    mask = counts > 1
    inv = 1.0 / np.log(counts[mask])
    if len(inv) and inv.max() > inv.min():
        scaled = lowest_weight + (inv - inv.min()) * \
            (highest_weight - lowest_weight) / (inv.max() - inv.min())
    else:
        scaled = np.full_like(inv, highest_weight)
    out: Dict[int, float] = {}
    j = 0
    for i, c in enumerate(classes):
        if mask[i]:
            out[c] = float(round(scaled[j], 5))
            j += 1
        else:
            out[c] = float(highest_weight)
    return out


def image_class_scores(per_image_classes: Sequence[Sequence[int]],
                       weights: Dict[int, float]) -> np.ndarray:
    """Mean class weight of the classes present in each image."""
    return np.asarray([np.mean([weights[c] for c in cls]) if len(cls) else 0.0
                       for cls in per_image_classes])


def rcf_curriculum_split(image_names: Sequence[str],
                         per_image_classes: Sequence[Sequence[int]],
                         weights: Dict[int, float],
                         rare_fraction: float = 0.5
                         ) -> Tuple[List[str], List[str]]:
    """(common, rare) split by per-image class-weight score —
    parity `parent.py:1454-1483`. The training loop zips common + rare
    (rare gets extra augmentation) per batch (`train_flags.py:358-459`)."""
    scores = image_class_scores(per_image_classes, weights)
    order = np.argsort(scores)
    n_rare = max(1, int(round(len(image_names) * rare_fraction)))
    common = [image_names[i] for i in order[:len(image_names) - n_rare]]
    rare = [image_names[i] for i in order[-n_rare:]]
    return common, rare


# ---------------------------------------------------------------------------
# PLS: pseudo-label image scoring
# ---------------------------------------------------------------------------

def pls_image_scores(per_image_det_scores: Sequence[Sequence[float]],
                     per_image_classes: Sequence[Sequence[int]],
                     weights: Dict[int, float],
                     beta: float = 0.5) -> np.ndarray:
    """d_i = (1 - beta) * s_i + beta * c_i — parity `pls.py:102-292`.

    s_i = mean detection score; c_i = normalized mean class weight.
    """
    s = np.asarray([np.mean(sc) if len(sc) else 0.0
                    for sc in per_image_det_scores])
    c = image_class_scores(per_image_classes, weights)
    if c.max() > c.min():
        c = (c - c.min()) / (c.max() - c.min())
    return (1.0 - beta) * s + beta * c


def pls_split(image_names: Sequence[str], scores: np.ndarray,
              portion: float, mode: str = "top",
              rng: Optional[np.random.RandomState] = None) -> List[str]:
    """Select a portion of the pool by PLS score: top / bottom / random."""
    n = max(1, int(round(len(image_names) * portion)))
    if mode == "random":
        rng = rng or np.random.RandomState(0)
        return list(rng.choice(image_names, n, replace=False))
    order = np.argsort(scores)
    picked = order[-n:] if mode == "top" else order[:n]
    return [image_names[i] for i in picked]


# ---------------------------------------------------------------------------
# GLC: GT cleaning via consistency-filtered predictions
# ---------------------------------------------------------------------------

def glc_clean_labels(gt_boxes: np.ndarray, gt_classes: np.ndarray,
                     pred_boxes: np.ndarray, pred_classes: np.ndarray,
                     pred_scores: np.ndarray, pred_consistency: np.ndarray,
                     mode: str = "md", iou_consist: float = 0.9,
                     md_max_inter: float = 0.0,
                     correct_score: float = 0.4
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Fix GT with consistent predictions — parity `glc.py:24-76`.

    modes:
      'md'       — add consistent, confident predictions that intersect no
                   GT (missing detections);
      'mistakes' — drop GT boxes matched by no consistent prediction;
      'noisy'    — replace matched GT coordinates with the prediction's.
    """
    consistent = (pred_consistency >= iou_consist) & \
        (pred_scores >= correct_score)
    pb, pc = pred_boxes[consistent], pred_classes[consistent]
    if mode == "md":
        if len(gt_boxes) and len(pb):
            inter = iou_matrix_corners(pb, gt_boxes).max(axis=1)
        else:
            inter = np.zeros(len(pb))
        add = inter <= md_max_inter
        return (np.concatenate([gt_boxes, pb[add]]) if len(pb) else gt_boxes,
                np.concatenate([gt_classes, pc[add]]) if len(pb) else gt_classes)
    if not len(gt_boxes):
        return gt_boxes, gt_classes
    if not len(pb):
        return (gt_boxes, gt_classes) if mode == "noisy" else \
            (gt_boxes[:0], gt_classes[:0])
    iou = iou_matrix_corners(gt_boxes, pb)
    best = iou.max(axis=1)
    best_idx = iou.argmax(axis=1)
    if mode == "mistakes":
        keep = best > 0
        return gt_boxes[keep], gt_classes[keep]
    if mode == "noisy":
        out = gt_boxes.copy()
        matched = best > 0.5
        out[matched] = pb[best_idx[matched]]
        return out, gt_classes
    raise ValueError(f"unknown glc mode {mode!r}")


# ---------------------------------------------------------------------------
# 3D ablation: synthetic label fault injection
# ---------------------------------------------------------------------------

def inject_label_faults(gt_boxes: np.ndarray, gt_classes: np.ndarray,
                        num_classes: int,
                        drop_fraction: float = 0.0,
                        box_noise_fraction: float = 0.0,
                        box_noise_scale: float = 0.1,
                        class_mistake_fraction: float = 0.0,
                        rng: Optional[np.random.RandomState] = None
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Synthetic MD / box-noise / class-mistake injection —
    parity `3d.py:20-80` (pseudo-label robustness studies)."""
    rng = rng or np.random.RandomState(0)
    boxes = gt_boxes.copy().astype(np.float64)
    classes = gt_classes.copy()
    n = len(boxes)
    if n == 0:
        return boxes, classes
    keep = rng.rand(n) >= drop_fraction
    boxes, classes = boxes[keep], classes[keep]
    n = len(boxes)
    if n and box_noise_fraction > 0:
        noisy = rng.rand(n) < box_noise_fraction
        h = (boxes[:, 2] - boxes[:, 0])[:, None]
        w = (boxes[:, 3] - boxes[:, 1])[:, None]
        scale = np.concatenate([h, w, h, w], axis=1) * box_noise_scale
        boxes[noisy] += rng.randn(int(noisy.sum()), 4) * scale[noisy]
    if n and class_mistake_fraction > 0:
        flip = rng.rand(n) < class_mistake_fraction
        classes = classes.copy()
        classes[flip] = rng.randint(1, num_classes + 1, int(flip.sum()))
    return boxes, classes


# ---------------------------------------------------------------------------
# RCC: rare-class collage synthesis
# ---------------------------------------------------------------------------

def rcc_collage(background: np.ndarray,
                crops: Sequence[Tuple[np.ndarray, int]],
                rng: Optional[np.random.RandomState] = None,
                max_scale: float = 1.5, min_scale: float = 0.5
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Paste rare-class crops onto a background at random scaled positions.

    Parity with the collage machinery (`parent.py:317-885`, `rcc.py:15`):
    returns (image, boxes, classes) for the synthesized sample.
    """
    import cv2

    rng = rng or np.random.RandomState(0)
    img = background.copy()
    H, W = img.shape[:2]
    boxes, classes = [], []
    for crop, cls in crops:
        s = rng.uniform(min_scale, max_scale)
        ch = max(4, min(int(crop.shape[0] * s), H - 1))
        cw = max(4, min(int(crop.shape[1] * s), W - 1))
        crop_r = cv2.resize(crop, (cw, ch))
        y = rng.randint(0, H - ch)
        x = rng.randint(0, W - cw)
        img[y:y + ch, x:x + cw] = crop_r
        boxes.append([y, x, y + ch, x + cw])
        classes.append(cls)
    return img, np.asarray(boxes, np.float32), np.asarray(classes, np.int64)
