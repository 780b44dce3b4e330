"""Detection visualization with uncertainty-colored boxes.

Parity with the vendored OD-API visualization
(`/root/reference/src/visualize/vis_utils.py:348-351,983-1119`): boxes drawn
with class labels + scores, and an uncertainty mode where box color comes
from a colormap over the normalized sigma (low = green, high = red).
Implemented with cv2 drawing (no PIL dependency in the hot path).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

STANDARD_COLORS = [
    (0, 255, 0), (255, 0, 0), (0, 0, 255), (255, 255, 0), (255, 0, 255),
    (0, 255, 255), (255, 128, 0), (128, 0, 255), (0, 128, 255), (128, 255, 0),
]


def _uncert_color(u_norm: float) -> tuple:
    """Green→yellow→red colormap over normalized uncertainty."""
    u = float(np.clip(u_norm, 0.0, 1.0))
    r = int(255 * min(1.0, 2 * u))
    g = int(255 * min(1.0, 2 * (1 - u)))
    return (r, g, 0)


def visualize_boxes_and_labels(image: np.ndarray, boxes: np.ndarray,
                               classes: np.ndarray, scores: np.ndarray,
                               label_map: Optional[Dict[int, str]] = None,
                               uncertainties: Optional[np.ndarray] = None,
                               min_score_thresh: float = 0.3,
                               line_thickness: int = 2) -> np.ndarray:
    """Draw detections; box colors encode uncertainty when provided.

    boxes: [N, 4] (y1, x1, y2, x2) absolute pixels.
    uncertainties: optional [N] or [N, 4] sigma (normalized internally).
    """
    import cv2

    img = np.ascontiguousarray(image.copy())
    keep = scores >= min_score_thresh
    boxes, classes, scores = boxes[keep], classes[keep], scores[keep]
    u = None
    if uncertainties is not None:
        u = np.asarray(uncertainties)[keep]
        if u.ndim > 1:
            u = u.mean(-1)
        rng = u.max() - u.min()
        u = (u - u.min()) / rng if rng > 0 else np.zeros_like(u)

    for i in range(len(boxes)):
        y1, x1, y2, x2 = [int(v) for v in boxes[i]]
        cls = int(classes[i])
        color = (_uncert_color(u[i]) if u is not None
                 else STANDARD_COLORS[cls % len(STANDARD_COLORS)])
        cv2.rectangle(img, (x1, y1), (x2, y2), color, line_thickness)
        name = (label_map or {}).get(cls, str(cls))
        text = f"{name}: {scores[i]:.0%}"
        if u is not None:
            text += f" s={u[i]:.2f}"
        (tw, th), _ = cv2.getTextSize(text, cv2.FONT_HERSHEY_SIMPLEX, 0.4, 1)
        ty = max(th + 2, y1)
        cv2.rectangle(img, (x1, ty - th - 2), (x1 + tw, ty), color, -1)
        cv2.putText(img, text, (x1, ty - 2), cv2.FONT_HERSHEY_SIMPLEX, 0.4,
                    (0, 0, 0), 1)
    return img


# Panel suffixes match the reference's written artifacts
# (`infer_model.py:983-1040`: *_mean_albox.png, *_mean_epbox.png,
# *_max_epcls.png; entropy panel added for the 4th decoded uncertainty).
UNCERTAINTY_PANELS = {
    "albox": "_mean_albox",
    "mcbox": "_mean_epbox",
    "mcclass": "_max_epcls",
    "entropy": "_entropy",
}


def overlay_panels(image: np.ndarray, boxes: np.ndarray, classes: np.ndarray,
                   scores: np.ndarray,
                   uncert_planes: Dict[str, Optional[np.ndarray]],
                   label_map: Optional[Dict[int, str]] = None,
                   min_score_thresh: float = 0.3) -> Dict[str, np.ndarray]:
    """Render the plain detection overlay plus one panel per uncertainty.

    Parity with the per-uncertainty overlay images written by inference
    (`/root/reference/src/infer_model.py:962-1059`): each panel colors the
    SAME detections by a different per-detection uncertainty (aleatoric box,
    epistemic box, epistemic class, entropy). Returns {suffix: uint8 image};
    the empty suffix is the plain class-colored overlay.
    """
    out = {"": visualize_boxes_and_labels(
        image, boxes, classes, scores, label_map,
        min_score_thresh=min_score_thresh)}
    for kind, u in uncert_planes.items():
        if u is None:
            continue
        suffix = UNCERTAINTY_PANELS.get(kind, "_" + kind)
        out[suffix] = visualize_boxes_and_labels(
            image, boxes, classes, scores, label_map, uncertainties=u,
            min_score_thresh=min_score_thresh)
    return out


def contact_sheet(images: Sequence[np.ndarray], cols: int = 5,
                  thumb_hw: tuple = (180, 320),
                  labels: Optional[Sequence[str]] = None) -> np.ndarray:
    """Tile images into one grid PNG — the rebuild's rendering of the
    reference's top/bottom-uncertainty image buckets
    (`infer_model.py:476-552` copies files into upper_uncert/lower_uncert
    dirs; here each bucket additionally gets a single contact sheet)."""
    import cv2

    th, tw = thumb_hw
    n = len(images)
    cols = max(1, min(cols, n))
    rows = (n + cols - 1) // cols
    canvas = np.zeros((rows * th, cols * tw, 3), np.uint8)
    for idx, im in enumerate(images):
        r, c = divmod(idx, cols)
        thumb = cv2.resize(np.asarray(im, np.uint8), (tw, th))
        if thumb.ndim == 2:
            thumb = np.stack([thumb] * 3, -1)
        canvas[r * th:(r + 1) * th, c * tw:(c + 1) * tw] = thumb[..., :3]
        if labels is not None:
            cv2.putText(canvas, str(labels[idx])[:40],
                        (c * tw + 4, r * th + 16),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.45, (255, 255, 0), 1)
    return canvas


def draw_detection_grid(image: np.ndarray, detections_per_cell,
                        grid: tuple = (2, 2)) -> np.ndarray:
    """Tile multiple visualizations (NMS-threshold sweeps etc.) —
    the DisplayCallback grid (`train_lib.py:533-617`)."""
    import cv2

    rows, cols = grid
    h, w = image.shape[:2]
    canvas = np.zeros((h * rows, w * cols, 3), np.uint8)
    for idx, det in enumerate(detections_per_cell[: rows * cols]):
        r, c = divmod(idx, cols)
        vis = visualize_boxes_and_labels(image, **det)
        canvas[r * h:(r + 1) * h, c * w:(c + 1) * w] = vis
    return canvas
