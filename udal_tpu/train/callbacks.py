"""Per-epoch COCO evaluation callback + TensorBoard image suites.

Parity with the reference's `COCOCallback` and `DisplayCallback`
(`/root/reference/src/train_lib.py:291-617`): every `map_freq` epochs the
val set is served through the full postprocess pipeline, COCO metrics are
logged, and four image panels are written to the event log — the AP-vs-IoU
curve (the 0.05-grid `COCOeval_all`, `custom_cocoeval.py:560-562`), the
class confusion matrix, the detection-correctness ROC, and a grid of
detections over (NMS-IoU, score) threshold combinations on a probe image.

Images are written as TensorBoard image summaries when TF is importable and
always as PNGs under ``<log_dir>/panels/`` (matplotlib Agg backend).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterator, Optional

import numpy as np


def _fig_to_rgb(fig) -> np.ndarray:
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    return buf.copy()


def _plot_ap_vs_iou(results: Dict[str, float]) -> Optional[np.ndarray]:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts = sorted((float(k.split("@")[1]), v) for k, v in results.items()
                 if k.startswith("AP@"))
    if not pts:
        return None
    xs, ys = zip(*pts)
    fig, ax = plt.subplots(figsize=(5, 4), dpi=100)
    ax.plot(xs, ys, marker="o", ms=3)
    ax.set_xlabel("IoU threshold")
    ax.set_ylabel("AP")
    ax.set_title("AP vs IoU (0.05 grid)")
    ax.set_ylim(0, 1)
    ax.grid(alpha=0.3)
    img = _fig_to_rgb(fig)
    plt.close(fig)
    return img


def _plot_confusion(cm: np.ndarray, names) -> np.ndarray:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5, 4.5), dpi=100)
    im = ax.imshow(cm, cmap="Blues")
    ax.set_xticks(range(len(names)))
    ax.set_yticks(range(len(names)))
    ax.set_xticklabels(names, rotation=45, ha="right", fontsize=7)
    ax.set_yticklabels(names, fontsize=7)
    ax.set_xlabel("predicted")
    ax.set_ylabel("ground truth")
    ax.set_title("confusion matrix (IoU>=0.5 matches)")
    fig.colorbar(im, ax=ax, shrink=0.8)
    img = _fig_to_rgb(fig)
    plt.close(fig)
    return img


def _plot_roc(scores: np.ndarray, hits: np.ndarray) -> Optional[np.ndarray]:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.metrics import auc, roc_curve

    if len(np.unique(hits)) < 2:
        return None
    fpr, tpr, _ = roc_curve(hits, scores)
    fig, ax = plt.subplots(figsize=(5, 4), dpi=100)
    ax.plot(fpr, tpr, label=f"AUC={auc(fpr, tpr):.3f}")
    ax.plot([0, 1], [0, 1], "--", color="gray")
    ax.set_xlabel("FPR")
    ax.set_ylabel("TPR")
    ax.set_title("detection-correctness ROC")
    ax.legend()
    img = _fig_to_rgb(fig)
    plt.close(fig)
    return img


class COCOCallback:
    """Epoch-end COCO eval + image panels over a validation stream.

    Args:
      config: detection Config.
      model: EfficientDetNet (the train-time module).
      val_iter_fn: () -> iterator of (images, labels) batches.
      val_steps: batches per evaluation.
      log_dir: panel/event output directory.
      label_map: {id: name} for panel axes.
    """

    def __init__(self, config, model, val_iter_fn: Callable[[], Iterator],
                 val_steps: int, log_dir: str, label_map=None):
        import jax

        from udal_tpu.ops.postprocess import postprocess_global

        self.config = config
        self.model = model
        self.val_iter_fn = val_iter_fn
        self.val_steps = val_steps
        self.log_dir = log_dir
        self.label_map = label_map or {}
        os.makedirs(os.path.join(log_dir, "panels"), exist_ok=True)

        def serve(variables, images, scales, key):
            cfg = config
            if cfg.mc_dropout and int(cfg.mc_dropoutsamp or 0) > 1:
                from udal_tpu.models.efficientdet import mc_forward

                cls_o, box_o = mc_forward(model, variables, images, key,
                                          int(cfg.mc_dropoutsamp))
            else:
                cls_o, box_o = model.apply(variables, images, train=False,
                                           rngs={"dropout": key})
            # scales map boxes to the original-image frame the scaled GT
            # lives in (same fix as ServingDriver.serve_preprocessed)
            return postprocess_global(cfg, list(cls_o), list(box_o),
                                      image_scales=scales)

        self._serve = jax.jit(serve)
        self._probe_serve = None

    # -- helpers ------------------------------------------------------------

    def _detections(self, variables):
        import jax

        key = jax.random.PRNGKey(0)
        it = self.val_iter_fn()
        img_id = 0
        first_batch = None
        from udal_tpu.eval.coco import COCOEvaluator

        evaluator = COCOEvaluator(label_map=self.label_map, fine_grid=True)
        pairs = []
        confusion = {}
        num_classes = int(self.config.num_classes)
        cm = np.zeros((num_classes + 1, num_classes + 1), np.int64)
        for _ in range(self.val_steps):
            images, labels = next(it)
            if first_batch is None:
                first_batch = (np.asarray(images), labels)
            det = self._serve(variables, np.asarray(images),
                              np.asarray(labels["image_scales"], np.float32),
                              key)
            b = images.shape[0]
            ids = np.arange(img_id, img_id + b)
            img_id += b
            boxes = np.asarray(det.boxes)
            scores = np.asarray(det.scores)
            classes = np.asarray(det.classes)
            y1, x1, y2, x2 = [boxes[..., i] for i in range(4)]
            rows = np.stack([np.repeat(ids[:, None], boxes.shape[1], 1),
                             x1, y1, x2 - x1, y2 - y1, scores, classes],
                            axis=-1)
            gt = np.asarray(labels["groundtruth_data"]).copy()
            gt[..., :4] *= np.asarray(labels["image_scales"])[:, None, None]
            evaluator.update_state(gt, rows)
            self._update_confusion(cm, boxes, scores, classes, gt, pairs)
        return evaluator.result(), cm, np.asarray(pairs), first_batch

    def _update_confusion(self, cm, boxes, scores, classes, gt, pairs,
                          iou_thr=0.5, score_thr=0.3):
        from udal_tpu.ops.boxes import pairwise_iou

        for b in range(boxes.shape[0]):
            keep = scores[b] > score_thr
            g = gt[b]
            g = g[g[:, -1] > 0]
            db = boxes[b][keep]
            dc = classes[b][keep].astype(int)
            ds = scores[b][keep]
            matched_gt = set()
            if len(g) and len(db):
                ious = np.asarray(pairwise_iou(db, g[:, :4]))
                for di in np.argsort(-ds):
                    gi = int(np.argmax(ious[di]))
                    hit = ious[di, gi] >= iou_thr and gi not in matched_gt
                    if hit:
                        matched_gt.add(gi)
                        cm[int(g[gi, -1]) % cm.shape[0],
                           dc[di] % cm.shape[0]] += 1
                    pairs.append((ds[di], float(
                        hit and dc[di] == int(g[gi, -1]))))
                for gi in range(len(g)):
                    if gi not in matched_gt:
                        cm[int(g[gi, -1]) % cm.shape[0], 0] += 1  # missed
            else:
                for di in range(len(db)):
                    cm[0, dc[di] % cm.shape[0]] += 1              # spurious
                    pairs.append((ds[di], 0.0))

    def _nms_grid_panel(self, variables, first_batch):
        """Detections over a grid of (nms-iou, score) thresholds — parity
        with DisplayCallback's threshold sweep (`train_lib.py:533-617`)."""
        import jax

        from udal_tpu.ops.postprocess import postprocess_global
        from udal_tpu.utils.visualize import visualize_boxes_and_labels

        images, labels = first_batch
        probe = images[:1]
        key = jax.random.PRNGKey(0)
        cells = []
        iou_grid = (0.3, 0.5, 0.7)
        score_grid = (0.1, 0.3, 0.5)
        cfg = self.config

        cls_o, box_o = self.model.apply(variables, probe, train=False,
                                        rngs={"dropout": key})
        base_iou = cfg.nms_configs.get("iou_thresh")
        base_score = cfg.nms_configs.get("score_thresh")
        rowimgs = []
        mean = np.asarray(cfg.mean_rgb, np.float32)
        std = np.asarray(cfg.stddev_rgb, np.float32)
        disp = np.clip(probe[0] * std + mean, 0, 255).astype(np.uint8)
        for iou_t in iou_grid:
            cols = []
            for score_t in score_grid:
                cfg.nms_configs["iou_thresh"] = iou_t
                cfg.nms_configs["score_thresh"] = score_t
                det = postprocess_global(cfg, list(cls_o), list(box_o))
                keep = np.asarray(det.scores[0]) > score_t
                img = visualize_boxes_and_labels(
                    disp.copy(), np.asarray(det.boxes[0])[keep],
                    np.asarray(det.classes[0])[keep].astype(int),
                    np.asarray(det.scores[0])[keep],
                    label_map=self.label_map)
                cols.append(img)
            rowimgs.append(np.concatenate(cols, axis=1))
        cfg.nms_configs["iou_thresh"] = base_iou
        cfg.nms_configs["score_thresh"] = base_score
        return np.concatenate(rowimgs, axis=0)

    # -- entry point ----------------------------------------------------------

    def __call__(self, epoch: int, state, writer=None) -> float:
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        results, cm, pairs, first_batch = self._detections(variables)

        names = ["bg/miss"] + [self.label_map.get(i, str(i))
                               for i in range(1, cm.shape[0])]
        panels = {
            "ap_vs_iou": _plot_ap_vs_iou(results),
            "confusion_matrix": _plot_confusion(cm, names),
            "roc": (_plot_roc(pairs[:, 0], pairs[:, 1])
                    if len(pairs) else None),
            "nms_grid": self._nms_grid_panel(variables, first_batch),
        }
        from PIL import Image

        for tag, img in panels.items():
            if img is None:
                continue
            Image.fromarray(img).save(os.path.join(
                self.log_dir, "panels", f"{tag}_epoch{epoch}.png"))
            if writer is not None:
                writer.write_image(epoch, tag, img)
        if writer is not None:
            writer.write(epoch, {k: v for k, v in results.items()
                                 if not k.startswith("AP_/")})
        return float(results["AP"])