"""Calibration driver: gather GT-assigned detections, fit all calibrators.

Parity with `Calibrate` (`/root/reference/src/calibrate_model.py:20-258`):
serve every validation image, assign each GT its best prediction by
IoU/MSE (`gather_detections`, `:76-187`), keep pairs with IoU > 0, then fit
the regression (`calibrate_regression.py`) and classification
(`calibrate_classification.py`) calibrators and pickle them under
``<out>/{regression,classification}/``.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

from udal_tpu.apps.calibration import (ClassificationCalib, RegressionCalib,
                                       gt_box_assigner, save_calibrators)
from udal_tpu.apps.infer import split_serve_outputs
from udal_tpu.apps.serving import ServingDriver


class Calibrate:
    """Gather detections and fit all calibrators."""

    def __init__(self, driver: ServingDriver, out_dir: str,
                 val_split: float = 0.8):
        self.driver = driver
        self.config = driver.config
        self.out_dir = out_dir
        self.val_split = val_split

    def gather_detections(self, batches: Iterable[Tuple[np.ndarray, Dict]]
                          ) -> Dict[str, np.ndarray]:
        """Serve val batches; assign GTs their best predictions.

        Returns flat arrays over all matched (GT, prediction) pairs:
        gt_boxes, pred_boxes, sigma_al?, sigma_cls?, logits?, gt_classes,
        pred_classes, scores, ious.
        """
        acc: Dict[str, List] = {k: [] for k in
                                ("gt_boxes", "pred_boxes", "sigma_al",
                                 "sigma_cls", "logits", "gt_classes",
                                 "pred_classes", "scores", "ious")}
        method = self.config.assign_gt_box or "IoU"
        from udal_tpu.apps.reader_batches import (groundtruth_from_labels,
                                                  serve_reader_batch)

        for images, labels in batches:
            scales = np.asarray(labels.get("image_scales",
                                           np.ones(images.shape[0])))
            # any reader contract (classic f32 / uint8 / native+warp); the
            # reader's scales put predictions in the GT frame below
            out = split_serve_outputs(
                self.config,
                serve_reader_batch(self.driver, images, labels))
            gt_data = groundtruth_from_labels(labels)
            for i in range(images.shape[0]):
                n_val = int(out["valid_len"][i])
                valid_gt = gt_data[i][gt_data[i][:, 6] > 0]
                if n_val == 0 or len(valid_gt) == 0:
                    continue
                boxes = out["boxes"][i][:n_val]
                gt_boxes = valid_gt[:, :4] * scales[i]
                idx, ious = gt_box_assigner(gt_boxes, boxes, method)
                keep = ious > 0
                if not np.any(keep):
                    continue
                sel = idx[keep]
                acc["gt_boxes"].append(gt_boxes[keep])
                acc["pred_boxes"].append(boxes[sel])
                acc["gt_classes"].append(valid_gt[keep, 6].astype(int))
                acc["pred_classes"].append(out["classes"][i][sel])
                acc["scores"].append(out["scores"][i][sel])
                acc["ious"].append(ious[keep])
                if "sigma_al" in out:
                    acc["sigma_al"].append(out["sigma_al"][i][sel])
                if "sigma_cls" in out:
                    acc["sigma_cls"].append(out["sigma_cls"][i][sel])
                if "logits" in out:
                    acc["logits"].append(out["logits"][i][sel])
        return {k: (np.concatenate(v) if v else np.zeros((0,)))
                for k, v in acc.items()}


    def run(self, batches: Iterable[Tuple[np.ndarray, Dict]]
            ) -> Tuple[Dict, Dict]:
        data = self.gather_detections(batches)
        num_classes = self.config.num_classes
        regression = {}
        classification = {}
        if len(data["gt_boxes"]) >= 8:
            if data["sigma_al"].size:
                rc = RegressionCalib(data["gt_boxes"], data["pred_boxes"],
                                     data["sigma_al"], data["gt_classes"],
                                     num_classes, self.val_split)
                regression = rc.fit_all()
            if data["logits"].size:
                sigma_cls = data["sigma_cls"] if data["sigma_cls"].size \
                    else None
                # per-class logit sigma aligned to logits width
                if sigma_cls is not None and \
                        sigma_cls.shape[-1] != data["logits"].shape[-1]:
                    sigma_cls = None
                cc = ClassificationCalib(data["gt_classes"], data["logits"],
                                         sigma_cls, num_classes)
                classification = cc.fit_all()
                self._reliability_diagrams(data, classification)
            if data["sigma_al"].size:
                self._regression_plots(data)
        save_calibrators(self.out_dir, regression, classification)
        return regression, classification

    def _reliability_diagrams(self, data, classification) -> None:
        """Before/after-TS reliability diagrams — parity
        `calibrate_classification.py:97-440`."""
        import numpy as np

        from udal_tpu.apps.calibration import stable_softmax
        from udal_tpu.utils.uncert_plots import reliability_diagram

        logits = np.asarray(data["logits"])
        y = np.asarray(data["gt_classes"]).astype(int)
        plots = os.path.join(self.out_dir, "plots")
        probs = stable_softmax(logits)
        pred = probs.argmax(-1) + 1
        reliability_diagram((pred == y).astype(float), probs.max(-1),
                            os.path.join(plots, "reliability_raw.png"),
                            title="raw softmax")
        t = classification.get("ts_all")
        if t is not None:
            probs_t = stable_softmax(logits / np.asarray(t))
            reliability_diagram((probs_t.argmax(-1) + 1 == y).astype(float),
                                probs_t.max(-1),
                                os.path.join(plots, "reliability_ts.png"),
                                title="temperature scaled")

    def _regression_plots(self, data) -> None:
        """Aleatoric-sigma calibration curve — parity with the
        uncertainty-toolbox panel (`validate_model.py:737-794`)."""
        import numpy as np

        from udal_tpu.utils.uncert_plots import regression_calibration_plot

        res = np.asarray(data["gt_boxes"]) - np.asarray(data["pred_boxes"])
        regression_calibration_plot(
            res.ravel(), np.asarray(data["sigma_al"]).ravel(),
            os.path.join(self.out_dir, "plots", "regression_reliability.png"),
            title="aleatoric box sigma")
