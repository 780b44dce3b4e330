"""Validation application: GT-assigned predictions with all uncertainties.

TPU-native redesign of `validate_model.py` (`/root/reference/src/
validate_model.py:472-795`): the validation set is served in batches (the
reference loops image-by-image), every GT is assigned its best prediction
(IoU or MSE, `config.assign_gt_box`), calibrators are applied, and the same
text artifacts are produced:

* ``validate_results.txt`` — one python-dict line per GT with prediction,
  raw + calibrated uncertainties (`validate_model.py:526-616`);
* ``model_performance.txt`` — misclassification rate, mIoU, coordinate RMSE;
* ``average_score.txt`` — mean detection score;
* ``validationstep_runtime.txt`` — per-batch latency, summarized
  mean/std/median after IQR outlier rejection (`validate_model.py:
  153-158,683-704`).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

from udal_tpu.apps.calibration import (CalibrateBoxUncert, CalibrateClass,
                                       gt_box_assigner, load_calibrators,
                                       relativize)
from udal_tpu.apps.infer import split_serve_outputs
from udal_tpu.apps.serving import ServingDriver


class Validator:
    """Batched validation with uncertainty artifacts."""

    def __init__(self, driver: ServingDriver, save_dir: str,
                 calib_dir: Optional[str] = None,
                 infer_augment: Optional[List[str]] = None,
                 dataset_root: Optional[str] = None,
                 preprocessed_batches: bool = True):
        self.driver = driver
        self.config = driver.config
        self.save_dir = save_dir
        # True (CLI contract): batches come from the eval InputReader,
        # already normalized+resized — served via `serve_preprocessed` with
        # the reader's scales. False (reference validate_model.py contract):
        # batches are raw pixels straight from files — served via `serve`.
        self.preprocessed_batches = preprocessed_batches
        # per-image occlusion/truncation GT metadata source (KITTI label_2
        # txt / BDD json — `dataset_data.py:25-84`); None -> -1 placeholders
        self.dataset_root = dataset_root
        self._ocl_trc_cache = {}
        # infer-time augmentation modes ⊆ {heq, alb, aug, flip} — parity
        # `validate_model.py:485-523`
        self.infer_augment = infer_augment or \
            (self.config.infer_augment if isinstance(
                self.config.infer_augment, (list, tuple)) else None)
        os.makedirs(save_dir, exist_ok=True)
        self.box_calib = self.cls_calib = None
        if calib_dir and os.path.isdir(calib_dir):
            reg, cls = load_calibrators(calib_dir)
            if reg:
                self.box_calib = CalibrateBoxUncert(reg, self.config.num_classes)
            if cls:
                self.cls_calib = CalibrateClass(cls, self.config.num_classes)
        self.runtimes: List[float] = []

    def run(self, batches: Iterable[Tuple[np.ndarray, Dict]]) -> List[Dict]:
        """batches: (images, labels) from the eval InputReader with names.

        Returns per-GT rows; writes the four artifacts.
        """
        rows: List[Dict] = []
        all_scores: List[float] = []
        from udal_tpu.apps.reader_batches import (groundtruth_from_labels,
                                                  is_fast_batch,
                                                  serve_reader_batch)
        from udal_tpu.data.dataloader import normalize_image

        for images, labels in batches:
            scales = np.asarray(labels.get("image_scales",
                                           np.ones(images.shape[0])))
            fast = is_fast_batch(images)

            if self.preprocessed_batches:
                def _serve(im):
                    # any reader contract; uint8/fast batches keep their
                    # valid_hw/warp labels (augments preserve size and the
                    # uint8 domain — coerce in case a variant returns float)
                    if fast:
                        im = np.clip(np.asarray(im), 0,
                                     255).astype(np.uint8)
                    return serve_reader_batch(self.driver, im, labels)
            else:
                def _serve(im):
                    return self.driver.serve(im)

            if self.infer_augment:
                # variants operate on raw pixels (weather/corruption/histeq
                # are uint8-domain ops); fast-input batches ARE raw uint8,
                # classic normalized batches are de-normalized first
                if self.preprocessed_batches and not fast:
                    from udal_tpu.data.dataloader import denormalize_image
                    raw = denormalize_image(images, self.config.mean_rgb,
                                            self.config.stddev_rgb)
                else:
                    raw = np.clip(np.asarray(images), 0, 255).astype(np.uint8)
                gt = groundtruth_from_labels(labels)
                names = labels.get("image_names",
                                   labels.get("source_ids", []))
                for aug_images, tag in self._augment_variants(raw):
                    if self.preprocessed_batches and not fast:
                        aug_images = normalize_image(aug_images,
                                                     self.config.mean_rgb,
                                                     self.config.stddev_rgb)
                    out_a = split_serve_outputs(self.config,
                                                _serve(aug_images))
                    for i in range(images.shape[0]):
                        name = f"{names[i]}@{tag}" if len(names) > i else tag
                        rows.extend(self._process_image(
                            out_a, i, gt[i], scales[i], name, all_scores))
            t0 = time.perf_counter()
            out = split_serve_outputs(self.config, _serve(images))
            self.runtimes.append(time.perf_counter() - t0)
            gt_data = groundtruth_from_labels(labels)
            names = labels.get("image_names",
                               labels.get("source_ids",
                                          [str(i) for i in
                                           range(images.shape[0])]))
            for i in range(images.shape[0]):
                rows.extend(self._process_image(
                    out, i, gt_data[i], scales[i], names[i], all_scores))

        self._write_results(rows)
        self._write_performance(rows, all_scores)
        self._write_runtimes()
        return rows

    def _augment_variants(self, images: np.ndarray):
        """Yield (augmented batch, tag) per configured infer_augment mode —
        parity `validate_model.py:485-523` (heq / alb weather / aug
        corruption ladders / flips)."""
        import cv2

        from udal_tpu.data.augment import add_weather, apply_corruption

        imgs = np.asarray(images, np.uint8)
        if "heq" in self.infer_augment:
            out = []
            for im in imgs:
                yuv = cv2.cvtColor(im, cv2.COLOR_RGB2YUV)
                yuv[:, :, 0] = cv2.equalizeHist(yuv[:, :, 0])
                out.append(cv2.cvtColor(yuv, cv2.COLOR_YUV2RGB))
            yield np.stack(out), "histeq"
        if "alb" in self.infer_augment:
            for weather in ("snow", "fog", "rain", "noise"):
                yield np.stack([add_weather(im, weather) for im in imgs]), \
                    weather
        if "aug" in self.infer_augment:
            for kind in ("ns", "mb", "ct", "br"):
                ladders = [apply_corruption(kind, im) for im in imgs]
                for s in range(len(ladders[0])):
                    yield np.stack([lad[s] for lad in ladders]), f"{kind}{s}"
        if "flip" in self.infer_augment:
            yield imgs[:, ::-1].copy(), "vflip"
            yield imgs[:, :, ::-1].copy(), "hflip"

    def _process_image(self, out, i, gt_rows, scale, name, all_scores):
        n_val = int(out["valid_len"][i])
        if n_val == 0:
            return []
        boxes = out["boxes"][i][:n_val]
        scores = out["scores"][i][:n_val]
        classes = out["classes"][i][:n_val]
        valid_gt = gt_rows[gt_rows[:, 6] > 0]
        if len(valid_gt) == 0:
            return []
        # GT boxes from the loader are in network-input pixels; predictions
        # come back in original resolution — rescale GT to match.
        gt_boxes = valid_gt[:, :4] * scale
        gt_classes = valid_gt[:, 6].astype(int)
        method = self.config.assign_gt_box or "IoU"
        idx, ious = gt_box_assigner(gt_boxes, boxes, method)
        keep = ious > 0

        sig_al = out.get("sigma_al")
        sig_mc = out.get("sigma_mc")
        sig_cls = out.get("sigma_cls")
        logits = out.get("logits")

        pred_boxes = boxes[idx]
        cal_boxes = {}
        if self.box_calib is not None and sig_al is not None:
            cal_boxes = self.box_calib(sig_al[i][:n_val][idx],
                                       gt_classes, pred_boxes)
        cal_cls = {}
        if self.cls_calib is not None and logits is not None:
            cal_cls = self.cls_calib(logits[i][:n_val][idx])

        rows = []
        for g in np.where(keep)[0]:
            d = idx[g]
            all_scores.append(float(scores[d]))
            row = {
                "image_name": name,
                "score": float(scores[d]),
                "bbox": [float(x) for x in boxes[d]],
                "gt_bbox": [float(x) for x in gt_boxes[g]],
                "gt_occl": self._gt_ocl_trc(name, g)[0],
                "gt_trunc": self._gt_ocl_trc(name, g)[1],
                "class": float(classes[d]),
                "gt_class": float(gt_classes[g]),
                "iou": float(ious[g]),
            }
            if logits is not None:
                row["logits"] = [float(x) for x in logits[i][d]]
                row["probab"] = [float(x) for x in out["probab"][i][d]]
                row["entropy"] = float(out["entropy"][i][d])
            if sig_al is not None:
                row["uncalib_albox"] = [float(x) for x in sig_al[i][d]]
                rel = relativize(boxes[d:d + 1], sig_al[i][d:d + 1])[0]
                row["rel_albox"] = [float(x) for x in rel]
            if sig_mc is not None:
                row["uncalib_mcbox"] = [float(x) for x in sig_mc[i][d]]
            if sig_cls is not None:
                row["uncalib_mcclass"] = [float(x) for x in sig_cls[i][d]]
            for k, v in cal_boxes.items():
                row[f"{k}_albox"] = [float(x) for x in v[g]]
            for k, v in cal_cls.items():
                row[f"{k}_entropy"] = float(v["entropy"][g])
            rows.append(row)
        return rows

    def _gt_ocl_trc(self, name, g):
        """Occlusion/truncation of GT #g in this image (or -1, -1)."""
        if self.dataset_root is None:
            return -1, -1
        base = name.split("@")[0]
        if base not in self._ocl_trc_cache:
            from udal_tpu.data.label_maps import get_ocl_trc

            occl, trcs = get_ocl_trc(self.dataset_root, [base])
            self._ocl_trc_cache[base] = (occl[0], trcs[0])
        occl, trcs = self._ocl_trc_cache[base]
        if g < len(occl):
            return float(occl[g]), float(trcs[g])
        return -1, -1

    # -- artifacts ---------------------------------------------------------------

    def _write_results(self, rows):
        with open(os.path.join(self.save_dir, "validate_results.txt"),
                  "w") as f:
            for row in rows:
                f.write(repr(row) + "\n")
        self._write_uncert_plots(rows)

    def _write_uncert_plots(self, rows):
        """Aleatoric/ and mcdropout/ calibration panels — parity with the
        reference's uncertainty-toolbox analysis (`validate_model.py:
        737-794`, `utils_extra.py:378-573`)."""
        from udal_tpu.utils.uncert_plots import regression_calibration_plot

        for key, tag in (("uncalib_albox", "aleatoric"),
                         ("uncalib_mcbox", "mcdropout")):
            res, sig = [], []
            for r in rows:
                if key not in r:
                    continue
                res.extend(np.asarray(r["gt_bbox"]) - np.asarray(r["bbox"]))
                sig.extend(r[key])
            if len(res) < 8:
                continue
            d = os.path.join(self.save_dir, tag)
            os.makedirs(d, exist_ok=True)
            metrics = regression_calibration_plot(
                np.asarray(res), np.asarray(sig),
                os.path.join(d, "calibration.png"), title=tag)
            with open(os.path.join(d, "metrics.txt"), "w") as f:
                f.write(repr(metrics) + "\n")

    def _write_performance(self, rows, all_scores):
        if rows:
            miscls = float(np.mean([r["class"] != r["gt_class"]
                                    for r in rows]))
            miou = float(np.mean([r["iou"] for r in rows]))
            rmse = float(np.sqrt(np.mean([
                np.mean((np.asarray(r["bbox"]) -
                         np.asarray(r["gt_bbox"])) ** 2) for r in rows])))
        else:
            miscls = miou = rmse = float("nan")
        with open(os.path.join(self.save_dir, "model_performance.txt"),
                  "w") as f:
            f.write(f"misclassification: {miscls}\n")
            f.write(f"mIoU: {miou}\n")
            f.write(f"RMSE: {rmse}\n")
        with open(os.path.join(self.save_dir, "average_score.txt"), "w") as f:
            f.write(str(float(np.mean(all_scores)) if all_scores else 0.0))

    def _write_runtimes(self):
        path = os.path.join(self.save_dir, "validationstep_runtime.txt")
        with open(path, "w") as f:
            for t in self.runtimes:
                f.write(f"{t}\n")
            if self.runtimes:
                r = np.asarray(self.runtimes)
                q1, q3 = np.percentile(r, [25, 75])
                iqr = q3 - q1
                keep = r[(r >= q1 - 1.5 * iqr) & (r <= q3 + 1.5 * iqr)]
                f.write(f"mean: {keep.mean()} std: {keep.std()} "
                        f"median: {np.median(keep)}\n")


def read_validate_results(path: str) -> List[Dict]:
    import ast

    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line and line.startswith("{"):
                rows.append(ast.literal_eval(line))
    return rows
