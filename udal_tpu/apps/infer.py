"""Batched inference application: uncertainty extraction, calibration,
auto-labeling.

TPU-native redesign of `InferImages` (`/root/reference/src/infer_model.py:
554-1059`): the reference loops one image at a time through a SavedModel;
here the pool is served in device-sized batches, and only final detections
spill to host for calibration (sklearn) and artifact writing. Output
contracts match the reference:

* ``prediction_data.txt`` — one python-dict line per detection
  (image_name, det_score, bbox, class, entropy/logits, raw + calibrated
  uncertainties) parsed downstream with `ast.literal_eval`
  (`infer_model.py:836-960`, `active_learning_loop.py:544-764`);
* auto-label gate: weighted combined uncertainty < mean(optimal thresholds)
  → ``labeled/`` else ``examine/`` (`infer_model.py:742-764`), with KITTI-
  format pseudo-label txt files for accepted images.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from udal_tpu.apps.calibration import (CalibrateBoxUncert, CalibrateClass,
                                       load_calibrators, relativize)
from udal_tpu.apps.serving import ServingDriver
from udal_tpu.apps.thresholding import read_optimal_thresholds


def split_serve_outputs(config, outputs) -> Dict[str, np.ndarray]:
    """Unpack the packed serving tuple into named arrays.

    Parity with the output splitting at `infer_model.py:585-650`:
    boxes[:, :, 4:8] -> albox sigma, [:, :, 8:12] -> mcbox sigma,
    classes[:, :, 1:] -> per-class logit sigma, logits -> softmax/entropy.
    """
    has_logits = bool(config.enable_softmax)
    if has_logits:
        boxes, scores, classes, valid, logits = outputs
    else:
        boxes, scores, classes, valid = outputs
        logits = None
    boxes = np.asarray(boxes)
    classes = np.asarray(classes)
    out: Dict[str, np.ndarray] = {
        "scores": np.asarray(scores), "valid_len": np.asarray(valid)}

    # Column presence is inferred from the packed widths, not just config:
    # the postprocess emits mc sigmas whenever the forward carried a sample
    # axis (MC dropout OR ensemble members, `ops/postprocess.py:162-166`),
    # so a deep-ensemble serve with mc_dropout=False still packs
    # [4 box][+4 albox][+4 mcbox] and [class, C logit sigmas].
    la = bool(config.loss_attenuation)
    mc_box = boxes.shape[-1] >= 4 + 4 * la + 4
    mc_cls = classes.ndim == 3 and classes.shape[-1] > 1
    col = 4
    out["boxes"] = boxes[..., :4]
    if la:
        out["sigma_al"] = boxes[..., col:col + 4]
        col += 4
    if mc_box:
        out["sigma_mc"] = boxes[..., col:col + 4]
    if mc_cls:
        out["classes"] = classes[..., 0]
        out["sigma_cls"] = classes[..., 1:]
    else:
        out["classes"] = classes if classes.ndim == 2 else classes[..., 0]
    if logits is not None:
        logits = np.asarray(logits)
        out["logits"] = logits
        z = logits - logits.max(-1, keepdims=True)
        p = np.exp(z)
        p = p / p.sum(-1, keepdims=True)
        out["probab"] = p
        out["entropy"] = -np.sum(p * np.log(np.clip(p, 1e-12, 1)), -1)
    return out


class InferImages:
    """Pool inference with uncertainty artifacts and auto-labeling."""

    def __init__(self, driver: ServingDriver, save_dir: str,
                 calib_dir: Optional[str] = None,
                 auto_labeling: bool = False,
                 opt_params: Optional[Sequence[float]] = None,
                 opt_thrs_path: Optional[str] = None,
                 min_score: float = 0.0,
                 save_visualizations: bool = False,
                 bucket_fraction: float = 0.1):
        self.driver = driver
        self.config = driver.config
        self.save_dir = save_dir
        self.min_score = min_score
        self.auto_labeling = auto_labeling
        # detection+uncertainty overlay PNGs (ref `infer_model.py:962-1059`)
        self.save_visualizations = save_visualizations
        # top/bottom-uncertainty image buckets (ref `infer_model.py:476-552`)
        self.bucket_fraction = bucket_fraction
        self._image_uncert: List[Tuple[str, float]] = []
        # per-uncertainty-kind image ranking (albox/mcbox/mcclass/entropy),
        # parity `_sort_maxuncert`/`_collect_highlow_uncert`
        self._image_uncert_kind: Dict[str, List[Tuple[str, float]]] = {}
        self._overlay_paths: Dict[str, str] = {}
        os.makedirs(save_dir, exist_ok=True)
        self.box_calib = self.cls_calib = None
        if calib_dir and os.path.isdir(calib_dir):
            reg, cls = load_calibrators(calib_dir)
            if reg:
                self.box_calib = CalibrateBoxUncert(reg,
                                                    self.config.num_classes)
            if cls:
                self.cls_calib = CalibrateClass(cls, self.config.num_classes)
        self.opt_params = (np.asarray(opt_params)
                           if opt_params is not None else None)
        self.opt_thrs = None
        if opt_thrs_path:
            self.opt_thrs = read_optimal_thresholds(opt_thrs_path)
        self.count_auto = 0
        self.count_skip = 0

    # -- auto-label gate --------------------------------------------------------

    def _combined_uncertainty(self, entropy, rel_albox) -> Optional[np.ndarray]:
        sel = self.config.thr_sel_uncert
        uncerts = []
        if "ENT" in sel and entropy is not None:
            uncerts.append(entropy)
        if "ALBOX" in sel and rel_albox is not None:
            uncerts.append(np.mean(rel_albox, axis=-1))
        if not uncerts or self.opt_params is None:
            return None
        return sum(p * u for p, u in zip(self.opt_params, uncerts))

    def _gate(self, combined: np.ndarray, scores: np.ndarray) -> bool:
        keep = scores > self.min_score
        thr = float(np.mean(self.opt_thrs)) if self.opt_thrs is not None \
            else np.inf
        return bool(np.all(combined[keep] < thr))

    # -- main loop -----------------------------------------------------------------

    def run(self, batches: Iterable[Tuple]) -> List[Dict]:
        """Serve batches; write prediction_data.txt; return the
        per-detection dict rows.

        Batches are ``(raw_images, names)`` — raw pixels, the reference
        `infer_model.py` file-reading contract — or
        ``(images, names, image_scales)`` from the eval InputReader, whose
        images are already normalized+resized (served without a second
        normalization; scales map boxes to the original frame) — or a
        reader's ``(images, labels)`` pair of ANY contract (classic f32 /
        fast-input uint8 / device_resize native uint8), dispatched through
        `apps.reader_batches`."""
        rows: List[Dict] = []
        labeled_names: List[str] = []
        examine_names: List[str] = []

        for batch in batches:
            overlay_scales = None
            if len(batch) == 2 and isinstance(batch[1], dict):
                from udal_tpu.apps.reader_batches import (
                    is_fast_batch, raw_pixels_from_batch, serve_reader_batch)

                images, labels = batch
                names = list(labels.get("image_names",
                                        labels.get("source_ids", [])))
                scales = np.asarray(labels.get(
                    "image_scales", np.ones(images.shape[0])), np.float32)
                native = is_fast_batch(images) and "warp_scale" in labels
                out = split_serve_outputs(
                    self.config,
                    serve_reader_batch(self.driver, images, labels))
                if self.save_visualizations:
                    images = raw_pixels_from_batch(images, labels,
                                                   self.config)
                    # boxes come back in the ORIGINAL frame; native
                    # (device_resize) pixels ARE original-frame, resized
                    # pixels are network-frame → map boxes by 1/scale
                    overlay_scales = None if native else scales
            elif len(batch) == 3:
                images, names, scales = batch
                out = split_serve_outputs(
                    self.config,
                    self.driver.serve_preprocessed(images, scales))
                if self.save_visualizations:
                    from udal_tpu.data.dataloader import denormalize_image
                    images = denormalize_image(images, self.config.mean_rgb,
                                               self.config.stddev_rgb)
                    # boxes are in the ORIGINAL frame (serve_preprocessed
                    # multiplies by image_scales); the only pixels we have
                    # are network-size, so map boxes back for the overlay
                    overlay_scales = np.asarray(scales, np.float32)
            else:
                images, names = batch
                out = split_serve_outputs(self.config,
                                          self.driver.serve(images))
            b = images.shape[0]
            for i in range(b):
                n_val = int(out["valid_len"][i])
                scores = out["scores"][i][:n_val]
                boxes = out["boxes"][i][:n_val]
                classes = out["classes"][i][:n_val]
                entropy = out.get("entropy")
                entropy_i = entropy[i][:n_val] if entropy is not None else None

                rel_al = rel_mc = mcc_max = None
                calibrated_boxes: Dict[str, np.ndarray] = {}
                if "sigma_mc" in out and n_val:
                    rel_mc = relativize(boxes, out["sigma_mc"][i][:n_val])
                if "sigma_cls" in out and n_val:
                    mcc_max = np.max(out["sigma_cls"][i][:n_val], axis=-1)
                if "sigma_al" in out:
                    sig = out["sigma_al"][i][:n_val]
                    rel_al = relativize(boxes, sig) if n_val else sig
                    if self.box_calib and n_val:
                        calibrated_boxes = {
                            f"{k}_albox": v for k, v in
                            self.box_calib(sig, classes, boxes).items()}
                # the reference calibrates BOTH the aleatoric and the
                # epistemic box sigma (`infer_model.py:652-740`)
                if "sigma_mc" in out and self.box_calib and n_val:
                    calibrated_boxes.update({
                        f"{k}_mcbox": v for k, v in
                        self.box_calib(out["sigma_mc"][i][:n_val], classes,
                                       boxes).items()})
                calibrated_cls: Dict[str, Dict] = {}
                if self.cls_calib is not None and "logits" in out and n_val:
                    import zlib

                    sig_cls = out.get("sigma_cls")
                    # per-image seed from the image name so the array-native
                    # pool path (`apps.al_scoring`) draws identical samples
                    seed = zlib.crc32(str(names[i]).encode()) & 0x7FFFFFFF
                    calibrated_cls = self.cls_calib(
                        out["logits"][i][:n_val],
                        uncert=(sig_cls[i][:n_val]
                                if sig_cls is not None else None),
                        seed=seed)

                combined = None
                if n_val:
                    combined = self._combined_uncertainty(entropy_i, rel_al)
                # per-image mean uncertainty for the top/bottom-10% buckets
                if n_val:
                    if combined is not None:
                        img_u = float(np.mean(combined))
                    elif entropy_i is not None:
                        img_u = float(np.mean(entropy_i))
                    elif rel_al is not None:
                        img_u = float(np.mean(rel_al))
                    else:
                        img_u = float(-np.mean(scores))
                    self._image_uncert.append((names[i], img_u))
                # per-kind image uncertainty for the per-uncertainty buckets
                # (reference ranks by the per-image max, `infer_model.py:
                # 833-900` filtered_max_* + `:476-552`)
                if n_val:
                    for kind, vals in (
                            ("albox", np.mean(rel_al, -1)
                             if rel_al is not None else None),
                            ("mcbox", np.mean(rel_mc, -1)
                             if rel_mc is not None else None),
                            ("mcclass", mcc_max),
                            ("entropy", entropy_i)):
                        if vals is not None and np.isfinite(vals).any():
                            self._image_uncert_kind.setdefault(
                                kind, []).append(
                                (names[i], float(np.nanmax(vals))))
                if self.save_visualizations and n_val:
                    ov_boxes = boxes if overlay_scales is None \
                        else boxes / overlay_scales[i]
                    planes = {
                        "albox": (np.mean(rel_al, -1)
                                  if rel_al is not None else None),
                        "mcbox": (np.mean(rel_mc, -1)
                                  if rel_mc is not None else None),
                        "mcclass": mcc_max,
                        "entropy": entropy_i,
                    }
                    self._save_overlay(images[i], names[i], ov_boxes,
                                       classes, scores, planes)
                subdir = ""
                if self.auto_labeling:
                    ok = combined is not None and self._gate(combined, scores)
                    subdir = "labeled" if ok else "examine"
                    (labeled_names if ok else examine_names).append(names[i])
                    if ok:
                        self.count_auto += 1
                    else:
                        self.count_skip += 1

                for d in np.where(scores > self.min_score)[0]:
                    row = {
                        "image_name": names[i],
                        "score_thresh": self.min_score,
                        "det_score": float(scores[d]),
                        "bbox": [float(x) for x in boxes[d]],
                        "class": float(classes[d]),
                    }
                    if entropy_i is not None:
                        row["entropy"] = float(entropy_i[d])
                        row["logits"] = [float(x) for x in
                                         out["logits"][i][d]]
                        row["probab"] = [float(x) for x in
                                         out["probab"][i][d]]
                    if "sigma_al" in out:
                        row["uncalib_albox"] = [
                            float(x) for x in out["sigma_al"][i][d]]
                    if "sigma_mc" in out:
                        row["uncalib_mcbox"] = [
                            float(x) for x in out["sigma_mc"][i][d]]
                    if "sigma_cls" in out:
                        row["uncalib_mcclass"] = [
                            float(x) for x in out["sigma_cls"][i][d]]
                    for k, v in calibrated_boxes.items():
                        row[k] = [float(x) for x in v[d]]
                    for k, v in calibrated_cls.items():
                        row[f"{k}_entropy"] = float(v["entropy"][d])
                        if "mcclass" in v:
                            row[f"{k}_mcclass"] = [float(x) for x in
                                                   v["mcclass"][d]]
                    if subdir:
                        row["auto_label"] = subdir
                    rows.append(row)

        with open(os.path.join(self.save_dir, "prediction_data.txt"),
                  "w") as f:
            for row in rows:
                f.write(repr(row) + "\n")
        if self.auto_labeling:
            for name, lst in [("labeled", labeled_names),
                              ("examine", examine_names)]:
                os.makedirs(os.path.join(self.save_dir, name), exist_ok=True)
                with open(os.path.join(self.save_dir, name, "images.txt"),
                          "w") as f:
                    f.write("\n".join(lst))
        self._write_buckets()
        return rows

    def _save_overlay(self, image, name, boxes, classes, scores, planes):
        """Per-image detection overlay + one panel per decoded uncertainty
        (aleatoric box / epistemic box / epistemic class / entropy) —
        parity `infer_model.py:962-1059`."""
        from PIL import Image

        from udal_tpu.utils.visualize import overlay_panels

        mean = np.asarray(self.config.mean_rgb, np.float32)
        std = np.asarray(self.config.stddev_rgb, np.float32)
        img = np.asarray(image, np.float32)
        if img.max() <= 20.0:      # normalized input -> denormalize
            img = img * std + mean
        img = np.clip(img, 0, 255).astype(np.uint8)
        panels = overlay_panels(
            img, np.asarray(boxes), np.asarray(classes).astype(int),
            np.asarray(scores), planes, min_score_thresh=self.min_score)
        out_dir = os.path.join(self.save_dir, "visualizations")
        os.makedirs(out_dir, exist_ok=True)
        stem = os.path.splitext(os.path.basename(str(name)))[0] or "img"
        for suffix, vis in panels.items():
            path = os.path.join(out_dir, stem + suffix + ".png")
            Image.fromarray(vis).save(path)
            if not suffix:
                self._overlay_paths[str(name)] = path

    def _write_buckets(self):
        """Top/bottom uncertainty image buckets — parity
        `infer_model.py:476-552`: a combined ranking (bottom10/top10) plus
        per-uncertainty-kind lower_uncert/upper_uncert dirs with copied
        overlays and a contact-sheet grid per bucket."""
        if self._image_uncert:
            ranked = sorted(self._image_uncert, key=lambda t: t[1])
            k = max(1, int(round(len(ranked) * self.bucket_fraction)))
            for tag, sel in (("bottom10", ranked[:k]),
                             ("top10", ranked[-k:])):
                d = os.path.join(self.save_dir, tag)
                os.makedirs(d, exist_ok=True)
                with open(os.path.join(d, "images.txt"), "w") as f:
                    for name, u in sel:
                        f.write(f"{name} {u}\n")
        for kind, pairs in self._image_uncert_kind.items():
            ranked = sorted(pairs, key=lambda t: t[1])
            k = max(1, int(np.ceil(len(ranked) * self.bucket_fraction)))
            for tag, sel in (("lower_uncert", ranked[:k]),
                             ("upper_uncert", ranked[-k:])):
                d = os.path.join(self.save_dir, "uncert", tag, kind)
                os.makedirs(d, exist_ok=True)
                with open(os.path.join(d, "images.txt"), "w") as f:
                    for name, u in sel:
                        f.write(f"{name} {u}\n")
                self._bucket_artifacts(d, sel)

    def _bucket_artifacts(self, bucket_dir, sel):
        """Copy the bucket's overlay PNGs and render one contact sheet."""
        import shutil

        copied = []
        labels = []
        for name, u in sel:
            src = self._overlay_paths.get(str(name))
            if src and os.path.exists(src):
                dst = os.path.join(bucket_dir, os.path.basename(src))
                shutil.copyfile(src, dst)
                copied.append(src)
                labels.append(f"{os.path.basename(src)} {u:.3g}")
        if copied:
            from PIL import Image

            from udal_tpu.utils.visualize import contact_sheet

            thumbs = [np.asarray(Image.open(p)) for p in copied]
            sheet = contact_sheet(thumbs, labels=labels)
            Image.fromarray(sheet).save(
                os.path.join(bucket_dir, "contact_sheet.png"))


def consistency_check(driver: ServingDriver, images: np.ndarray,
                      base_boxes: np.ndarray, base_classes: np.ndarray,
                      modes: Sequence[str] = ("flip", "blur", "noise"),
                      rng: Optional[np.random.RandomState] = None
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Prediction consistency under augmentation — parity
    `infer_model.py:768-830` (consistency_ssl): serve augmented variants,
    report per-detection mean best-IoU against the augmented predictions and
    whether the class agrees across all variants.

    Returns (mean_iou [B, K], class_agreement [B, K] bool).
    """
    import cv2

    from udal_tpu.apps.calibration import iou_matrix_corners

    rng = rng or np.random.RandomState(0)
    b, k = base_classes.shape[:2]
    ious_all = []
    classes_all = []
    for mode in modes:
        if mode == "flip":
            aug = images[:, :, ::-1]
        elif mode == "blur":
            aug = np.stack([cv2.GaussianBlur(im, (9, 9), 0) for im in
                            np.asarray(images, np.uint8)])
        elif mode == "noise":
            aug = np.clip(images + rng.randn(*images.shape) * 12, 0,
                          255).astype(images.dtype)
        else:
            raise ValueError(mode)
        out = split_serve_outputs(driver.config, driver.serve(aug))
        boxes_aug = out["boxes"]
        if mode == "flip":
            w = images.shape[2]
            flipped = boxes_aug.copy()
            flipped[..., 1] = w - boxes_aug[..., 3]
            flipped[..., 3] = w - boxes_aug[..., 1]
            boxes_aug = flipped
        per_image_iou = np.zeros((b, k))
        per_image_cls = np.zeros((b, k))
        for i in range(b):
            m = iou_matrix_corners(base_boxes[i], boxes_aug[i])
            best = m.argmax(axis=1)
            per_image_iou[i] = m.max(axis=1)
            per_image_cls[i] = out["classes"][i][best]
        ious_all.append(per_image_iou)
        classes_all.append(per_image_cls)
    mean_iou = np.mean(np.stack(ious_all), axis=0)
    agree = np.all(np.stack(classes_all) == base_classes[None], axis=0)
    return mean_iou, agree


def read_prediction_data(path: str) -> List[Dict]:
    """Parse prediction_data.txt (ast.literal_eval per line) — the contract
    consumed by the AL loop and SSL scoring."""
    import ast

    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(ast.literal_eval(line))
    return rows


def write_kitti_labels(path: str, boxes: np.ndarray, classes: np.ndarray,
                       scores: np.ndarray, label_map: Dict[int, str]) -> None:
    """Write pseudo-labels in KITTI txt format (type, trunc, occl, alpha,
    x1 y1 x2 y2, dims/loc zeros, score)."""
    with open(path, "w") as f:
        for b, c, s in zip(boxes, classes, scores):
            name = label_map.get(int(c), str(int(c)))
            y1, x1, y2, x2 = [float(v) for v in b]
            f.write(f"{name} 0.0 0 0.0 {x1:.2f} {y1:.2f} {x2:.2f} {y2:.2f} "
                    f"0.0 0.0 0.0 0.0 0.0 0.0 0.0 {float(s):.4f}\n")
