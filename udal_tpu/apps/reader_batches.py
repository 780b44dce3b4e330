"""Adapters between InputReader batch contracts and the serving driver.

The reader has three batch contracts (classic normalized f32; `fast_input`
resized uint8; `device_resize` NATIVE-size uint8 + warp params). Apps that
consume (images, labels) batches dispatch through these helpers so every
product flow (eval, infer, validate, calibrate) accepts all three — the
uint8 contracts ship 4x fewer H2D bytes and run normalization (and, with
warp params, the bilinear resize itself) inside the jitted serving program.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def is_fast_batch(images) -> bool:
    dt = getattr(images, "dtype", None)
    if dt is not None:           # numpy OR device array: no host transfer
        return dt == np.uint8
    return np.asarray(images).dtype == np.uint8


def serve_reader_batch(driver, images, labels: Dict, structured: bool = False):
    """Serve one reader batch of any contract.

    Returns the packed tuple (default) or a structured `Detections`
    (``structured=True``); detections are in the ORIGINAL-image frame (the
    driver multiplies by the reader's ``image_scales``).
    """
    scales = labels.get("image_scales")
    if is_fast_batch(images):
        kw = dict(valid_hw=labels.get("valid_hw"), image_scales=scales,
                  warp_scale=labels.get("warp_scale"),
                  warp_offset=labels.get("warp_offset"))
        if structured:
            return driver.serve_detections_preprocessed_uint8(images, **kw)
        return driver.serve_preprocessed_uint8(images, **kw)
    if structured:
        return driver.serve_detections_preprocessed(images, scales)
    return driver.serve_preprocessed(images, scales)


def groundtruth_from_labels(labels: Dict) -> np.ndarray:
    """[B, M, 7] groundtruth_data ([y1,x1,y2,x2,is_crowd,area,class], the
    classic reader contract), synthesized from the compact fast-input
    labels when needed."""
    if "groundtruth_data" in labels:
        return np.asarray(labels["groundtruth_data"])
    gb = np.asarray(labels["gt_boxes"], np.float32)
    gc = np.asarray(labels["gt_classes"], np.float32)
    area = (gb[..., 2] - gb[..., 0]) * (gb[..., 3] - gb[..., 1])
    return np.concatenate(
        [gb, np.zeros_like(area)[..., None], area[..., None],
         gc[..., None]], axis=-1)


def raw_pixels_from_batch(images, labels: Dict, config) -> np.ndarray:
    """uint8 raw pixels for overlay rendering / uint8-domain augmentation.

    Fast-input batches ARE raw uint8 (network-size, or native-size with
    device_resize); classic batches are de-normalized back to pixels."""
    if is_fast_batch(images):
        return np.asarray(images)
    from udal_tpu.data.dataloader import denormalize_image

    return denormalize_image(images, config.mean_rgb, config.stddev_rgb)
