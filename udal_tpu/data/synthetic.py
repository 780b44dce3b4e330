"""Synthetic detection dataset generator (testing / fake-data backend).

Extends the reference's `--use_fake_data` idea (`dataloader.py:562-566`)
into a full synthetic TFRecord dataset: images with colored rectangles on
noise backgrounds, each rectangle a labeled box. Used by unit tests and as
an end-to-end smoke backend.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from udal_tpu.data import example_codec as codec
from udal_tpu.data import tfrecord as tfr


def make_image_with_boxes(rng: np.random.RandomState, height: int, width: int,
                          num_objects: int, num_classes: int,
                          natural: bool = False
                          ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Noise image with bright class-colored rectangles.

    ``natural=True`` uses a smooth low-frequency background with mild pixel
    noise instead of dense noise — photograph-like compression statistics,
    so JPEG decode cost in perf harnesses matches real camera data (dense
    noise is the pathological worst case for both JPEG and PNG decoders).
    """
    if natural:
        import cv2

        low = rng.randint(0, 255, (max(2, height // 16),
                                   max(2, width // 16), 3), np.uint8)
        image = cv2.resize(low, (width, height),
                           interpolation=cv2.INTER_CUBIC)
        image = np.clip(image.astype(np.int16) +
                        rng.randint(-8, 8, image.shape), 0,
                        255).astype(np.uint8)
    else:
        image = rng.randint(0, 60, (height, width, 3), np.uint8)
    boxes = []
    classes = []
    palette = (np.arange(1, num_classes + 1)[:, None] *
               np.asarray([[97, 61, 37]]) % 200 + 55).astype(np.uint8)
    for _ in range(num_objects):
        h = rng.randint(height // 8, height // 2)
        w = rng.randint(width // 8, width // 2)
        y1 = rng.randint(0, height - h)
        x1 = rng.randint(0, width - w)
        cls = rng.randint(1, num_classes + 1)
        image[y1:y1 + h, x1:x1 + w] = palette[cls - 1]
        boxes.append([y1, x1, y1 + h, x1 + w])
        classes.append(cls)
    return image, np.asarray(boxes, np.float32), np.asarray(classes, np.int64)


def encode_png(image: np.ndarray) -> bytes:
    import cv2

    ok, buf = cv2.imencode(".png", cv2.cvtColor(image, cv2.COLOR_RGB2BGR))
    assert ok
    return buf.tobytes()


def encode_jpeg(image: np.ndarray, quality: int = 90) -> bytes:
    import cv2

    ok, buf = cv2.imencode(".jpg", cv2.cvtColor(image, cv2.COLOR_RGB2BGR),
                           [cv2.IMWRITE_JPEG_QUALITY, quality])
    assert ok
    return buf.tobytes()


def make_example(image: np.ndarray, boxes: np.ndarray, classes: np.ndarray,
                 source_id: str, filename: str,
                 pseudo_scores: Optional[np.ndarray] = None,
                 label_map: Optional[Dict[int, str]] = None,
                 image_format: str = "png") -> bytes:
    """Serialize one synthetic sample with the reference tf.Example schema
    (`datasets/KITTI/kitti_tf_creator.py:380-438`)."""
    h, w = image.shape[:2]
    encoded = (encode_jpeg(image) if image_format in ("jpeg", "jpg")
               else encode_png(image))
    feats = {
        "image/encoded": codec.bytes_feature(encoded),
        "image/format": codec.bytes_feature(image_format),
        "image/height": codec.int64_feature(h),
        "image/width": codec.int64_feature(w),
        "image/filename": codec.bytes_feature(filename),
        "image/source_id": codec.bytes_feature(source_id),
        "image/object/bbox/ymin": codec.float_list_feature(boxes[:, 0] / h),
        "image/object/bbox/xmin": codec.float_list_feature(boxes[:, 1] / w),
        "image/object/bbox/ymax": codec.float_list_feature(boxes[:, 2] / h),
        "image/object/bbox/xmax": codec.float_list_feature(boxes[:, 3] / w),
        "image/object/class/label": codec.int64_list_feature(classes),
    }
    if label_map:
        feats["image/object/class/text"] = codec.bytes_list_feature(
            [label_map.get(int(c), str(c)) for c in classes])
    if pseudo_scores is not None:
        feats["image/object/pseudo_score"] = codec.float_list_feature(
            pseudo_scores)
    return codec.serialize_example(feats)


def write_synthetic_dataset(path: str, num_images: int = 16,
                            height: int = 128, width: int = 192,
                            num_classes: int = 7, max_objects: int = 4,
                            seed: int = 0,
                            pseudo_scores: bool = False,
                            image_format: str = "png",
                            natural: bool = False) -> List[Dict]:
    """Write a synthetic TFRecord; returns per-image metadata for checks.

    Tests default to lossless PNG (exact pixels under groundtruth boxes);
    perf harnesses pass ``image_format="jpeg", natural=True`` so decode
    cost matches real camera data (see `make_image_with_boxes`).
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    rng = np.random.RandomState(seed)
    meta = []
    ext = "jpg" if image_format in ("jpeg", "jpg") else "png"
    with tfr.TFRecordWriter(path) as w:
        for i in range(num_images):
            n = rng.randint(1, max_objects + 1)
            image, boxes, classes = make_image_with_boxes(
                rng, height, width, n, num_classes, natural=natural)
            ps = rng.uniform(0.3, 1.0, len(classes)).astype(np.float32) \
                if pseudo_scores else None
            w.write(make_example(image, boxes, classes, str(i),
                                 f"img{i:06d}.{ext}", ps,
                                 image_format=image_format))
            meta.append(dict(source_id=str(i), boxes=boxes, classes=classes,
                             height=height, width=width))
    return meta
