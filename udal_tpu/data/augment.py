"""Data augmentation: RandAugment (detection-safe subset), GridMask, Mosaic,
weather/photometric corruptions.

Parity targets: `/root/reference/src/aug/autoaugment.py:1694-1910`
(randaug/v0 policies + albumentations weather bridge), `aug/gridmask.py:121`,
`aug/mosaic.py:235`, and the inference-time corruption ladders
(`src/add_corruption.py:15-149`). Implemented with numpy/cv2 on the host
input pipeline (color ops are cheap relative to decode); geometric ops keep
boxes consistent.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


def _blend(a: np.ndarray, b: np.ndarray, factor: float) -> np.ndarray:
    return np.clip(a.astype(np.float32) +
                   factor * (b.astype(np.float32) - a.astype(np.float32)),
                   0, 255).astype(np.uint8)


# -- color ops (image only) ---------------------------------------------------

def autocontrast(img: np.ndarray, _level: float) -> np.ndarray:
    out = img.astype(np.float32)
    for c in range(img.shape[-1]):
        lo, hi = out[..., c].min(), out[..., c].max()
        if hi > lo:
            out[..., c] = (out[..., c] - lo) * 255.0 / (hi - lo)
    return np.clip(out, 0, 255).astype(np.uint8)


def equalize(img: np.ndarray, _level: float) -> np.ndarray:
    import cv2

    out = img.copy()
    for c in range(img.shape[-1]):
        out[..., c] = cv2.equalizeHist(img[..., c])
    return out


def solarize(img: np.ndarray, level: float) -> np.ndarray:
    threshold = int(256 - level * 256 / 10)
    return np.where(img < threshold, img, 255 - img).astype(np.uint8)


def posterize(img: np.ndarray, level: float) -> np.ndarray:
    bits = max(1, 8 - int(level * 4 / 10))
    shift = 8 - bits
    return ((img >> shift) << shift).astype(np.uint8)


def color_jitter(img: np.ndarray, level: float) -> np.ndarray:
    gray = (img @ np.asarray([0.299, 0.587, 0.114]))[..., None]
    gray3 = np.repeat(gray, 3, -1).astype(np.uint8)
    return _blend(gray3, img, 0.1 + level * 1.8 / 10)


def contrast(img: np.ndarray, level: float) -> np.ndarray:
    mean = np.full_like(img, int(img.mean()))
    return _blend(mean, img, 0.1 + level * 1.8 / 10)


def brightness(img: np.ndarray, level: float) -> np.ndarray:
    return _blend(np.zeros_like(img), img, 0.1 + level * 1.8 / 10)


def sharpness(img: np.ndarray, level: float) -> np.ndarray:
    import cv2

    blurred = cv2.GaussianBlur(img, (3, 3), 0)
    return _blend(blurred, img, 0.1 + level * 1.8 / 10)


COLOR_OPS: Dict[str, Callable] = {
    "AutoContrast": autocontrast, "Equalize": equalize, "Solarize": solarize,
    "Posterize": posterize, "Color": color_jitter, "Contrast": contrast,
    "Brightness": brightness, "Sharpness": sharpness,
}


def randaugment(img: np.ndarray, boxes: np.ndarray,
                num_layers: int = 2, magnitude: float = 9.0,
                rng: Optional[np.random.RandomState] = None
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Detection RandAugment — color-op subset of
    `distort_image_with_randaugment` (`aug/autoaugment.py:1739-1806`); the
    box-geometry ops are covered by the pipeline's flip/scale jitter."""
    rng = rng or np.random.RandomState(0)
    names = list(COLOR_OPS)
    for _ in range(num_layers):
        op = names[rng.randint(len(names))]
        level = rng.uniform(0, magnitude)
        img = COLOR_OPS[op](img, level)
    return img, boxes


def gridmask(img: np.ndarray, ratio: float = 0.6, d_range=(32, 96),
             rotate: int = 0,
             rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    """GridMask: zero out a periodic grid — parity `aug/gridmask.py:121`."""
    rng = rng or np.random.RandomState(0)
    h, w = img.shape[:2]
    d = rng.randint(d_range[0], min(d_range[1], max(h, w, d_range[0] + 1)))
    keep = int(d * ratio)
    mask = np.ones((h, w), np.uint8)
    off_y, off_x = rng.randint(0, d, 2)
    ys = (np.arange(h) + off_y) % d >= keep
    xs = (np.arange(w) + off_x) % d >= keep
    mask[np.ix_(ys, xs)] = 0
    return img * mask[..., None]


def mosaic(samples: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
           out_size: Tuple[int, int],
           rng: Optional[np.random.RandomState] = None
           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """4-image mosaic preserving boxes — parity `aug/mosaic.py:235`."""
    import cv2

    rng = rng or np.random.RandomState(0)
    assert len(samples) == 4
    H, W = out_size
    cy = rng.randint(H // 4, 3 * H // 4)
    cx = rng.randint(W // 4, 3 * W // 4)
    canvas = np.zeros((H, W, 3), samples[0][0].dtype)
    quads = [(0, 0, cy, cx), (0, cx, cy, W), (cy, 0, H, cx), (cy, cx, H, W)]
    out_boxes, out_classes = [], []
    for (img, boxes, classes), (y1, x1, y2, x2) in zip(samples, quads):
        qh, qw = y2 - y1, x2 - x1
        scale_y = qh / img.shape[0]
        scale_x = qw / img.shape[1]
        canvas[y1:y2, x1:x2] = cv2.resize(img, (qw, qh))
        if len(boxes):
            b = boxes * np.asarray([scale_y, scale_x, scale_y, scale_x])
            b += np.asarray([y1, x1, y1, x1])
            area = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
            keep = area > 4
            out_boxes.append(b[keep])
            out_classes.append(classes[keep])
    boxes = np.concatenate(out_boxes) if out_boxes else np.zeros((0, 4))
    classes = np.concatenate(out_classes) if out_classes else np.zeros((0,))
    return canvas, boxes.astype(np.float32), classes


# -- weather / corruption ladders ---------------------------------------------

def add_weather(img: np.ndarray, weather_type: str,
                severity: float = 0.5,
                rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    """fog / rain / snow / noise — the albumentations bridge's op set
    (`add_corruption.py:86-149`) implemented directly."""
    import cv2

    rng = rng or np.random.RandomState(0)
    out = img.astype(np.float32)
    h, w = img.shape[:2]
    if weather_type == "fog":
        fog = np.full_like(out, 255.0)
        out = out * (1 - 0.5 * severity) + fog * (0.5 * severity)
    elif weather_type == "rain":
        streaks = np.zeros((h, w), np.float32)
        n = int(200 * severity) + 50
        xs = rng.randint(0, w, n)
        ys = rng.randint(0, max(h - 12, 1), n)
        for x, y in zip(xs, ys):
            streaks[y:y + 12, x] = 180
        streaks = cv2.GaussianBlur(streaks, (3, 3), 0)
        out = np.clip(out + streaks[..., None], 0, 255)
        out = cv2.GaussianBlur(out, (3, 3), 0)
    elif weather_type == "snow":
        flakes = (rng.rand(h, w) < 0.002 + 0.008 * severity).astype(np.float32)
        flakes = cv2.dilate(flakes, np.ones((2, 2)))
        out = np.clip(out + flakes[..., None] * 255, 0, 255)
        out = out * (1 - 0.2 * severity) + 255 * 0.2 * severity
    elif weather_type == "noise":
        out = out + rng.randn(h, w, 3) * 25 * severity
    elif weather_type == "sat":
        hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.float32)
        hsv[..., 1] = np.clip(hsv[..., 1] * (1 + severity), 0, 255)
        out = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB).astype(
            np.float32)
    else:
        raise ValueError(f"unknown weather {weather_type!r}")
    return np.clip(out, 0, 255).astype(np.uint8)


def apply_corruption(kind: str, img: np.ndarray,
                     severities: Sequence[float] = (0.2, 0.5, 0.8)
                     ) -> List[np.ndarray]:
    """Severity ladders for brightness/contrast/blur/noise/motion-blur —
    parity `add_corruption.py:15-83` (returns one image per severity)."""
    import cv2

    out = []
    for s in severities:
        if kind == "br":          # brightness
            out.append(np.clip(img.astype(np.float32) * (1 + s), 0,
                               255).astype(np.uint8))
        elif kind == "ct":        # contrast
            mean = img.mean()
            out.append(np.clip((img - mean) * (1 - s) + mean, 0,
                               255).astype(np.uint8))
        elif kind == "bl":        # gaussian blur
            k = 2 * int(1 + 4 * s) + 1
            out.append(cv2.GaussianBlur(img, (k, k), 0))
        elif kind == "ns":        # gaussian noise
            noisy = img + np.random.RandomState(0).randn(*img.shape) * 40 * s
            out.append(np.clip(noisy, 0, 255).astype(np.uint8))
        elif kind == "mb":        # motion blur
            k = max(3, int(15 * s))
            kernel = np.zeros((k, k), np.float32)
            kernel[k // 2, :] = 1.0 / k
            out.append(cv2.filter2D(img, -1, kernel))
        else:
            raise ValueError(f"unknown corruption {kind!r}")
    return out


def apply_policy(policy: Optional[str], img: np.ndarray, boxes: np.ndarray,
                 rng: Optional[np.random.RandomState] = None,
                 weather_mode: str = "subjective",
                 weather_save_path: Optional[str] = None
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Dispatch on config.autoaugment_policy ∈ {None, 'randaug', 'v0'..'v3',
    'test', 'albu'/'albumentations'} — parity with the reference policy
    switch (`dataloader.py:dataset_parser`, `aug/autoaugment.py:1694-1956`).

    'v0'–'v3'/'test' run the full AutoAugment detection policy tables;
    'albu' runs the weather bridge with optimal/random/subjective params
    (`weather_mode`, with per-dataset pickled optima under
    `weather_save_path` — ref `autoaugment.py:1772-1776`).
    """
    from udal_tpu.data import autoaugment as aa

    rng = rng or np.random.RandomState(0)
    if not policy:
        return img, boxes
    if policy == "randaug":
        return aa.distort_image_with_randaugment(img, boxes, rng=rng)
    if policy in aa.POLICIES:
        return aa.distort_image_with_autoaugment(img, boxes, policy, rng)
    if policy in ("albu", "albumentations"):
        return aa.distort_image_with_weather(
            img, boxes, mode=weather_mode, save_path=weather_save_path,
            rng=rng)
    raise ValueError(f"unknown policy {policy!r}")
