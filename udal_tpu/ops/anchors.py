"""Multi-scale anchor generation and box decoding (JAX, TPU-native).

Functional re-design of the reference anchor machinery
(`/root/reference/src/anchors.py:41-240`): anchors are generated once on the
host with numpy (static shapes per config), while decoding runs on-device as
pure jittable functions operating on the flat ``[N, 4]`` anchor tensor.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

from udal_tpu.config import get_feat_sizes, parse_image_size

# Reference caps pre-NMS candidates at 5000 (`anchors.py:38`).
MAX_DETECTION_POINTS = 5000


class Anchors:
    """Multiscale anchor grid.

    Same box layout as the reference: per level (min..max), for every spatial
    location the ``num_scales * len(aspect_ratios)`` anchors are interleaved
    per location, levels concatenated to a flat ``[N, 4]`` (y1, x1, y2, x2)
    tensor in input-image pixel coordinates.
    """

    def __init__(self, min_level: int, max_level: int, num_scales: int,
                 aspect_ratios: Sequence[Union[float, Sequence[float]]],
                 anchor_scale: Union[float, Sequence[float]],
                 image_size: Union[int, str, Tuple[int, int]]):
        self.min_level = min_level
        self.max_level = max_level
        self.num_scales = num_scales
        self.aspect_ratios = list(aspect_ratios)
        n_levels = max_level - min_level + 1
        if isinstance(anchor_scale, (list, tuple)):
            assert len(anchor_scale) == n_levels
            self.anchor_scales = list(anchor_scale)
        else:
            self.anchor_scales = [anchor_scale] * n_levels
        self.image_size = parse_image_size(image_size)
        self.feat_sizes = get_feat_sizes(image_size, max_level)
        self.boxes_np = self._generate_boxes()

    @property
    def boxes(self) -> jnp.ndarray:
        """Anchor tensor as a jax array.

        Materialized from numpy on every access: Anchors objects are cached
        across jit traces (`from_config`), so holding a jnp array created
        inside one trace would leak tracers into the next.
        """
        return jnp.asarray(self.boxes_np)

    def _level_configs(self, level: int):
        """(stride_yx, octave, aspect, scale) per anchor shape on a level."""
        f0, fl = self.feat_sizes[0], self.feat_sizes[level]
        stride = (f0["height"] / float(fl["height"]), f0["width"] / float(fl["width"]))
        out = []
        for octave in range(self.num_scales):
            for aspect in self.aspect_ratios:
                out.append((stride, octave / float(self.num_scales), aspect,
                            self.anchor_scales[level - self.min_level]))
        return out

    def _generate_boxes(self) -> np.ndarray:
        boxes_all: List[np.ndarray] = []
        for level in range(self.min_level, self.max_level + 1):
            boxes_level = []
            for (stride, octave, aspect, scale) in self._level_configs(level):
                base_x = scale * stride[1] * 2.0 ** octave
                base_y = scale * stride[0] * 2.0 ** octave
                if isinstance(aspect, (list, tuple)):
                    aspect_x, aspect_y = aspect
                else:
                    aspect_x = np.sqrt(aspect)
                    aspect_y = 1.0 / aspect_x
                half_x = base_x * aspect_x / 2.0
                half_y = base_y * aspect_y / 2.0
                x = np.arange(stride[1] / 2, self.image_size[1], stride[1])
                y = np.arange(stride[0] / 2, self.image_size[0], stride[0])
                xv, yv = np.meshgrid(x, y)
                xv, yv = xv.reshape(-1), yv.reshape(-1)
                boxes = np.stack([yv - half_y, xv - half_x, yv + half_y, xv + half_x],
                                 axis=1)
                boxes_level.append(boxes[:, None, :])
            # [locations, anchors_per_loc, 4] -> interleave per location
            boxes_all.append(np.concatenate(boxes_level, axis=1).reshape(-1, 4))
        return np.vstack(boxes_all).astype(np.float32)

    def get_anchors_per_location(self) -> int:
        return self.num_scales * len(self.aspect_ratios)

    def level_slices(self) -> Dict[int, Tuple[int, int]]:
        """Flat [start, end) index range of each pyramid level's anchors."""
        out = {}
        count = 0
        a = self.get_anchors_per_location()
        for level in range(self.min_level, self.max_level + 1):
            fs = self.feat_sizes[level]
            steps = fs["height"] * fs["width"] * a
            out[level] = (count, count + steps)
            count += steps
        return out


@functools.lru_cache(maxsize=16)
def _cached_anchors(min_level, max_level, num_scales, aspect_ratios, anchor_scale,
                    image_size) -> Anchors:
    return Anchors(min_level, max_level, num_scales, list(aspect_ratios),
                   anchor_scale, image_size)


def from_config(config) -> Anchors:
    """Build (cached) anchors from a detection Config."""
    ar = tuple(tuple(a) if isinstance(a, (list, tuple)) else a
               for a in config.aspect_ratios)
    scale = config.anchor_scale
    if isinstance(scale, list):
        scale = tuple(scale)
    return _cached_anchors(config.min_level, config.max_level, config.num_scales,
                           ar, scale, parse_image_size(config.image_size))


def anchors_to_centersize(anchor_boxes: jnp.ndarray):
    """(ycenter, xcenter, h, w) of corner-encoded anchors."""
    ycenter_a = (anchor_boxes[..., 0] + anchor_boxes[..., 2]) / 2
    xcenter_a = (anchor_boxes[..., 1] + anchor_boxes[..., 3]) / 2
    ha = anchor_boxes[..., 2] - anchor_boxes[..., 0]
    wa = anchor_boxes[..., 3] - anchor_boxes[..., 1]
    return ycenter_a, xcenter_a, ha, wa


def decode_box_outputs(pred_boxes: jnp.ndarray, anchor_boxes: jnp.ndarray) -> jnp.ndarray:
    """Decode (ty, tx, th, tw) regression targets to absolute (y1, x1, y2, x2).

    Parity: `anchors.py:41-77`. Pure elementwise math — fuses into the
    surrounding XLA program; broadcasting supports arbitrary leading axes
    (batch, MC-sample) over the anchor dimension.
    """
    anchor_boxes = anchor_boxes.astype(pred_boxes.dtype)
    ycenter_a, xcenter_a, ha, wa = anchors_to_centersize(anchor_boxes)
    ty, tx, th, tw = jnp.moveaxis(pred_boxes, -1, 0)
    w = jnp.exp(tw) * wa
    h = jnp.exp(th) * ha
    ycenter = ty * ha + ycenter_a
    xcenter = tx * wa + xcenter_a
    return jnp.stack([ycenter - h / 2.0, xcenter - w / 2.0,
                      ycenter + h / 2.0, xcenter + w / 2.0], axis=-1)


def encode_box_targets(gt_boxes: jnp.ndarray, anchor_boxes: jnp.ndarray,
                       eps: float = 1e-8) -> jnp.ndarray:
    """Inverse of :func:`decode_box_outputs` — FasterRCNN box coding.

    Parity: `object_detection_efficientdet/faster_rcnn_box_coder.py:38-87`
    (with scale_factors=None as used by the reference AnchorLabeler).
    """
    ycenter_a, xcenter_a, ha, wa = anchors_to_centersize(anchor_boxes)
    ycenter_g = (gt_boxes[..., 0] + gt_boxes[..., 2]) / 2
    xcenter_g = (gt_boxes[..., 1] + gt_boxes[..., 3]) / 2
    hg = gt_boxes[..., 2] - gt_boxes[..., 0]
    wg = gt_boxes[..., 3] - gt_boxes[..., 1]
    # epsilon guards match the reference coder's EPSILON = 1e-8
    ha = ha + eps
    wa = wa + eps
    hg = hg + eps
    wg = wg + eps
    ty = (ycenter_g - ycenter_a) / ha
    tx = (xcenter_g - xcenter_a) / wa
    th = jnp.log(hg / ha)
    tw = jnp.log(wg / wa)
    return jnp.stack([ty, tx, th, tw], axis=-1)
