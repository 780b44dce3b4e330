"""EfficientDet assembled model (flax) with vmap-based MC-dropout sampling.

Parity target: `EfficientDetNet` (`/root/reference/src/efficientdet_keras.py:
850-1070`) — backbone → resample p6/p7 → BiFPN → class/box heads, raw
per-level outputs. The reference's MC-dropout inference runs a *Python loop*
of `mc_dropoutsamp` full forward passes inside `call`
(`efficientdet_keras.py:999-1024`); here MC sampling is `jax.vmap` over a
batch of dropout PRNG keys — one XLA program, the sample axis batched onto
the MXU. Deep-ensemble sampling reuses the same mechanism with vmap over
stacked parameter pytrees (see `mc.py`).
"""

from __future__ import annotations

import functools
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from udal_tpu.config import Config, get_feat_sizes, parse_image_size
from udal_tpu.models.bifpn import FPNCells, ResampleFeatureMap
from udal_tpu.models.efficientnet import EfficientNet, backbone_spec
from udal_tpu.models.heads import BoxNet, ClassNet, SegmentationHead


class EfficientDetNet(nn.Module):
    """Backbone + BiFPN + heads; returns (cls_outputs, box_outputs) lists.

    `method="features"` exposes the FPN feature maps and
    `method="heads"` runs only the prediction heads — used to factor MC
    sampling when dropout is confined to the heads (the reference's
    mc_classheadrate / mc_boxheadrate mode): the backbone+BiFPN run once and
    only the heads are vmapped over sample keys.
    """
    config: Config
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        min_level, max_level = cfg.min_level, cfg.max_level
        num_levels = max_level - min_level + 1
        feat_sizes = get_feat_sizes(cfg.image_size, max_level)
        feat_hw = tuple((feat_sizes[l]["height"], feat_sizes[l]["width"])
                        for l in range(min_level, max_level + 1))
        self._feat_sizes = feat_sizes

        mc_boxrate = mc_clsrate = mc_backbone = 0.0
        if cfg.mc_dropout:
            mc_boxrate = cfg.mc_boxheadrate or cfg.mc_dropoutrate
            mc_clsrate = cfg.mc_classheadrate or cfg.mc_dropoutrate
            mc_backbone = cfg.mc_dropoutrate

        survival_prob = cfg.survival_prob
        if "b0" in cfg.backbone_name:
            survival_prob = 0.0  # parity: `efficientdet_keras.py:872-873`
        spec = backbone_spec(cfg.backbone_name,
                             survival_prob=survival_prob or None)
        self.backbone = EfficientNet(
            spec, act_type=cfg.act_type, axis_name=self.bn_axis_name,
            mc_dropoutrate=mc_backbone, include_top=False, dtype=self.dtype,
            name="backbone")
        self.resample_layers = [ResampleFeatureMap(
            cfg.fpn_num_filters, cfg.apply_bn_for_resampling,
            self.bn_axis_name, self.dtype, name=f"resample_p{level}")
            for level in range(6, max_level + 1)]
        self.fpn_cells = FPNCells(
            min_level, max_level, feat_hw, cfg.fpn_num_filters,
            cfg.fpn_cell_repeats,
            fpn_name=cfg.fpn_name,
            weight_method=cfg.fpn_weight_method or "fastattn",
            act_type=cfg.act_type,
            conv_bn_act_pattern=cfg.conv_bn_act_pattern,
            separable_conv=cfg.separable_conv,
            apply_bn_for_resampling=cfg.apply_bn_for_resampling,
            fused_sepconv=bool(cfg.get("fused_sepconv", False)),
            bn_axis_name=self.bn_axis_name, dtype=self.dtype,
            name="fpn_cells")

        num_anchors = len(cfg.aspect_ratios) * cfg.num_scales
        if "object_detection" in cfg.heads:
            self.class_net = ClassNet(
                num_classes=cfg.num_classes, num_anchors=num_anchors,
                num_filters=cfg.fpn_num_filters, num_levels=num_levels,
                repeats=cfg.box_class_repeats,
                separable_conv=cfg.separable_conv, act_type=cfg.act_type,
                survival_prob=cfg.survival_prob, mc_dropoutrate=mc_clsrate,
                fused_sepconv=bool(cfg.get("fused_sepconv", False)),
                bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                name="class_net")
            # loss attenuation doubles the box output to 8·A (μ, σ)
            extend = 2 * num_anchors if cfg.loss_attenuation else num_anchors
            self.box_net = BoxNet(
                num_anchors=extend, num_filters=cfg.fpn_num_filters,
                num_levels=num_levels, repeats=cfg.box_class_repeats,
                separable_conv=cfg.separable_conv, act_type=cfg.act_type,
                survival_prob=cfg.survival_prob, mc_dropoutrate=mc_boxrate,
                fused_sepconv=bool(cfg.get("fused_sepconv", False)),
                bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                name="box_net")
        if "segmentation" in cfg.heads:
            self.seg_head = SegmentationHead(
                cfg.seg_num_classes, cfg.fpn_num_filters, num_levels,
                cfg.act_type, self.bn_axis_name, self.dtype, name="seg_head")

    def features(self, images: jnp.ndarray, train: bool = False,
                 start_block: int = 0, start_in_expanded: bool = False):
        """Backbone → extra-level resampling → BiFPN feature maps."""
        cfg = self.config
        backbone_outs = self.backbone(images, train, start_block=start_block,
                                      start_in_expanded=start_in_expanded)
        # [features, r1..r5] — levels 3..5 are reductions 3..5
        feats = list(backbone_outs[cfg.min_level:cfg.max_level + 1])
        for i, level in enumerate(range(6, cfg.max_level + 1)):
            fs = self._feat_sizes[level]
            feats.append(self.resample_layers[i](
                feats[-1], fs["height"], fs["width"], train))
        return self.fpn_cells(feats, train)

    def predict_heads(self, feats, train: bool = False):
        """Class/box/segmentation heads over the FPN feature maps."""
        cfg = self.config
        outputs = []
        if "object_detection" in cfg.heads:
            outputs.append(self.class_net(feats, train))
            outputs.append(self.box_net(feats, train))
        if "segmentation" in cfg.heads:
            outputs.append(self.seg_head(feats, train))
        return tuple(outputs)

    def __call__(self, images: jnp.ndarray, train: bool = False):
        return self.predict_heads(self.features(images, train), train)

    def forward_from_block1(self, x, train: bool = False):
        """Forward from the block-1 input — the per-sample part of the fast
        MC path (models/mc_fast.py); the stem + block 0 run once outside."""
        return self.predict_heads(
            self.features(x, train, start_block=1), train)

    def forward_from_block1_expanded(self, x, train: bool = False):
        """Forward from block 1's post-dropout *expanded* tensor — the fast
        MC path emits it directly from the fused block0-tail ⊕ block1-expand
        matmul, skipping the narrow (lane-padded) block-0 output entirely."""
        return self.predict_heads(
            self.features(x, train, start_block=1, start_in_expanded=True),
            train)


def mc_forward(model: EfficientDetNet, variables, images: jnp.ndarray,
               key: jax.Array, num_samples: int,
               train: bool = False) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """MC-dropout forward: vmap over `num_samples` dropout keys.

    Replaces the reference's Python loop of full forward passes
    (`efficientdet_keras.py:999-1024`). Returns per-level lists with a
    leading sample axis: cls/box tensors of shape [T, B, H, W, C].

    When dropout is confined to the heads (mc_classheadrate/mc_boxheadrate
    without mc_dropoutrate) the backbone+BiFPN run ONCE and only the heads
    are vmapped — an optimization the reference's full-forward loop can't
    express.
    """
    cfg = model.config
    keys = jax.random.split(key, num_samples)
    head_only = bool(cfg.mc_dropout) and not cfg.mc_dropoutrate and \
        bool(cfg.mc_classheadrate or cfg.mc_boxheadrate)

    if head_only:
        feats = model.apply(variables, images, train,
                            method=EfficientDetNet.features)

        def heads_pass(k):
            return model.apply(variables, feats, train,
                               method=EfficientDetNet.predict_heads,
                               rngs={"dropout": k})

        return jax.vmap(heads_pass)(keys)

    from udal_tpu.models.mc_fast import fast_mc_eligible, mc_forward_fast
    if not train and fast_mc_eligible(cfg, variables):
        # shared-prefix hoist + exact block-0 fold (see models/mc_fast.py)
        return mc_forward_fast(model, variables, images, key, num_samples,
                               train)

    def one_pass(k):
        return model.apply(variables, images, train=train,
                           rngs={"dropout": k})

    return jax.vmap(one_pass)(keys)


class EfficientDetModel(EfficientDetNet):
    """EfficientDetNet + pre/post-processing in one module call.

    API parity with the reference `EfficientDetModel`
    (`efficientdet_keras.py:1073-1146`): ``__call__(raw_images)`` runs
    normalize/resize → network → global NMS postprocess and returns the
    packed detection tuple. (The serving stack uses `apps.serving.
    ServingDriver`, which jits the same program with key management.)
    """

    def __call__(self, raw_images: jnp.ndarray, train: bool = False,
                 pre_mode: Optional[str] = "infer",
                 post_mode: Optional[str] = "global"):
        from udal_tpu.ops.postprocess import (per_class_nms,
                                              postprocess_global)

        cfg = self.config
        scales = None
        images = raw_images
        if pre_mode == "infer":
            images, scales = preprocess_images(raw_images, cfg.image_size,
                                               cfg.mean_rgb, cfg.stddev_rgb)
            images = images.astype(self.dtype)
        outs = super().__call__(images, train)
        if post_mode is None or "object_detection" not in cfg.heads:
            return outs
        fn = postprocess_global if post_mode == "global" else per_class_nms
        det = fn(cfg, list(outs[0]), list(outs[1]), image_scales=scales)
        return det.packed() + tuple(outs[2:])


def preprocess_images(raw_images: jnp.ndarray, image_size, mean_rgb, stddev_rgb
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """uint8 images → normalized, aspect-preserving resized batch + scales.

    Parity: `EfficientDetModel._preprocessing` + `DetectionInputProcessor`
    (`efficientdet_keras.py:1076-1100`, `dataloader.py:35-248`): normalize
    with RGB mean/std, scale by min(out/in) keeping aspect ratio, place at
    the top-left of the padded canvas. Returns (images, scale_to_original).
    """
    h_out, w_out = parse_image_size(image_size)
    b, h_in, w_in = raw_images.shape[0], raw_images.shape[1], raw_images.shape[2]
    x = raw_images.astype(jnp.float32)
    mean = jnp.asarray(mean_rgb, jnp.float32).reshape(1, 1, 1, -1)
    std = jnp.asarray(stddev_rgb, jnp.float32).reshape(1, 1, 1, -1)
    x = (x - mean) / std

    scale = min(h_out / h_in, w_out / w_in)
    scaled_h, scaled_w = int(h_in * scale), int(w_in * scale)
    x = jax.image.resize(x, (b, scaled_h, scaled_w, x.shape[-1]), "bilinear")
    x = jnp.pad(x, ((0, 0), (0, h_out - scaled_h), (0, w_out - scaled_w), (0, 0)))
    image_scale = jnp.full((b,), 1.0 / scale, jnp.float32)
    return x, image_scale
