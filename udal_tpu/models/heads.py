"""Class / Box / Segmentation prediction heads in flax.linen.

Parity with the reference heads (`/root/reference/src/efficientdet_keras.py:
353-764`): `box_class_repeats` conv→BN→act blocks with convs *shared across
pyramid levels* but per-(repeat, level) BatchNorms, separable convs with
variance-scaling init, the focal-loss prior bias on the class logits, MC
dropout (channel-wise, always-on) after each activation, and the
loss-attenuation channel doubling of the box head
(`efficientdet_keras.py:936-941`: 8·A channels = per-anchor (μ, σ)).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from udal_tpu.models.bifpn import SeparableConv
from udal_tpu.models.efficientnet import (BatchNorm, activation_fn,
                                          spatial_dropout)

_var_scaling = nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal")
_normal_001 = nn.initializers.normal(stddev=0.01)
# focal-loss prior: P(foreground) = 0.01 at init
_class_bias = nn.initializers.constant(-math.log((1 - 0.01) / 0.01))


class _HeadStack(nn.Module):
    """Shared conv tower applied per level with per-(repeat, level) BN."""
    num_levels: int
    num_filters: int
    repeats: int
    prefix: str
    separable_conv: bool = True
    act_type: str = "swish"
    survival_prob: Optional[float] = None
    mc_dropoutrate: float = 0.0
    fused_sepconv: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        convs = []
        bns = []
        for i in range(self.repeats):
            if self.separable_conv:
                convs.append(SeparableConv(
                    self.num_filters, 3, use_bias=True, dtype=self.dtype,
                    depthwise_init=_var_scaling, pointwise_init=_var_scaling,
                    fuse_full=self.fused_sepconv,
                    name=f"{self.prefix}-{i}"))
            else:
                convs.append(nn.Conv(
                    self.num_filters, (3, 3), padding="SAME",
                    kernel_init=_normal_001, dtype=self.dtype,
                    name=f"{self.prefix}-{i}"))
            bns.append([BatchNorm(axis_name=self.bn_axis_name, dtype=self.dtype,
                                  name=f"{self.prefix}-{i}-bn-{l}")
                        for l in range(self.num_levels)])
        self.convs = convs
        self.bns = bns

    def __call__(self, feat: jnp.ndarray, level_id: int, train: bool):
        act = activation_fn(self.act_type)
        mc = self.mc_dropoutrate > 0.0
        x = feat
        for i in range(self.repeats):
            original = x
            x = self.convs[i](x)
            x = self.bns[i][level_id](x, train)
            x = act(x)
            x = spatial_dropout(self, x, self.mc_dropoutrate, mc)
            if i > 0 and self.survival_prob:
                # Residual with stochastic depth — parity with head drop
                # connect (`efficientdet_keras.py:462-465`); detection
                # defaults leave survival_prob unset.
                x = x + original
        return x


class ClassNet(nn.Module):
    """Per-level class logits: [B, H, W, A * num_classes]."""
    num_classes: int
    num_anchors: int
    num_filters: int
    num_levels: int
    repeats: int = 4
    separable_conv: bool = True
    act_type: str = "swish"
    survival_prob: Optional[float] = None
    mc_dropoutrate: float = 0.0
    fused_sepconv: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        self.stack = _HeadStack(self.num_levels, self.num_filters, self.repeats,
                                "class", self.separable_conv, self.act_type,
                                self.survival_prob, self.mc_dropoutrate,
                                self.fused_sepconv,
                                self.bn_axis_name, self.dtype, name="stack")
        out_ch = self.num_classes * self.num_anchors
        if self.separable_conv:
            self.predict = SeparableConv(out_ch, 3, use_bias=True,
                                         dtype=self.dtype,
                                         depthwise_init=_var_scaling,
                                         pointwise_init=_var_scaling,
                                         bias_init=_class_bias,
                                         fuse_full=self.fused_sepconv,
                                         name="class-predict")
        else:
            self.predict = nn.Conv(out_ch, (3, 3), padding="SAME",
                                   kernel_init=_normal_001,
                                   bias_init=_class_bias, dtype=self.dtype,
                                   name="class-predict")

    def __call__(self, feats: Sequence[jnp.ndarray], train: bool) -> List[jnp.ndarray]:
        return [self.predict(self.stack(f, i, train)) for i, f in enumerate(feats)]


class BoxNet(nn.Module):
    """Per-level box regression: [B, H, W, 4 * A] (or 8·A with attenuation)."""
    num_anchors: int            # pass 2*A for loss attenuation (μ, σ doubling)
    num_filters: int
    num_levels: int
    repeats: int = 4
    separable_conv: bool = True
    act_type: str = "swish"
    survival_prob: Optional[float] = None
    mc_dropoutrate: float = 0.0
    fused_sepconv: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        self.stack = _HeadStack(self.num_levels, self.num_filters, self.repeats,
                                "box", self.separable_conv, self.act_type,
                                self.survival_prob, self.mc_dropoutrate,
                                self.fused_sepconv,
                                self.bn_axis_name, self.dtype, name="stack")
        out_ch = 4 * self.num_anchors
        if self.separable_conv:
            self.predict = SeparableConv(out_ch, 3, use_bias=True,
                                         dtype=self.dtype,
                                         depthwise_init=_var_scaling,
                                         pointwise_init=_var_scaling,
                                         fuse_full=self.fused_sepconv,
                                         name="box-predict")
        else:
            self.predict = nn.Conv(out_ch, (3, 3), padding="SAME",
                                   kernel_init=_normal_001, dtype=self.dtype,
                                   name="box-predict")

    def __call__(self, feats: Sequence[jnp.ndarray], train: bool) -> List[jnp.ndarray]:
        return [self.predict(self.stack(f, i, train)) for i, f in enumerate(feats)]


class SegmentationHead(nn.Module):
    """Transposed-conv decoder head (`efficientdet_keras.py:695-764`)."""
    num_classes: int
    num_filters: int
    num_levels: int
    act_type: str = "swish"
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool):
        act = activation_fn(self.act_type)
        x = feats[-1]
        # decode from the coarsest level up, fusing finer levels
        for i, feat in enumerate(reversed(feats[:-1])):
            x = nn.ConvTranspose(self.num_filters, (3, 3), strides=(2, 2),
                                 padding="SAME", dtype=self.dtype,
                                 name=f"up{i}")(x)
            x = BatchNorm(axis_name=self.bn_axis_name, dtype=self.dtype,
                          name=f"bn{i}")(x, train)
            x = act(x)
            x = x + feat
        return nn.ConvTranspose(self.num_classes, (3, 3), strides=(2, 2),
                                padding="SAME", dtype=self.dtype,
                                name="logits")(x)
