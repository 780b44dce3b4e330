"""EfficientNet backbone in flax.linen — TPU-native rebuild.

Architecture parity with the reference Keras implementation
(`/root/reference/src/backbone/efficientnet_model.py`,
`efficientnet_builder.py`, `efficientnet_lite_builder.py`): same block
decode strings, width/depth rounding, SE layout, stem/head, and the
MC-dropout hooks (channel-wise SpatialDropout inside every MBConv when
enabled — `efficientnet_model.py:301-304,453-463`).

TPU-first differences:
* dropout is driven by explicit `jax.random` keys (the 'dropout' rng
  collection) instead of always-on Keras layers, so MC sampling is a `vmap`
  over keys;
* BatchNorm supports `axis_name` for cross-replica moment aggregation under
  `shard_map`/`pmap` (replaces TpuBatchNormalization, `utils.py:186-227`);
* NHWC, bf16-friendly: pass `dtype=jnp.bfloat16` for MXU-optimal compute.

Trainable parameter counts match the reference goldens
(`efficientnet_builder_test.py:46-60`, b0=5,288,548 …).
"""

from __future__ import annotations

import dataclasses
import math
import re
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# ---------------------------------------------------------------------------
# Block args / scaling math
# ---------------------------------------------------------------------------

# Standard EfficientNet architecture notation (public, from the paper repos).
DEFAULT_BLOCKS_ARGS = [
    "r1_k3_s11_e1_i32_o16_se0.25", "r2_k3_s22_e6_i16_o24_se0.25",
    "r2_k5_s22_e6_i24_o40_se0.25", "r3_k3_s22_e6_i40_o80_se0.25",
    "r3_k5_s11_e6_i80_o112_se0.25", "r4_k5_s22_e6_i112_o192_se0.25",
    "r1_k3_s11_e6_i192_o320_se0.25",
]

# (width_coefficient, depth_coefficient, resolution, dropout_rate)
EFFICIENTNET_PARAMS = {
    "efficientnet-b0": (1.0, 1.0, 224, 0.2),
    "efficientnet-b1": (1.0, 1.1, 240, 0.2),
    "efficientnet-b2": (1.1, 1.2, 260, 0.3),
    "efficientnet-b3": (1.2, 1.4, 300, 0.3),
    "efficientnet-b4": (1.4, 1.8, 380, 0.4),
    "efficientnet-b5": (1.6, 2.2, 456, 0.4),
    "efficientnet-b6": (1.8, 2.6, 528, 0.5),
    "efficientnet-b7": (2.0, 3.1, 600, 0.5),
    "efficientnet-b8": (2.2, 3.6, 672, 0.5),
    "efficientnet-l2": (4.3, 5.3, 800, 0.5),
}

EFFICIENTNET_LITE_PARAMS = {
    "efficientnet-lite0": (1.0, 1.0, 224, 0.2),
    "efficientnet-lite1": (1.0, 1.1, 240, 0.2),
    "efficientnet-lite2": (1.1, 1.2, 260, 0.3),
    "efficientnet-lite3": (1.2, 1.4, 280, 0.3),
    "efficientnet-lite4": (1.4, 1.8, 300, 0.3),
}


@dataclasses.dataclass(frozen=True)
class BlockArgs:
    kernel_size: int
    num_repeat: int
    input_filters: int
    output_filters: int
    expand_ratio: int
    id_skip: bool
    se_ratio: Optional[float]
    strides: Tuple[int, int]


def decode_block_string(s: str) -> BlockArgs:
    ops = s.split("_")
    options = {}
    for op in ops:
        splits = re.split(r"(\d.*)", op)
        if len(splits) >= 2:
            options[splits[0]] = splits[1]
    return BlockArgs(
        kernel_size=int(options["k"]),
        num_repeat=int(options["r"]),
        input_filters=int(options["i"]),
        output_filters=int(options["o"]),
        expand_ratio=int(options["e"]),
        id_skip="noskip" not in s,
        se_ratio=float(options["se"]) if "se" in options else None,
        strides=(int(options["s"][0]), int(options["s"][1])),
    )


def round_filters(filters: int, width_coefficient: Optional[float],
                  depth_divisor: int = 8, min_depth: Optional[int] = None,
                  skip: bool = False) -> int:
    """Width scaling — parity `efficientnet_model.py:162-176`."""
    if skip or not width_coefficient:
        return filters
    filters *= width_coefficient
    min_depth = min_depth or depth_divisor
    new_filters = max(min_depth,
                      int(filters + depth_divisor / 2) // depth_divisor * depth_divisor)
    if new_filters < 0.9 * filters:
        new_filters += depth_divisor
    return int(new_filters)


def round_repeats(repeats: int, depth_coefficient: Optional[float],
                  skip: bool = False) -> int:
    if skip or not depth_coefficient:
        return repeats
    return int(math.ceil(depth_coefficient * repeats))


@dataclasses.dataclass(frozen=True)
class BackboneSpec:
    """Fully-resolved (scaled) backbone architecture."""
    blocks: Tuple[BlockArgs, ...]
    stem_filters: int
    head_filters: int
    dropout_rate: float
    use_se: bool
    num_classes: int = 1000
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    survival_prob: Optional[float] = None


def backbone_spec(model_name: str, survival_prob: Optional[float] = None,
                  num_classes: int = 1000) -> BackboneSpec:
    """Resolve a model name to a scaled block list."""
    lite = "lite" in model_name
    table = EFFICIENTNET_LITE_PARAMS if lite else EFFICIENTNET_PARAMS
    width, depth, _, dropout = table[model_name]
    raw = [decode_block_string(s) for s in DEFAULT_BLOCKS_ARGS]
    blocks: List[BlockArgs] = []
    for i, b in enumerate(raw):
        fix = lite and (i == 0 or i == len(raw) - 1)
        blocks.append(dataclasses.replace(
            b,
            input_filters=round_filters(b.input_filters, width),
            output_filters=round_filters(b.output_filters, width),
            num_repeat=round_repeats(b.num_repeat, depth, skip=fix),
        ))
    return BackboneSpec(
        blocks=tuple(blocks),
        stem_filters=round_filters(32, width, skip=lite),
        head_filters=round_filters(1280, width, skip=lite),
        dropout_rate=dropout,
        use_se=not lite,
        num_classes=num_classes,
        survival_prob=survival_prob,
    )


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------

conv_kernel_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
dense_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_out", "uniform")


def activation_fn(act_type: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Parity with `utils.py:42-59` activation registry."""
    if act_type in ("swish", "silu"):
        return jax.nn.silu
    if act_type == "swish_native":
        return jax.nn.silu
    if act_type == "relu":
        return jax.nn.relu
    if act_type == "relu6":
        return jax.nn.relu6
    if act_type == "hswish":
        return jax.nn.hard_swish
    if act_type == "mish":
        return lambda x: x * jnp.tanh(jax.nn.softplus(x))
    if act_type == "identity":
        return lambda x: x
    raise ValueError(f"Unsupported act_type {act_type!r}")


class BatchNorm(nn.Module):
    """BatchNorm with optional cross-replica moment aggregation.

    `axis_name` + `axis_index_groups` replaces the reference's
    TpuBatchNormalization / SyncBatchNormalization (`utils.py:186-269`) —
    flax computes batch statistics with `lax.pmean` over the named mesh axis.
    """
    momentum: float = 0.99
    epsilon: float = 1e-3
    axis_name: Optional[str] = None
    axis_index_groups: Optional[Any] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis_name=self.axis_name if train else None,
            axis_index_groups=self.axis_index_groups if train else None,
            dtype=self.dtype,
            name="bn",
        )(x)


def spatial_dropout(module: nn.Module, x: jnp.ndarray, rate: float,
                    active: bool) -> jnp.ndarray:
    """Channel-wise (spatial) dropout, always-on when `active`.

    Mirrors Keras SpatialDropout2D(training=True) used for MC-dropout
    (`efficientnet_model.py:453-463`): entire feature maps are dropped.
    Implemented inline (no submodule) so it works in setup-style methods;
    the mask broadcasts over H, W — one bernoulli per (batch, channel).
    """
    if rate <= 0.0 or not active:
        return x
    rng = module.make_rng("dropout")
    keep = 1.0 - rate
    mask_shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
    mask = jax.random.bernoulli(rng, keep, mask_shape)
    # plain multiply (not select) — fuses into neighbouring convs without
    # forcing a layout change, measured ~2% faster end to end on v5e
    return x * (mask.astype(x.dtype) / jnp.asarray(keep, x.dtype))


def drop_connect(x: jnp.ndarray, rng, survival_prob: float) -> jnp.ndarray:
    """Stochastic depth on the residual branch (`utils.py` drop_connect)."""
    batch = x.shape[0]
    keep = jax.random.bernoulli(rng, survival_prob, (batch,) + (1,) * (x.ndim - 1))
    return x / survival_prob * keep.astype(x.dtype)


class SqueezeExcite(nn.Module):
    se_filters: int
    output_filters: int
    act: Callable
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        se = jnp.mean(x, axis=(1, 2), keepdims=True)
        se = nn.Conv(self.se_filters, (1, 1), padding="SAME",
                     kernel_init=conv_kernel_init, dtype=self.dtype,
                     name="reduce")(se)
        se = self.act(se)
        se = nn.Conv(self.output_filters, (1, 1), padding="SAME",
                     kernel_init=conv_kernel_init, dtype=self.dtype,
                     name="expand")(se)
        return jax.nn.sigmoid(se) * x


class MBConvBlock(nn.Module):
    """Mobile inverted residual bottleneck with optional SE + MC dropout."""
    block_args: BlockArgs
    act_type: str = "swish"
    use_se: bool = True
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    axis_name: Optional[str] = None
    mc_dropoutrate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, survival_prob: Optional[float] = None,
                 pre_expanded: bool = False):
        """`pre_expanded=True` treats `x` as the post-dropout expanded
        tensor (after expand_conv/bn0/act/dropout) — the entry used by the
        fast MC path, which emits that tensor directly from a fused packed
        matmul (models/mc_fast.py). Only valid for blocks without a
        residual skip into the expanded domain (callers must not request it
        for id_skip blocks, where `inputs` would be undefined)."""
        a = self.block_args
        act = activation_fn(self.act_type)
        bn = lambda name: BatchNorm(self.bn_momentum, self.bn_epsilon,
                                    self.axis_name, dtype=self.dtype, name=name)
        inputs = x
        mc = self.mc_dropoutrate > 0.0

        if a.expand_ratio != 1 and not pre_expanded:
            x = nn.Conv(a.input_filters * a.expand_ratio, (1, 1), padding="SAME",
                        use_bias=False, kernel_init=conv_kernel_init,
                        dtype=self.dtype, name="expand_conv")(x)
            x = act(bn("bn0")(x, train))
            x = spatial_dropout(self, x, self.mc_dropoutrate, mc)

        # Depthwise conv acts on the *actual* channel count; with a fixed
        # (lite) stem this can differ from the rounded block_args filters —
        # TF DepthwiseConv2D has the same actual-channels semantics.
        filters = x.shape[-1]
        x = nn.Conv(filters, (a.kernel_size, a.kernel_size), strides=a.strides,
                    padding="SAME", feature_group_count=filters, use_bias=False,
                    kernel_init=conv_kernel_init, dtype=self.dtype,
                    name="depthwise_conv")(x)
        x = act(bn("bn1")(x, train))
        x = spatial_dropout(self, x, self.mc_dropoutrate, mc)

        if self.use_se and a.se_ratio and 0 < a.se_ratio <= 1:
            se_filters = max(1, int(a.input_filters * a.se_ratio))
            x = SqueezeExcite(se_filters, filters, act, self.dtype, name="se")(x)

        x = nn.Conv(a.output_filters, (1, 1), padding="SAME", use_bias=False,
                    kernel_init=conv_kernel_init, dtype=self.dtype,
                    name="project_conv")(x)
        x = bn("bn2")(x, train)

        if (a.id_skip and all(s == 1 for s in a.strides)
                and a.input_filters == a.output_filters):
            if train and survival_prob:
                rng = self.make_rng("dropout")
                x = drop_connect(x, rng, survival_prob)
            x = x + inputs
        return x


class EfficientNet(nn.Module):
    """EfficientNet feature extractor (+ optional classification head)."""
    spec: BackboneSpec
    act_type: str = "swish"
    axis_name: Optional[str] = None
    mc_dropoutrate: float = 0.0
    include_top: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, start_block: int = 0,
                 start_in_expanded: bool = False):
        """Returns [logits_or_features, reduction_1 … reduction_5].

        Same list contract as the reference backbone with
        ``features_only=True`` (`efficientnet_model.py:839-900`):
        element 0 is the final feature map (or logits when `include_top`),
        elements 1..5 are the stride 2/4/8/16/32 reduction endpoints — so
        `outputs[min_level:max_level+1]` picks P3-P5 inputs.

        `start_block > 0` treats `x` as the output of block
        `start_block - 1` and skips the stem and earlier blocks — the entry
        point for the fast MC path (models/mc_fast.py), which computes the
        shared prefix once outside the sample vmap. Skipped reduction
        endpoints other than `x` itself are reported as None (only
        reductions ≥ min_level are consumed downstream).
        """
        spec = self.spec
        act = activation_fn(self.act_type)

        if start_block == 0:
            x = nn.Conv(spec.stem_filters, (3, 3), strides=(2, 2),
                        padding="SAME", use_bias=False,
                        kernel_init=conv_kernel_init,
                        dtype=self.dtype, name="stem_conv")(x)
            x = act(BatchNorm(spec.bn_momentum, spec.bn_epsilon,
                              self.axis_name, dtype=self.dtype,
                              name="stem_bn")(x, train))

        # expand per-repeat blocks
        expanded: List[BlockArgs] = []
        for a in spec.blocks:
            expanded.append(a)
            for _ in range(a.num_repeat - 1):
                expanded.append(dataclasses.replace(
                    a, input_filters=a.output_filters, strides=(1, 1)))

        endpoints = {}
        reduction_idx = 0
        n = len(expanded)
        for idx in range(start_block):
            # replay the reduction bookkeeping for skipped blocks
            if (idx == n - 1) or (expanded[idx + 1].strides[0] > 1):
                reduction_idx += 1
                # with start_in_expanded, `x` is the *expanded* tensor of
                # the entry block, not the previous block's output — record
                # None rather than a wrong-channel endpoint
                endpoints[f"reduction_{reduction_idx}"] = (
                    x if idx == start_block - 1 and not start_in_expanded
                    else None)
        for idx, a in enumerate(expanded):
            if idx < start_block:
                continue
            is_reduction = (idx == n - 1) or (expanded[idx + 1].strides[0] > 1)
            survival_prob = spec.survival_prob
            if survival_prob:
                drop_rate = 1.0 - survival_prob
                survival_prob = 1.0 - drop_rate * float(idx) / n
            x = MBConvBlock(a, self.act_type, spec.use_se, spec.bn_momentum,
                            spec.bn_epsilon, self.axis_name, self.mc_dropoutrate,
                            self.dtype, name=f"blocks_{idx}")(
                x, train, survival_prob,
                pre_expanded=start_in_expanded and idx == start_block)
            if is_reduction:
                reduction_idx += 1
                endpoints[f"reduction_{reduction_idx}"] = x

        features = x
        if self.include_top:
            x = nn.Conv(spec.head_filters, (1, 1), padding="SAME", use_bias=False,
                        kernel_init=conv_kernel_init, dtype=self.dtype,
                        name="head_conv")(x)
            x = act(BatchNorm(spec.bn_momentum, spec.bn_epsilon, self.axis_name,
                              dtype=self.dtype, name="head_bn")(x, train))
            x = jnp.mean(x, axis=(1, 2))
            if spec.dropout_rate > 0:
                x = nn.Dropout(spec.dropout_rate, deterministic=not train)(x)
            x = nn.Dense(spec.num_classes, kernel_init=dense_kernel_init,
                         name="fc")(x)
            head_out = x
        else:
            head_out = features

        return [head_out] + [endpoints[f"reduction_{i}"]
                             for i in range(1, reduction_idx + 1)]
