"""Fast MC-dropout inference path: shared-prefix hoisting + block-0 fold.

Motivation (measured on v5e, tools/perf_blocks.py): under the naive
`vmap(model.apply)` MC forward, the first MBConv block (expand_ratio=1,
C=32 @ 256x512) alone costs 17.6 ms of the 80 ms step — its per-sample
tensors store C=32 in the 128-lane tile dim, so every elementwise pass
moves 4x its logical bytes, times T=10 samples.

The fix is exact algebra, not approximation. For an e=1 MBConv the ops are

    x0 = act(bn1(dw(x)))                  # sample-INDEPENDENT (shared)
    u  = m ⊙ x0                           # spatial dropout, m per (n, c)
    s  = sigmoid(SE(mean_hw(u)))          # SE squeeze-excite
    y  = bn2(project_1x1(s ⊙ u))

Two identities collapse the per-sample work:
  1. mean_hw(m ⊙ x0) = m ⊙ mean_hw(x0)      (m is constant over H, W)
  2. project_1x1(σ ⊙ x0) = x0 @ (diag(σ)·W) (1x1 conv is a matmul)
so with σ = s·m the whole per-sample block becomes ONE batched matmul with
per-sample folded weights on the SHARED x0 — plus tiny SE MLPs on vectors.
The shared prefix (stem + block-0 depthwise/bn/act) runs once at batch B
instead of T*B.

Four formulations were built and measured on v5e; the production path is
v4 (`folded_block0_all_samples`): ONE `einsum('bhwc,btcd->bthwd')` outside
the sample vmap, with t a free dim of the folded-weight operand — the
shared x0 is read once and none of the broadcast-lhs batched-dot layout
pathologies of the earlier variants appear (v1/v2 remain below as tested
building blocks; see docs/PERF_ANALYSIS.md for the full measurement
table). End-to-end: ~2.7% faster than the naive vmap at the d0 op point
(112.5 -> 115 img/s).

Replaces the hot loop at `/root/reference/src/efficientdet_keras.py:999-1024`
together with `mc_forward` (models/efficientdet.py).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp

from udal_tpu.models.efficientnet import activation_fn, backbone_spec

PACK = 8  # spatial positions folded into the lane dim


def fast_mc_eligible(cfg, variables) -> bool:
    """True when the shared-prefix + block-0 fold applies exactly.

    The v4 formulation (one dot outside the sample vmap with t a free rhs
    dim, `folded_block0_all_samples`) measures ~2.7% faster end-to-end on
    v5e and is ON by default; `cfg.mc_fast_fold = False` opts out. (The
    earlier v1-v3 formulations measured neutral-or-worse — see
    docs/PERF_ANALYSIS.md — and remain only as tested building blocks.)
    """
    try:
        if not cfg.get("mc_fast_fold", True):
            return False
        if not (cfg.mc_dropout and cfg.mc_dropoutrate):
            return False
        if cfg.backbone_name not in ("efficientnet-b0",):
            # the fold itself generalizes to any e=1 first block; gate to
            # configurations covered by the parity tests. The residual case
            # (id_skip with matching filters) is excluded: the fold emits
            # block-0's bn2 output without the skip add.
            spec = backbone_spec(cfg.backbone_name)
            b0 = spec.blocks[0]
            if not (b0.expand_ratio == 1 and b0.strides == (1, 1)
                    and spec.use_se
                    and not (b0.id_skip
                             and b0.input_filters == b0.output_filters)):
                return False
        if cfg.act_type not in ("swish", "silu", "swish_native"):
            return False
        params = variables.get("params", {})
        if "backbone" not in params or "blocks_0" not in params["backbone"]:
            return False
        p0 = params["backbone"]["blocks_0"]
        # v4 folds only block 0's tail: it must be an e=1 block (no expand
        # conv — its depthwise is sample-shared) with SE and a 1x1 project
        if "expand_conv" in p0 or "se" not in p0 or "project_conv" not in p0:
            return False
        if "batch_stats" not in variables:
            return False
        return True
    except Exception:
        return False


def _bn_affine(params, stats, dtype, eps: float = 1e-3):
    """Inference BatchNorm as (scale, bias) in f32, castable to `dtype`."""
    scale = params["scale"] / jnp.sqrt(stats["var"] + eps)
    bias = params["bias"] - stats["mean"] * scale
    return scale.astype(dtype), bias.astype(dtype)


def mc_shared_prefix(variables, images: jnp.ndarray, dtype, pack: int = PACK,
                     eps: float = 1e-3
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """stem conv/bn/act + block-0 depthwise/bn/act, computed once at batch B.

    Returns (x0_packed [B, H*W/pack, pack*C0], x0_mean [B, C0] in f32).
    Pure-JAX mirror of the flax modules (same params, same op order);
    exactness is covered by tests/test_mc_fast.py.
    """
    p = variables["params"]["backbone"]
    s = variables["batch_stats"]["backbone"]
    act = activation_fn("swish")

    x = images.astype(dtype)
    k = p["stem_conv"]["kernel"].astype(dtype)
    x = jax.lax.conv_general_dilated(
        x, k, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    scale, bias = _bn_affine(p["stem_bn"]["bn"], s["stem_bn"]["bn"], dtype,
                             eps)
    x = act(x * scale + bias)

    kd = p["blocks_0"]["depthwise_conv"]["kernel"].astype(dtype)
    c0 = kd.shape[-1]
    x = jax.lax.conv_general_dilated(
        x, kd, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c0)
    scale, bias = _bn_affine(p["blocks_0"]["bn1"]["bn"],
                             s["blocks_0"]["bn1"]["bn"], dtype, eps)
    x0 = act(x * scale + bias)

    b, h, w, _ = x0.shape
    x0_mean = jnp.mean(x0.astype(jnp.float32), axis=(1, 2))
    if pack is None:           # NHWC for the scale-into-conv fold
        return x0, x0_mean
    x0_packed = x0.reshape(b, h * w // pack, pack * c0)
    return x0_packed, x0_mean


def folded_block0_tail(variables, x0_packed: jnp.ndarray,
                       x0_mean: jnp.ndarray, key: jax.Array,
                       rate: float, out_hw: Tuple[int, int],
                       mask: jnp.ndarray = None,
                       eps: float = 1e-3) -> jnp.ndarray:
    """Per-sample block-0 tail as one batched packed matmul.

    Returns block-1 input [B, H, W, C_out] (NHWC). `mask` overrides the
    dropout draw for tests.
    """
    p0 = variables["params"]["backbone"]["blocks_0"]
    s0 = variables["batch_stats"]["backbone"]["blocks_0"]
    dtype = x0_packed.dtype
    act = activation_fn("swish")
    b = x0_packed.shape[0]
    c0 = x0_packed.shape[-1] // PACK

    if mask is None:
        keep = 1.0 - rate
        mask = jax.random.bernoulli(key, keep, (b, c0)).astype(jnp.float32) \
            / keep
    # SE on the masked mean — identity 1: mean(m*x0) = m*mean(x0)
    se_in = (mask * x0_mean).astype(dtype)
    wr, br = p0["se"]["reduce"]["kernel"], p0["se"]["reduce"]["bias"]
    we, be = p0["se"]["expand"]["kernel"], p0["se"]["expand"]["bias"]
    z = act(se_in @ wr[0, 0].astype(dtype) + br.astype(dtype))
    se = z @ we[0, 0].astype(dtype) + be.astype(dtype)
    sig = jax.nn.sigmoid(se.astype(jnp.float32))

    # identity 2: project(σ ⊙ x0) = x0 @ (diag(σ)·W); bn2 scale folds in
    sigma = (sig * mask)  # [B, C0] f32
    wp = p0["project_conv"]["kernel"][0, 0].astype(jnp.float32)  # [C0, Co]
    bscale, bbias = _bn_affine(p0["bn2"]["bn"], s0["bn2"]["bn"], jnp.float32,
                               eps)
    w = sigma[:, :, None] * (wp * bscale[None, :])        # [B, C0, Co]
    co = wp.shape[-1]

    # block-diagonalize to the packed lane space: [B, PACK*C0, PACK*Co]
    eye = jnp.eye(PACK, dtype=jnp.float32)
    wbd = (eye[:, None, :, None] * w[:, None, :, None, :]
           ).reshape(b, PACK * c0, PACK * co).astype(dtype)

    y = jax.lax.dot_general(
        x0_packed, wbd, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)               # [B, M, PACK*Co]
    y = y + jnp.tile(bbias, PACK)[None, None, :]
    h, wd = out_hw
    return y.astype(dtype).reshape(b, h, wd, co)


def folded_block0_block1_expand(variables, x0_packed: jnp.ndarray,
                                x0_mean: jnp.ndarray, key: jax.Array,
                                rate: float, out_hw: Tuple[int, int],
                                pack: int = 4,
                                mask2: jnp.ndarray = None,
                                mask1: jnp.ndarray = None,
                                eps: float = 1e-3) -> jnp.ndarray:
    """Block-0 tail ⊕ block-1 expand as ONE batched packed matmul.

    Between block 0's bn2 output and block 1's expand conv there is no
    nonlinearity, so the folded per-sample project weight composes with the
    expand weight: the narrow NHWC-16 tensor (whose 128-lane padding makes
    it 8x its logical bytes) is never materialized. The matmul emits block
    1's pre-activation expanded tensor; swish + the expand-side dropout
    apply in its epilogue. Returns [B, H, W, C_exp] (NHWC).

    `mask2` (block-0 channel mask) / `mask1` (expanded-channel mask)
    override the dropout draws for tests.
    """
    p0 = variables["params"]["backbone"]["blocks_0"]
    s0 = variables["batch_stats"]["backbone"]["blocks_0"]
    p1 = variables["params"]["backbone"]["blocks_1"]
    s1 = variables["batch_stats"]["backbone"]["blocks_1"]
    dtype = x0_packed.dtype
    act = activation_fn("swish")
    b = x0_packed.shape[0]
    c0 = x0_packed.shape[-1] // pack

    k2, k1 = jax.random.split(key)
    keep = 1.0 - rate
    if mask2 is None:
        mask2 = jax.random.bernoulli(k2, keep, (b, c0)).astype(jnp.float32) \
            / keep
    # SE on the masked mean — dropout commutes with the spatial mean
    se_in = (mask2 * x0_mean).astype(dtype)
    wr, br = p0["se"]["reduce"]["kernel"], p0["se"]["reduce"]["bias"]
    we, be = p0["se"]["expand"]["kernel"], p0["se"]["expand"]["bias"]
    z = act(se_in @ wr[0, 0].astype(dtype) + br.astype(dtype))
    se = z @ we[0, 0].astype(dtype) + be.astype(dtype)
    sigma = jax.nn.sigmoid(se.astype(jnp.float32)) * mask2    # [B, C0]

    # per-sample composed weight: diag(σ)·W_proj·diag(bn2_s)·E·diag(bn0_s)
    wp = p0["project_conv"]["kernel"][0, 0].astype(jnp.float32)   # [C0, Cn]
    b2s, b2b = _bn_affine(p0["bn2"]["bn"], s0["bn2"]["bn"], jnp.float32, eps)
    ex = p1["expand_conv"]["kernel"][0, 0].astype(jnp.float32)    # [Cn, Ce]
    b0s, b0b = _bn_affine(p1["bn0"]["bn"], s1["bn0"]["bn"], jnp.float32, eps)
    a_static = (wp * b2s[None, :]) @ (ex * b0s[None, :])          # [C0, Ce]
    w = sigma[:, :, None] * a_static[None]                        # [B, C0, Ce]
    bias = b2b @ (ex * b0s[None, :]) + b0b                        # [Ce]
    ce = a_static.shape[-1]

    eye = jnp.eye(pack, dtype=jnp.float32)
    wbd = (eye[:, None, :, None] * w[:, None, :, None, :]
           ).reshape(b, pack * c0, pack * ce).astype(dtype)

    zp = jax.lax.dot_general(
        x0_packed, wbd, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # [B, M, pack*Ce]
    zp = zp + jnp.tile(bias, pack)[None, None, :]
    zp = act(zp)
    if mask1 is None:
        mask1 = jax.random.bernoulli(k1, keep, (b, ce)).astype(jnp.float32) \
            / keep
    zp = zp * jnp.tile(mask1, (1, pack))[:, None, :]
    h, wd = out_hw
    return zp.astype(dtype).reshape(b, h, wd, ce)


def folded_block0_all_samples(variables, x0: jnp.ndarray,
                              x0_mean: jnp.ndarray, key: jax.Array,
                              rate: float, num_samples: int,
                              masks: jnp.ndarray = None,
                              eps: float = 1e-3) -> jnp.ndarray:
    """Block-0 tail for ALL samples as ONE dot with t a free rhs dim.

    y[b, t, h, w, d] = Σ_c x0[b, h, w, c] · Wfold[b, t, c, d] — the shared
    x0 is read once (not per sample), the per-(t, b) folded weights carry
    dropout ⊙ SE ⊙ bn2, and t lands next to the channel dim so no batched
    dot with broadcast lhs (and none of its layout pathologies, see
    docs/PERF_ANALYSIS.md fold v1/v2) is involved. Returns [B, T, H, W, Co].
    """
    p0 = variables["params"]["backbone"]["blocks_0"]
    s0 = variables["batch_stats"]["backbone"]["blocks_0"]
    dtype = x0.dtype
    act = activation_fn("swish")
    b, h, w, c0 = x0.shape
    t = num_samples

    if masks is None:
        keep = 1.0 - rate
        masks = jax.random.bernoulli(
            key, keep, (t, b, c0)).astype(jnp.float32) / keep
    se_in = (masks * x0_mean[None]).astype(dtype)            # [T, B, C0]
    wr, br = p0["se"]["reduce"]["kernel"], p0["se"]["reduce"]["bias"]
    we, be = p0["se"]["expand"]["kernel"], p0["se"]["expand"]["bias"]
    z = act(se_in @ wr[0, 0].astype(dtype) + br.astype(dtype))
    se = z @ we[0, 0].astype(dtype) + be.astype(dtype)
    sigma = jax.nn.sigmoid(se.astype(jnp.float32)) * masks   # [T, B, C0]

    wp = p0["project_conv"]["kernel"][0, 0].astype(jnp.float32)  # [C0, Co]
    bscale, bbias = _bn_affine(p0["bn2"]["bn"], s0["bn2"]["bn"], jnp.float32,
                               eps)
    wfold = sigma[..., None] * (wp * bscale[None, :])        # [T, B, C0, Co]
    wfold = jnp.swapaxes(wfold, 0, 1).astype(dtype)          # [B, T, C0, Co]

    y = jnp.einsum("bhwc,btcd->bthwd", x0, wfold,
                   preferred_element_type=jnp.float32)
    y = y + bbias[None, None, None, None, :]
    return y.astype(dtype)


def mc_forward_fast(model, variables, images: jnp.ndarray, key: jax.Array,
                    num_samples: int, train: bool = False
                    ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """MC-dropout forward with the shared prefix + block-0 fold (v4).

    Drop-in replacement for the vmap branch of `mc_forward` when
    `fast_mc_eligible`; returns per-level [T, B, H, W, C] lists.
    """
    cfg = model.config
    dtype = model.dtype
    eps = backbone_spec(cfg.backbone_name).bn_epsilon
    x0, x0_mean = mc_shared_prefix(variables, images, dtype, pack=None,
                                   eps=eps)
    k0, k1 = jax.random.split(key)
    y_all = folded_block0_all_samples(variables, x0, x0_mean, k0,
                                      cfg.mc_dropoutrate, num_samples,
                                      eps=eps)
    keys = jax.random.split(k1, num_samples)

    def one_pass(x1, k):
        return model.apply(variables, x1, train,
                           method=type(model).forward_from_block1,
                           rngs={"dropout": k})

    # map over t on axis 1 of y_all — no explicit [B,T]->[T,B] transpose
    return jax.vmap(one_pass, in_axes=(1, 0))(y_all, keys)
