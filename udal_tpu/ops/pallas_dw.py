"""Pallas TPU kernel: fused depthwise-conv + BN + swish (+ dropout, SE-mean).

The MBConv depthwise stage is the profiled hot spot of the EfficientNet
backbone on TPU (the reference's Keras DepthwiseConv2D + BN + swish chain,
`/root/reference/src/backbone/efficientnet_model.py:262-475`). This kernel
streams row chunks of each image through VMEM with double-buffered
load/store DMAs and applies the whole chain — depthwise k×k conv (stride 1
or 2, SAME), inference BatchNorm (folded scale/bias), swish, the MC-dropout
channel mask, and the squeeze-excite global-mean accumulation — in a single
pass, so each activation byte moves HBM→VMEM→HBM exactly once.

Layout: NHWC with C on lanes. C must be a multiple of 128 (the caller pads
channels to lane width — the HBM tiled layout stores those lanes anyway, so
the padding adds no memory traffic). Both input and output live in HBM and
are moved by in-kernel async copies; the grid runs one program per image,
and each program pipelines its row chunks (load i+1 / compute i / store i).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _same_pads(size: int, k: int, stride: int) -> Tuple[int, int]:
    """TF SAME padding (lo, hi) for one spatial dim."""
    out = -(-size // stride)
    total = max((out - 1) * stride + k - size, 0)
    return total // 2, total - total // 2


def _dw_kernel(x_hbm, w_ref, scale_ref, bias_ref, mask_ref,
               y_hbm, mean_ref, xbuf, ybuf, acc_ref, load_sem, store_sem,
               *, k, stride, hb_out, n_chunks, w_out,
               use_mask, use_mean, act):
    n = pl.program_id(0)
    s_in = xbuf.shape[1]
    hbs = hb_out * stride

    def load(i, slot):
        """Input DMA for row chunk i into xbuf[slot] — uniform size (the
        caller pre-pads H/W, so no edge cases)."""
        return pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(i * hbs, s_in)],
            xbuf.at[slot],
            load_sem.at[slot])

    def store(i, slot):
        return pltpu.make_async_copy(
            ybuf.at[slot],
            y_hbm.at[n, pl.ds(i * hb_out, hb_out)],
            store_sem.at[slot])

    w = w_ref[...].astype(jnp.float32)              # [k, k, C]
    scale = scale_ref[...].astype(jnp.float32)      # [1, 1, C]
    bias = bias_ref[...].astype(jnp.float32)
    dmask = mask_ref[...].astype(jnp.float32) if use_mask else None
    c = xbuf.shape[-1]
    wq = xbuf.shape[-2]                             # padded W in scratch

    load(0, 0).start()

    def body(i, mean_carry):
        slot = i % 2

        if n_chunks > 1:
            @pl.when(i + 1 < n_chunks)
            def _():
                load(jnp.minimum(i + 1, n_chunks - 1), (i + 1) % 2).start()

        load(i, slot).wait()

        # the store of chunk i-2 must have drained before ybuf[slot] reuse
        if n_chunks > 2:
            @pl.when(i >= 2)
            def _():
                store(jnp.maximum(i - 2, 0), slot).wait()

        # --- compute chunk i: [s_in, Wq, C] -> [hb_out, W_out, C] ---------
        x = xbuf[slot]

        acc_ref[...] = jnp.zeros_like(acc_ref)
        for dy in range(k):
            if stride == 1:
                rb = jax.lax.slice(x, (dy, 0, 0),
                                   (dy + hb_out, wq, c))
            else:
                # rows dy + 2r via the parity reshape (S_in is even; Mosaic
                # has no step>1 vector slices)
                rbt = x.reshape(x.shape[0] // 2, 2, wq, c)
                rb = jax.lax.slice(
                    rbt, (dy // 2, dy % 2, 0, 0),
                    (dy // 2 + hb_out, dy % 2 + 1, wq, c))[:, 0]
            if stride == 2:
                rb2 = rb.reshape(hb_out, wq // 2, 2, c)
            for dx in range(k):
                if stride == 1:
                    sub = jax.lax.slice(rb, (0, dx, 0),
                                        (hb_out, dx + w_out, c))
                else:
                    sub = jax.lax.slice(
                        rb2, (0, dx // 2, dx % 2, 0),
                        (hb_out, dx // 2 + w_out, dx % 2 + 1, c))[:, :, 0]
                acc_ref[...] = acc_ref[...] + \
                    sub.astype(jnp.float32) * w[dy, dx]

        y = acc_ref[...] * scale[0] + bias[0]
        if act == "swish":
            y = y * jax.nn.sigmoid(y)
        elif act == "relu":
            y = jnp.maximum(y, 0.0)
        elif act == "relu6":
            y = jnp.clip(y, 0.0, 6.0)
        if use_mask:
            y = y * dmask[0]
        ybuf[slot] = y.astype(ybuf.dtype)
        store(i, slot).start()
        if use_mean:
            mean_carry = mean_carry + jnp.sum(y, axis=(0, 1))[None, :]
        return mean_carry

    mean_part = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((1, c), jnp.float32))

    # drain outstanding stores
    if n_chunks >= 2:
        store(n_chunks - 2, (n_chunks - 2) % 2).wait()
    store(n_chunks - 1, (n_chunks - 1) % 2).wait()

    if use_mean:
        mean_ref[...] = mean_part[None]


def fused_depthwise(x: jnp.ndarray, kernel: jnp.ndarray,
                    scale: jnp.ndarray, bias: jnp.ndarray,
                    drop_mask: Optional[jnp.ndarray] = None,
                    stride: int = 1, act: str = "swish",
                    want_mean: bool = True,
                    block_rows: int = 0,
                    interpret: Optional[bool] = None):
    """Fused depthwise conv + BN + activation (+ dropout mask, SE mean).

    Args:
      x: [N, H, W, C] input, C a multiple of 128 (bf16 recommended).
      kernel: [k, k, 1, C] or [k, k, C] depthwise filters.
      scale, bias: [C] folded BatchNorm affine (see :func:`fold_bn`).
      drop_mask: optional [N, C] channel dropout multiplier (already scaled
        by 1/keep) — the MC spatial-dropout mask.
      stride: 1 or 2 (SAME padding, TF semantics).
      act: 'swish' | 'relu' | 'relu6' | 'identity'.
      want_mean: also return the global spatial mean [N, C] (float32) of the
        post-activation output — the squeeze-excite input.

    Returns y [N, H', W', C] (x.dtype), and mean [N, C] if want_mean.
    """
    if kernel.ndim == 4:
        kernel = kernel.reshape(kernel.shape[0], kernel.shape[1], -1)
    n, h, w, c = x.shape
    k = kernel.shape[0]
    h_out = -(-h // stride)
    w_out = -(-w // stride)
    pad_t, pad_b = _same_pads(h, k, stride)
    pad_l, pad_r = _same_pads(w, k, stride)

    if block_rows <= 0:
        # VMEM: 2x in (bf16) + 2x out + f32 accumulator + ~2 f32 tap
        # temporaries; keep the f32 accumulator ≤ ~1MB so the peak stays
        # well under the 16MB scoped limit
        acc_budget = 1_048_576 // (max(w_out, 1) * c * 4)
        in_budget = (1_572_864 // (max(w, 1) * c * x.dtype.itemsize))
        block_rows = max(1, min(h_out, acc_budget, in_budget // stride))
        while h_out % block_rows:
            block_rows -= 1
    hb_out = block_rows
    s_in = (hb_out - 1) * stride + k
    if stride == 2 and s_in % 2:
        s_in += 1            # parity-reshape trick needs an even row count
    n_chunks = h_out // hb_out
    # scratch W: SAME padding, rounded up to a multiple of 8 — DMA slices
    # of the (sublane) W dim must be 8-aligned on TPU
    wq = -(-(w + pad_l + pad_r) // 8) * 8

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"

    use_mask = drop_mask is not None
    if not use_mask:
        drop_mask = jnp.ones((n, c), x.dtype)

    kern = functools.partial(
        _dw_kernel, k=k, stride=stride, hb_out=hb_out, n_chunks=n_chunks,
        w_out=w_out, use_mask=use_mask, use_mean=want_mean, act=act)

    def wrapped(x_hbm, w_ref, scale_ref, bias_ref, mask_ref, y_hbm,
                *rest):
        if want_mean:
            mean_ref = rest[0]
            scratch = rest[1:]
        else:
            mean_ref = None
            scratch = rest
        kern(x_hbm, w_ref, scale_ref, bias_ref, mask_ref, y_hbm, mean_ref,
             *scratch)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec((k, k, c), lambda i: (0, 0, 0)),
        pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0)),
        pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0)),
        pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
    ]
    out_shapes = [jax.ShapeDtypeStruct((n, h_out, w_out, c), x.dtype)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]
    if want_mean:
        out_shapes.append(jax.ShapeDtypeStruct((n, 1, c), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)))

    # H and W are zero-padded to the staged shape by the producer (XLA fuses
    # the pad into the preceding op's output write), so every chunk's DMA is
    # uniform — no edge cases, no in-kernel masking.
    h_stage = (n_chunks - 1) * hb_out * stride + s_in
    outs = pl.pallas_call(
        wrapped,
        grid=(n,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((2, s_in, wq, c), x.dtype),
            pltpu.VMEM((2, hb_out, w_out, c), x.dtype),
            pltpu.VMEM((hb_out, w_out, c), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(_stage(x, pad_t, h_stage, pad_l, wq), kernel, scale.reshape(1, 1, c),
      bias.reshape(1, 1, c), drop_mask.reshape(n, 1, c))

    if want_mean:
        y, total = outs
        return y, total[:, 0, :] / float(h_out * w_out)
    return outs[0]


def _stage(x, pad_t, h_stage, pad_l, wq):
    """Zero-pad H/W to the staged shape (fused into the producer by XLA)."""
    n, h, w, c = x.shape
    if h_stage == h and wq == w:
        return x
    return jnp.pad(x, ((0, 0), (pad_t, h_stage - h - pad_t),
                       (pad_l, wq - w - pad_l), (0, 0)))


def fold_bn(gamma, beta, mean, var, eps: float):
    """Inference BatchNorm folded to (scale, bias)."""
    scale = gamma * jax.lax.rsqrt(var + eps)
    return scale, beta - mean * scale
