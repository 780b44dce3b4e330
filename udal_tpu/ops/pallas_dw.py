"""Pallas TPU kernel: fused depthwise-conv + BN + swish (+ dropout, SE-mean).

The MBConv depthwise stage is the profiled hot spot of the EfficientNet
backbone on TPU (the reference's Keras DepthwiseConv2D + BN + swish chain,
`/root/reference/src/backbone/efficientnet_model.py:262-475`): XLA executes
it as a VPU convolution fusion at ~15% of HBM bandwidth. This kernel streams
(batch, row-block) tiles through VMEM once and applies the whole chain —
depthwise k×k conv (stride 1 or 2, SAME), inference BatchNorm (folded to
scale/bias), swish, the MC-dropout channel mask, and the squeeze-excite
global-mean accumulation — in a single pass, so each activation byte moves
HBM→VMEM→HBM exactly once.

Layout: NHWC with C on lanes (matching the surrounding convs — no layout
changes at the kernel boundary). The input stays in HBM (`pltpu.ANY`) and
row blocks with halo are DMA'd into a double-buffered VMEM scratch by the
kernel itself (the remote AOT compiler rejects `pl.Element` halo specs);
halo rows outside the image are zero-masked in VMEM.
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
               y_ref, mean_ref=None, *, xbuf=None, sems=None,
               k, stride, hb_out, h_in, w_out,
               pad_t, pad_l, pad_r, use_mask, use_mean, act):
    n = pl.program_id(0)
    hb = pl.program_id(1)
    n_h = pl.num_programs(1)
    n_n = pl.num_programs(0)
    s_in = (hb_out - 1) * stride + k
    hbs = hb_out * stride
    size_last = hbs + pad_t          # rows the last block copies (<= s_in)

    def issue(slot, n_idx, hb_idx):
        """Start the input DMA for block (n_idx, hb_idx) into xbuf[slot].

        n_h is static, so impossible branches are never emitted; predicates
        only separate the (dynamic) first/middle/last row blocks.
        """
        if n_h == 1:
            pltpu.make_async_copy(
                x_hbm.at[n_idx, pl.ds(0, h_in)],
                xbuf.at[slot, pl.ds(pad_t, h_in)],
                sems.at[slot]).start()
            return
        # clamps keep pl.ds bounds valid even in untaken predicate branches
        g0 = jnp.clip(hb_idx * hbs - pad_t, 0, max(h_in - s_in, 0))
        gl = jnp.clip(hb_idx * hbs - pad_t, 0, max(h_in - size_last, 0))
        first = hb_idx == 0
        last = hb_idx == n_h - 1

        @pl.when(first)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[n_idx, pl.ds(0, s_in - pad_t)],
                xbuf.at[slot, pl.ds(pad_t, s_in - pad_t)],
                sems.at[slot]).start()

        @pl.when(last)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[n_idx, pl.ds(gl, size_last)],
                xbuf.at[slot, pl.ds(0, size_last)],
                sems.at[slot]).start()

        if n_h > 2:
            @pl.when((~first) & (~last))
            def _():
                pltpu.make_async_copy(
                    x_hbm.at[n_idx, pl.ds(g0, s_in)],
                    xbuf.at[slot, pl.ds(0, s_in)],
                    sems.at[slot]).start()

    del n_n
    slot = 0
    issue(slot, n, hb)

    def wait(slot, hb_idx):
        # the DMA wait must match the issued copy size exactly
        if n_h == 1:
            pltpu.make_async_copy(
                x_hbm.at[0, pl.ds(0, h_in)],
                xbuf.at[slot, pl.ds(pad_t, h_in)],
                sems.at[slot]).wait()
            return
        first = hb_idx == 0
        last = hb_idx == n_h - 1

        @pl.when(first)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[0, pl.ds(0, s_in - pad_t)],
                xbuf.at[slot, pl.ds(pad_t, s_in - pad_t)],
                sems.at[slot]).wait()

        @pl.when(last)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[0, pl.ds(0, size_last)],
                xbuf.at[slot, pl.ds(0, size_last)],
                sems.at[slot]).wait()

        if n_h > 2:
            @pl.when((~first) & (~last))
            def _():
                pltpu.make_async_copy(
                    x_hbm.at[0, pl.ds(0, s_in)],
                    xbuf.at[slot, pl.ds(0, s_in)],
                    sems.at[slot]).wait()

    wait(slot, hb)

    w_full = xbuf.shape[-2]
    c = xbuf.shape[-1]
    row0 = hb * hbs - pad_t                         # global row of block[0]
    w = w_ref[...].astype(jnp.float32)              # [k, k, C]
    scale = scale_ref[...].astype(jnp.float32)
    bias = bias_ref[...].astype(jnp.float32)
    dmask = mask_ref[...].astype(jnp.float32) if use_mask else None
    # W taps via a parity reshape when stride 2 (no step>1 vector slices)
    wq = (w_full + pad_l + pad_r + stride - 1) // stride * stride

    def one_row(r, mean_carry):
        # row r of the output block reads input rows r*stride + [0, k)
        slab = xbuf[slot, pl.ds(r * stride, k)]      # [k, W, C]
        rows = jax.lax.broadcasted_iota(jnp.int32, slab.shape, 0) + \
            (row0 + r * stride)
        ok = (rows >= 0) & (rows < h_in)
        slab = jnp.where(ok, slab, jnp.zeros_like(slab))
        if pad_l or (wq != w_full + pad_l):
            slab = jnp.pad(slab, ((0, 0), (pad_l, wq - w_full - pad_l),
                                  (0, 0)))
        if stride == 2:
            slab = slab.reshape(k, wq // 2, 2, c)

        acc = jnp.zeros((w_out, c), jnp.float32)
        for dy in range(k):
            for dx in range(k):
                if stride == 1:
                    sub = jax.lax.slice(slab, (dy, dx, 0),
                                        (dy + 1, dx + w_out, c))[0]
                else:
                    sub = jax.lax.slice(
                        slab, (dy, dx // 2, dx % 2, 0),
                        (dy + 1, dx // 2 + w_out, dx % 2 + 1, c))[0, :, 0]
                acc = acc + sub.astype(jnp.float32) * w[dy, dx]

        y = acc * scale[0] + bias[0]
        if act == "swish":
            y = y * jax.nn.sigmoid(y)
        elif act == "relu":
            y = jnp.maximum(y, 0.0)
        elif act == "relu6":
            y = jnp.clip(y, 0.0, 6.0)
        if use_mask:
            y = y * dmask[0]
        y_ref[0, r] = y.astype(y_ref.dtype)
        if use_mean:
            mean_carry = mean_carry + jnp.sum(y, axis=0, keepdims=True)
        return mean_carry

    mean_part = jax.lax.fori_loop(
        0, hb_out, one_row, jnp.zeros((1, c), jnp.float32))

    if use_mean:
        @pl.when(hb == 0)
        def _():
            mean_ref[...] = mean_part[None]

        @pl.when(hb != 0)
        def _():
            mean_ref[...] = mean_ref[...] + mean_part[None]


def fused_depthwise(x: jnp.ndarray, kernel: jnp.ndarray,
                    scale: jnp.ndarray, bias: jnp.ndarray,
                    drop_mask: Optional[jnp.ndarray] = None,
                    stride: int = 1, act: str = "swish",
                    want_mean: bool = False,
                    block_rows: int = 0,
                    interpret: Optional[bool] = None):
    """Fused depthwise conv + BN + activation (+ dropout mask, SE mean).

    Args:
      x: [N, H, W, C] input (any float dtype; bf16 recommended).
      kernel: [k, k, 1, C] or [k, k, C] depthwise filters.
      scale, bias: [C] folded BatchNorm affine (gamma/sqrt(var+eps), ...).
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
        # VMEM budget: the double-buffered input scratch dominates (compute
        # temporaries are per-row slabs). Keep 2·s_in·W·C ≤ ~7MB and the
        # (double-buffered) output block ≤ ~2MB.
        in_budget = 3_500_000 // (max(w, 1) * c * x.dtype.itemsize)
        out_budget = 2_000_000 // (max(w_out, 1) * c * x.dtype.itemsize)
        block_rows = max(1, min(h_out, in_budget // stride, out_budget))
        while h_out % block_rows:
            block_rows -= 1
    hb_out = block_rows
    s_in = (hb_out - 1) * stride + k

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"

    use_mask = drop_mask is not None
    if not use_mask:
        drop_mask = jnp.ones((n, c), x.dtype)

    kern = functools.partial(
        _dw_kernel, k=k, stride=stride, hb_out=hb_out, h_in=h,
        w_out=w_out, pad_t=pad_t, pad_l=pad_l, pad_r=pad_r,
        use_mask=use_mask, use_mean=want_mean, act=act)

    def wrapped(x_hbm, w_ref, scale_ref, bias_ref, mask_ref, y_ref,
                *rest):
        if want_mean:
            mean_ref = rest[0]
            scratch = rest[1:]
        else:
            mean_ref = None
            scratch = rest
        kern(x_hbm, w_ref, scale_ref, bias_ref, mask_ref, y_ref, mean_ref,
             xbuf=scratch[0], sems=scratch[1])

    # All small per-channel operands are rank-3 (·, 1, C) so their trailing
    # two block dims equal the full array dims (a Mosaic block constraint).
    grid = (n, h_out // hb_out)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),           # x stays in HBM
        pl.BlockSpec((k, k, c), lambda i, j: (0, 0, 0)),
        pl.BlockSpec((1, 1, c), lambda i, j: (0, 0, 0)),
        pl.BlockSpec((1, 1, c), lambda i, j: (0, 0, 0)),
        pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
    ]
    out_shapes = [jax.ShapeDtypeStruct((n, h_out, w_out, c), x.dtype)]
    out_specs = [pl.BlockSpec((1, hb_out, w_out, c),
                              lambda i, j: (i, j, 0, 0))]
    if want_mean:
        out_shapes.append(jax.ShapeDtypeStruct((n, 1, c), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)))

    outs = pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((1, s_in, w, c), x.dtype),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        interpret=interpret,
    )(x, kernel, scale.reshape(1, 1, c), bias.reshape(1, 1, c),
      drop_mask.reshape(n, 1, c))

    if want_mean:
        y, total = outs
        return y, total[:, 0, :] / float(h_out * w_out)
    return outs[0]


def fold_bn(gamma, beta, mean, var, eps: float):
    """Inference BatchNorm folded to (scale, bias)."""
    scale = gamma * jax.lax.rsqrt(var + eps)
    return scale, beta - mean * scale
