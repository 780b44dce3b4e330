"""Fused MBConv front half (expand 1x1 -> bn0/act/drop -> dw k x k -> bn1/
act/drop -> SE-sum) as a batch-in-lanes Pallas TPU kernel.

Layout insight (from device traces, docs/PERF_ANALYSIS.md): XLA stores the
MC-inference activations batch-minor — `[N, H, W, C]` with layout
`{0,3,2,1}`, i.e. physically row-major `[H, W, C, N]` with the T*B=80
sample-batch on the 128-lane axis. This kernel adopts that layout natively:

* the logical `jnp.transpose(x, (1, 2, 3, 0))` at the boundary matches
  XLA's preferred physical layout (no relayout in the steady state);
* every depthwise tap is a plain (ring-row, sublane) offset — no lane
  shuffles and no halo DMA games (W lives on sublanes, H is a grid axis);
* the expand conv is one MXU `dot_general` per input row:
  `[Ce, Cin] x [e, Cin, N] -> [Ce, e, N]`, landing directly in the
  ring-buffer layout the dw taps consume;
* BN scales/biases are folded into the conv weights (inference), dropout
  masks are per-(channel, sample) lane vectors, and the SE squeeze sum is
  accumulated on the fly — the expanded tensor never exists in HBM.

Targets the XLA `convert_reduce_fusion`s (expand+dw+SE) that dominate the
MC-d0 step (~31 ms of 75 ms). Reference semantics: MBConvBlock
(`/root/reference/src/backbone/efficientnet_model.py:262-470`).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(*refs, k: int, s: int, wt: int, h_in: int, w_in: int,
            cin: int, ce: int, n: int, n_specs: int):
    p = k // 2
    nx = 3 * n_specs
    x_refs = refs[:nx]
    we_ref, b0_ref, m1_ref, wd_ref, b1_ref, m2_ref = refs[nx:nx + 6]
    y_ref, se_ref = refs[nx + 6:nx + 8]
    ring, acc = refs[nx + 8:nx + 10]

    iw = pl.program_id(0)
    ih = pl.program_id(1)
    e = s * wt + 2 * p                      # ring W extent
    bw = s * wt                             # x block W extent

    @pl.when(jnp.logical_and(ih == 0, iw == 0))
    def _():
        acc[:] = jnp.zeros_like(acc)

    @pl.when(ih == 0)
    def _():
        ring[:] = jnp.zeros_like(ring)

    # global W start of the ring (may under/overhang the image)
    w0 = iw * bw - p
    col = jax.lax.broadcasted_iota(jnp.int32, (1, e, 1), 1) + w0
    col_ok = jnp.logical_and(col >= 0, col < w_in).astype(jnp.float32)

    m1 = m1_ref[:].astype(jnp.float32)                      # [Ce,1,N]
    b0 = b0_ref[:].astype(jnp.float32)                      # [Ce,1,1]

    def expand_row(j, r):
        left, main, right = (x_refs[3 * j], x_refs[3 * j + 1],
                             x_refs[3 * j + 2])
        xt = jnp.concatenate(
            [left[0, bw - p:bw], main[0], right[0, 0:p]],
            axis=0)                                         # [e, Cin, N]
        z = jax.lax.dot_general(
            we_ref[:], xt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # [Ce, e, N]
        z = z + b0
        z = z * jax.nn.sigmoid(z)                           # swish (bn0 act)
        z = z * m1
        z = z * col_ok                                      # W edges
        z = z * (r < h_in).astype(jnp.float32)              # bottom edge
        slot = jax.lax.rem(r, jnp.int32(k))
        ring[pl.ds(slot * ce, ce)] = z.astype(ring.dtype)

    for j in range(n_specs):
        r = s * ih + p - j
        if j < s:
            expand_row(j, r)
        else:
            @pl.when(jnp.logical_and(ih == 0, r >= 0))
            def _(j=j, r=r):
                expand_row(j, r)

    # depthwise stencil for output row ih (input center row s*ih)
    a = jnp.zeros((ce, wt, n), jnp.float32)
    for dh in range(-p, p + 1):
        slot = jax.lax.rem(s * ih + dh + k, jnp.int32(k))
        row = ring[pl.ds(slot * ce, ce)]                    # [Ce, e, N]
        for dwv in range(-p, p + 1):
            tap = wd_ref[dh + p, dwv + p].astype(jnp.float32)  # [Ce,1,1]
            if s > 1:
                sl = row[:, p + dwv: p + dwv + s * wt: s, :]
            else:
                sl = row[:, p + dwv: p + dwv + wt, :]
            a = a + sl.astype(jnp.float32) * tap

    a = a + b1_ref[:].astype(jnp.float32)
    a = a * jax.nn.sigmoid(a)                               # swish (bn1 act)
    a = a * m2_ref[:].astype(jnp.float32)
    acc[:] = acc[:] + jnp.sum(a, axis=1)
    se_ref[:] = acc[:]
    y_ref[0] = jnp.swapaxes(a.astype(y_ref.dtype), 0, 1)    # [wt, Ce, N]


def fused_expand_dw(x, we, b0, m1, wd, b1, m2, *, stride: int,
                    ksize: int, wt: int = 32,
                    interpret: bool = False) -> Tuple[jnp.ndarray,
                                                      jnp.ndarray]:
    """x [H, W, Cin, N] -> (y [H/s, W/s, Ce, N], se_sum [Ce, N] f32).

    Args:
      x : input activations, batch-in-lanes layout (N minor).
      we: expand weight [Cin, Ce] with the bn0 scale folded in.
      b0: expand-side bias [Ce] (bn0).
      m1: expand-side dropout mask [Ce, N], pre-scaled by 1/keep.
      wd: depthwise taps [k, k, Ce] with the bn1 scale folded in.
      b1: dw-side bias [Ce] (bn1).
      m2: dw-side dropout mask [Ce, N].
      stride, ksize: MBConv stride / kernel size (1|2, 3|5).
      wt: output W-tile width (VMEM sizing knob; w_out % wt == 0).
    """
    h_in, w_in, cin, n = x.shape
    ce = we.shape[1]
    s, k, p = stride, ksize, ksize // 2
    h_out, w_out = h_in // s, w_in // s
    assert w_out % wt == 0, (w_out, wt)
    n_wtiles = w_out // wt
    n_specs = s + p
    bw = s * wt

    kern = functools.partial(
        _kernel, k=k, s=s, wt=wt, h_in=h_in, w_in=w_in, cin=cin, ce=ce,
        n=n, n_specs=n_specs)

    def mk_row_maps(j):
        def base_r(ih):
            return jnp.clip(s * ih + p - j, 0, h_in - 1)

        return (
            lambda iw, ih: (base_r(ih), jnp.maximum(iw - 1, 0), 0, 0),
            lambda iw, ih: (base_r(ih), iw, 0, 0),
            lambda iw, ih: (base_r(ih), jnp.minimum(iw + 1, n_wtiles - 1),
                            0, 0),
        )

    x_specs = []
    for j in range(n_specs):
        for m in mk_row_maps(j):
            x_specs.append(pl.BlockSpec((1, bw, cin, n), m,
                                        memory_space=pltpu.VMEM))

    def small(shape):
        return pl.BlockSpec(shape, lambda iw, ih: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    e = bw + 2 * p
    y, se = pl.pallas_call(
        kern,
        grid=(n_wtiles, h_out),
        in_specs=x_specs + [
            small((ce, cin)),       # we (transposed)
            small((ce, 1, 1)),      # b0
            small((ce, 1, n)),      # m1
            small((k, k, ce, 1, 1)),  # wd
            small((ce, 1, 1)),      # b1
            small((ce, 1, n)),      # m2
        ],
        out_specs=[
            pl.BlockSpec((1, wt, ce, n), lambda iw, ih: (ih, iw, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ce, n), lambda iw, ih: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h_out, w_out, ce, n), x.dtype),
            jax.ShapeDtypeStruct((ce, n), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((k * ce, e, n), x.dtype),      # expanded ring (folded)
            pltpu.VMEM((ce, n), jnp.float32),         # SE accumulator
        ],
        interpret=interpret,
    )(*([x] * (3 * n_specs)), jnp.swapaxes(we, 0, 1),
      b0.reshape(ce, 1, 1), m1.reshape(ce, 1, n),
      wd.reshape(k, k, ce, 1, 1), b1.reshape(ce, 1, 1),
      m2.reshape(ce, 1, n))
    return y, se
