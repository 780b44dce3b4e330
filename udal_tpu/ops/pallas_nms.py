"""Pallas TPU kernel: greedy (soft-)NMS entirely in VMEM.

The XLA version (`udal_tpu.ops.nms.soft_nms`) expresses the greedy loop as a
`lax.fori_loop` whose per-iteration argmax/IoU ops each round-trip HBM. This
kernel keeps the candidate boxes and working scores resident in VMEM for the
whole loop (N=5k candidates ≈ 100 KB), so the K sequential iterations touch
no HBM until the final index/score writeback.

Semantics match `nms.soft_nms` (TF NonMaxSuppressionV5): gaussian decay
below the IoU threshold, hard suppression above it, dead candidates excluded
from future selection, `valid_len` = picks above the score threshold.

Enable with `use_pallas=True` (off by default: compiled on TPU via Mosaic;
the XLA path remains the portable fallback, and interpret mode covers CPU
tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from udal_tpu.ops.nms import NEG_INF, NMSResult

LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _nms_kernel(boxes_ref, scores_ref, idx_ref, score_ref,
                work_ref, *, k: int, iou_threshold: float,
                score_threshold: float, sigma: float):
    """One image. boxes [4, Np] (coordinate-planar for lane-friendly math),
    scores [1, Np] in VMEM; outputs idx/score [1, Kp]."""
    np_ = scores_ref.shape[-1]
    kp = idx_ref.shape[-1]
    work_ref[:] = scores_ref[:]
    idx_ref[:] = jnp.zeros((1, kp), jnp.int32)
    score_ref[:] = jnp.full((1, kp), NEG_INF, jnp.float32)

    y1 = boxes_ref[0:1, :]
    x1 = boxes_ref[1:2, :]
    y2 = boxes_ref[2:3, :]
    x2 = boxes_ref[3:4, :]
    area = jnp.maximum(y2 - y1, 0.0) * jnp.maximum(x2 - x1, 0.0)
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (1, np_), 1)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (1, kp), 1)

    def body(i, _):
        work = work_ref[:]
        best_score = jnp.max(work)
        # argmax via masked iota-min (ties → lowest index, TF semantics)
        best = jnp.min(jnp.where(work == best_score, lane_idx,
                                 jnp.int32(np_)))
        # scalar stores to VMEM are unsupported on TPU: write the pick as a
        # masked vector update of the output rows
        sel = out_lane == i
        idx_ref[:] = jnp.where(sel, best, idx_ref[:])
        score_ref[:] = jnp.where(sel, best_score, score_ref[:])

        # extract the best box via masked reduction (dynamic gathers don't
        # lower on Mosaic)
        bmask = lane_idx == best
        by1 = jnp.sum(jnp.where(bmask, y1, 0.0))
        bx1 = jnp.sum(jnp.where(bmask, x1, 0.0))
        by2 = jnp.sum(jnp.where(bmask, y2, 0.0))
        bx2 = jnp.sum(jnp.where(bmask, x2, 0.0))
        barea = jnp.maximum(by2 - by1, 0.0) * jnp.maximum(bx2 - bx1, 0.0)

        iy1 = jnp.maximum(y1, by1)
        ix1 = jnp.maximum(x1, bx1)
        iy2 = jnp.minimum(y2, by2)
        ix2 = jnp.minimum(x2, bx2)
        inter = jnp.maximum(iy2 - iy1, 0.0) * jnp.maximum(ix2 - ix1, 0.0)
        union = area + barea - inter
        iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)

        if sigma > 0:
            weight = jnp.where(iou <= iou_threshold,
                               jnp.exp(-(iou * iou) / sigma), 0.0)
        else:
            weight = (iou <= iou_threshold).astype(work.dtype)
        decayed = work * weight
        dead = (weight == 0.0) | (decayed < score_threshold) | \
            (lane_idx == best)
        work_ref[:] = jnp.where(dead, NEG_INF, decayed)
        return 0

    jax.lax.fori_loop(0, k, body, 0)


def pallas_soft_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                    max_output_size: int, iou_threshold: float = 0.5,
                    score_threshold: float = 0.001, sigma: float = 0.5,
                    interpret: bool = False) -> NMSResult:
    """Greedy soft-NMS for [N, 4] boxes via one VMEM-resident kernel."""
    n = boxes.shape[0]
    np_ = _round_up(n, LANE)
    kp = _round_up(max_output_size, LANE)
    boxes_t = jnp.transpose(boxes.astype(jnp.float32))          # [4, N]
    boxes_p = jnp.pad(boxes_t, ((0, 0), (0, np_ - n)))
    scores_p = jnp.pad(scores.astype(jnp.float32)[None],
                       ((0, 0), (0, np_ - n)),
                       constant_values=NEG_INF)

    kernel = functools.partial(_nms_kernel, k=max_output_size,
                               iou_threshold=iou_threshold,
                               score_threshold=score_threshold, sigma=sigma)
    idx, sel_scores = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((1, kp), jnp.int32),
                   jax.ShapeDtypeStruct((1, kp), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((1, np_), jnp.float32)],
        interpret=interpret,
    )(boxes_p, scores_p)

    idx = idx[0, :max_output_size]
    sel_scores = sel_scores[0, :max_output_size]
    valid = (sel_scores > score_threshold) & (sel_scores > NEG_INF / 2)
    order = jnp.argsort(~valid, stable=True)
    idx = jnp.clip(idx[order], 0, n - 1)
    sel_scores = jnp.where(valid[order], sel_scores[order], 0.0)
    return NMSResult(idx, sel_scores, valid[order],
                     jnp.sum(valid).astype(jnp.int32))


def batched_pallas_soft_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                            max_output_size: int, iou_threshold: float = 0.5,
                            score_threshold: float = 0.001,
                            sigma: float = 0.5,
                            interpret: bool = False) -> NMSResult:
    fn = functools.partial(pallas_soft_nms, max_output_size=max_output_size,
                           iou_threshold=iou_threshold,
                           score_threshold=score_threshold, sigma=sigma,
                           interpret=interpret)
    return jax.vmap(fn)(boxes, scores)
