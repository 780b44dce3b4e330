"""Uncertainty decoding and aggregation (JAX, TPU-native).

Implements the exact non-linear uncertainty decoding of arXiv 2306.08981 as
pure jittable math — behavioral parity with the reference
(`/root/reference/src/utils_box.py:105-292`, `src/utils_extra.py:142-244`)
but redesigned TPU-first:

* ``l-norm`` / ``n-flow``: closed-form log-normal / transformed-distribution
  moments. The reference routes ``n-flow`` through TFP bijectors; the
  resulting moments are the same closed form, so here both run the analytic
  expressions directly on-device (no TFP dependency, fully fusible).
* ``sample``: Monte-Carlo propagation through the decode using
  ``jax.random`` (vectorized over a sample axis instead of TFP
  MultivariateNormalDiag).
* MC-dropout aggregation: the reference loops T full forward passes in Python
  and stacks on host; here the sample axis is a leading vmapped axis and the
  mean/std reductions happen in HBM.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from udal_tpu.ops.anchors import anchors_to_centersize


def _corner_moments(ycenter, xcenter, h, w, dycenter, dxcenter, dh, dw):
    """Means/variances of corners from center-size means/variances."""
    ymin = ycenter - h / 2.0
    xmin = xcenter - w / 2.0
    ymax = ycenter + h / 2.0
    xmax = xcenter + w / 2.0
    dymin = dycenter + dh / 4.0
    dxmin = dxcenter + dw / 4.0
    dymax = dycenter + dh / 4.0
    dxmax = dxcenter + dw / 4.0
    return (ymin, xmin, ymax, xmax), (dymin, dxmin, dymax, dxmax)


def decode_uncert(pred_boxes: jnp.ndarray, box_uncert: jnp.ndarray,
                  anchor_boxes: jnp.ndarray, method: str = "l-norm",
                  n_samples: int = 30,
                  key: jax.Array | None = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode anchor-relative (mean, std) box distributions to absolute ones.

    Args:
      pred_boxes: [..., 4] regression means (ty, tx, th, tw).
      box_uncert: [..., 4] regression stds.
      anchor_boxes: [N, 4] anchors (broadcast against leading axes).
      method: 'l-norm' | 'n-flow' | 'sample' | 'falsedec'.
      n_samples: samples for the 'sample' method.
      key: PRNG key for 'sample' (defaults to a fixed seed, matching the
        reference's use of TFP's default sampling without a user seed).

    Returns:
      (boxes [..., 4] y1x1y2x2, stds [..., 4]).

    Parity: `utils_box.py:105-286`. Computation runs in float64-equivalent
    f32 (the reference upcasts to f64 on CPU; on TPU f32 is the native wide
    type and matches within decode tolerance).
    """
    orig_dtype = pred_boxes.dtype
    compute = jnp.float32
    anchor_boxes = anchor_boxes.astype(compute)
    ycenter_a, xcenter_a, ha, wa = anchors_to_centersize(anchor_boxes)

    pred_boxes = pred_boxes.astype(compute)
    ty, tx, th, tw = jnp.moveaxis(pred_boxes, -1, 0)
    pred_var = jnp.square(box_uncert.astype(compute))
    dty, dtx, dth, dtw = jnp.moveaxis(pred_var, -1, 0)

    if method in ("l-norm", "n-flow"):
        # Exact moments: centers are affine in normal ty/tx; sizes are scaled
        # log-normals. 'n-flow' in the reference builds the same distributions
        # via TFP bijectors — identical closed-form mean/variance.
        w = jnp.exp(tw + dtw / 2) * wa
        h = jnp.exp(th + dth / 2) * ha
        ycenter = ty * ha + ycenter_a
        xcenter = tx * wa + xcenter_a
        dw = (jnp.exp(dtw) - 1) * jnp.exp(2 * tw + dtw) * wa ** 2
        dh = (jnp.exp(dth) - 1) * jnp.exp(2 * th + dth) * ha ** 2
        dycenter = dty * ha ** 2
        dxcenter = dtx * wa ** 2
        corners, dcorners = _corner_moments(ycenter, xcenter, h, w,
                                            dycenter, dxcenter, dh, dw)
    elif method == "sample":
        if key is None:
            key = jax.random.PRNGKey(0)
        t_mean = jnp.stack([ty, tx, th, tw], axis=0)
        t_std = jnp.sqrt(jnp.stack([dty, dtx, dth, dtw], axis=0))
        eps = jax.random.normal(key, (n_samples,) + t_mean.shape, dtype=compute)
        samp = t_mean[None] + eps * t_std[None]       # [S, 4, ...]
        sy, sx, sh, sw = samp[:, 0], samp[:, 1], samp[:, 2], samp[:, 3]
        w = jnp.exp(sw) * wa
        h = jnp.exp(sh) * ha
        ycenter = sy * ha + ycenter_a
        xcenter = sx * wa + xcenter_a
        stacked = jnp.stack([ycenter - h / 2, xcenter - w / 2,
                             ycenter + h / 2, xcenter + w / 2], axis=1)  # [S,4,...]
        mean = jnp.mean(stacked, axis=0)
        var = jnp.mean(jnp.square(stacked), axis=0) - jnp.square(mean)
        corners = tuple(mean[i] for i in range(4))
        dcorners = tuple(var[i] for i in range(4))
    elif method == "falsedec":
        # Naive (incorrect) decode baseline — kept for ablation parity
        # (`utils_box.py:247-266`).
        w = jnp.exp(tw) * wa
        h = jnp.exp(th) * ha
        ycenter = ty * ha + ycenter_a
        xcenter = tx * wa + xcenter_a
        dw = jnp.exp(dtw) * wa
        dh = jnp.exp(dth) * ha
        dycenter = dty * ha + ycenter_a
        dxcenter = dtx * wa + xcenter_a
        corners = (ycenter - h / 2, xcenter - w / 2, ycenter + h / 2, xcenter + w / 2)
        dcorners = (jnp.abs(dycenter - dh / 2), jnp.abs(dxcenter - dw / 2),
                    dycenter + dh / 2, dxcenter + dw / 2)
    else:
        raise ValueError(f"Unknown uncertainty decode method: {method!r}")

    coords = jnp.stack(corners, axis=-1).astype(orig_dtype)
    uncerts = jnp.sqrt(jnp.maximum(jnp.stack(dcorners, axis=-1), 0.0)).astype(orig_dtype)
    return coords, uncerts


def relativize_uncert(pred_boxes: jnp.ndarray, box_uncert: jnp.ndarray) -> jnp.ndarray:
    """Normalize per-coordinate stds by box height/width.

    Parity: `utils_box.py:279-292`. Works on any leading batch axes.
    """
    height = pred_boxes[..., 2] - pred_boxes[..., 0]
    width = pred_boxes[..., 3] - pred_boxes[..., 1]
    scaling = jnp.stack([height, width, height, width], axis=-1)
    return box_uncert / scaling


def mc_moments(stacked: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean and std over the leading MC-sample axis.

    Parity with `utils_extra.py:220-244` (get_mcuncert) but as one fused
    reduction on device; input is [T, ...]. Accumulates in float32 so the
    surrounding pipeline can stay bf16 (HBM-bandwidth-bound) without losing
    moment precision.
    """
    x = stacked.astype(jnp.float32)
    mean = jnp.mean(x, axis=0)
    var = jnp.mean(jnp.square(x), axis=0) - jnp.square(mean)
    return mean, jnp.sqrt(jnp.maximum(var, 0.0))


def clip_uncert(log_sigma_sq: jnp.ndarray, clip_min: float, clip_max: float) -> jnp.ndarray:
    """Clip predicted log-variance to a sane range during training.

    Parity: `train_lib.py:1220-1241` (_clip_uncert) — the box head's extra
    channels predict log(sigma^2); clipping is applied in sigma domain.
    """
    sigma = jnp.sqrt(jnp.exp(log_sigma_sq))
    sigma = jnp.clip(sigma, clip_min, clip_max)
    return jnp.log(jnp.square(sigma))


def entropy_from_logits(logits: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Shannon entropy of softmax(logits) — classification uncertainty."""
    logp = jax.nn.log_softmax(logits, axis=axis)
    p = jnp.exp(logp)
    return -jnp.sum(p * logp, axis=axis)
