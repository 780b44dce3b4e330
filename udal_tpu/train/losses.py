"""Detection losses (JAX) — focal, box (huber/MSE ± attenuation NLL), IoU.

Behavioral parity with the reference losses
(`/root/reference/src/train_lib.py:737-906,1220-1415`), as pure functions:

* focal loss with the normalizer folded in (`train_lib.py:737-788`);
* box loss with **loss attenuation**: the box head's extra 4·A channels are
  per-anchor (sigma_y, sigma_x, sigma_h, sigma_w); training adds sigma^2/2 to
  the *height/width* regression means to compensate the log-normal decode
  (`decode_uncert`'s exp(t + sigma^2/2)), and minimizes the NLL
  0.25 * sum(L/sigma^2 + log(1 + sigma^2)) / normalizer
  (`train_lib.py:817-870`). NOTE — deliberate deviation: the reference
  selects the "h/w" channels by slicing the second half of the channel axis,
  which under the per-anchor-interleaved layout actually hits the latter half
  of the anchors (all four coords). Here the compensation is applied to the
  true (th, tw) channels of every anchor (k % 4 in {2, 3}), matching the
  decode math the compensation exists for.
* per-level aggregation with cls-target −2 masking, one-hot with background
  (-1) mapping to the all-zeros row, optional per-image pseudo-score
  weighting, LA box loss averaged over levels (`train_lib.py:1244-1415`);
* CSD consistency loss: JSD on softmax + flip-consistent box MSE with
  x-offset sign flip and background elimination (`train_lib.py:1452-1586`).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from udal_tpu.ops import anchors as anchor_lib
from udal_tpu.ops.boxes import iou_loss as iou_loss_fn


def huber(targets: jnp.ndarray, preds: jnp.ndarray, delta: float) -> jnp.ndarray:
    """Elementwise Huber loss (Keras convention)."""
    err = targets - preds
    abs_err = jnp.abs(err)
    quad = jnp.minimum(abs_err, delta)
    lin = abs_err - quad
    return 0.5 * quad * quad + delta * lin


def focal_loss(y_true: jnp.ndarray, y_pred: jnp.ndarray, alpha: float,
               gamma: float, normalizer: jnp.ndarray,
               label_smoothing: float = 0.0) -> jnp.ndarray:
    """Elementwise focal loss / normalizer — parity `train_lib.py:737-788`."""
    pred_prob = jax.nn.sigmoid(y_pred)
    p_t = y_true * pred_prob + (1 - y_true) * (1 - pred_prob)
    alpha_factor = y_true * alpha + (1 - y_true) * (1 - alpha)
    modulating = (1.0 - p_t) ** gamma
    y_smooth = y_true * (1.0 - label_smoothing) + 0.5 * label_smoothing
    # numerically-stable sigmoid BCE with logits
    ce = jnp.maximum(y_pred, 0) - y_pred * y_smooth + jnp.log1p(
        jnp.exp(-jnp.abs(y_pred)))
    return alpha_factor * modulating * ce / normalizer


def clip_uncert_channels(box_output: jnp.ndarray, clip_min: float,
                         clip_max: float) -> jnp.ndarray:
    """Clip the sigma half of an 8·A box map — parity `train_lib.py:1220-1241`."""
    half = box_output.shape[-1] // 2
    mu = box_output[..., :half]
    sigma = jnp.clip(box_output[..., half:], clip_min, clip_max)
    return jnp.concatenate([mu, sigma], axis=-1)


def box_loss(box_targets: jnp.ndarray, box_output: jnp.ndarray,
             num_positives: jnp.ndarray, delta: float = 0.1,
             loss_att: bool = False, loss_type: str = "huber",
             pseudo_scores: Optional[jnp.ndarray] = None,
             strict_parity: bool = False,
             beta_nll: float = 0.0) -> jnp.ndarray:
    """Per-level box regression loss — parity `train_lib.py:789-870`.

    Args:
      box_targets: [B, H, W, 4A].
      box_output: [B, H, W, 4A] or [B, H, W, 8A] with attenuation.
      num_positives: scalar normalizer (sum positives + 1).
      pseudo_scores: optional [B] per-image weights.
      strict_parity: reproduce the reference's sigma^2/2 compensation slice
        bit-exactly — the reference adds it to the SECOND HALF of the mu
        channel axis (`train_lib.py:817-845`), which under the per-anchor
        (a, coord) interleaved layout is the latter half of the anchors
        rather than the (th, tw) coords; False applies it to the true
        (th, tw) channels of every anchor (the decode the compensation
        exists for). A/B: docs/LOSS_PARITY_AB.md.
      beta_nll: beta-NLL stabilization (Seitzer et al., ICLR 2022,
        "On the Pitfalls of Heteroscedastic Uncertainty Estimation").
        Scales the per-element NLL by stop_grad(sigma^(2*beta)), removing
        the 1/sigma^2 gradient amplification that the reference's plain
        NLL suffers on floor-riding anchors (clip_min_uncert=0.01 gives a
        1e4x multiplier; measured collapse: docs/COLLAPSE_ROOTCAUSE.md).
        beta=0 (default) is exact reference-parity NLL; beta=1 makes the
        mu-gradient identical to the plain Huber gradient while sigma
        still learns from the residual term.
    """
    normalizer = num_positives * 4.0
    if loss_att:
        half = box_output.shape[-1] // 2
        sigma = box_output[..., half:]
        mu = box_output[..., :half]
        n_anchors4 = mu.shape[-1]
        if strict_parity:
            idx = jnp.arange(n_anchors4)
            hw_mask = (idx >= n_anchors4 // 2).astype(mu.dtype)
        else:
            coord = jnp.arange(n_anchors4) % 4
            hw_mask = (coord >= 2).astype(mu.dtype)
        mu = mu + hw_mask * jnp.square(sigma) / 2.0
        box_output = mu

    mask = (box_targets != 0.0).astype(box_output.dtype)
    if loss_type == "huber":
        per_elem = huber(box_targets, box_output, delta)
    else:
        per_elem = jnp.square(box_targets - box_output)
    if pseudo_scores is not None:
        per_elem = per_elem * pseudo_scores[:, None, None, None]

    if loss_att:
        var = jnp.square(sigma)
        nll = per_elem / var + jnp.log1p(var)
        if beta_nll:
            nll = nll * jax.lax.stop_gradient(var ** beta_nll)
        return 0.25 * jnp.sum(nll * mask) / normalizer
    return jnp.sum(per_elem * mask) / normalizer


def detection_loss(config, cls_outputs: Sequence[jnp.ndarray],
                   box_outputs: Sequence[jnp.ndarray],
                   labels: Dict[str, jnp.ndarray],
                   pseudo_scores: Optional[jnp.ndarray] = None
                   ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total detection loss over all levels — parity `train_lib.py:1244-1415`.

    labels keys: 'cls_targets_<l>' [B,H,W,A] int, 'box_targets_<l>'
    [B,H,W,4A], 'mean_num_positives' [B].
    """
    dtype = cls_outputs[0].dtype
    num_positives_sum = jnp.sum(labels["mean_num_positives"]) + 1.0
    num_positives_sum = num_positives_sum.astype(dtype)

    cls_losses = []
    box_losses = []
    for level_idx in range(len(cls_outputs)):
        level = level_idx + config.min_level
        cls_t = labels[f"cls_targets_{level}"]
        onehot = jax.nn.one_hot(cls_t, config.num_classes, dtype=dtype)
        b, h, w = onehot.shape[:3]
        onehot_flat = onehot.reshape(b, h, w, -1)
        cls_l = focal_loss(onehot_flat, cls_outputs[level_idx], config.alpha,
                           config.gamma, num_positives_sum,
                           config.label_smoothing)
        cls_l = cls_l.reshape(b, h, w, -1, config.num_classes)
        # mask ignored anchors (cls target -2)
        cls_l = cls_l * (cls_t != -2)[..., None].astype(dtype)
        if pseudo_scores is not None:
            cls_l = cls_l * pseudo_scores[:, None, None, None, None]
        cls_losses.append(jnp.sum(cls_l))

        box_losses.append(box_loss(
            labels[f"box_targets_{level}"], box_outputs[level_idx],
            num_positives_sum, delta=config.delta,
            loss_att=bool(config.loss_attenuation),
            loss_type="huber" if config.boxloss_type == "huber" else "mse",
            pseudo_scores=pseudo_scores,
            strict_parity=bool(config.get("strict_loss_parity", False)),
            beta_nll=float(config.get("la_beta_nll", 0.0))))

    cls_loss_total = sum(cls_losses)
    if config.loss_attenuation:
        box_loss_total = sum(box_losses) / len(box_losses)
    else:
        box_loss_total = sum(box_losses)

    box_iou = jnp.asarray(0.0, dtype)
    if config.iou_loss_type:
        anchors = anchor_lib.from_config(config)
        level_slices = anchors.level_slices()
        outs, tgts, anchor_rows = [], [], []
        for level_idx in range(len(box_outputs)):
            level = level_idx + config.min_level
            o = box_outputs[level_idx]
            if config.loss_attenuation:
                o = o[..., : o.shape[-1] // 2]
            outs.append(o.reshape(-1, 4))
            tgts.append(labels[f"box_targets_{level}"].reshape(-1, 4))
            s, e = level_slices[level]
            lvl_anchors = anchors.boxes[s:e]
            anchor_rows.append(jnp.tile(lvl_anchors, (o.shape[0], 1)))
        out_flat = jnp.concatenate(outs, 0)
        tgt_flat = jnp.concatenate(tgts, 0)
        anc_flat = jnp.concatenate(anchor_rows, 0)
        mask = (tgt_flat != 0.0).astype(dtype)
        dec_out = anchor_lib.decode_box_outputs(out_flat, anc_flat) * mask
        dec_tgt = anchor_lib.decode_box_outputs(tgt_flat, anc_flat) * mask
        box_iou = jnp.sum(iou_loss_fn(dec_out, dec_tgt, config.iou_loss_type)) \
            / (num_positives_sum * 4.0)

    total = (cls_loss_total + config.box_loss_weight * box_loss_total +
             config.iou_loss_weight * box_iou)
    loss_vals = {"det_loss": total, "cls_loss": cls_loss_total,
                 "box_loss": box_loss_total}
    if config.iou_loss_type:
        loss_vals["box_iou_loss"] = box_iou
    return total, loss_vals


def csd_consistency_loss(config, cls_outputs, box_outputs, cls_outputs_aug,
                         box_outputs_aug) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CSD flip-consistency loss — parity `train_lib.py:1452-1586`.

    The augmented forward sees the horizontally-flipped image; its feature
    maps are mirrored back (flip W axis, anchors per location keep order) and
    compared: JSD between softmaxed class maps, MSE between box maps with
    the x-offset sign flipped. Background elimination keeps only anchors
    whose max background-excluded probability mass is high in both views.
    """
    eps = 1e-10
    cls_l, box_l = [], []
    be_thr = float(config.get("csd_BE_thr", 0.0) or 0.0)
    use_be = bool(config.get("csd_BE", True))
    for level_idx in range(len(cls_outputs)):
        c = cls_outputs[level_idx]
        ca = jnp.flip(cls_outputs_aug[level_idx], axis=2)
        b_, h, w, _ = c.shape
        a = c.shape[-1] // config.num_classes
        c = c.reshape(b_, h, w, a, config.num_classes)
        ca = ca.reshape(b_, h, w, a, config.num_classes)
        p = jax.nn.softmax(c, axis=-1)
        pa = jax.nn.softmax(ca, axis=-1)
        m = 0.5 * (p + pa)
        jsd = 0.5 * (jnp.sum(p * (jnp.log(p + eps) - jnp.log(m + eps)), -1) +
                     jnp.sum(pa * (jnp.log(pa + eps) - jnp.log(m + eps)), -1))

        bx = box_outputs[level_idx].reshape(b_, h, w, a, 4)
        bxa = jnp.flip(box_outputs_aug[level_idx], axis=2).reshape(b_, h, w, a, 4)
        # mirror: ty, th, tw consistent; tx flips sign
        sign = jnp.asarray([1.0, -1.0, 1.0, 1.0], bx.dtype)
        mse = jnp.mean(jnp.square(bx - bxa * sign), axis=-1)

        if use_be:
            # background elimination: drop anchors dominated by background
            fg = jnp.max(p[..., 1:], axis=-1)
            fga = jnp.max(pa[..., 1:], axis=-1)
            keep = ((fg > be_thr) & (fga > be_thr)).astype(jsd.dtype)
            denom = jnp.maximum(jnp.sum(keep), 1.0)
            cls_l.append(jnp.sum(jsd * keep) / denom)
            box_l.append(jnp.sum(mse * keep) / denom)
        else:
            cls_l.append(jnp.mean(jsd))
            box_l.append(jnp.mean(mse))
    n = len(cls_l)
    return sum(cls_l) / n, sum(box_l) / n


def csd_ramp_weight(step: jnp.ndarray, total_steps: int) -> jnp.ndarray:
    """Ramp-up/ramp-down schedule for the CSD consistency weight.

    Parity: `train_lib.py:1417-1450` — exp(-5(1-t)^2) ramp-up over the first
    half..., linear composition simplified to the reference's piecewise form:
    ramp up during the first 10%, ramp down during the last 10%.
    """
    t = step.astype(jnp.float32) / max(total_steps, 1)
    up = jnp.exp(-5.0 * jnp.square(1.0 - jnp.clip(t / 0.1, 0.0, 1.0)))
    down = jnp.exp(-12.5 * jnp.square(jnp.clip((t - 0.9) / 0.1, 0.0, 1.0)))
    return up * down


def l2_regularization(params, weight_decay: float) -> jnp.ndarray:
    """weight_decay * sum ||w||^2 / 2 over kernel weights (excludes BN/bias).

    Parity: `_reg_l2_loss` (`train_lib.py`) which filters 'bn' and 'bias'.
    """
    total = 0.0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = "/".join(str(p.key) if hasattr(p, "key") else str(p)
                        for p in path).lower()
        if "bn" in name or "bias" in name or "batch" in name:
            continue
        total = total + jnp.sum(jnp.square(leaf))
    return weight_decay * total / 2.0
