"""Ensemble ACCURACY evidence (VERDICT r3 #6): does fused deep-ensemble
epistemic sigma separate TP from FP detections better than single-model
MC dropout?

Round 3 committed the ensemble THROUGHPUT number (docs/ENSEMBLE_BENCH.json:
79.08 img/s, 1.34x the sequential 5-member floor) with unit tests only; no
evidence accompanied the fusion path that its epistemic signal is useful.
Fusion semantics match the MC reductions the reference applies over its
sample axis (`/root/reference/src/postprocess.py:326-331`,
`src/utils_extra.py:220-244` — the reference itself ships no ensemble).

Protocol (synthetic 4x-data op point, `tools/ab_parity.make_dataset`):
  members  : M cheap d0 trainings, seeds 0..M-1 (independent init + data
             order), identical budget
  single   : member 0 served with T-pass MC dropout -> per-detection
             relativized epistemic sigma (mcbox)
  ensemble : all M members stacked and served as one vmapped program
             (`ServingDriver(..., ensemble=True)`) -> fused epistemic sigma
  labels   : greedy TP/FP assignment vs groundtruth (IoU>=0.5, same class,
             score-descending, one detection per GT)
  metric   : AUROC of the epistemic score separating TP (y=1) from FP (y=0)
             via `apps.thresholding.roc_metrics` (low uncertainty must
             indicate correctness); detection score AUROC reported as the
             no-uncertainty baseline.

Writes the "accuracy" section into docs/ENSEMBLE_BENCH.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def train_member(train_path, args, seed, log):
    import jax

    from udal_tpu.config import get_detection_config
    from udal_tpu.data.dataloader import InputReader
    from udal_tpu.train.train_lib import (create_train_state,
                                          make_jitted_train_step)

    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = args.image_size
    cfg.num_classes = args.num_classes
    cfg.loss_attenuation = True
    # beta-NLL stabilization — see docs/COLLAPSE_ROOTCAUSE.md.
    cfg.la_beta_nll = args.beta
    cfg.mc_dropout = False
    cfg.enable_softmax = True
    cfg.num_epochs = 10
    cfg.moving_average_decay = 0
    if args.repeats:
        cfg.fpn_cell_repeats = args.repeats
        cfg.box_class_repeats = args.repeats
    cfg.override({"batch_size": args.batch}, allow_new_keys=True)

    spe = max(1, args.steps // 10)
    model, state, tx, schedule = create_train_state(
        cfg, jax.random.PRNGKey(seed), steps_per_epoch=spe)
    step_fn = make_jitted_train_step(cfg, model, tx, schedule, spe)
    it = InputReader(train_path, is_training=True, seed=seed)(cfg, args.batch)
    t0 = time.time()
    rng = jax.random.PRNGKey(9000 + seed)
    for _ in range(args.steps):
        images, labels = next(it)
        labels = {k: v for k, v in labels.items() if not isinstance(v, list)}
        state, vals = step_fn(state, images, labels, rng)
    it.close()
    log(f"  [member {seed}] {args.steps} steps in {time.time() - t0:.0f}s "
        f"(loss={float(vals['loss']):.3f})")
    return cfg, model, state


def collect(drv, val_path, batch):
    """Serve the val set -> packed DetectionPool (names preserved)."""
    from udal_tpu.apps import al_scoring as als
    from udal_tpu.data.dataloader import InputReader

    reader = InputReader(val_path, is_training=False, names=True)
    return als.collect_pool(
        drv, ((imgs, labels["image_names"], labels["image_scales"])
              for imgs, labels in reader(drv.config, batch)))


def tpfp_labels(pool, gt_by_name, min_score, iou_thr=0.5):
    """Per-detection (uncert_ep, det_score, y) rows.

    Greedy assignment mirroring `tools/ab_parity._det_hits`: detections in
    score-descending order claim the best unclaimed same-class GT at
    IoU >= iou_thr. Boxes are [y1,x1,y2,x2] original-frame corners on both
    sides.
    """
    from udal_tpu.apps.al_scoring import _rel_box_plane

    ep_plane = _rel_box_plane(pool.boxes, pool.feats["uncalib_mcbox"],
                              pool.mask)
    rows = []
    for i, name in enumerate(pool.names):
        gtb, gtc = gt_by_name[name]
        claimed = np.zeros(len(gtb), bool)
        valid = np.where(pool.mask[i] &
                         (pool.feats["det_score"][i] > min_score))[0]
        order = valid[np.argsort(-pool.feats["det_score"][i][valid])]
        for j in order:
            d = pool.boxes[i, j]
            best, bi = 0.0, -1
            for g in range(len(gtb)):
                if claimed[g] or int(gtc[g]) != int(pool.classes[i, j]):
                    continue
                yx1 = np.maximum(d[:2], gtb[g, :2])
                yx2 = np.minimum(d[2:], gtb[g, 2:])
                inter = float(np.prod(np.maximum(yx2 - yx1, 0)))
                area_d = float((d[2] - d[0]) * (d[3] - d[1]))
                area_g = float((gtb[g, 2] - gtb[g, 0]) *
                               (gtb[g, 3] - gtb[g, 1]))
                iou = inter / max(area_d + area_g - inter, 1e-9)
                if iou > best:
                    best, bi = iou, g
            hit = best >= iou_thr
            if hit:
                claimed[bi] = True
            rows.append((float(ep_plane[i, j]),
                         float(pool.feats["det_score"][i, j]), float(hit)))
    return np.asarray(rows, np.float64).reshape(-1, 3)


def auroc_section(rows):
    from udal_tpu.apps.thresholding import roc_metrics

    ep, score, y = rows[:, 0], rows[:, 1], rows[:, 2]
    out = {"n_detections": int(len(y)), "n_tp": int(y.sum()),
           "n_fp": int((1 - y).sum())}
    if len(np.unique(y)) < 2:
        out["auroc_epistemic"] = None
        return out
    r = roc_metrics(ep, y, fix_cd=False)
    out["auroc_epistemic"] = round(float(r[2]), 4) if r != 0 else None
    # low SCORE should indicate failure -> flip sign so "low uncert = good"
    r = roc_metrics(-score, y, fix_cd=False)
    out["auroc_det_score_baseline"] = (round(float(r[2]), 4)
                                       if r != 0 else None)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--members", type=int, default=3)
    ap.add_argument("--train-images", type=int, default=256)
    ap.add_argument("--val-images", type=int, default=64)
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--num-classes", type=int, default=2)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=900)
    ap.add_argument("--mc-samples", type=int, default=10)
    ap.add_argument("--min-score", type=float, default=0.2)
    ap.add_argument("--repeats", type=int, default=None)
    ap.add_argument("--beta", type=float, default=1.0,
                    help="la_beta_nll (0 = reference-parity NLL, which collapses)")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "ENSEMBLE_BENCH.json"))
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        args.members, args.train_images, args.val_images = 2, 12, 6
        args.image_size, args.batch, args.steps = 64, 2, 8
        args.mc_samples, args.repeats, args.min_score = 2, 1, 0.0

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    from tools.ab_parity import make_dataset
    from udal_tpu.apps.serving import ServingDriver
    from udal_tpu.models.ensemble import stack_variables

    work = tempfile.mkdtemp(prefix="ens_eff_")
    train_path = os.path.join(work, "train.tfrecord")
    val_path = os.path.join(work, "val.tfrecord")
    _, meta_v = make_dataset(train_path, val_path, args.train_images,
                             args.val_images, args.image_size,
                             args.num_classes, seed=0)
    gt_by_name = {f"img{int(m['source_id']):06d}.png":
                  (np.asarray(m["boxes"], np.float64),
                   np.asarray(m["classes"])) for m in meta_v}

    states = []
    cfg = model = None
    for seed in range(args.members):
        cfg, model, state = train_member(train_path, args, seed, log)
        states.append(state)

    scfg = cfg.copy()
    scfg.mc_dropout = True
    scfg.mc_dropoutrate = 0.05
    scfg.mc_dropoutsamp = args.mc_samples
    scfg.is_training_bn = False
    drv_mc = ServingDriver(
        scfg, {"params": states[0].params,
               "batch_stats": states[0].batch_stats},
        batch_size=args.batch, dtype=jax.numpy.bfloat16)
    pool_mc = collect(drv_mc, val_path, args.batch)
    rows_mc = tpfp_labels(pool_mc, gt_by_name, args.min_score)
    single = auroc_section(rows_mc)
    log(f"  [single-MC T={args.mc_samples}] {single}")

    stacked = stack_variables([{"params": s.params,
                                "batch_stats": s.batch_stats}
                               for s in states])
    # no member-internal dropout: epistemic signal comes from member
    # disagreement; the postprocess fuses the member axis regardless
    ecfg = cfg.copy()
    ecfg.mc_dropout = False
    ecfg.is_training_bn = False
    drv_ens = ServingDriver(ecfg, stacked, batch_size=args.batch,
                            dtype=jax.numpy.bfloat16, ensemble=True)
    pool_ens = collect(drv_ens, val_path, args.batch)
    rows_ens = tpfp_labels(pool_ens, gt_by_name, args.min_score)
    ens = auroc_section(rows_ens)
    log(f"  [ensemble M={args.members}] {ens}")

    section = {
        "protocol": (f"{args.members} members x {args.steps} steps, "
                     f"{args.train_images} imgs @{args.image_size}px "
                     f"{args.num_classes} classes; TP/FP IoU>=0.5 greedy "
                     f"same-class match on {args.val_images} val images; "
                     "AUROC of relativized epistemic sigma (mcbox), "
                     "roc_metrics fix_cd=False"),
        "single_model_mc": dict(single, T=args.mc_samples),
        "deep_ensemble": dict(ens, M=args.members),
    }
    if single.get("auroc_epistemic") and ens.get("auroc_epistemic"):
        section["ensemble_minus_mc_auroc"] = round(
            ens["auroc_epistemic"] - single["auroc_epistemic"], 4)

    report = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            report = json.load(f)
    report["accuracy"] = section
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(section))


if __name__ == "__main__":
    main()
