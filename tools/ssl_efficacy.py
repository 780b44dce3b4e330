"""SSL efficacy A/B: do STAC pseudo-labels (and CSD consistency) IMPROVE a
student over its teacher at equal step budget?

The reference implements STAC/CSD (`/root/reference/src/SSL_stac.py:656-768`,
CSD loss `src/train_lib.py:1452-1586`) but ships no efficacy experiment;
round-3 VERDICT asks for evidence the SSL branches help, not just run.

Protocol (synthetic op-256 set):
  labeled   : small labeled split (default 32 images)
  unlabeled : the remaining pool, labels stripped
  teacher   : trained on labeled only, student-half step budget
  control   : trained on labeled only, FULL student step budget
              (rules out the more-steps confound)
  student   : teacher pseudo-labels the pool (score threshold tau) ->
              labeled+pseudo zip batches with the STAC loss split
              (`config.unlabeled_start`), full budget
  csd       : labeled+unlabeled zip batches with the flip-consistency CSD
              loss, full budget (optional arm)

All arms share datasets, eval protocol (COCOEvaluator via
tools/ab_parity.eval_ours) and seeds. Writes docs/SSL_AB.json.
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

from udal_tpu.data import example_codec as codec   # noqa: E402
from udal_tpu.data import tfrecord as tfr          # noqa: E402


def split_dataset(full_path, labeled_path, unlabeled_path, n_labeled, seed):
    records = list(tfr.iterate_tfrecord(full_path))
    rng = np.random.RandomState(seed)
    idx = rng.permutation(len(records))
    with tfr.TFRecordWriter(labeled_path) as w:
        for i in idx[:n_labeled]:
            w.write(records[i])
    with tfr.TFRecordWriter(unlabeled_path) as w:
        for i in idx[n_labeled:]:
            feats = codec.parse_example(records[i])
            for k in list(feats):
                if k.startswith("image/object/"):
                    feats[k] = []
            w.write(codec.serialize_example(feats))
    return len(records) - n_labeled


def decode_pool_images(unlabeled_path):
    """{filename: uint8 RGB} straight from the TFRecord."""
    import cv2

    images = {}
    for rec in tfr.iterate_tfrecord(unlabeled_path):
        feats = codec.parse_example(rec)
        name = feats["image/filename"][0].decode()
        buf = np.frombuffer(feats["image/encoded"][0], np.uint8)
        images[name] = cv2.cvtColor(cv2.imdecode(buf, cv2.IMREAD_COLOR),
                                    cv2.COLOR_BGR2RGB)
    return images


def base_config(args):
    from udal_tpu.config import get_detection_config

    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = args.image_size
    cfg.num_classes = args.num_classes
    cfg.loss_attenuation = True
    # Without beta-NLL the attenuation loss collapses the trainer at this
    # op point and the arms measure the collapse, not SSL
    # (docs/COLLAPSE_ROOTCAUSE.md).
    cfg.la_beta_nll = args.beta
    cfg.mc_dropout = False
    cfg.enable_softmax = True
    cfg.num_epochs = 10
    cfg.moving_average_decay = 0
    if args.repeats:
        cfg.fpn_cell_repeats = args.repeats
        cfg.box_class_repeats = args.repeats
    cfg.override({"batch_size": args.batch}, allow_new_keys=True)
    return cfg


def train(cfg, make_iter, steps, seed, log, tag):
    import jax

    from udal_tpu.train.train_lib import (create_train_state,
                                          make_jitted_train_step)

    spe = max(1, steps // 10)
    model, state, tx, schedule = create_train_state(
        cfg, jax.random.PRNGKey(seed), steps_per_epoch=spe)
    step_fn = make_jitted_train_step(cfg, model, tx, schedule, spe)
    it = make_iter(cfg)
    t0 = time.time()
    rng = jax.random.PRNGKey(777 + seed)
    for step in range(1, steps + 1):
        images, labels = next(it)
        labels = {k: v for k, v in labels.items() if not isinstance(v, list)}
        state, vals = step_fn(state, images, labels, rng)
    log(f"  [{tag}] {steps} steps in {time.time() - t0:.0f}s "
        f"(loss={float(vals['loss']):.3f})")
    return model, state


def labeled_iter(path, batch, seed):
    from udal_tpu.data.dataloader import InputReader

    def make(cfg):
        return InputReader(path, is_training=True, seed=seed)(cfg, batch)
    return make


def zip_iter(path_l, path_u, batch_l, batch_u, seed, ssl_overrides):
    """labeled + unlabeled/pseudo zip with the unlabeled_start split —
    the cmd_train_ssl composition (`udal_tpu/cli.py:111-171`)."""
    from udal_tpu.data.composition import zip_readers
    from udal_tpu.data.dataloader import InputReader

    def make(cfg):
        cfg.override(dict(ssl_overrides, unlabeled_start=batch_l),
                     allow_new_keys=True)
        r_l = InputReader(path_l, is_training=True, seed=seed)
        r_u = InputReader(path_u, is_training=True, seed=seed + 1)
        return zip_readers(r_l, r_u, cfg, batch_l, batch_u)
    return make


def pseudo_label(cfg, state, unlabeled_path, args, work, log):
    """Teacher serves the pool; score-thresholded pseudo TFRecord."""
    import jax

    from udal_tpu.apps.infer import InferImages
    from udal_tpu.apps.serving import ServingDriver
    from udal_tpu.apps.ssl import select_pseudo_labels, write_pseudo_tfrecord

    scfg = cfg.copy()
    scfg.mc_dropout = args.mc_samples > 1
    scfg.mc_dropoutrate = 0.05
    scfg.mc_dropoutsamp = args.mc_samples
    scfg.is_training_bn = False
    drv = ServingDriver(
        scfg, {"params": state.params, "batch_stats": state.batch_stats},
        batch_size=args.batch, dtype=jax.numpy.bfloat16)

    images = decode_pool_images(unlabeled_path)
    names = sorted(images)
    app = InferImages(drv, os.path.join(work, "teacher_infer"),
                      min_score=0.05)
    batches = []
    for i in range(0, len(names), args.batch):
        chunk = names[i:i + args.batch]
        if len(chunk) < args.batch:
            chunk = chunk + [chunk[-1]] * (args.batch - len(chunk))
        batches.append((np.stack([images[n] for n in chunk])
                        .astype(np.float32), chunk))
    rows = app.run(batches)
    sel = select_pseudo_labels(rows, args.pseudo_strategy, args.tau,
                               with_scores=True)
    sel_names, classes, boxes, scores = sel
    # de-duplicate the pad images
    uniq = [i for i, n in enumerate(sel_names)
            if n not in set(sel_names[:i])]
    sel_names = [sel_names[i] for i in uniq]
    classes = [classes[i] for i in uniq]
    boxes = [boxes[i] for i in uniq]
    scores = [scores[i] for i in uniq]
    path = os.path.join(work, "pseudo.tfrecord")
    n = write_pseudo_tfrecord(path, images, sel_names, classes, boxes,
                              scores if args.pseudoscore else None)
    n_dets = int(sum(len(c) for c in classes))
    log(f"  [pseudo] {n} images, {n_dets} pseudo boxes "
        f"(tau={args.tau}, strategy={args.pseudo_strategy})")
    return path, n, n_dets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool", type=int, default=256)
    ap.add_argument("--labeled", type=int, default=32)
    ap.add_argument("--val", type=int, default=48)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--num-classes", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--teacher-steps", type=int, default=400)
    ap.add_argument("--student-steps", type=int, default=800)
    ap.add_argument("--tau", type=float, default=0.5)
    ap.add_argument("--tau-sweep", default=None,
                    help="comma floats: train ONE teacher, then one student "
                         "arm per tau (reuses the teacher + pool decode)")
    ap.add_argument("--pseudo-strategy", default="score")
    ap.add_argument("--pseudoscore", action="store_true",
                    help="weight pseudo batches by mean detection score")
    ap.add_argument("--mc-samples", type=int, default=1)
    ap.add_argument("--arms", default="teacher,control,student,csd")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--repeats", type=int, default=None)
    ap.add_argument("--beta", type=float, default=1.0,
                    help="la_beta_nll (0 = reference-parity NLL, which collapses)")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "SSL_AB.json"))
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        args.pool, args.labeled, args.val, args.image_size = 16, 6, 6, 64
        args.batch, args.teacher_steps, args.student_steps = 2, 6, 10
        args.repeats = 1
        args.tau = 0.01

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    from tools.ab_parity import eval_ours
    from udal_tpu.data.synthetic import write_synthetic_dataset

    work = tempfile.mkdtemp(prefix="ssl_ab_")
    full = os.path.join(work, "full.tfrecord")
    val_path = os.path.join(work, "val.tfrecord")
    write_synthetic_dataset(full, num_images=args.pool,
                            height=args.image_size, width=args.image_size,
                            num_classes=args.num_classes, seed=args.seed)
    write_synthetic_dataset(val_path, num_images=args.val,
                            height=args.image_size, width=args.image_size,
                            num_classes=args.num_classes, seed=args.seed + 1)
    labeled = os.path.join(work, "labeled.tfrecord")
    unlabeled = os.path.join(work, "unlabeled.tfrecord")
    n_unlabeled = split_dataset(full, labeled, unlabeled, args.labeled,
                                args.seed)
    log(f"labeled {args.labeled} / unlabeled {n_unlabeled} / val {args.val}")

    arms = args.arms.split(",")
    report = {"config": vars(args), "arms": {}}

    def save():
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)

    teacher_state = None
    cfg_t = base_config(args)
    if {"teacher", "student"} & set(arms):
        model, teacher_state = train(
            cfg_t, labeled_iter(labeled, args.batch, args.seed),
            args.teacher_steps, args.seed, log, "teacher")
        res = eval_ours(cfg_t, model, teacher_state, val_path, args.batch)
        report["arms"]["teacher"] = dict(res, steps=args.teacher_steps)
        log(f"  [teacher] AP={res['AP']:.4f}")
        save()

    if "control" in arms:
        cfg = base_config(args)
        model, state = train(
            cfg, labeled_iter(labeled, args.batch, args.seed),
            args.student_steps, args.seed, log, "control")
        res = eval_ours(cfg, model, state, val_path, args.batch)
        report["arms"]["control"] = dict(res, steps=args.student_steps)
        log(f"  [control] AP={res['AP']:.4f}")
        save()

    taus = ([float(t) for t in args.tau_sweep.split(",")]
            if args.tau_sweep else [args.tau])
    for tau in taus if "student" in arms and teacher_state is not None \
            else []:
        args.tau = tau
        arm = "student" if len(taus) == 1 else f"student_tau{tau:g}"
        pseudo, n_img, n_det = pseudo_label(cfg_t, teacher_state, unlabeled,
                                            args, work, log)
        if n_img == 0:
            log(f"  [{arm}] SKIPPED: teacher produced no pseudo labels "
                "above tau")
            report["arms"][arm] = {"skipped": "no pseudo labels"}
            save()
            continue
        cfg = base_config(args)
        b_l = args.batch // 2
        model, state = train(
            cfg, zip_iter(labeled, pseudo, b_l, args.batch - b_l,
                          args.seed, {"ssl_method": "STAC",
                                      "stac_lambda": 1.0}),
            args.student_steps, args.seed, log, arm)
        res = eval_ours(cfg, model, state, val_path, args.batch)
        report["arms"][arm] = dict(
            res, steps=args.student_steps, tau=tau, pseudo_images=n_img,
            pseudo_boxes=n_det)
        log(f"  [{arm}] AP={res['AP']:.4f}")
        save()

    if "csd" in arms:
        cfg = base_config(args)
        b_l = args.batch // 2
        model, state = train(
            cfg, zip_iter(labeled, unlabeled, b_l, args.batch - b_l,
                          args.seed, {"ssl_method": "CSD", "csd_ramp": True,
                                      "csd_BE": True, "csd_BE_thr": 0.0}),
            args.student_steps, args.seed, log, "csd")
        res = eval_ours(cfg, model, state, val_path, args.batch)
        report["arms"]["csd"] = dict(res, steps=args.student_steps)
        log(f"  [csd] AP={res['AP']:.4f}")
        save()

    a = {k: v for k, v in report["arms"].items() if "AP" in v}
    students = {k: v for k, v in a.items() if k.startswith("student")}
    if students:
        best = max(students, key=lambda k: students[k]["AP"])
        report["best_student_arm"] = best
        a["student"] = students[best]
    if "student" in a and "control" in a:
        report["student_minus_control_AP"] = a["student"]["AP"] - \
            a["control"]["AP"]
    if "student" in a and "teacher" in a:
        report["student_minus_teacher_AP"] = a["student"]["AP"] - \
            a["teacher"]["AP"]
    if "csd" in a and "control" in a:
        report["csd_minus_control_AP"] = a["csd"]["AP"] - a["control"]["AP"]
    save()
    print(json.dumps({k: v for k, v in report.items() if k != "config"}))


if __name__ == "__main__":
    main()
