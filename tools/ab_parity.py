"""Long-horizon training-equivalence A/B: udal_tpu vs the live reference.

Trains BOTH frameworks on identical synthetic TFRecords at a small-but-real
operating point and compares the mAP trajectory, final mAP, and detection
confidence calibration (ECE), evaluated by the SAME evaluator
(udal_tpu.eval.coco.COCOEvaluator) on the same validation records.

Reference side: the real `train_lib.EfficientDetNetTrain.train_step`
(`/root/reference/src/train_lib.py:1588-1806`) driven by the real
`dataloader.InputReader` — imported read-only, with unavailable pip deps
stubbed. Evaluation uses the reference's own `postprocess.generate_detections`.

Ours: `train/loop.train_and_evaluate`-equivalent stepping via
`make_jitted_train_step` and `ServingDriver` detections, run with
`strict_loss_parity` both off (the TPU-native default (th,tw)-channel
compensation) and on (bit-parity loss math).

Usage:
  python tools/ab_parity.py [--steps 400] [--image-size 256] [--batch 4]
                            [--out docs/TRAIN_PARITY_AB.json] [--tiny]

Writes a JSON with the curves plus a markdown summary next to it.
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

EVAL_EVERY_FRACTIONS = (0.25, 0.5, 0.75, 1.0)


def make_dataset(path_train, path_val, n_train, n_val, size, num_classes,
                 seed=0):
    from udal_tpu.data.synthetic import write_synthetic_dataset

    meta_t = write_synthetic_dataset(path_train, num_images=n_train,
                                     height=size, width=size,
                                     num_classes=num_classes, seed=seed)
    meta_v = write_synthetic_dataset(path_val, num_images=n_val,
                                     height=size, width=size,
                                     num_classes=num_classes, seed=seed + 1)
    return meta_t, meta_v


def _ece(scores, hits, bins=10):
    scores = np.asarray(scores, np.float64)
    hits = np.asarray(hits, np.float64)
    if len(scores) == 0:
        return float("nan")
    edges = np.linspace(0, 1, bins + 1)
    ece = 0.0
    for lo, hi in zip(edges[:-1], edges[1:]):
        m = (scores > lo) & (scores <= hi)
        if m.sum():
            ece += m.mean() * abs(scores[m].mean() - hits[m].mean())
    return float(ece)


def _det_hits(det_rows, gt, iou_thr=0.5):
    """(score, hit) pairs: hit=1 when a det matches an unclaimed same-class
    GT with IoU>=thr. det_rows [N,7] = [img, x, y, w, h, score, cls]."""
    out = []
    for img_id in np.unique(det_rows[:, 0]).astype(int):
        dets = det_rows[det_rows[:, 0] == img_id]
        g = gt[img_id]
        gboxes = g[g[:, -1] > 0]
        claimed = np.zeros(len(gboxes), bool)
        for d in dets[np.argsort(-dets[:, 5])]:
            x, y, w, h, score, cls = d[1], d[2], d[3], d[4], d[5], d[6]
            best, bi = 0.0, -1
            for j, gb in enumerate(gboxes):
                if claimed[j] or int(gb[6]) != int(cls):
                    continue
                yx1 = np.maximum([y, x], gb[:2])
                yx2 = np.minimum([y + h, x + w], gb[2:4])
                inter = np.prod(np.maximum(yx2 - yx1, 0))
                union = h * w + (gb[2] - gb[0]) * (gb[3] - gb[1]) - inter
                iou = inter / max(union, 1e-9)
                if iou > best:
                    best, bi = iou, j
            hit = best >= iou_thr
            if hit:
                claimed[bi] = True
            out.append((float(score), float(hit)))
    return out


# ---------------------------------------------------------------------------
# Reference side
# ---------------------------------------------------------------------------

def _flush_partial(partial_path, curves):
    """Checkpoint the curve after every eval point: a background section
    killed near the end (session wall-clock) must not lose its curve."""
    if partial_path:
        with open(partial_path, "w") as f:
            json.dump(curves, f, indent=1)


def run_reference(train_path, val_path, steps, size, num_classes, batch,
                  eval_points, log, partial_path=None):
    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
    from udal_tpu.utils.reference_compat import (add_reference_to_path,
                                                 stub_reference_deps)

    stub_reference_deps()
    add_reference_to_path()

    import tensorflow as tf

    import dataloader as ref_dataloader
    import hparams_config as ref_hc
    import postprocess as ref_postprocess
    import train_flags as ref_train_flags
    import train_lib as ref_train_lib
    import utils as ref_utils

    config = ref_hc.get_detection_config("efficientdet-d0")
    config.image_size = ref_utils.parse_image_size(size)
    config.num_classes = num_classes
    config.loss_attenuation = True
    config.mc_dropout = False
    # op-point scoring path; also dodges a live reference bug
    # (`postprocess.py:470`: `return pre_nms_output.append(None)` → None
    # when enable_softmax=False)
    config.enable_softmax = True
    # Eval routes through postprocess_global (pyfunc=False,
    # per_class_nms=False in eval_reference): the pyfunc path calls pre_nms
    # without splitting LA channels (`postprocess.py:804-809` → crash with
    # loss_attenuation), and the graph per-class path clobbers `logits`
    # after the first class's gather (`postprocess.py:662` — silent garbage
    # on GPU, OOB error on CPU). The global path is the one the rebuild
    # mirrors, so it is also the right comparison.
    config.nms_configs.pyfunc = False
    config.batch_size = batch
    config.moving_average_decay = 0   # EMA off both sides (tfa absent)
    config.steps_per_execution = 1
    # schedule horizon: 10 nominal epochs over the step budget, so warmup
    # (1 epoch) ends at 10% of training instead of spanning all of it
    config.num_epochs = 10
    config.grad_checkpoint = False
    config.img_summary_steps = None
    config.override({"steps_per_epoch": max(1, steps // 10),
                     "model_dir": tempfile.mkdtemp(prefix="ab_ref_")},
                    allow_new_keys=True)

    # TF 2.10 semantics: the reference calls
    # `optimizer.learning_rate(optimizer.iterations)` (train_lib.py:1785),
    # which requires the pre-2.11 optimizer class; map to tf.keras's
    # `legacy` aliases under the installed TF 2.21
    if hasattr(tf.keras.optimizers, "legacy"):
        tf.keras.optimizers.SGD = tf.keras.optimizers.legacy.SGD
        tf.keras.optimizers.Adam = tf.keras.optimizers.legacy.Adam

    model = ref_train_lib.EfficientDetNetTrain(config=config)
    ref_train_flags.setup_model(model, config)

    train_ds = ref_dataloader.InputReader(
        train_path, is_training=True, use_fake_data=False,
        max_instances_per_image=config.max_instances_per_image)(
            config.as_dict(), batch_size=batch)
    it = iter(train_ds)
    tf_step = tf.function(model.train_step)

    curves = []
    t0 = time.time()
    for step in range(1, steps + 1):
        images, labels = next(it)
        tf_step(images, labels)
        if step in eval_points:
            res = eval_reference(model, config, ref_postprocess,
                                 ref_dataloader, val_path, batch)
            res["step"] = step
            res["wall_s"] = time.time() - t0
            curves.append(res)
            _flush_partial(partial_path, curves)
            log(f"[ref] step {step}: AP={res['AP']:.4f} "
                f"ECE={res['ECE']:.4f} ({res['wall_s']:.0f}s)")
    return curves


def eval_reference(model, config, ref_postprocess, ref_dataloader, val_path,
                   batch):
    """Mirrors `/root/reference/src/eval.py:108-151`: model forward →
    generate_detections → transform_detections, scored by OUR evaluator."""
    from udal_tpu.eval.coco import COCOEvaluator

    ds = ref_dataloader.InputReader(
        val_path, is_training=False,
        max_instances_per_image=config.max_instances_per_image)(
            config, batch_size=batch)
    evaluator = COCOEvaluator()
    pairs = []
    for images, labels in ds:
        cls_out, box_out = model(images, training=False)[:2]
        dets = ref_postprocess.generate_detections(
            config, cls_out, box_out,
            labels["image_scales"], labels["source_ids"],
            per_class_nms=False)
        dets = ref_postprocess.transform_detections(dets)
        rows = np.asarray(dets)
        gt = np.asarray(labels["groundtruth_data"]).copy()
        gt[..., :4] *= np.asarray(labels["image_scales"])[:, None, None]
        evaluator.update_state(gt, rows)
        gt_by_img = {int(rows[i, 0, 0]): gt[i] for i in range(len(gt))}
        pairs.extend(_det_hits(rows.reshape(-1, rows.shape[-1]), gt_by_img))
    res = evaluator.result()
    scores = [p[0] for p in pairs]
    hits = [p[1] for p in pairs]
    return {"AP": float(res["AP"]), "ECE": _ece(scores, hits)}


# ---------------------------------------------------------------------------
# Our side
# ---------------------------------------------------------------------------

def run_ours(train_path, val_path, steps, size, num_classes, batch,
             eval_points, strict, log, beta=0.0, partial_path=None):
    import jax

    from udal_tpu.config import get_detection_config
    from udal_tpu.data.dataloader import InputReader
    from udal_tpu.train.train_lib import (create_train_state,
                                          make_jitted_train_step)

    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = size
    cfg.num_classes = num_classes
    cfg.loss_attenuation = True
    cfg.mc_dropout = False
    cfg.enable_softmax = True   # op-point scoring path, both sides
    cfg.num_epochs = 10   # schedule horizon (see run_reference)
    cfg.moving_average_decay = 0      # EMA off both sides
    cfg.la_beta_nll = beta   # 0 = reference-parity NLL (both A/B sides)
    cfg.override({"batch_size": batch,
                  "strict_loss_parity": bool(strict)}, allow_new_keys=True)

    spe = max(1, steps // 10)
    model, state, tx, schedule = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=spe)
    step_fn = make_jitted_train_step(cfg, model, tx, schedule, spe)
    reader = InputReader(train_path, is_training=True, seed=0)
    it = reader(cfg, batch)

    curves = []
    t0 = time.time()
    rng = jax.random.PRNGKey(42)
    for step in range(1, steps + 1):
        images, labels = next(it)
        labels = {k: v for k, v in labels.items() if not isinstance(v, list)}
        state, vals = step_fn(state, images, labels, rng)
        if step in eval_points:
            res = eval_ours(cfg, model, state, val_path, batch)
            res["step"] = step
            res["wall_s"] = time.time() - t0
            res["loss"] = float(vals["loss"])
            curves.append(res)
            _flush_partial(partial_path, curves)
            log(f"[ours strict={strict}] step {step}: AP={res['AP']:.4f} "
                f"ECE={res['ECE']:.4f} loss={res['loss']:.3f} "
                f"({res['wall_s']:.0f}s)")
    return curves


def eval_ours(cfg, model, state, val_path, batch):
    import jax

    from udal_tpu.apps.serving import ServingDriver
    from udal_tpu.data.dataloader import InputReader
    from udal_tpu.eval.coco import COCOEvaluator

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    driver = ServingDriver(cfg, variables, batch_size=batch,
                           dtype=jax.numpy.float32)
    evaluator = COCOEvaluator()
    reader = InputReader(val_path, is_training=False)
    img_id = 0
    pairs = []
    for images, labels in reader(cfg, batch):
        # reader batches are already normalized — serve_detections would
        # normalize twice (the r3 AP-collapse artifact)
        det = driver.serve_detections_preprocessed(
            images, labels["image_scales"])
        b = images.shape[0]
        boxes = np.asarray(det.boxes)
        rows = np.stack(
            [np.repeat(np.arange(img_id, img_id + b)[:, None],
                       boxes.shape[1], 1),
             boxes[..., 1], boxes[..., 0],
             boxes[..., 3] - boxes[..., 1], boxes[..., 2] - boxes[..., 0],
             np.asarray(det.scores), np.asarray(det.classes)], axis=-1)
        gt = np.asarray(labels["groundtruth_data"]).copy()
        gt[..., :4] *= np.asarray(labels["image_scales"])[:, None, None]
        evaluator.update_state(gt, rows)
        gt_by_img = {img_id + i: gt[i] for i in range(b)}
        pairs.extend(_det_hits(rows.reshape(-1, 7), gt_by_img))
        img_id += b
    res = evaluator.result()
    return {"AP": float(res["AP"]),
            "ECE": _ece([p[0] for p in pairs], [p[1] for p in pairs])}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="run our side on the default accelerator; by "
                    "default the A/B pins jax to CPU (a sitecustomize in "
                    "this image pins JAX_PLATFORMS=axon, which would route "
                    "this multi-hour run through the TPU relay)")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--num-classes", type=int, default=4)
    ap.add_argument("--train-images", type=int, default=64)
    ap.add_argument("--val-images", type=int, default=16)
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "TRAIN_PARITY_AB.json"))
    ap.add_argument("--tiny", action="store_true",
                    help="128px / 60 steps quick profile")
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--sections", default="all",
                    help="comma list of ours_default,ours_strict,reference "
                    "(default all). With one core, run ours on the TPU "
                    "(--tpu --sections ours_default,ours_strict) in "
                    "parallel with the CPU-bound reference section; both "
                    "merge into --out")
    ap.add_argument("--seed", type=int, default=0,
                    help="dataset seed (keep identical across sections)")
    ap.add_argument("--beta", type=float, default=1.0,
                    help="la_beta_nll for the ours_beta section "
                         "(docs/COLLAPSE_ROOTCAUSE.md)")
    args = ap.parse_args()
    if args.tiny:
        args.steps, args.image_size = 60, 128
        args.train_images, args.val_images = 16, 8
    if not args.tpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    # deterministic dataset location: parallel section runs (and resumes)
    # must train on the SAME records
    key = f"{args.image_size}_{args.num_classes}_{args.train_images}_" \
          f"{args.val_images}_{args.seed}"
    d = os.path.join(tempfile.gettempdir(), f"ab_parity_{key}")
    os.makedirs(d, exist_ok=True)
    train_path = os.path.join(d, "train.tfrecord")
    val_path = os.path.join(d, "val.tfrecord")
    if not (os.path.exists(train_path) and os.path.exists(val_path)):
        make_dataset(train_path, val_path, args.train_images,
                     args.val_images, args.image_size, args.num_classes - 1,
                     seed=args.seed)
    eval_points = sorted({max(1, int(args.steps * f))
                          for f in EVAL_EVERY_FRACTIONS})
    log = lambda s: print(s, flush=True)

    results = {"config": vars(args), "eval_points": eval_points}
    if os.path.exists(args.out):   # merge into an existing (parallel) run
        with open(args.out) as f:
            prev = json.load(f)
        for k in ("ours_default", "ours_strict", "ours_beta", "reference"):
            if k in prev:
                results[k] = prev[k]

    def flush():
        # checkpoint after every section: a multi-hour run must not lose
        # completed curves to a crash in a later section; re-merge right
        # before writing so a parallel section's finish isn't clobbered
        if os.path.exists(args.out):
            with open(args.out) as f:
                prev = json.load(f)
            for k in ("ours_default", "ours_strict", "ours_beta",
                      "reference"):
                if k in prev and k not in results:
                    results[k] = prev[k]
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        log(f"wrote {args.out}")

    sections = [s.strip() for s in args.sections.split(",")] \
        if args.sections != "all" else ["ours_default", "ours_strict",
                                        "reference"]
    if args.skip_reference and "reference" in sections:
        sections.remove("reference")

    part = lambda sec: f"{args.out}.partial_{sec}.json"
    if "ours_default" in sections:
        results["ours_default"] = run_ours(
            train_path, val_path, args.steps, args.image_size,
            args.num_classes, args.batch, eval_points, strict=False, log=log,
            partial_path=part("ours_default"))
        flush()
    if "ours_strict" in sections:
        results["ours_strict"] = run_ours(
            train_path, val_path, args.steps, args.image_size,
            args.num_classes, args.batch, eval_points, strict=True, log=log,
            partial_path=part("ours_strict"))
        flush()
    if "ours_beta" in sections:
        results["ours_beta"] = run_ours(
            train_path, val_path, args.steps, args.image_size,
            args.num_classes, args.batch, eval_points, strict=False, log=log,
            beta=args.beta, partial_path=part("ours_beta"))
        flush()
    if "reference" in sections:
        results["reference"] = run_reference(
            train_path, val_path, args.steps, args.image_size,
            args.num_classes, args.batch, eval_points, log=log,
            partial_path=part("reference"))
        flush()


if __name__ == "__main__":
    main()
