"""Learnability probe for the A/B op point (tools/ab_parity.py).

Trains OUR side only at a candidate op point and prints AP plus score/match
diagnostics at regular eval points, so the expensive CPU-bound reference
section is only launched at an op point where AP is solidly non-zero
(VERDICT r2 #2 demands a non-noise-level comparison).

Usage:
  python tools/ab_probe.py --steps 800 --lr-scale 0.25 --num-classes 2
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.ab_parity import make_dataset, _det_hits, _ece  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--num-classes", type=int, default=2)
    ap.add_argument("--train-images", type=int, default=64)
    ap.add_argument("--val-images", type=int, default=16)
    ap.add_argument("--lr-scale", type=float, default=1.0)
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--no-la", action="store_true")
    ap.add_argument("--no-aug", action="store_true",
                    help="disable hflip + scale jitter (isolates aug "
                         "difficulty from trainer health)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from udal_tpu.apps.serving import ServingDriver
    from udal_tpu.config import get_detection_config
    from udal_tpu.data.dataloader import InputReader
    from udal_tpu.eval.coco import COCOEvaluator
    from udal_tpu.train.train_lib import (create_train_state,
                                          make_jitted_train_step)

    key = (f"{args.image_size}_{args.num_classes}_{args.train_images}_"
           f"{args.val_images}_{args.seed}")
    d = os.path.join("/tmp", f"ab_parity_{key}")
    os.makedirs(d, exist_ok=True)
    train_path = os.path.join(d, "train.tfrecord")
    val_path = os.path.join(d, "val.tfrecord")
    if not (os.path.exists(train_path) and os.path.exists(val_path)):
        make_dataset(train_path, val_path, args.train_images,
                     args.val_images, args.image_size, args.num_classes - 1,
                     seed=args.seed)

    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = args.image_size
    cfg.num_classes = args.num_classes
    cfg.loss_attenuation = not args.no_la
    cfg.mc_dropout = False
    cfg.enable_softmax = True
    cfg.num_epochs = 10
    cfg.moving_average_decay = 0
    cfg.learning_rate = cfg.learning_rate * args.lr_scale
    cfg.lr_warmup_init = cfg.lr_warmup_init * args.lr_scale
    if args.no_aug:
        cfg.input_rand_hflip = False
        cfg.jitter_min = 1.0
        cfg.jitter_max = 1.0
    cfg.override({"batch_size": args.batch}, allow_new_keys=True)

    spe = max(1, args.steps // 10)
    model, state, tx, schedule = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=spe)
    step_fn = make_jitted_train_step(cfg, model, tx, schedule, spe)
    reader = InputReader(train_path, is_training=True, seed=0)
    it = reader(cfg, args.batch)

    def diag_eval(state):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        driver = ServingDriver(cfg, variables, batch_size=args.batch,
                               dtype=jax.numpy.float32)
        evaluator = COCOEvaluator()
        vreader = InputReader(val_path, is_training=False)
        img_id, pairs, smax, n_hi = 0, [], 0.0, 0
        for images, labels in vreader(cfg, args.batch):
            det = driver.serve_detections_preprocessed(
                images, labels["image_scales"])
            b = images.shape[0]
            boxes = np.asarray(det.boxes)
            scores = np.asarray(det.scores)
            smax = max(smax, float(scores.max()))
            n_hi += int((scores > 0.1).sum())
            rows = np.stack(
                [np.repeat(np.arange(img_id, img_id + b)[:, None],
                           boxes.shape[1], 1),
                 boxes[..., 1], boxes[..., 0],
                 boxes[..., 3] - boxes[..., 1],
                 boxes[..., 2] - boxes[..., 0],
                 scores, np.asarray(det.classes)], axis=-1)
            gt = np.asarray(labels["groundtruth_data"]).copy()
            gt[..., :4] *= np.asarray(labels["image_scales"])[:, None, None]
            evaluator.update_state(gt, rows)
            gt_by_img = {img_id + i: gt[i] for i in range(b)}
            pairs.extend(_det_hits(rows.reshape(-1, 7), gt_by_img))
            img_id += b
        res = evaluator.result()
        hits = sum(p[1] for p in pairs)
        return (float(res["AP"]),
                _ece([p[0] for p in pairs], [p[1] for p in pairs]),
                smax, n_hi, int(hits), len(pairs))

    def mode_split_diag(state):
        """Max |cls logit| in eval mode (running BN stats) vs train mode
        (batch stats) on one val batch — separates 'model diverged' from
        'running stats diverged' when the eval metrics collapse."""
        vreader = InputReader(val_path, is_training=False)
        images, _ = next(iter(vreader(cfg, args.batch)))
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        outs_e = model.apply(variables, images, train=False,
                             rngs={"dropout": jax.random.PRNGKey(0)})
        outs_t, _ = model.apply(variables, images, train=True,
                                mutable=["batch_stats"],
                                rngs={"dropout": jax.random.PRNGKey(0)})
        cls_e = max(float(np.abs(np.asarray(o)).max()) for o in outs_e[0])
        cls_t = max(float(np.abs(np.asarray(o)).max()) for o in outs_t[0])
        return cls_e, cls_t

    t0 = time.time()
    rng = jax.random.PRNGKey(42)
    for step in range(1, args.steps + 1):
        images, labels = next(it)
        labels = {k: v for k, v in labels.items() if not isinstance(v, list)}
        state, vals = step_fn(state, images, labels, rng)
        if step % args.eval_every == 0 or step == args.steps:
            ap, ece, smax, n_hi, hits, n = diag_eval(state)
            # BN running-stats health: eval-mode forward diverging while
            # train loss falls is the classic sign of broken moving stats
            bn_leaves = jax.tree_util.tree_leaves(state.batch_stats)
            bn_max = max((float(np.abs(np.asarray(l)).max())
                          for l in bn_leaves), default=0.0)
            cls_e, cls_t = mode_split_diag(state)
            print(f"step {step:5d}: AP={ap:.4f} ECE={ece:.4f} "
                  f"loss={float(vals['loss']):.3f} "
                  f"lr={float(vals.get('learning_rate', -1)):.5f} "
                  f"smax={smax:.3f} n>0.1={n_hi} hits={hits}/{n} "
                  f"bn_max={bn_max:.1f} cls_eval={cls_e:.1f} "
                  f"cls_train={cls_t:.1f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    it.close()


if __name__ == "__main__":
    main()
