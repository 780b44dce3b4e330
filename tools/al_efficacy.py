"""AL selection-quality experiment: does uncertainty-based acquisition beat
random selection? (the core claim of the AL methods paper the reference
implements — `/root/reference/src/active_learning_loop.py:767-840,994-1136`).

Setup: a synthetic pool with heterogeneous informativeness —
* "easy" images: common classes 1..4 rendered at full contrast;
* "hard" images (a minority): rare classes 5..7 at low contrast + noise.
The validation set contains all classes, so COCO AP (mean over classes)
rewards learning the rare classes; a random acquisition sees hard images at
the pool rate, while an uncertainty acquisition should over-select them.

Closed loop per arm (strategy): identical random seed iteration 0, then
per budget iteration: train from scratch on the selected set → serve the
remaining pool (MC dropout on) → array-native scoring
(`apps.al_scoring.collect_pool`/`select_pool`) → add top-k → re-train.
Both arms share datasets, seeds, eval protocol (COCOEvaluator).

Writes docs/AL_EFFICACY.json (+ final checkpoint for the scoring bench's
--ckpt mode). Summary + analysis in docs/AL_EFFICACY.md.
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

from udal_tpu.data import tfrecord as tfr                     # noqa: E402
from udal_tpu.data.synthetic import make_example              # noqa: E402


def make_al_image(rng, height, width, num_objects, hard,
                  hard_contrast=0.4, hard_noise=25):
    """Easy: bright class-1..4 rectangles. Hard: rare classes 5..7 at
    ``hard_contrast`` over a background with ±``hard_noise`` extra noise.

    hard_contrast=1.0, hard_noise=0 makes "hard" purely *rare* (classes
    5..7 render exactly like the common ones) — informative to acquire but
    fully learnable; the low-contrast default makes them additionally
    difficult, which at high doses poisons training (the composition bisect
    `tools/al_collapse_repro.py`)."""
    image = rng.randint(0, 60, (height, width, 3), np.uint8)
    if hard and hard_noise:
        image = np.clip(image.astype(np.int16) +
                        rng.randint(-hard_noise, hard_noise, image.shape), 0,
                        255).astype(np.uint8)
    palette = (np.arange(1, 8)[:, None] *
               np.asarray([[97, 61, 37]]) % 200 + 55).astype(np.float32)
    boxes, classes = [], []
    bg_mean = float(image.mean())
    for _ in range(num_objects):
        h = rng.randint(height // 8, height // 2)
        w = rng.randint(width // 8, width // 2)
        y1 = rng.randint(0, height - h)
        x1 = rng.randint(0, width - w)
        cls = rng.randint(5, 8) if hard else rng.randint(1, 5)
        contrast = hard_contrast if hard else 1.0
        color = bg_mean + contrast * (palette[cls - 1] - bg_mean)
        image[y1:y1 + h, x1:x1 + w] = color.astype(np.uint8)
        boxes.append([y1, x1, y1 + h, x1 + w])
        classes.append(cls)
    return image, np.asarray(boxes, np.float32), np.asarray(classes, np.int64)


def build_pool(n_pool, size, hard_frac, seed, hard_contrast=0.4,
               hard_noise=25):
    """Returns (serialized examples, names, is_hard flags)."""
    rng = np.random.RandomState(seed)
    examples, names, hard_flags = [], [], []
    for i in range(n_pool):
        hard = rng.rand() < hard_frac
        img, boxes, classes = make_al_image(rng, size, size,
                                            rng.randint(2, 5), hard,
                                            hard_contrast, hard_noise)
        name = f"img{i:06d}.png"
        examples.append(make_example(img, boxes, classes, str(i), name))
        names.append(name)
        hard_flags.append(bool(hard))
    return examples, names, hard_flags


def build_val(path, n_val, size, seed, hard_contrast=0.4, hard_noise=25):
    """Validation set: 50/50 easy/hard so AP rewards all 7 classes."""
    rng = np.random.RandomState(seed)
    with tfr.TFRecordWriter(path) as w:
        for i in range(n_val):
            hard = i % 2 == 1
            img, boxes, classes = make_al_image(rng, size, size,
                                                rng.randint(2, 5), hard,
                                                hard_contrast, hard_noise)
            w.write(make_example(img, boxes, classes, str(i),
                                 f"val{i:06d}.png"))


def write_subset(path, examples, names, selected):
    idx = {n: i for i, n in enumerate(names)}
    with tfr.TFRecordWriter(path) as w:
        for n in selected:
            w.write(examples[idx[n]])


def train_model(train_path, steps, size, batch, seed, log, repeats=None,
                beta=1.0):
    """Fresh d0 training on the selected subset (loss attenuation on, MC off
    for speed; MC dropout activates at serve time only).

    beta defaults to 1.0 (la_beta_nll): without it the attenuation NLL
    collapses the trainer at this op point (docs/COLLAPSE_ROOTCAUSE.md) and
    both arms' AP curves measure the collapse, not selection quality."""
    import jax

    from udal_tpu.config import get_detection_config
    from udal_tpu.data.dataloader import InputReader
    from udal_tpu.train.train_lib import (create_train_state,
                                          make_jitted_train_step)

    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = size
    cfg.num_classes = 7
    cfg.loss_attenuation = True
    cfg.la_beta_nll = beta
    cfg.mc_dropout = False
    cfg.enable_softmax = True
    cfg.num_epochs = 10
    cfg.moving_average_decay = 0
    if repeats:
        cfg.fpn_cell_repeats = repeats
        cfg.box_class_repeats = repeats
    cfg.override({"batch_size": batch}, allow_new_keys=True)

    spe = max(1, steps // 10)
    model, state, tx, schedule = create_train_state(
        cfg, jax.random.PRNGKey(seed), steps_per_epoch=spe)
    step_fn = make_jitted_train_step(cfg, model, tx, schedule, spe)
    reader = InputReader(train_path, is_training=True, seed=seed)
    it = reader(cfg, batch)
    t0 = time.time()
    rng = jax.random.PRNGKey(1000 + seed)
    for step in range(1, steps + 1):
        images, labels = next(it)
        labels = {k: v for k, v in labels.items() if not isinstance(v, list)}
        state, vals = step_fn(state, images, labels, rng)
    log(f"    trained {steps} steps in {time.time() - t0:.0f}s "
        f"(loss={float(vals['loss']):.3f})")
    it.close()
    return cfg, model, state


def serve_driver(cfg, state, batch, mc_samples):
    import jax

    from udal_tpu.apps.serving import ServingDriver

    scfg = cfg.copy()
    scfg.mc_dropout = True
    scfg.mc_dropoutrate = 0.05
    scfg.mc_dropoutsamp = mc_samples
    scfg.is_training_bn = False
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return ServingDriver(scfg, variables, batch_size=batch,
                         dtype=jax.numpy.bfloat16)


def run_arm(strategy, examples, names, hard_flags, val_path, args, seed_set,
            work, log):
    from tools.ab_parity import eval_ours
    from udal_tpu.apps import al_scoring as als
    from udal_tpu.data.dataloader import InputReader

    hard_by_name = dict(zip(names, hard_flags))
    selected = list(seed_set)
    rng = np.random.RandomState(args.seed + 17)
    curve = []
    final_state = final_cfg = None
    for it_i in range(args.iterations + 1):
        sub = os.path.join(work, f"{strategy}_it{it_i}.tfrecord")
        write_subset(sub, examples, names, selected)
        log(f"  [{strategy}] iter {it_i}: train on {len(selected)} "
            f"({sum(hard_by_name[n] for n in selected)} hard)")
        cfg, model, state = train_model(sub, args.steps, args.image_size,
                                        args.batch, args.seed, log,
                                        repeats=args.repeats, beta=args.beta)
        res = eval_ours(cfg, model, state, val_path, args.batch)
        curve.append({
            "iteration": it_i, "n_selected": len(selected),
            "n_hard_selected": int(sum(hard_by_name[n] for n in selected)),
            "AP": res["AP"], "ECE": res["ECE"]})
        log(f"  [{strategy}] iter {it_i}: AP={res['AP']:.4f} "
            f"hard={curve[-1]['n_hard_selected']}/{len(selected)}")
        final_state, final_cfg = state, cfg
        if it_i == args.iterations:
            break
        remaining = [n for n in names if n not in set(selected)]
        if strategy == "random":
            picks = list(rng.choice(remaining,
                                    min(args.per_iter, len(remaining)),
                                    replace=False))
        else:
            drv = serve_driver(cfg, state, args.batch, args.mc_samples)
            rem_path = os.path.join(work, f"{strategy}_rem{it_i}.tfrecord")
            write_subset(rem_path, examples, names, remaining)
            reader = InputReader(rem_path, is_training=False, names=True)
            t0 = time.time()
            pool = als.collect_pool(
                drv, ((imgs, labels["image_names"], labels["image_scales"])
                      for imgs, labels in reader(drv.config, args.batch)))
            picks = als.select_pool(pool, strategy, args.per_iter,
                                    opt_params=[0.5, 0.5])
            hard_picked = sum(hard_by_name[n] for n in picks)
            log(f"  [{strategy}] scored {pool.n_images} in "
                f"{time.time() - t0:.0f}s -> picked {len(picks)} "
                f"({hard_picked} hard)")
        selected.extend(picks)
    return curve, final_cfg, final_state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool", type=int, default=512)
    ap.add_argument("--val", type=int, default=96)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--iterations", type=int, default=3)
    ap.add_argument("--seed-size", type=int, default=32)
    ap.add_argument("--per-iter", type=int, default=32)
    ap.add_argument("--mc-samples", type=int, default=5)
    ap.add_argument("--hard-frac", type=float, default=0.25)
    ap.add_argument("--hard-contrast", type=float, default=0.4)
    ap.add_argument("--hard-noise", type=int, default=25)
    ap.add_argument("--seed-easy-only", action="store_true",
                    help="draw the iteration-0 seed set from easy images "
                         "only (cold start: rare classes unseen), so "
                         "acquisition quality on the rare classes is the "
                         "whole signal")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--strategies", default="entropy,random")
    ap.add_argument("--save-ckpt", default=None,
                    help="save the final uncertainty-arm TrainState here "
                         "(for perf_al_scoring --ckpt)")
    ap.add_argument("--repeats", type=int, default=None,
                    help="override fpn_cell/box_class repeats (tiny mode)")
    ap.add_argument("--beta", type=float, default=1.0,
                    help="la_beta_nll for arm training (0 = reference-parity "
                         "NLL, which collapses — docs/COLLAPSE_ROOTCAUSE.md)")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke: 24-image pool, 64px, 1 iteration")
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "AL_EFFICACY.json"))
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        args.pool, args.val, args.image_size = 24, 8, 64
        args.batch, args.steps, args.iterations = 2, 8, 1
        args.seed_size, args.per_iter, args.mc_samples = 6, 6, 2
        args.repeats = 1

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    work = tempfile.mkdtemp(prefix="al_efficacy_")
    examples, names, hard_flags = build_pool(args.pool, args.image_size,
                                             args.hard_frac, args.seed,
                                             args.hard_contrast,
                                             args.hard_noise)
    val_path = os.path.join(work, "val.tfrecord")
    build_val(val_path, args.val, args.image_size, args.seed + 1,
              args.hard_contrast, args.hard_noise)
    log(f"pool: {args.pool} images, {sum(hard_flags)} hard; "
        f"val: {args.val}")

    seed_rng = np.random.RandomState(args.seed + 5)
    seed_candidates = ([n for n, h in zip(names, hard_flags) if not h]
                       if args.seed_easy_only else names)
    seed_set = list(seed_rng.choice(seed_candidates, args.seed_size,
                                    replace=False))

    report = {
        "config": vars(args),
        "n_hard_in_pool": int(sum(hard_flags)),
        "n_hard_in_seed": int(sum(dict(zip(names, hard_flags))[n]
                                  for n in seed_set)),
        "arms": {},
    }
    for strategy in args.strategies.split(","):
        curve, cfg, state = run_arm(strategy, examples, names, hard_flags,
                                    val_path, args, seed_set, work, log)
        report["arms"][strategy] = curve
        if args.save_ckpt and strategy != "random":
            from udal_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(args.save_ckpt, state, epoch=1)
            log(f"saved checkpoint to {args.save_ckpt}")
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)

    arms = report["arms"]
    if "random" in arms:
        for s, curve in arms.items():
            if s == "random":
                continue
            delta = curve[-1]["AP"] - arms["random"][-1]["AP"]
            report.setdefault("final_ap_delta_vs_random", {})[s] = delta
            log(f"{s}: final AP {curve[-1]['AP']:.4f} vs random "
                f"{arms['random'][-1]['AP']:.4f} (delta {delta:+.4f})")
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "config"}))


if __name__ == "__main__":
    main()
