"""Root-cause probe for the seed-dependent late-training collapse.

Round-3 A/Bs (docs/ab_parity_r3_op128_seed{1,2}.json) show OUR trainer's AP
peaking mid-run then collapsing with the total loss exploding (1.69 -> 27 at
seed 1). This probe replays the exact op point with per-step component
logging — focal / box-NLL / L2 / gradient norm / LR — plus periodic sigma
statistics on the positive anchors (the loss-attenuation channels, clipped
to [clip_min_uncert, clip_max_uncert] = [0.01, 1024]) and evaluation AP, to
identify WHICH term blows up and why.

Hypotheses:
  H1  LA-NLL feedback: sigma rides the 0.01 clip floor on well-fit anchors;
      one hard positive then contributes per_elem/sigma^2 ~ 1e4 x loss and
      a matching gradient spike destabilizes mu.
  H2  focal-loss alpha imbalance at few classes (2-class op point).
  H3  BN statistics drift (train/eval mismatch).

Writes docs/collapse_probe_seed<seed>.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.ab_parity import eval_ours, make_dataset  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--num-classes", type=int, default=2)
    ap.add_argument("--train-images", type=int, default=64)
    ap.add_argument("--val-images", type=int, default=16)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--eval-every", type=int, default=150)
    ap.add_argument("--sigma-every", type=int, default=25)
    ap.add_argument("--no-la", action="store_true",
                    help="H1 control: train WITHOUT loss attenuation")
    ap.add_argument("--clip-min", type=float, default=None,
                    help="override clip_min_uncert (H1 mitigation test)")
    ap.add_argument("--beta", type=float, default=None,
                    help="la_beta_nll beta-NLL stabilization (fix test)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from udal_tpu.config import get_detection_config
    from udal_tpu.data.dataloader import InputReader
    from udal_tpu.train import losses as loss_lib
    from udal_tpu.train.train_lib import (create_train_state,
                                          make_jitted_train_step)

    work = os.path.join("/tmp", f"collapse_probe_{args.seed}")
    os.makedirs(work, exist_ok=True)
    train_path = os.path.join(work, "train.tfrecord")
    val_path = os.path.join(work, "val.tfrecord")
    make_dataset(train_path, val_path, args.train_images, args.val_images,
                 args.image_size, args.num_classes, seed=args.seed)

    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = args.image_size
    cfg.num_classes = args.num_classes
    cfg.loss_attenuation = not args.no_la
    cfg.mc_dropout = False
    cfg.enable_softmax = True
    cfg.num_epochs = 10
    cfg.moving_average_decay = 0
    if args.clip_min is not None:
        cfg.clip_min_uncert = args.clip_min
    if args.beta is not None:
        cfg.la_beta_nll = args.beta
    cfg.override({"batch_size": args.batch}, allow_new_keys=True)

    spe = max(1, args.steps // 10)
    model, state, tx, schedule = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=spe)
    step_fn = make_jitted_train_step(cfg, model, tx, schedule, spe)
    reader = InputReader(train_path, is_training=True, seed=0)
    it = reader(cfg, args.batch)

    @jax.jit
    def sigma_stats(state, images, labels):
        """Positive-anchor sigma / per-elem residual stats (H1 evidence)."""
        outs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=False)
        box_outputs = outs[1]
        mins, means, fracs_at_floor, max_res = [], [], [], []
        for lvl, b in enumerate(box_outputs):
            half = b.shape[-1] // 2
            sigma = jnp.clip(b[..., half:], cfg.clip_min_uncert,
                             cfg.clip_max_uncert)
            mu = b[..., :half]
            tgt = labels[f"box_targets_{lvl + cfg.min_level}"]
            mask = (tgt != 0.0).astype(b.dtype)
            n = jnp.sum(mask) + 1e-6
            s_masked = jnp.where(mask > 0, sigma, jnp.inf)
            mins.append(jnp.min(s_masked))
            means.append(jnp.sum(sigma * mask) / n)
            fracs_at_floor.append(
                jnp.sum((sigma <= cfg.clip_min_uncert * 1.01) * mask) / n)
            res = jnp.square(tgt - mu) * mask
            max_res.append(jnp.max(res))
        return (jnp.min(jnp.stack(mins)),
                jnp.sum(jnp.stack(means)) / len(means),
                jnp.sum(jnp.stack(fracs_at_floor)) / len(fracs_at_floor),
                jnp.max(jnp.stack(max_res)))

    rng = jax.random.PRNGKey(42)
    trace, evals = [], []
    t0 = time.time()
    diag_batch = None
    for step in range(1, args.steps + 1):
        images, labels = next(it)
        labels = {k: v for k, v in labels.items() if not isinstance(v, list)}
        if diag_batch is None:
            diag_batch = (images, labels)
        state, vals = step_fn(state, images, labels, rng)
        if step % args.sigma_every == 0 or step == 1:
            row = {"step": step,
                   "loss": float(vals["loss"]),
                   "cls_loss": float(vals.get("cls_loss", np.nan)),
                   "box_loss": float(vals.get("box_loss", np.nan)),
                   "reg_l2": float(vals.get("reg_l2_loss", np.nan)),
                   "grad_norm": float(vals.get("gradient_norm", np.nan)),
                   "lr": float(vals.get("learning_rate", np.nan))}
            if cfg.loss_attenuation:
                smin, smean, floor_frac, maxres = sigma_stats(state,
                                                              *diag_batch)
                row.update(sigma_min=float(smin), sigma_mean=float(smean),
                           sigma_floor_frac=float(floor_frac),
                           max_pos_residual=float(maxres))
            trace.append(row)
            print(json.dumps(row), file=sys.stderr, flush=True)
        if step % args.eval_every == 0:
            res = eval_ours(cfg, model, state, val_path, args.batch)
            evals.append({"step": step, "AP": res["AP"], "ECE": res["ECE"],
                          "wall_s": time.time() - t0})
            print(f"eval step {step}: AP={res['AP']:.4f}", file=sys.stderr,
                  flush=True)
    it.close()

    out = args.out or os.path.join(REPO, "docs",
                                   f"collapse_probe_seed{args.seed}.json")
    with open(out, "w") as f:
        json.dump({"config": vars(args), "trace": trace, "evals": evals},
                  f, indent=1)
    print(json.dumps({"out": out, "final_AP": evals[-1]["AP"] if evals
                      else None}))


if __name__ == "__main__":
    main()
