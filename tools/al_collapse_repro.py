"""Bisect the AL-efficacy iteration>=1 AP drop (both arms, both runs:
iter0 trains fine, every later iteration scores ~10x lower AP despite
healthy losses). Controlled CPU repro over the same pool builder and
trainer as tools/al_efficacy.py:

  arm seed32    : the 32-image seed set (iter0 composition)
  arm rand64    : seed + 32 random picks (random-arm iter1 composition)
  arm easy64    : seed + 32 easy-only picks (composition control)
  arm hard64    : seed + 32 hard-only picks (dose control)
  arm seed32x2  : the seed set written TWICE (size control: 64 records,
                  identical image distribution)

If rand64 collapses but easy64/seed32x2 do not -> hard images poison
training (generator makes them unlearnable, not informative-hard).
If seed32x2 collapses -> harness/file-size bug, not composition.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.al_efficacy import build_pool, build_val, write_subset  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool", type=int, default=512)
    ap.add_argument("--val", type=int, default=64)
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--seed-size", type=int, default=32)
    ap.add_argument("--hard-frac", type=float, default=0.25)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--repeats", type=int, default=None)
    ap.add_argument("--beta", type=float, default=1.0)
    ap.add_argument("--arms", default="seed32,rand64,easy64,hard64,seed32x2")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="/tmp/al_collapse_repro.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import tempfile

    from tools.ab_parity import eval_ours
    from tools.al_efficacy import train_model

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    work = tempfile.mkdtemp(prefix="al_repro_")
    examples, names, hard_flags = build_pool(args.pool, args.image_size,
                                             args.hard_frac, args.seed)
    val_path = os.path.join(work, "val.tfrecord")
    build_val(val_path, args.val, args.image_size, args.seed + 1)
    hard_by_name = dict(zip(names, hard_flags))

    seed_rng = np.random.RandomState(args.seed + 5)
    seed_set = list(seed_rng.choice(names, args.seed_size, replace=False))
    remaining = [n for n in names if n not in set(seed_set)]
    rng = np.random.RandomState(args.seed + 17)
    rand_picks = list(rng.choice(remaining, 32, replace=False))
    easy_picks = [n for n in remaining if not hard_by_name[n]][:32]
    hard_picks = [n for n in remaining if hard_by_name[n]][:32]

    compositions = {
        "seed32": seed_set,
        "rand64": seed_set + rand_picks,
        "easy64": seed_set + easy_picks,
        "hard64": seed_set + hard_picks,
        "seed32x2": seed_set + seed_set,
    }

    report = {"config": vars(args), "arms": {}}
    for arm in args.arms.split(","):
        sel = compositions[arm]
        sub = os.path.join(work, f"{arm}.tfrecord")
        # write_subset dedups by name via index map; write twice manually
        if arm == "seed32x2":
            from udal_tpu.data import tfrecord as tfr
            idx = {n: i for i, n in enumerate(names)}
            with tfr.TFRecordWriter(sub) as w:
                for n in sel:
                    w.write(examples[idx[n]])
        else:
            write_subset(sub, examples, names, sel)
        n_hard = int(sum(hard_by_name[n] for n in sel))
        log(f"[{arm}] train on {len(sel)} ({n_hard} hard)")
        cfg, model, state = train_model(sub, args.steps, args.image_size,
                                        args.batch, args.seed, log,
                                        repeats=args.repeats, beta=args.beta)
        res = eval_ours(cfg, model, state, val_path, args.batch)
        report["arms"][arm] = {"n": len(sel), "n_hard": n_hard,
                               "AP": res["AP"], "ECE": res["ECE"]}
        log(f"[{arm}] AP={res['AP']:.4f} ECE={res['ECE']:.4f}")
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    print(json.dumps(report["arms"]))


if __name__ == "__main__":
    main()
