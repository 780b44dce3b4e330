"""Aggregate multi-seed AL efficacy runs into mean +/- std curves.

VERDICT r4 #2: the single-seed entropy-vs-random margin (+0.021 AP at the
final budget, docs/AL_EFFICACY.json) is inside training noise; replicate
across >=3 seeds and report per-iteration mean/std for both arms.

Inputs: one tools/al_efficacy.py JSON per seed (identical protocol, only
--seed differs). Output: docs/AL_EFFICACY_MULTISEED.json with, per arm and
per iteration, the seed values plus mean/std/min/max, and the final-budget
mean delta entropy-random that the tightened guard test asserts on
(tests/test_efficacy_artifacts.py). Matches the experiment the reference's
AL loop motivates but never ships (/root/reference/src/
active_learning_loop.py:767-840).

Usage: python tools/al_efficacy_aggregate.py docs/AL_EFFICACY.json \
           docs/al_efficacy_seed1.json docs/al_efficacy_seed2.json \
           [--out docs/AL_EFFICACY_MULTISEED.json]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def aggregate(paths):
    runs = []
    for p in paths:
        with open(p) as f:
            runs.append(json.load(f))

    # protocol must be identical across seeds (seed itself may differ)
    keys = ("pool", "val", "image_size", "batch", "steps", "iterations",
            "seed_size", "per_iter", "mc_samples", "hard_frac",
            "seed_easy_only", "beta", "strategies")
    proto = {k: runs[0]["config"].get(k) for k in keys}
    for r in runs[1:]:
        got = {k: r["config"].get(k) for k in keys}
        if got != proto:
            raise SystemExit(f"protocol mismatch: {got} != {proto}")

    arms = sorted(runs[0]["arms"])
    n_iters = len(runs[0]["arms"][arms[0]])
    out = {"protocol": proto,
           "seeds": [r["config"]["seed"] for r in runs],
           "n_seeds": len(runs),
           "inputs": [os.path.relpath(p, REPO) for p in paths],
           "arms": {}}
    for arm in arms:
        rows = []
        for it in range(n_iters):
            aps = np.array([r["arms"][arm][it]["AP"] for r in runs])
            eces = np.array([r["arms"][arm][it]["ECE"] for r in runs])
            rows.append({
                "iteration": it,
                "n_selected": runs[0]["arms"][arm][it]["n_selected"],
                "AP_per_seed": [round(float(a), 5) for a in aps],
                "AP_mean": round(float(aps.mean()), 5),
                "AP_std": round(float(aps.std(ddof=1)), 5)
                if len(aps) > 1 else 0.0,
                "AP_min": round(float(aps.min()), 5),
                "AP_max": round(float(aps.max()), 5),
                "ECE_mean": round(float(eces.mean()), 5),
            })
        out["arms"][arm] = rows

    if {"entropy", "random"} <= set(arms):
        e = out["arms"]["entropy"][-1]
        r = out["arms"]["random"][-1]
        deltas = np.array(e["AP_per_seed"]) - np.array(r["AP_per_seed"])
        out["final_budget"] = {
            "entropy_mean_AP": e["AP_mean"],
            "random_mean_AP": r["AP_mean"],
            "mean_delta": round(float(deltas.mean()), 5),
            "delta_per_seed": [round(float(d), 5) for d in deltas],
            "seeds_where_entropy_wins": int((deltas > 0).sum()),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "AL_EFFICACY_MULTISEED.json"))
    args = ap.parse_args()
    out = aggregate(args.inputs)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out.get("final_budget", {})))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
