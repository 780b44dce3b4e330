"""SMBO-vs-dense-grid equivalence benchmark for the thresholding optimizer.

VERDICT r1 weak-point #4: the framework replaces the reference's
Optuna/HEBO Bayesian weight search (`/root/reference/src/
uncertainty_analysis.py:86-327`) with a dependency-free SMBO
(`udal_tpu.apps.thresholding.minimize_smbo`). This benchmark checks, on a
frozen synthetic validate_results-style problem, that the SMBO reaches the
dense-grid FD@CD minimum within tolerance at a fraction of the evaluations.

Writes docs/SMBO_EQUIVALENCE.md and prints the comparison table.
"""

import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from udal_tpu.apps.thresholding import UncertOptimal, minimize_smbo


def frozen_problem(n=4000, num_uncert=3, seed=7):
    """Synthetic detections: IoUs + correctness + informative uncertainties.

    Channel 0 is strongly informative, channel 1 weakly, channel 2 noise —
    the optimum must weight them accordingly, which is exactly the structure
    of ENT/ALBOX/MCBOX uncertainties in real validate_results files.
    """
    rng = np.random.RandomState(seed)
    quality = rng.beta(2.5, 1.2, n)                 # latent detection quality
    ious = np.clip(quality + rng.randn(n) * 0.08, 0, 1)
    tps = (rng.rand(n) < 0.97).astype(float)        # class-correctness flips
    u0 = np.clip(1 - quality + rng.randn(n) * 0.10, 0, None)
    u1 = np.clip(1 - quality + rng.randn(n) * 0.35, 0, None)
    u2 = np.abs(rng.randn(n))                       # pure noise
    gt_classes = rng.randint(1, 8, n)
    return gt_classes, tps, ious, [u0, u1, u2][:num_uncert]


def main():
    gt, tps, ious, uncerts = frozen_problem()
    opt = UncertOptimal(gt, tps, ious, uncerts, source_path="/tmp/smbo_bench")

    # dense grid: weights in [0,1] step 1/12 per channel (13^3 = 2197 evals)
    steps = np.linspace(0.0, 1.0, 13)
    t0 = time.time()
    best_grid, best_grid_w, n_grid = np.inf, None, 0
    for w in itertools.product(steps, repeat=len(uncerts)):
        if not any(w):
            continue
        y = opt._objective(np.asarray(w))
        n_grid += 1
        if y < best_grid:
            best_grid, best_grid_w = y, np.asarray(w)
    t_grid = time.time() - t0

    rows = []
    for evals in (100, 200, 400, 600):
        t0 = time.time()
        w, y = minimize_smbo(opt._objective, len(uncerts), max_evals=evals,
                             seed=0)
        rows.append((evals, y, time.time() - t0, w))

    lines = [
        "# SMBO vs dense grid — thresholding optimizer equivalence",
        "",
        "Frozen problem: 4000 synthetic detections, 3 uncertainty channels",
        "(informative / weak / noise), objective = mean FD@CD(0.95) over",
        "IoU 0.5:0.05:0.75 (the reference's objective,",
        "`uncertainty_analysis.py:86-327`). Regenerate with",
        "`python tools/bench_smbo.py`.",
        "",
        "| optimizer | evals | FD@CD (%) | Δ vs grid (pp) | seconds |",
        "|---|---|---|---|---|",
        f"| dense grid 13^3 | {n_grid} | {best_grid:.3f} | — | "
        f"{t_grid:.1f} |",
    ]
    for evals, y, dt, w in rows:
        lines.append(f"| minimize_smbo | {evals} | {y:.3f} | "
                     f"{y - best_grid:+.3f} | {dt:.1f} |")
    lines += [
        "",
        f"Grid optimum weights: {np.round(best_grid_w, 3).tolist()}",
        f"SMBO(600) weights:    {np.round(rows[-1][3], 3).tolist()}",
        "",
        "Acceptance: SMBO at 600 evals within 2pp FD@CD of the dense-grid"
        " minimum (VERDICT r1 item 8).",
    ]
    out = "\n".join(lines)
    print(out)
    docs = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs")
    os.makedirs(docs, exist_ok=True)
    with open(os.path.join(docs, "SMBO_EQUIVALENCE.md"), "w") as f:
        f.write(out + "\n")
    assert rows[-1][1] <= best_grid + 2.0, "SMBO regression > 2pp!"


if __name__ == "__main__":
    main()
