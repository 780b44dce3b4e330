"""Render the long-horizon A/B curves (docs/ab_parity_r3_*.json) to one
small-multiples PNG for docs/TRAIN_PARITY_AB.md.

Layout: one column per run (seed 0/1/2 at 64 train images, plus the
4x-data run when present), two rows (AP, confidence ECE), shared y-scale
per row so the panels compare directly. Series identity is fixed:
ours_default = blue, reference = orange, ours_strict = aqua (seed-0 only).

Usage: python tools/ab_plot.py [--out docs/ab_curves.png]
"""

from __future__ import annotations

import argparse
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = os.path.join(REPO, "docs")

# Fixed-order categorical slots (light mode), text/surface tokens.
SERIES = {
    "ours_default": ("#2a78d6", "ours (default)"),
    "reference": ("#eb6834", "reference"),
    "ours_strict": ("#1baf7a", "ours (strict)"),
}
SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT_2 = "#52514e"
GRID = "#e4e3df"

RUNS = [
    ("ab_parity_r3_op128.json", "seed 0 · 64 imgs"),
    ("ab_parity_r3_op128_seed1.json", "seed 1 · 64 imgs"),
    ("ab_parity_r3_op128_seed2.json", "seed 2 · 64 imgs"),
    ("ab_parity_r3_op128_4xdata.json", "seed 0 · 256 imgs (4× data)"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(DOCS, "ab_curves.png"))
    args = ap.parse_args()

    runs = []
    for fname, label in RUNS:
        path = os.path.join(DOCS, fname)
        if os.path.exists(path):
            with open(path) as f:
                runs.append((json.load(f), label))
    if not runs:
        raise SystemExit("no ab_parity JSONs found in docs/")

    ncol = len(runs)
    fig, axes = plt.subplots(2, ncol, figsize=(3.1 * ncol + 0.8, 5.6),
                             sharey="row", squeeze=False)
    fig.patch.set_facecolor(SURFACE)

    ECE_FLOOR = 2e-3  # log-scale floor; points below are clipped to it
    row_max = [0.0, 0.0]
    for col, (data, label) in enumerate(runs):
        for row, metric in enumerate(("AP", "ECE")):
            ax = axes[row][col]
            ax.set_facecolor(SURFACE)
            for key in ("ours_default", "reference", "ours_strict"):
                if key not in data:
                    continue
                color, name = SERIES[key]
                pts = data[key]
                xs = [p["step"] for p in pts]
                ys = [max(p[metric], ECE_FLOOR) if metric == "ECE"
                      else p[metric] for p in pts]
                row_max[row] = max(row_max[row], max(ys))
                ax.plot(xs, ys, color=color, linewidth=2, marker="o",
                        markersize=4.5, label=name, zorder=3)
            ax.grid(True, color=GRID, linewidth=0.8, zorder=0)
            ax.tick_params(colors=TEXT_2, labelsize=8)
            for s in ("top", "right"):
                ax.spines[s].set_visible(False)
            for s in ("left", "bottom"):
                ax.spines[s].set_color(GRID)
            if row == 0:
                ax.set_title(label, fontsize=9.5, color=TEXT)
            if col == 0:
                ax.set_ylabel("COCO AP" if metric == "AP"
                              else "confidence ECE (log)",
                              fontsize=9, color=TEXT)
            if row == 1:
                ax.set_xlabel("train step", fontsize=8.5, color=TEXT_2)

    # shared row scales set once, after all panels' data is in (set_ylim
    # during plotting freezes shared autoscale at the first panel's range)
    axes[0][0].set_ylim(0, row_max[0] * 1.08)
    axes[1][0].set_yscale("log")
    axes[1][0].set_ylim(ECE_FLOOR * 0.9, row_max[1] * 1.5)

    handles, labels = axes[0][0].get_legend_handles_labels()
    # seed-0 panel carries strict; prefer the fullest legend available
    for colax in axes[0]:
        h, l = colax.get_legend_handles_labels()
        if len(h) > len(handles):
            handles, labels = h, l
    fig.legend(handles, labels, loc="upper right", fontsize=8.5,
               frameon=False, ncol=len(handles),
               bbox_to_anchor=(0.995, 0.955), labelcolor=TEXT)
    fig.suptitle("Long-horizon A/B vs the live reference trainer "
                 "(op128: d0 topology @128px, 2 classes, batch 4)",
                 fontsize=11, color=TEXT, x=0.01, y=0.99, ha="left")
    fig.text(0.01, 0.005, "identical synthetic TFRecords per panel; both "
             "frameworks scored by the same evaluator (udal_tpu COCOEvaluator"
             "); ECE = detection confidence vs IoU≥0.5 hit rate, "
             f"log scale, floored at {ECE_FLOOR:g}",
             fontsize=7.5, color=TEXT_2)
    fig.tight_layout(rect=(0, 0.02, 1, 0.90))
    fig.savefig(args.out, dpi=160, facecolor=SURFACE)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
