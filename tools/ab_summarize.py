"""Summarize op512 A/B JSONs into a markdown table (for docs/AB_OP512.md).

Usage: python tools/ab_summarize.py docs/ab_parity_r5_op512_seed1.json \
           docs/ab_parity_r5_op512_seed2.json
Prints a GFM table of AP/ECE per eval point per (seed, arm), plus the
final-point beta-minus-default deltas and a collapse verdict (an arm
"collapses" when its final AP drops >50% from its own running peak —
the signature in docs/COLLAPSE_ROOTCAUSE.md).
"""

from __future__ import annotations

import json
import re
import sys

ARMS = {"ours_default": "β=0 (parity NLL)", "ours_beta": "β=1 (β-NLL)"}


def main():
    paths = sys.argv[1:]
    if not paths:
        raise SystemExit(__doc__)
    rows = []
    finals = {}
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        seed = d.get("config", {}).get("seed")
        if seed is None:
            m = re.search(r"seed(\d+)", p)
            seed = int(m.group(1)) if m else "?"
        for arm, label in ARMS.items():
            curve = d.get(arm)
            if not curve:
                continue
            peak = 0.0
            collapse = False
            for pt in curve:
                peak = max(peak, pt["AP"])
                if peak > 0.02 and pt["AP"] < 0.5 * peak:
                    collapse = True
            last = curve[-1]
            finals[(seed, arm)] = last["AP"]
            rows.append((seed, label,
                         " / ".join(f"{pt['AP']:.3f}" for pt in curve),
                         f"{last['ECE']:.4f}",
                         f"{last['wall_s']:.0f}",
                         "COLLAPSED" if collapse else "no"))
    print("| seed | arm | AP @ eval points | final ECE | wall s | "
          "collapse |")
    print("|---|---|---|---|---|---|")
    for r in sorted(rows):
        print("| " + " | ".join(str(c) for c in r) + " |")
    print()
    for seed in sorted({s for s, _ in finals}):
        b0 = finals.get((seed, "ours_default"))
        b1 = finals.get((seed, "ours_beta"))
        if b0 is not None and b1 is not None:
            print(f"seed {seed}: final AP β=1 − β=0 = {b1 - b0:+.4f} "
                  f"({b1:.4f} vs {b0:.4f})")


if __name__ == "__main__":
    main()
