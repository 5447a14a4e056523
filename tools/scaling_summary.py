"""Aggregate every BENCH/SCALING*.json artifact into one summary table.

Prints per-run medians and per-pair efficiencies plus a pooled view per
width pair (all quiet-window pairs across runs), so the full measurement
history — not a cherry-picked run — is one command away:

    python tools/scaling_summary.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "BENCH")


def main():
    pooled: dict[str, list] = {}
    print(f"{'file':38s} {'protocol':28s} {'pair':7s} "
          f"{'median':7s} per-pair raw")
    for path in sorted(glob.glob(os.path.join(BENCH, "SCALING*.json"))):
        with open(path) as f:
            d = json.load(f)
        proto = d.get("protocol", "?")
        for key in list(d):
            m = re.match(r"per_pair_efficiency_(\d+)_to_(\d+)$", key)
            if not m:
                continue
            lo, hi = m.groups()
            pairs = d[key]
            med = d.get(f"scaling_efficiency_{lo}_to_{hi}")
            name = os.path.basename(path)
            print(f"{name:38s} {proto:28s} {lo}->{hi:4s} "
                  f"{med if med is not None else '':7} {pairs}")
            pooled.setdefault(f"{lo}->{hi}", []).extend(pairs)
    print()
    for pair, vals in sorted(pooled.items()):
        print(f"pooled {pair}: n={len(vals)} median={statistics.median(vals):.3f} "
              f"max={max(vals):.3f} min={min(vals):.3f}")


if __name__ == "__main__":
    main()
