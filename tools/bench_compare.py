"""Per-query diff of two bench artifacts (VERDICT r7 task 2 attribution).

Usage: python tools/bench_compare.py BENCH/BENCH_r6_preview.json \
           BENCH/BENCH_r8_preview.json [pct_flag_threshold=5]

Flattens the top-level `queries`, `extra_queries` and `tier_read` timing
maps of each artifact, prints old/new seconds and %delta per query sorted
by |delta|, flags rows beyond the threshold, and summarizes headline
total_sec / points_per_sec movement. Pure stdlib; runs nothing.
"""

from __future__ import annotations

import json
import sys


def _flatten(d: dict) -> dict[str, float]:
    out: dict[str, float] = {}
    for sect in ("queries", "extra_queries", "tier_read"):
        for k, v in (d.get(sect) or {}).items():
            if isinstance(v, (int, float)) and not k.endswith(
                    ("_blobs_decoded", "_blobs_total")):
                out[k] = float(v)
    return out


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 5.0
    qo, qn = _flatten(old), _flatten(new)
    rows = []
    for k in sorted(set(qo) | set(qn)):
        a, b = qo.get(k), qn.get(k)
        if a is None or b is None:
            rows.append((float("inf"), k, a, b, None))
            continue
        pct = 100.0 * (b - a) / a if a else 0.0
        rows.append((abs(pct), k, a, b, pct))
    rows.sort(reverse=True)
    flagged = 0
    print(f"{'query':34s} {'old':>8s} {'new':>8s} {'delta%':>8s}")
    for _, k, a, b, pct in rows:
        if pct is None:
            print(f"{k:34s} {a if a is not None else '-':>8} "
                  f"{b if b is not None else '-':>8} {'only-one':>8s}")
            continue
        mark = " <-- " + ("slower" if pct > 0 else "faster") \
            if abs(pct) >= thr else ""
        if abs(pct) >= thr:
            flagged += 1
        print(f"{k:34s} {a:8.3f} {b:8.3f} {pct:+8.1f}{mark}")
    for field in ("value", "points_per_sec"):
        a, b = old.get(field), new.get(field)
        if a and b:
            print(f"headline {field}: {a} -> {b} "
                  f"({100.0 * (b - a) / a:+.1f}%)")
    print(f"{flagged} queries beyond ±{thr}%")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
