"""Finalize an orphaned SCALING_INPROGRESS.json checkpoint into an artifact.

tools/scaling_bench.py checkpoints its full probe log after every
sandwich pair (added after the r8a collector died with its launching
session and lost the loop-exit artifact). When a collector dies again —
the r8d run was killed mid-pair when its parent session ended — the
checkpoint carries everything the final artifact would have except the
summary fields. This tool recomputes those summary fields with the SAME
formulas scaling_bench.py uses at loop exit, so scaling_summary.py /
scaling_model.py read the finalized run exactly like a native artifact.

The output is explicitly labeled ``"recovered_from_checkpoint"`` — it is
a re-aggregation of measurements the collector already wrote, not new
data. Fields computed only at loop exit from live processes
(delivery_ceiling_same_run) are omitted.

Usage: python tools/scaling_ckpt_finalize.py \
           BENCH/SCALING_INPROGRESS.json BENCH/SCALING_4to16_r8d.json
"""

from __future__ import annotations

import json
import statistics
import sys


def finalize(ckpt: dict) -> dict:
    probes = ckpt["probes"]
    sand = [p for p in probes if "sandwich" in p]
    acc = [p for p in sand if p.get("accepted")]

    results = {
        "protocol": ckpt.get("protocol", "auto_quiet_window_sandwich"),
        "recovered_from_checkpoint": True,
        "concurrency": ckpt.get("concurrency", 1),
        "wall_sec": round(probes[-1]["t"] - probes[0]["t"], 1),
        "probes": probes,
    }

    med = statistics.median
    with_decomp = [p for p in sand if "eff_raw" in p]
    if with_decomp:
        results["all_pairs"] = {
            "n": len(with_decomp),
            "n_accepted": sum(1 for p in with_decomp if p["accepted"]),
            "eff_raw_median": round(
                med(p["eff_raw"] for p in with_decomp), 3),
            "eff_steal_adj_median": round(
                med(p["eff_steal_adj"] for p in with_decomp), 3),
            "eff_scalable_median": round(
                med(p["eff_scalable"] for p in with_decomp), 3),
            "fixed_sec_median": {
                k: round(med(p["fixed_sec"][k] for p in with_decomp), 2)
                for k in with_decomp[0]["fixed_sec"]},
        }
    if not acc:
        results["note"] = "no accepted pairs in checkpoint"
        return results

    # Rebuild the accepted-pair samples the way the collector's loop does:
    # lo sample = mean of the two bracketing narrow reps (max steal),
    # hi sample = the wide rep; fixed_sec comes from the pair decomposition.
    lo = acc[0]["lo_reps"][0]["cores"]
    hi = acc[0]["hi_rep"]["cores"]
    samples = {lo: [], hi: []}
    for p in acc:
        s1, s2 = p["lo_reps"]
        mean_lo = dict(s1)
        mean_lo["pps"] = (s1["pps"] + s2["pps"]) / 2
        mean_lo["sec"] = (s1["sec"] + s2["sec"]) / 2
        mean_lo["steal_pct"] = max(s1["steal_pct"], s2["steal_pct"])
        if "fixed_sec" in p:
            mean_lo["fixed_sec"] = p["fixed_sec"][str(lo)]
            p["hi_rep"].setdefault("fixed_sec", p["fixed_sec"][str(hi)])
        samples[lo].append(mean_lo)
        samples[hi].append(p["hi_rep"])

    for c in (lo, hi):
        pps = [s["pps"] for s in samples[c]]
        results[f"local[{c}]"] = {
            "runs": samples[c],
            "median_pps": statistics.median(pps),
            "median_sec": statistics.median(s["sec"] for s in samples[c]),
            "points": samples[c][0]["points"],
        }

    eff = (results[f"local[{hi}]"]["median_pps"]
           / results[f"local[{lo}]"]["median_pps"] / (hi / lo))
    pairs = [round(h["pps"] / l["pps"] / (hi / lo), 3)
             for l, h in zip(samples[lo], samples[hi])]
    adj = [round((h["pps"] / (1 - h["steal_pct"] / 100))
                 / (l["pps"] / (1 - l["steal_pct"] / 100)) / (hi / lo), 3)
           for l, h in zip(samples[lo], samples[hi])]
    results[f"scaling_efficiency_{lo}_to_{hi}"] = round(eff, 3)
    results[f"per_pair_efficiency_{lo}_to_{hi}"] = pairs
    results[f"per_pair_eff_steal_adj_{lo}_to_{hi}"] = adj
    results[f"eff_steal_adj_{lo}_to_{hi}"] = round(med(adj), 3)
    if all("cal_sec" in s for s in samples[lo] + samples[hi]):
        cal_adj = [round((h["pps"] * h["cal_sec"])
                         / (l["pps"] * l["cal_sec"]) / (hi / lo), 3)
                   for l, h in zip(samples[lo], samples[hi])]
        results[f"per_pair_eff_cal_adj_{lo}_to_{hi}"] = cal_adj
        results[f"eff_cal_adj_{lo}_to_{hi}"] = round(med(cal_adj), 3)
    if all("fixed_sec" in s for s in samples[lo] + samples[hi]):
        scal = [round(((l["sec"] - l["fixed_sec"])
                       / max(h["sec"] - h["fixed_sec"], 1e-9))
                      / (hi / lo), 3)
                for l, h in zip(samples[lo], samples[hi])]
        results[f"per_pair_eff_scalable_{lo}_to_{hi}"] = scal
        results[f"eff_scalable_{lo}_to_{hi}"] = round(med(scal), 3)
        results[f"fixed_sec_median_{lo}"] = round(
            med(s["fixed_sec"] for s in samples[lo]), 3)
        results[f"fixed_sec_median_{hi}"] = round(
            med(s["fixed_sec"] for s in samples[hi]), 3)
    return results


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    with open(sys.argv[1]) as f:
        ckpt = json.load(f)
    if not ckpt.get("checkpoint"):
        sys.exit("input is not a collector checkpoint")
    results = finalize(ckpt)
    with open(sys.argv[2], "w") as f:
        json.dump(results, f, indent=2)
    summary = {k: v for k, v in results.items() if k != "probes"}
    for c in [k for k in summary if k.startswith("local[")]:
        summary[c] = {k: v for k, v in summary[c].items() if k != "runs"}
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
