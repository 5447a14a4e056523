"""Recover a SCALING_*.json artifact from a collector console log.

tools/scaling_bench.py writes its artifact only at normal loop exit
(runs reached or budget exhausted). If a run must be stopped early —
e.g. to free the box for the gated bench inside a bounded session — the
console log still carries every number the parent printed per pair:
the two narrow bracket walls, the wide wall/pps/steal/busy, the drift,
the accept/reject verdict, and (r7+) the tiny-input fixed-cost
decomposition. This tool parses those lines back into the same probe
schema the collector writes, so scaling_summary.py / scaling_model.py
read the recovered run exactly like a native artifact.

The output is explicitly labeled ``"recovered_from_log"`` — it is a
transcription of measurements the collector made and printed, not new
data. Fields the log does not carry (per-rep cal_sec, t_end, points of
THIS run) are omitted or, for the constant ``points`` of the standard
24M-point input, taken from the named donor artifact of the same input.

Usage: python tools/scaling_log_recover.py /tmp/scaling_r7b.log \
           BENCH/SCALING_4to16_r7b.json [points]
"""

from __future__ import annotations

import json
import re
import statistics
import sys

PAIR_RE = re.compile(
    r"pair (\d+) local\[(\d+)\]: ([\d.]+)s/([\d.]+)s \(([\d.]+)% drift\) "
    r"local\[(\d+)\]: ([\d.]+)s (\d+)k pts/s steal ([\d.]+)% "
    r"busy \[([\d.]+), ([\d.]+), ([\d.]+)\] "
    r"(?:bw ([\d.]+)/([\d.]+) GB/s )?"  # r8+: bandwidth bracket readings
    r"-> (OK|REJECT[^\n\r]*?)(?=\s*$|\s*\[)",
    re.M)
DECOMP_RE = re.compile(
    r"decomposition: fixed ([\d.]+)s/([\d.]+)s eff_raw ([\d.]+) "
    r"eff_steal_adj ([\d.]+) eff_scalable ([\d.]+)")


def recover(log_path: str, points: int) -> dict:
    text = open(log_path, errors="replace").read()
    # strip carriage-return progress-bar overwrites so line anchors work
    text = re.sub(r"\[Stage[^\]]*\]", "", text).replace("\r", "\n")
    pairs = PAIR_RE.findall(text)
    decomps = DECOMP_RE.findall(text)
    probes = []
    for i, p in enumerate(pairs):
        (n, lo_w, s1, s2, drift, hi_w, sh, pps_k, steal,
         b1, b2, b3, bw_pre, bw_post, why) = p
        lo_w, hi_w = int(lo_w), int(hi_w)
        s1, s2, sh = float(s1), float(s2), float(sh)
        why = why.strip()
        pr = {
            "sandwich": int(n),
            "lo_reps": [
                {"cores": lo_w, "sec": s1, "pps": points / s1,
                 "steal_pct": 0.0, "busy_cpus": float(b1)},
                {"cores": lo_w, "sec": s2, "pps": points / s2,
                 "steal_pct": 0.0, "busy_cpus": float(b3)},
            ],
            "hi_rep": {"cores": hi_w, "sec": sh, "pps": points / sh,
                       "pps_printed_k": int(pps_k),
                       "steal_pct": float(steal), "busy_cpus": float(b2)},
            "drift_pct": float(drift),
            "accepted": why == "OK",
            "why": why,
            **({"stream_bw_gbs": float(bw_pre),
                "stream_bw_post_gbs": float(bw_post)} if bw_pre else {}),
            "note": ("recovered from console log; lo-rep steal not "
                     "printed per-rep -> recorded 0.0 (pairs with lo "
                     "steal were already folded into the printed "
                     "eff_steal_adj)"),
        }
        if i < len(decomps):
            f_lo, f_hi, e_raw, e_adj, e_scal = map(float, decomps[i])
            pr["fixed_sec"] = {str(lo_w): f_lo, str(hi_w): f_hi}
            pr["eff_raw"] = e_raw
            pr["eff_steal_adj"] = e_adj
            pr["eff_scalable"] = e_scal
        probes.append(pr)

    out = {
        "protocol": "auto_quiet_window_sandwich",
        "recovered_from_log": log_path,
        "concurrency": 1,
        "probes": probes,
    }
    acc = [p for p in probes if p["accepted"]]
    if acc:
        lo_w = acc[0]["lo_reps"][0]["cores"]
        hi_w = acc[0]["hi_rep"]["cores"]
        ratio = hi_w // lo_w
        effs = [round(p["hi_rep"]["pps"]
                      / ((p["lo_reps"][0]["pps"] + p["lo_reps"][1]["pps"]) / 2)
                      / ratio, 3) for p in acc]
        out[f"per_pair_efficiency_{lo_w}_to_{hi_w}"] = effs
        out[f"scaling_efficiency_{lo_w}_to_{hi_w}"] = round(
            statistics.median(effs), 3)
        out[f"local[{lo_w}]"] = {
            "runs": [r for p in acc for r in p["lo_reps"]],
            "median_sec": statistics.median(
                r["sec"] for p in acc for r in p["lo_reps"]),
            "points": points,
        }
        out[f"local[{hi_w}]"] = {
            "runs": [p["hi_rep"] for p in acc],
            "median_sec": statistics.median(p["hi_rep"]["sec"] for p in acc),
            "points": points,
        }
    sand = [p for p in probes if "eff_raw" in p]
    if sand:
        med = statistics.median
        acc_sand = [p for p in sand if p["accepted"]]
        out["all_pairs"] = {
            "n": len(sand),
            "n_accepted": len(acc_sand),
            # medians over ALL decomposition-bearing pairs (incl. rejected);
            # the accepted-only raw median is the north-rule number
            "eff_raw_median_accepted": round(
                med(p["eff_raw"] for p in acc_sand), 3) if acc_sand else None,
            "eff_raw_median": round(med(p["eff_raw"] for p in sand), 3),
            "eff_steal_adj_median": round(
                med(p["eff_steal_adj"] for p in sand), 3),
            "eff_scalable_median": round(
                med(p["eff_scalable"] for p in sand), 3),
            "fixed_sec_median": {
                k: round(med(p["fixed_sec"][k] for p in sand), 2)
                for k in sand[0]["fixed_sec"]},
        }
    return out


if __name__ == "__main__":
    log, dest = sys.argv[1], sys.argv[2]
    pts = int(sys.argv[3]) if len(sys.argv) > 3 else 24030019
    art = recover(log, pts)
    with open(dest, "w") as f:
        json.dump(art, f, indent=2)
    ap = art.get("all_pairs", {})
    print(f"recovered {len(art['probes'])} pairs "
          f"({ap.get('n_accepted', 0)} accepted) -> {dest}")
    print(json.dumps(ap, indent=2))
