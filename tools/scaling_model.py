"""Attribute same-box scaling loss to its causes, reproducibly.

Reads the sandwich-pair decompositions (BENCH/SCALING*.json probes that
carry ``eff_scalable`` / ``fixed_sec``) plus the same-box delivery ceilings
(BENCH/CEILING_4_to_16.json) and solves the two-component model:

    t(W)  =  fixed  +  (1-beta) * C / W  +  beta * B / membw(W)

* ``fixed``     — per-job overhead that does not shrink with cores
                  (driver planning, scheduler, Python-worker dispatch
                  floor); measured directly by the tiny-input probe.
* ``C``         — CPU-bound core-seconds; scales with W at the measured
                  spin ceiling (~1.0 on this box).
* ``beta``      — fraction of the SCALABLE work that is memory-bandwidth
                  bound; on one box it scales at the measured stream
                  ceiling (0.45 from 4->16: the socket saturates ~100 GB/s
                  and 4 cores already draw ~55), NOT with cores.

Solving eff_scalable = 1 / ((1-beta) + beta/ceiling) for beta gives the
bandwidth-bound fraction that exactly reproduces the measured scalable
efficiency. The multi-node prediction then swaps the bandwidth term's
scaling from "one shared socket" to "one memory system per node" (every
executor host added brings its own memory controllers — the bandwidth
pool grows WITH the cluster, which is precisely what this single box
cannot emulate), leaving only the fixed-cost Amdahl term:

    eff_cluster(N->4N) = (fixed + S) / (4 * (fixed + S/4))   [S >> fixed]

Usage:  python tools/scaling_model.py
"""

from __future__ import annotations

import glob
import json
import os
import statistics

BENCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH")


def collect_pairs() -> list[dict]:
    pairs = []
    for path in sorted(glob.glob(os.path.join(BENCH, "SCALING_*.json"))):
        # SCALING.json (no underscore, outside this glob) is the live output
        # slot; SCALING_INPROGRESS.json is the collector's mid-run checkpoint
        # — both duplicate the archived run's probes (same exclusion as
        # scaling_summary.py)
        if os.path.basename(path) == "SCALING_INPROGRESS.json":
            continue
        with open(path) as f:
            d = json.load(f)
        for pr in d.get("probes", []):
            if "eff_scalable" in pr:
                pr["_src"] = os.path.basename(path)
                pairs.append(pr)
    return pairs


def main():
    pairs = collect_pairs()
    if not pairs:
        raise SystemExit("no decomposition-bearing pairs found")
    ceil_path = os.path.join(BENCH, "CEILING_4_to_16.json")
    with open(ceil_path) as f:
        ceil = json.load(f)
    stream_eff = ceil["stream_membw"]["ceiling_eff"]   # 0.45 measured
    spin_eff = ceil["spin"]["ceiling_eff"]             # ~1.0 measured

    med = statistics.median
    accepted = [p for p in pairs if p.get("accepted")]
    use = accepted or pairs
    eff_scal = med(p["eff_scalable"] for p in use)
    eff_raw = med(p["eff_raw"] for p in use)
    fixed = {k: med(p["fixed_sec"][k] for p in use if k in p["fixed_sec"])
             for k in use[0]["fixed_sec"]}
    lo_sec = med((p["lo_reps"][0]["sec"] + p["lo_reps"][1]["sec"]) / 2
                 for p in use)
    hi_sec = med(p["hi_rep"]["sec"] for p in use)
    lo_w = use[0]["lo_reps"][0]["cores"]
    hi_w = use[0]["hi_rep"]["cores"]

    # bandwidth-bound fraction that reproduces the measured scalable
    # efficiency given the box's stream ceiling (beta of the LO-width
    # scalable wall time)
    #   eff_scalable = 1 / ((1-beta)/spin_eff + beta/stream_eff)
    inv = 1.0 / eff_scal
    beta = (inv - 1.0 / spin_eff) / (1.0 / stream_eff - 1.0 / spin_eff)
    beta = max(0.0, min(1.0, beta))

    # multi-node prediction: bandwidth scales with nodes, so the scalable
    # part scales at ~spin ceiling; only the fixed term is left as Amdahl.
    scal_lo = lo_sec - fixed[str(lo_w)]
    t4n = fixed[str(hi_w)] + scal_lo / (hi_w // lo_w)
    eff_cluster = (fixed[str(lo_w)] + scal_lo) / ((hi_w // lo_w) * t4n)

    # per-pair fit: solve beta for EVERY decomposition-bearing pair
    # (accepted and rejected) and check the model's falsifiable claim —
    # apparent beta must TRACK the host's delivered bandwidth phase
    # (wide-rep throughput), not the code, which is constant across pairs.
    def _beta_of(e):
        b = (1.0 / max(e, 1e-9) - 1.0 / spin_eff) \
            / (1.0 / stream_eff - 1.0 / spin_eff)
        return max(0.0, min(1.5, b))  # >1 flags contention beyond membw

    per_pair = []
    for p in pairs:
        fl, fh = p["fixed_sec"][str(lo_w)], p["fixed_sec"][str(hi_w)]
        p_lo = (p["lo_reps"][0]["sec"] + p["lo_reps"][1]["sec"]) / 2
        sc_lo = max(p_lo - fl, 1e-9)
        p_t4n = fh + sc_lo / (hi_w // lo_w)
        per_pair.append({
            "src": p["_src"], "accepted": bool(p.get("accepted")),
            "eff_raw": p["eff_raw"], "eff_scalable": p["eff_scalable"],
            "beta": round(_beta_of(p["eff_scalable"]), 3),
            "hi_pps_k": round(p["hi_rep"]["pps"] / 1000),
            "hi_steal_pct": p["hi_rep"]["steal_pct"],
            "predicted_cluster_eff": round(
                (fl + sc_lo) / ((hi_w // lo_w) * p_t4n), 3),
        })
    # rank correlation (Spearman via rank transform, no scipy) between
    # delivered wide bandwidth and apparent beta: strongly negative =
    # the efficiency loss lives in the host's bandwidth phase.
    def _ranks(xs):
        order = sorted(range(len(xs)), key=lambda i: xs[i])
        r = [0.0] * len(xs)
        for rank, i in enumerate(order):
            r[i] = float(rank)
        return r

    corr = None
    if len(per_pair) >= 3:
        xs = _ranks([q["hi_pps_k"] for q in per_pair])
        ys = _ranks([q["beta"] for q in per_pair])
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        sxy = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
        sxx = sum((a - mx) ** 2 for a in xs)
        syy = sum((b - my) ** 2 for b in ys)
        if sxx > 0 and syy > 0:
            corr = round(sxy / (sxx * syy) ** 0.5, 3)

    out = {
        "pairs_used": len(use),
        "pairs_accepted": len(accepted),
        "widths": [lo_w, hi_w],
        "median_lo_sec": round(lo_sec, 1),
        "median_hi_sec": round(hi_sec, 1),
        "fixed_sec_median": {k: round(v, 2) for k, v in fixed.items()},
        "eff_raw_median": round(eff_raw, 3),
        "eff_scalable_median": round(eff_scal, 3),
        "ceilings_same_box": {"spin": spin_eff, "stream_membw": stream_eff},
        "bandwidth_bound_fraction_beta": round(beta, 3),
        "predicted_cluster_eff_N_to_4N": round(eff_cluster, 3),
        "model": ("beta solves eff_scalable = 1/((1-b)/spin + b/stream); "
                  "cluster prediction scales bandwidth WITH nodes (one "
                  "memory system per executor host) leaving only the "
                  "fixed-cost Amdahl term"),
        "per_pair": per_pair,
        "spearman_beta_vs_delivered_bandwidth": corr,
        "per_pair_predicted_cluster_eff_median": round(
            med(q["predicted_cluster_eff"] for q in per_pair), 3),
    }
    with open(os.path.join(BENCH, "SCALING_MODEL.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
