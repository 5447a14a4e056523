"""Two-parallelism scaling protocol (BASELINE.md): run the identical rollup
job at the configured parallelism levels on the same input, INTERLEAVED —
rep k at N runs back-to-back with rep k at 4N — so a host CPU-steal burst
(documented ±2-4x on this sandbox) lands on both levels, not just one phase.
Writes BENCH/SCALING.json and prints a summary.

Each level lives in its own long-lived subprocess (own JVM, own Python
worker pool, warmed once); the parent sends one "run" command per rep,
alternating levels. Efficiency = median_pps(4N) / median_pps(N) / 4, plus
per-pair ratios.

Every rep also records the host steal% observed DURING that rep
(/proc/stat delta): this firecracker guest loses 20+% of CPU to the host
under full-width load while narrow loads dodge stolen vcpus (measured
2.2% steal idle, 21.7% under a 32-wide spin) — an asymmetry that caps
apparent same-box wide-level efficiency no matter what the engine does.
`eff_steal_adj` normalizes pps by the CPU actually delivered
(pps / (1 - steal)); both raw and adjusted numbers are written.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
import pyspark.sql.functions as F
from sen2rts_spark.session import get_spark, prewarm_python_workers
from sen2rts_spark.operators.pipeline import rollup_gorilla_pipeline

cores = int(sys.argv[1]); pages_path = sys.argv[2]
conc = int(sys.argv[3]) if len(sys.argv) > 3 else 1
tiny_path = sys.argv[4] if len(sys.argv) > 4 else ""

def cpu_snap():
    with open("/proc/stat") as f:
        v = list(map(int, f.readline().split()[1:]))
    return v  # user nice sys idle iowait irq softirq steal ...

import numpy as _np
_CAL = _np.arange(2_000_000, dtype=_np.float64)
def calibrate():
    # single-thread host-speed probe (~0.5 s when healthy): the sandbox
    # degrades on ~10-min timescales WITHOUT visible steal (rep at 2.6%%
    # steal ran 2.5x slow), so /proc/stat alone cannot normalize reps.
    # The probe rate right before each rep gives a per-rep speed index.
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(30):
        s += float(_np.cumsum(_CAL)[-1])
    return time.perf_counter() - t0

spark = get_spark("scaling-%%d" %% cores, cores=cores)  # 3 tasks/core default
spark.sparkContext.setLogLevel("ERROR")

def run_pipeline():
    pages = spark.read.parquet(pages_path)
    blobs = rollup_gorilla_pipeline(pages, "daily", fused=True)
    return blobs.agg(F.sum("count")).first()[0]

def run_load():
    # throughput mode: `conc` concurrent instances of the SAME job (Spark
    # schedules concurrent jobs in one session) — aggregate points / wall.
    # Identical conc at every level keeps the comparison fair; >1 reclaims
    # barrier idle exactly as a multi-tenant cluster does.
    if conc == 1:
        return run_pipeline()
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(conc) as ex:
        return sum(f.result() for f in
                   [ex.submit(run_pipeline) for _ in range(conc)])

def run_fixed():
    # fixed-cost probe: the IDENTICAL pipeline (same stage/job count, same
    # plan depth) over a ~0.2%%-size input — its wall time is the per-job
    # overhead that does NOT shrink with cores (driver planning, job/stage
    # scheduling, Python-worker dispatch floor). scalable_sec = sec - this.
    pages = spark.read.parquet(tiny_path)
    blobs = rollup_gorilla_pipeline(pages, "daily", fused=True)
    t0 = time.time()
    blobs.agg(F.sum("count")).first()
    return time.time() - t0

# warm-up (untimed): worker pool on an idle JVM, then one full pass for JIT
prewarm_python_workers(spark)
run_load()
if tiny_path:
    run_fixed()
print("READY", flush=True)
for line in sys.stdin:
    cmd = line.strip()
    if cmd == "cal":
        # health probe only: no Spark job, just the single-thread speed index
        print(json.dumps({"cal_sec": round(calibrate(), 3)}), flush=True)
        continue
    if cmd == "fixed":
        print(json.dumps({"fixed_sec": round(run_fixed(), 3)}), flush=True)
        continue
    if cmd != "run":
        break
    cal = calibrate()
    c0 = cpu_snap()
    t0 = time.time()
    n = run_load()
    dt = time.time() - t0
    c1 = cpu_snap()
    d = [y - x for x, y in zip(c0, c1)]
    steal = d[7] / max(sum(d), 1)
    # host-wide busy CPUs during the rep (everything minus idle+iowait,
    # scaled to the core count): ambient load from OTHER processes is
    # invisible to cal probes (taken between bursts) and to steal, but it
    # inflates busy_cpus far past this child's own width — the parent
    # rejects pairs whose reps ran against such contention
    busy = (sum(d) - d[3] - d[4]) / max(sum(d), 1) * os.cpu_count()
    print(json.dumps({"cores": cores, "sec": dt, "points": int(n),
                      "pps": n / dt, "steal_pct": round(100 * steal, 1),
                      "cal_sec": round(cal, 3),
                      "busy_cpus": round(busy, 1),
                      "t_end": time.time()}), flush=True)
spark.stop()
"""


class Level:
    def __init__(self, cores: int, pages_path: str, conc: int = 1,
                 tiny_path: str = ""):
        self.cores = cores
        self.proc = subprocess.Popen(
            [sys.executable, "-c", CHILD % {"repo": REPO}, str(cores),
             pages_path, str(conc), tiny_path],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
            cwd=REPO)
        while True:
            line = self.proc.stdout.readline()
            if not line:
                raise RuntimeError(f"child local[{cores}] died during warmup")
            if line.strip() == "READY":
                break

    def _cmd(self, cmd: str) -> dict:
        self.proc.stdin.write(cmd + "\n")
        self.proc.stdin.flush()
        while True:
            line = self.proc.stdout.readline()
            if not line:
                raise RuntimeError(f"child local[{self.cores}] died")
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)

    def run_once(self) -> dict:
        return self._cmd("run")

    def cal(self) -> float:
        return self._cmd("cal")["cal_sec"]

    def fixed(self) -> float:
        return self._cmd("fixed")["fixed_sec"]

    def close(self):
        try:
            self.proc.stdin.write("quit\n")
            self.proc.stdin.flush()
        except Exception:
            pass
        self.proc.wait(timeout=60)


def main():
    n_urls = int(os.environ.get("SPARK_GRAFT_PAGES_URLS", "150000"))
    runs = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "4"))
    levels = tuple(int(x) for x in os.environ.get(
        "SPARK_GRAFT_SCALING_LEVELS", "8,32").split(","))
    conc = int(os.environ.get("SPARK_GRAFT_SCALING_CONC", "1"))
    if os.environ.get("SPARK_GRAFT_SCALING_SANDWICH", "") == "1":
        # sandwich pairs only exercise levels[0]/levels[-1]; a middle level
        # would never collect samples and the run would be discarded
        if len(levels) != 2:
            raise SystemExit("SANDWICH=1 requires exactly 2 levels, got "
                             f"{levels}")
        # the sandwich branch lives inside the auto quiet-window loop;
        # without MODE=auto the flag silently does nothing (a 40-minute run
        # in the wrong protocol — it happened)
        if os.environ.get("SPARK_GRAFT_SCALING_MODE", "") != "auto":
            raise SystemExit("SANDWICH=1 requires "
                             "SPARK_GRAFT_SCALING_MODE=auto")
    # materialize input once — in a SUBPROCESS so its JVM fully exits
    # (py4j keeps the gateway JVM alive until the owning python exits, and an
    # idle extra JVM perturbs the wide-level reps)
    prep = ("import sys; sys.path.insert(0, %r); "
            "from bench import ensure_pages; "
            "from sen2rts_spark.session import get_spark; "
            "s = get_spark('scaling-prep', cores=8); "
            "print(ensure_pages(s, %r, %d, 200)); "
            "print(ensure_pages(s, %r, 300, 200))"
            % (REPO, REPO, n_urls, REPO))
    prep_out = subprocess.run(
        [sys.executable, "-c", prep], capture_output=True, text=True,
        check=True, cwd=REPO).stdout.strip().splitlines()
    pages_path, tiny_path = prep_out[-2], prep_out[-1]

    # pre-warm the OS page cache: the sandbox disk is slow enough that the
    # first scan otherwise measures disk, not the engine
    for root, _d, files in os.walk(pages_path):
        for fn in files:
            with open(os.path.join(root, fn), "rb") as f:
                while f.read(1 << 24):
                    pass

    children = {c: Level(c, pages_path, conc, tiny_path) for c in levels}
    samples: dict[int, list] = {c: [] for c in levels}
    t_start = time.time()
    probe_log: list[dict] = []
    if os.environ.get("SPARK_GRAFT_SCALING_MODE", "") == "auto":
        # Steal-gated quiet-window collector (round-3 VERDICT task 2): the
        # host degrades in ~10-min phases and steals 6-10% from wide loads
        # in bad phases, which caps *apparent* same-box scaling no matter
        # what the engine does. Instead of averaging through that, probe
        # host health first — idle steal < 1% over the probe window AND the
        # single-thread cal probe within 5% across both children and within
        # 15% of the best cal seen — and only then time one interleaved
        # pair (order alternated to cancel drift). Collect until `runs`
        # qualifying pairs or the budget expires. Every probe, accepted or
        # not, is logged; nothing is discarded silently.
        budget = float(os.environ.get("SPARK_GRAFT_SCALING_BUDGET_SEC",
                                      "4200"))
        # absolute health cap: "within 15% of best seen" is vacuous on the
        # first probes, so a run started inside a degraded-but-stable host
        # phase (cal 1.4 s observed) would happily pair there. The healthy
        # single-thread cal on this host is well-characterized at
        # 0.20-0.35 s (BENCH/BASELINE.md); refuse pairs above the cap.
        cal_cap = float(os.environ.get("SPARK_GRAFT_SCALING_CAL_CAP", "0.45"))
        best_cal = float("inf")

        def _steal_window(sec: float = 1.0) -> float:
            with open("/proc/stat") as f:
                a = list(map(int, f.readline().split()[1:]))
            time.sleep(sec)
            with open("/proc/stat") as f:
                b = list(map(int, f.readline().split()[1:]))
            d = [y - x for x, y in zip(a, b)]
            return 100.0 * d[7] / max(sum(d), 1)

        def _load_steal(width: int, sec: float = 3.0) -> float:
            # load-INDUCED steal probe: this guest shows ~0% steal idle even
            # in phases where a full-width load loses 2-11% to the
            # hypervisor (r7a: all 16 idle probes clean, every 16-wide rep
            # stolen from). Spin `width` subprocesses for `sec` and read the
            # steal that demand provokes — 3 s here saves a doomed 5-min pair.
            sys.path.insert(0, os.path.join(REPO, "tools"))
            from delivery_ceiling import _run, _spin_worker
            with open("/proc/stat") as f:
                a = list(map(int, f.readline().split()[1:]))
            _run(width, _spin_worker, sec)
            with open("/proc/stat") as f:
                b = list(map(int, f.readline().split()[1:]))
            d = [y - x for x, y in zip(a, b)]
            return 100.0 * d[7] / max(sum(d), 1)

        npair = 0
        nskip = 0
        while len(samples[levels[0]]) < runs \
                and time.time() - t_start < budget:
            cals = {c: children[c].cal() for c in levels}
            steal = _steal_window(1.0)
            best_cal = min(best_cal, *cals.values())
            spread = max(cals.values()) / min(cals.values()) - 1
            slow = max(cals.values()) / best_cal - 1
            quiet = (steal < 1.0 and spread < 0.05 and slow < 0.15
                     and max(cals.values()) < cal_cap)
            probe_log.append({"t": round(time.time() - t_start, 1),
                              "cals": cals, "steal_idle_pct": round(steal, 2),
                              "accepted": quiet})
            print(f"probe t+{probe_log[-1]['t']:.0f}s cal={cals} "
                  f"steal={steal:.2f}% -> "
                  f"{'PAIR' if quiet else 'wait'}", flush=True)
            if not quiet:
                time.sleep(15)
                continue
            if os.environ.get("SPARK_GRAFT_SCALING_SANDWICH", "") == "1":
                wide_steal = _load_steal(levels[-1])
                probe_log[-1]["load_steal_pct"] = round(wide_steal, 2)
                # delivered-bandwidth phase probe (r8): the fused pipeline's
                # pair efficiency tracks the WIDE level's delivered memory
                # bandwidth (r8a: hi reps at 806-852k pts/s -> eff 0.80-0.82,
                # hi reps at 756-765k -> 0.69-0.77, identical cal/steal/busy
                # across all six). cal + steal probes cannot see these
                # lean-bandwidth host phases (single-thread cal is cache-
                # resident; steal is load-induced but CPU-side). Probe the
                # same instrument delivery_ceiling.py characterizes: a 2 s
                # full-wide numpy stream with an in-process warm loop (cold
                # processes read 3-80 GB/s from first-touch faults alone),
                # healthy phase 174-238 GB/s at 16-wide on this box (r8).
                # Every reading is logged; skipped phases still yield a
                # forced evidence-only pair every 4th consecutive skip.
                from delivery_ceiling import stream_bw
                bw = stream_bw(levels[-1])
                probe_log[-1]["stream_bw_gbs"] = round(bw / 1e9, 1)
                bw_floor = float(os.environ.get(
                    "SPARK_GRAFT_SCALING_BW_FLOOR_GBS", "120"))
                steal_bad = wide_steal >= float(os.environ.get(
                    "SPARK_GRAFT_SCALING_STEAL_CAP", "2.0"))
                bw_bad = bw < bw_floor * 1e9
                if steal_bad or bw_bad:
                    nskip += 1
                    # every 4th consecutive skip, run the pair anyway: it
                    # will fail the acceptance gate but still yields the
                    # fixed/scalable decomposition + steal-adjusted numbers
                    # (a night of pure skips produces zero evidence — r7a)
                    reason = (f"load-steal {wide_steal:.1f}%" if steal_bad
                              else f"stream bw {bw / 1e9:.0f} GB/s < "
                                   f"{bw_floor:.0f} floor")
                    if nskip % 4 != 0:
                        probe_log[-1]["accepted"] = False
                        print(f"    {reason} -> wait (wide load cannot get "
                              f"clean delivery)", flush=True)
                        time.sleep(30)
                        continue
                    print(f"    {reason} but {nskip} consecutive skips -> "
                          f"forced pair (evidence-only)", flush=True)
                else:
                    nskip = 0
                # sandwich rep order lo, hi, lo: a pair spans ~3-5 min and
                # the host phase can flip INSIDE it, in either direction —
                # run-A pairs caught a degraded wide level (raw 0.48-0.69),
                # run-B pairs 3-4 a degraded NARROW level (raw 0.93-1.13,
                # over-unity). The two narrow reps bracket the wide one;
                # if they disagree >10% the phase moved mid-pair and the
                # pair is logged but NOT counted. Accepted pairs use the
                # mean of the two bracketing narrow reps.
                lo, hi = levels[0], levels[-1]
                npair += 1
                s1 = children[lo].run_once()
                sh = children[hi].run_once()
                s2 = children[lo].run_once()
                # bandwidth bracket: the pre-pair stream probe validated the
                # phase at pair START; the lo-rep drift bracket only sees
                # narrow-side flips, so re-probe after the pair — a phase
                # that went lean mid-pair degraded the wide rep invisibly.
                bw_post = stream_bw(levels[-1])
                bw_pair_ok = (not bw_bad) and bw_post >= bw_floor * 1e9
                drift = abs(s1["pps"] - s2["pps"]) / max(s1["pps"], s2["pps"])
                # the narrow brackets validate the narrow side; the wide
                # rep's own /proc/stat steal validates the wide side (run E
                # pair 2: clean brackets, wide rep at 6.7% steal -> 0.495)
                steal_cap = float(os.environ.get(
                    "SPARK_GRAFT_SCALING_STEAL_CAP", "2.0"))
                # ambient-load cap (run r6a pair 1: clean cal/steal/drift,
                # wide rep at half speed — builder processes were running;
                # busy_cpus during a rep must stay near the child's own
                # width or the pair measured contention, not the engine)
                busy_slack = float(os.environ.get(
                    "SPARK_GRAFT_SCALING_BUSY_SLACK", "6"))
                amb_ok = all(
                    r.get("busy_cpus", 0) <= r["cores"] + busy_slack
                    for r in (s1, sh, s2))
                ok = (drift < 0.10 and sh["steal_pct"] < steal_cap
                      and amb_ok and bw_pair_ok)
                why = ("OK" if ok else
                       "REJECT (ambient load)" if not amb_ok else
                       "REJECT (wide-rep steal)"
                       if sh["steal_pct"] >= steal_cap else
                       "REJECT (lean-bandwidth phase)" if not bw_pair_ok else
                       "REJECT (phase moved mid-pair)")
                print(f"pair {npair} local[{lo}]: {s1['sec']:.1f}s/"
                      f"{s2['sec']:.1f}s ({drift * 100:.1f}% drift) "
                      f"local[{hi}]: {sh['sec']:.1f}s "
                      f"{sh['pps'] / 1000:.0f}k pts/s "
                      f"steal {sh['steal_pct']}% "
                      f"busy {[r.get('busy_cpus') for r in (s1, sh, s2)]} "
                      f"bw {bw / 1e9:.0f}/{bw_post / 1e9:.0f} GB/s "
                      f"-> {why}", flush=True)
                probe_log.append({
                    "t": round(time.time() - t_start, 1), "sandwich": npair,
                    "lo_reps": [s1, s2], "hi_rep": sh,
                    "stream_bw_gbs": round(bw / 1e9, 1),
                    "stream_bw_post_gbs": round(bw_post / 1e9, 1),
                    "drift_pct": round(100 * drift, 1), "accepted": ok,
                    "why": why})
                # per-pair fixed/scalable decomposition (VERDICT r6 task 1):
                # tiny-input pipeline = per-job overhead that does not shrink
                # with cores; the efficiency of the SCALABLE part separates
                # engine scaling from the Amdahl floor of driver/scheduler
                # fixed cost. Measured on EVERY pair — r7a rejected 16/16 on
                # host noise and left zero decomposition data; a rejected
                # pair's decomposition is still evidence (flagged accepted
                # false), and the two tiny runs cost ~seconds.
                mean_lo = dict(s1)
                mean_lo["pps"] = (s1["pps"] + s2["pps"]) / 2
                mean_lo["sec"] = (s1["sec"] + s2["sec"]) / 2
                mean_lo["steal_pct"] = max(s1["steal_pct"], s2["steal_pct"])
                f_lo = children[lo].fixed()
                f_hi = children[hi].fixed()
                mean_lo["fixed_sec"] = f_lo
                sh["fixed_sec"] = f_hi
                eff_raw = (mean_lo["sec"] / sh["sec"]) / (hi / lo)
                scal_lo = max(mean_lo["sec"] - f_lo, 1e-9)
                scal_hi = max(sh["sec"] - f_hi, 1e-9)
                eff_scal = (scal_lo / scal_hi) / (hi / lo)
                # steal-adjusted: sec * (1 - steal) = wall the same rep
                # would have taken had the hypervisor delivered every cycle
                adj_lo = mean_lo["sec"] * (1 - mean_lo["steal_pct"] / 100)
                adj_hi = sh["sec"] * (1 - sh["steal_pct"] / 100)
                eff_adj = (adj_lo / adj_hi) / (hi / lo)
                probe_log[-1]["fixed_sec"] = {str(lo): f_lo, str(hi): f_hi}
                probe_log[-1]["eff_raw"] = round(eff_raw, 3)
                probe_log[-1]["eff_steal_adj"] = round(eff_adj, 3)
                probe_log[-1]["eff_scalable"] = round(eff_scal, 3)
                print(f"    decomposition: fixed {f_lo:.2f}s/"
                      f"{f_hi:.2f}s eff_raw {eff_raw:.3f} "
                      f"eff_steal_adj {eff_adj:.3f} "
                      f"eff_scalable {eff_scal:.3f}", flush=True)
                if ok:
                    samples[lo].append(mean_lo)
                    samples[hi].append(sh)
                # checkpoint after every pair: the r8a collector died with
                # its launching session and the artifact (written only at
                # loop exit) was lost — recovered from the console log, but
                # the log has no lo-rep steal. Cheap insurance.
                ckpt = {"protocol": "auto_quiet_window_sandwich",
                        "checkpoint": True, "concurrency": conc,
                        "probes": probe_log}
                with open(os.path.join(REPO, "BENCH",
                                       "SCALING_INPROGRESS.json"), "w") as f:
                    json.dump(ckpt, f, indent=2)
                continue
            order = levels if npair % 2 == 0 else tuple(reversed(levels))
            npair += 1
            for c in order:
                s = children[c].run_once()
                samples[c].append(s)
                print(f"pair {npair} local[{c}]: {s['sec']:.1f}s "
                      f"{s['pps'] / 1000:.0f}k pts/s "
                      f"steal {s['steal_pct']}%", flush=True)
    else:
        for rep in range(runs):
            for c in levels:  # interleaved: rep k of every level back-to-back
                s = children[c].run_once()
                samples[c].append(s)
                print(f"rep {rep + 1}/{runs} local[{c}]: {s['sec']:.1f}s "
                      f"{s['pps'] / 1000:.0f}k pts/s", flush=True)
    for ch in children.values():
        ch.close()

    results = {"protocol": "interleaved", "concurrency": conc,
               "wall_sec": round(time.time() - t_start, 1)}
    if probe_log:
        results["protocol"] = "auto_quiet_window"
        if os.environ.get("SPARK_GRAFT_SCALING_SANDWICH", "") == "1":
            results["protocol"] += "_sandwich"
        results["probes"] = probe_log
    # all-pair summary (accepted AND rejected): a 0-accept run must still
    # deliver the decomposition evidence the pairs carry
    sand = [p for p in probe_log if "eff_raw" in p]
    if sand:
        med = statistics.median
        results["all_pairs"] = {
            "n": len(sand),
            "n_accepted": sum(1 for p in sand if p["accepted"]),
            "eff_raw_median": round(med(p["eff_raw"] for p in sand), 3),
            "eff_steal_adj_median": round(
                med(p["eff_steal_adj"] for p in sand), 3),
            "eff_scalable_median": round(
                med(p["eff_scalable"] for p in sand), 3),
            "fixed_sec_median": {
                k: round(med(p["fixed_sec"][k] for p in sand), 2)
                for k in sand[0]["fixed_sec"]},
        }
        print(f"all pairs (incl. rejected): {results['all_pairs']}",
              flush=True)
    if not all(samples[c] for c in levels):
        results["note"] = "no qualifying quiet-window pairs within budget"
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "SCALING.json"), "w") as f:
            json.dump(results, f, indent=2)
        print("no qualifying pairs collected; probes logged")
        return

    for c in levels:
        pps = [s["pps"] for s in samples[c]]
        results[f"local[{c}]"] = {
            "runs": samples[c],
            "median_pps": statistics.median(pps),
            "median_sec": statistics.median(s["sec"] for s in samples[c]),
            "points": samples[c][0]["points"],
        }
        print(f"local[{c}]: median {results[f'local[{c}]']['median_pps']:.0f} points/sec")

    for lo, hi in zip(levels, levels[1:]):
        if hi == lo * 4:
            eff = (results[f"local[{hi}]"]["median_pps"]
                   / results[f"local[{lo}]"]["median_pps"] / 4)
            pairs = [round(h["pps"] / l["pps"] / 4, 3)
                     for l, h in zip(samples[lo], samples[hi])]
            adj = [round((h["pps"] / (1 - h["steal_pct"] / 100))
                         / (l["pps"] / (1 - l["steal_pct"] / 100)) / 4, 3)
                   for l, h in zip(samples[lo], samples[hi])]
            results[f"scaling_efficiency_{lo}_to_{hi}"] = round(eff, 3)
            results[f"per_pair_efficiency_{lo}_to_{hi}"] = pairs
            results[f"per_pair_eff_steal_adj_{lo}_to_{hi}"] = adj
            # host-speed-normalized: multiply each pps by its rep's
            # calibration time (slow host => larger cal_sec scales pps up)
            if all("cal_sec" in s for s in samples[lo] + samples[hi]):
                cal_adj = [round((h["pps"] * h["cal_sec"])
                                 / (l["pps"] * l["cal_sec"]) / 4, 3)
                           for l, h in zip(samples[lo], samples[hi])]
                results[f"per_pair_eff_cal_adj_{lo}_to_{hi}"] = cal_adj
                results[f"eff_cal_adj_{lo}_to_{hi}"] = round(
                    statistics.median(cal_adj), 3)
            results[f"eff_steal_adj_{lo}_to_{hi}"] = round(
                statistics.median(adj), 3)
            # fixed/scalable decomposition medians (VERDICT r6 task 1)
            if all("fixed_sec" in s for s in samples[lo] + samples[hi]):
                scal = [round(((l["sec"] - l["fixed_sec"])
                               / max(h["sec"] - h["fixed_sec"], 1e-9))
                              / (hi / lo), 3)
                        for l, h in zip(samples[lo], samples[hi])]
                results[f"per_pair_eff_scalable_{lo}_to_{hi}"] = scal
                results[f"eff_scalable_{lo}_to_{hi}"] = round(
                    statistics.median(scal), 3)
                results[f"fixed_sec_median_{lo}"] = round(statistics.median(
                    s["fixed_sec"] for s in samples[lo]), 3)
                results[f"fixed_sec_median_{hi}"] = round(statistics.median(
                    s["fixed_sec"] for s in samples[hi]), 3)
            print(f"scaling efficiency (N={lo} -> 4N={hi}): {eff:.3f} raw, "
                  f"{statistics.median(adj):.3f} steal-adjusted "
                  f"(per-pair raw {pairs}, adj {adj}; target >= 0.8)")

    # same-run host delivery ceilings (what THIS box gave from lo to hi
    # widths while these pairs were collected): the stream probe bounds any
    # bandwidth-bound stage's possible efficiency; a job efficiency between
    # the stream and spin ceilings is host-delivery-limited, not plan-limited
    try:
        sys.path.insert(0, os.path.join(REPO, "tools"))
        from delivery_ceiling import (_run, _spin_worker,  # noqa: E402
                                      _stream_worker)
        lo, hi = levels[0], levels[-1]
        ceil = {}
        for name, worker in (("spin", _spin_worker),
                             ("stream_membw", _stream_worker)):
            _run(lo, worker, 1.0)
            r_lo = _run(lo, worker, 4.0)
            r_hi = _run(hi, worker, 4.0)
            ceil[name] = {"ratio": round(r_hi / r_lo, 3),
                          "ceiling_eff": round(r_hi / r_lo / (hi / lo), 3)}
        results["delivery_ceiling_same_run"] = ceil
        print(f"same-run delivery ceilings: {ceil}", flush=True)
    except Exception as exc:  # ceiling probe is evidence, never a failure
        results["delivery_ceiling_same_run"] = {"error": str(exc)}

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "SCALING.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
