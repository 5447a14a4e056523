"""Two-parallelism scaling protocol (BASELINE.md): run the identical rollup
job at local[8] (N) and local[32] (4N) on the same input, ≥3 runs each,
median points/sec, efficiency = (T_4N / T_N) / 4. Writes BENCH/SCALING.json
and prints a summary.

Each measurement runs in a fresh subprocess (fresh JVM) so the two levels
don't share executor state.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
import pyspark.sql.functions as F
from sen2rts_spark.session import get_spark
from sen2rts_spark.operators.extract import extract_obs
from sen2rts_spark.operators.rollup import rollup_raw
from sen2rts_spark.operators.gorilla_sink import encode_blobs

cores = int(sys.argv[1]); pages_path = sys.argv[2]
spark = get_spark("scaling-%%d" %% cores, cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
# warm the JVM + parquet footers once, then measure
spark.read.parquet(pages_path).count()
t0 = time.time()
pages = spark.read.parquet(pages_path)
obs = extract_obs(pages).select("id", F.col("date").cast("timestamp").alias("ts"), "value", "qa")
blobs = encode_blobs(rollup_raw(obs, "daily"), "daily")
n = blobs.agg(F.sum("count")).first()[0]
dt = time.time() - t0
print(json.dumps({"cores": cores, "sec": dt, "points": int(n),
                  "pps": n / dt}))
spark.stop()
"""


def run_once(cores: int, pages_path: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD % {"repo": REPO}, str(cores), pages_path],
        capture_output=True, text=True, check=True, cwd=REPO)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    n_urls = int(os.environ.get("SPARK_GRAFT_PAGES_URLS", "3000"))
    runs = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))
    # materialize input once
    sys.path.insert(0, REPO)
    from bench import ensure_pages
    from sen2rts_spark.session import get_spark
    spark = get_spark("scaling-prep", cores=8)
    pages_path = ensure_pages(spark, REPO, n_urls, 200)
    spark.stop()

    results = {}
    for cores in (8, 32):
        samples = [run_once(cores, pages_path) for _ in range(runs)]
        pps = [s["pps"] for s in samples]
        results[f"local[{cores}]"] = {
            "runs": samples,
            "median_pps": statistics.median(pps),
            "median_sec": statistics.median(s["sec"] for s in samples),
            "points": samples[0]["points"],
        }
        print(f"local[{cores}]: median {results[f'local[{cores}]']['median_pps']:.0f} points/sec")

    eff = results["local[32]"]["median_pps"] / results["local[8]"]["median_pps"] / 4
    results["scaling_efficiency_8_to_32"] = round(eff, 3)
    print(f"scaling efficiency (N=8 -> 4N=32): {eff:.3f} (target >= 0.8)")

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "SCALING.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
