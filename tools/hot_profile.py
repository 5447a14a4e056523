"""Per-query profiling harness for the optimization rounds (bench.py is
FROZEN for measurement; this side tool isolates individual registry queries).

Usage:
  python tools/hot_profile.py [--sf DIR] [--reps N] [--plans OUTDIR] \
      [--noop] name [name ...]

Times each named queries() entry with the same methodology as bench.py
(warm pass, then N timed reps, min reported) at $SPARK_GRAFT_SF_DIR or
--sf. With --plans, writes each query's .explain("formatted") output to
OUTDIR/<name>_<tag>.txt. --noop forces full materialization through the
noop sink (guide §1.4) instead of .count().
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--noop", action="store_true")
    args = ap.parse_args()

    from sen2rts_spark.queries import queries
    from sen2rts_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("hot_profile", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as _entry
    _entry._ensure_pyfiles(spark)
    from sen2rts_spark.session import prewarm_python_workers
    prewarm_python_workers(spark)

    qs = queries()
    out: dict[str, float] = {}
    for name in args.names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        df = fn(spark, args.sf)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    args.plans, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)

        def _run():
            d = fn(spark, args.sf)
            if args.noop:
                d.write.format("noop").mode("overwrite").save()
            else:
                d.count()

        _run()  # warm
        best = float("inf")
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.time()
            _run()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
        print(f"  {name}: {out[name]}s", file=sys.stderr)
    print(json.dumps({"sf": args.sf, "reps": args.reps,
                      "noop": args.noop, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
