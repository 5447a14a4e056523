"""spark-submit entry point for the rollup/retention service.

Production launch (north rule: spark-submit --py-files on a multi-executor
cluster):

    python tools/build_pyfiles.py   # -> dist/sen2rts_spark.zip
    spark-submit \
      --master yarn --deploy-mode cluster \
      --py-files dist/sen2rts_spark.zip \
      --conf spark.sql.adaptive.enabled=true \
      --conf spark.sql.adaptive.skewJoin.enabled=true \
      --conf spark.sql.shuffle.partitions=<2-3x total cores> \
      tools/submit_rollup.py \
      --pages <iceberg-or-parquet path/table> --out <warehouse root> \
      --tiers hourly,daily,weekly --resume

Local sandbox run:

    python tools/submit_rollup.py --pages .bench_cache/pages_3000x200.parquet \
        --out /tmp/warehouse --tiers daily,weekly
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="pages table path")
    ap.add_argument("--out", required=True, help="output warehouse root")
    ap.add_argument("--tiers", default="hourly,daily,weekly")
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--resume", action="store_true",
                    help="skip buckets already committed in lineage")
    ap.add_argument("--blob-tier", default="daily")
    args = ap.parse_args()

    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    from sen2rts_spark.operators.extract import extract_obs
    from sen2rts_spark.operators.gorilla_sink import encode_blobs
    from sen2rts_spark.operators.rollup import rollup_raw, rollup_tier
    from sen2rts_spark.sources.catalog import Catalog

    # under spark-submit the session comes preconfigured; fall back to local
    spark = SparkSession.builder.appName("rollup-service").getOrCreate()
    cat = Catalog(spark, args.out, n_buckets=args.n_buckets)

    pages = spark.read.parquet(args.pages)
    obs = extract_obs(pages).select(
        "id", F.col("date").cast("timestamp").alias("ts"), "value", "qa")

    tiers = [t.strip() for t in args.tiers.split(",") if t.strip()]
    prev = None
    for tier in tiers:
        cur = rollup_raw(obs, tier) if prev is None else rollup_tier(prev, tier)
        res = cat.write_stage(cur, f"tier_{tier}", resume=args.resume)
        print(f"tier_{tier}: wrote {res['rows']} rows "
              f"in buckets {res['written_buckets']}")
        prev = cat.read_stage(f"tier_{tier}")

    blobs = encode_blobs(cat.read_stage(f"tier_{args.blob_tier}"),
                         args.blob_tier)
    res = cat.write_stage(blobs, f"blobs_{args.blob_tier}",
                          resume=args.resume)
    print(f"blobs_{args.blob_tier}: wrote {res['rows']} blobs")
    cat.metrics().show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
