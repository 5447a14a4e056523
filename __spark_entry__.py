"""Driver contract for the spark-graft builder (PySpark target).

``entry``      — flagship pipeline smoke on sf0.001
``queries``    — operator registry (sen2rts_spark.queries + _ts + _docs)
``oracle_sql`` — matching DuckDB oracles (omitted for non-SQL-expressible
                 per-series kernels → rows-only checks)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: events → daily rollup tier → Gorilla blobs → per-user stats.

    Exercises the headline path (scan → continuous aggregate → compressed
    sink) plus a decode verification join, all on sf0.001.
    """
    import pyspark.sql.functions as F

    from sen2rts_spark.operators.gorilla_sink import decode_blobs, encode_blobs
    from sen2rts_spark.operators.rollup import rollup_raw

    events = spark.read.parquet(f"{SF0001}/events.parquet").select(
        F.col("user_id").cast("string").alias("id"), "ts", "value",
        F.lit(1.0).alias("qa"))
    daily = rollup_raw(events, "daily")
    blobs = encode_blobs(daily, "daily")
    decoded = decode_blobs(blobs).groupBy("id").agg(
        F.count(F.lit(1)).alias("points_decoded"))
    return (
        blobs.groupBy("id").agg(
            F.sum("count").alias("points"),
            F.sum(F.length("blob")).alias("blob_bytes"),
        )
        .join(decoded, "id")
        .withColumn("roundtrip_ok", F.col("points") == F.col("points_decoded"))
        .select("id", "points", "blob_bytes", "roundtrip_ok")
        .orderBy("id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sen2rts_spark import queries as q
    return q.queries()


def oracle_sql() -> dict[str, str]:
    from sen2rts_spark import queries as q
    return q.oracle_sql()
