"""Structured Streaming variant of the rollup tiers.

The reference is strictly batch (SURVEY §2.9); the north rule's continuous
aggregates map to either incremental batch MERGE (docs/ICEBERG.sql) or this
streaming path: readStream → watermark → windowed weighted aggregate →
append/update sink. Late observations within the watermark update their
bucket; beyond it they are dropped (the bounded-late-data policy).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..operators.rollup import TIER_SECONDS

__all__ = ["stream_rollup"]


def stream_rollup(stream: DataFrame, tier: str = "hourly",
                  watermark: str = "2 hours",
                  ts_col: str = "ts", id_col: str = "id",
                  value_col: str = "value", qa_col: str = "qa") -> DataFrame:
    """Streaming continuous aggregate for one tier.

    ``stream`` is a streaming DataFrame (e.g. ``spark.readStream``). Returns
    the windowed aggregate; caller attaches ``writeStream`` (update mode for
    a live table, append for a log after watermark expiry).
    """
    secs = TIER_SECONDS[tier]
    w = F.coalesce(F.col(qa_col).cast("double"), F.lit(0.0)) + F.lit(1e-9)
    return (
        stream.select(
            F.col(id_col).alias("id"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).cast("double").alias("v"),
            w.alias("w"),
        )
        .filter(F.col("v").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy("id", F.window("ts", f"{secs} seconds").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.sum("w").alias("wsum"),
            F.sum(F.col("v") * F.col("w")).alias("vwsum"),
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
            F.max("ts").alias("last_ts"),
            F.max_by("v", "ts").alias("last_value"),
        )
        .select("id", F.col("win.start").alias("bucket_start"), "count",
                "wsum", "vwsum", "vmin", "vmax", "last_ts", "last_value",
                (F.col("vwsum") / F.col("wsum")).alias("value"))
    )
