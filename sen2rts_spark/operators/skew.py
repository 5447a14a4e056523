"""Hot-key (hot-domain) skew handling: salted two-phase aggregation.

The north rule requires explicit salting for hot-domain skew. Associative
aggregates (the rollup partials — count/wsum/vwsum/min/max) pre-aggregate per
``(key, salt)`` then combine per key, so no single reducer owns a whole hot
domain. Per-series kernels CANNOT be salted (a series must be colocated) —
they are protected by rolling up to a bounded tier first (SURVEY §4.3).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["salted_rollup_raw", "domain_of"]


def domain_of(url_col) -> F.Column:
    return F.regexp_extract(url_col, r"https?://([^/]+)/", 1)


def salted_rollup_raw(obs: DataFrame, tier_seconds: int, salt_n: int = 16,
                      id_col: str = "id", ts_col: str = "ts",
                      value_col: str = "value", qa_col: str = "qa") -> DataFrame:
    """Rollup with per-(id, salt) partial aggregation before the final
    combine — two shuffles, but the first is uniform even when one id
    dominates the input."""
    w = F.coalesce(F.col(qa_col).cast("double"), F.lit(0.0)) + F.lit(1e-9)
    salted = obs.select(
        F.col(id_col).alias("id"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("v"),
        w.alias("w"),
        F.pmod(F.hash(ts_col), F.lit(salt_n)).alias("salt"),
    ).filter(F.col("v").isNotNull())
    partial = (
        salted.groupBy("id", "salt",
                       F.window("ts", f"{tier_seconds} seconds").alias("win"))
        .agg(F.count(F.lit(1)).alias("count"), F.sum("w").alias("wsum"),
             F.sum(F.col("v") * F.col("w")).alias("vwsum"),
             F.min("v").alias("vmin"), F.max("v").alias("vmax"),
             F.max("ts").alias("last_ts"),
             F.max_by("v", "ts").alias("last_value"))
    )
    final = (
        partial.groupBy("id", "win")
        .agg(F.sum("count").alias("count"), F.sum("wsum").alias("wsum"),
             F.sum("vwsum").alias("vwsum"), F.min("vmin").alias("vmin"),
             F.max("vmax").alias("vmax"), F.max("last_ts").alias("last_ts"),
             F.max_by("last_value", "last_ts").alias("last_value"))
        .select("id", F.col("win.start").alias("bucket_start"), "count",
                "wsum", "vwsum", "vmin", "vmax", "last_ts", "last_value",
                (F.col("vwsum") / F.col("wsum")).alias("value"))
    )
    return final
