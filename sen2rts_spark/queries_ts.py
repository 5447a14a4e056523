"""Timeseries graft queries: rollup tiers, retention, gap fill, compression.

These exercise the engine's own operators (operators/rollup.py,
operators/gorilla_sink.py, operators/timeseries.py) over the driver's
``events`` table, with DuckDB oracles where the semantics are SQL-expressible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Window

from .operators.gorilla_sink import decode_blobs, encode_blobs
from .operators.rollup import rollup_raw, rollup_tier
from .queries import load, register

_DAILY_ORACLE = """
SELECT user_id,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
       COUNT(*) AS count,
       ROUND(SUM(value * 1.000000001) / SUM(1.000000001), 6) AS value,
       ROUND(MIN(value), 6) AS vmin,
       ROUND(MAX(value), 6) AS vmax
FROM events GROUP BY user_id, date_trunc('day', ts)
"""


def _daily(spark, sf_dir):
    e = load(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("id"), "ts", "value",
        F.lit(1.0).alias("qa"))
    return rollup_raw(e, "daily")


def _present_daily(t):
    return t.select(
        F.col("id").cast("long").alias("user_id"),
        "bucket_start", "count",
        F.round("value", 6).alias("value"),
        F.round("vmin", 6).alias("vmin"),
        F.round("vmax", 6).alias("vmax"))


@register("rollup_daily", _DAILY_ORACLE)
def q_rollup_daily(spark, sf_dir):
    """Daily continuous aggregate (qa-weighted mean, min/max, count)."""
    return _present_daily(_daily(spark, sf_dir))


@register("rollup_tier_chain", _DAILY_ORACLE)
def q_rollup_tier_chain(spark, sf_dir):
    """daily(hourly(raw)) must equal daily(raw) — oracle is direct daily."""
    e = load(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("id"), "ts", "value",
        F.lit(1.0).alias("qa"))
    hourly = rollup_raw(e, "hourly")
    return _present_daily(rollup_tier(hourly, "daily"))


@register("rollup_weekly_retention", """
SELECT user_id,
       to_timestamp((epoch(ts)::BIGINT // 604800) * 604800) AS bucket_start,
       COUNT(*) AS count,
       ROUND(SUM(value * 1.000000001) / SUM(1.000000001), 6) AS value
FROM events
WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 56 DAY
GROUP BY user_id, (epoch(ts)::BIGINT // 604800)
""")
def q_rollup_weekly_retention(spark, sf_dir):
    """Weekly tier with a retention window (keep last 8 weeks of raw)."""
    e = load(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("id"), "ts", "value",
        F.lit(1.0).alias("qa"))
    mx = e.agg(F.max("ts").alias("mx"))
    kept = e.crossJoin(F.broadcast(mx)) \
        .filter(F.col("ts") >= F.col("mx") - F.expr("INTERVAL 56 DAY")) \
        .drop("mx")
    weekly = rollup_raw(kept, "weekly")
    return weekly.select(
        F.col("id").cast("long").alias("user_id"),
        "bucket_start", "count", F.round("value", 6).alias("value"))


@register("gorilla_roundtrip_daily", """
SELECT user_id,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
       ROUND(SUM(value * 1.000000001) / SUM(1.000000001), 6) AS value
FROM events GROUP BY user_id, date_trunc('day', ts)
""")
def q_gorilla_roundtrip_daily(spark, sf_dir):
    """encode→decode of the daily tier must reproduce the plain daily SQL."""
    daily = _daily(spark, sf_dir)
    back = decode_blobs(encode_blobs(daily, "daily"))
    return back.select(
        F.col("id").cast("long").alias("user_id"),
        "bucket_start",
        F.round("value", 6).alias("value"))


@register("fill_linear_daily", """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day, AVG(value) AS v
  FROM events GROUP BY user_id, date_trunc('day', ts)),
bounds AS (
  SELECT user_id, MIN(day) AS dmin, MAX(day) AS dmax FROM daily GROUP BY user_id),
grid AS (
  SELECT b.user_id, UNNEST(generate_series(b.dmin, b.dmax, INTERVAL 1 DAY)) AS day
  FROM bounds b),
joined AS (
  SELECT g.user_id, g.day, d.v FROM grid g
  LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day),
ctx AS (
  SELECT user_id, day, v,
         last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
         first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY day
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
  FROM joined)
SELECT user_id, day,
       ROUND(CASE WHEN v IS NOT NULL THEN v
            ELSE pv + (nv - pv) * date_diff('day', pd, day)
                      / NULLIF(date_diff('day', pd, nd), 0) END, 6) AS filled
FROM ctx
""")
def q_fill_linear_daily(spark, sf_dir):
    """C8: linear gap-fill of the daily series (smooth_s2ts.R:182-191),
    expressed as pure window SQL in BOTH engines (no UDF)."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy("user_id", F.date_trunc("day", "ts").alias("day")) \
        .agg(F.avg("value").alias("v"))
    bounds = daily.groupBy("user_id").agg(F.min("day").alias("dmin"),
                                          F.max("day").alias("dmax"))
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("dmin", "dmax", F.expr("INTERVAL 1 DAY")))
        .alias("day"))
    joined = grid.join(daily, ["user_id", "day"], "left")
    wp = Window.partitionBy("user_id").orderBy("day") \
        .rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.partitionBy("user_id").orderBy("day") \
        .rowsBetween(0, Window.unboundedFollowing)
    vday = F.when(F.col("v").isNotNull(), F.col("day"))
    ctx = joined.select(
        "user_id", "day", "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(vday, ignorenulls=True).over(wp).alias("pd"),
        F.first("v", ignorenulls=True).over(wn).alias("nv"),
        F.first(vday, ignorenulls=True).over(wn).alias("nd"))
    frac = (F.datediff(F.to_date("day"), F.to_date("pd"))
            / F.nullif(F.datediff(F.to_date("nd"), F.to_date("pd")), F.lit(0)))
    return ctx.select(
        "user_id", "day",
        F.round(F.when(F.col("v").isNotNull(), F.col("v"))
                .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac), 6)
        .alias("filled"))


# ---- non-SQL-expressible per-series kernels: rows-only checks ------------

@register("smooth_savgol_series")
def q_smooth_savgol_series(spark, sf_dir):
    """W4-W6: spike removal + iterated weighted SG over daily event series.

    Not SQL-expressible (iterated weighted regression) → rows-only check.
    """
    from .operators.timeseries import smooth
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.col("user_id").cast("string").alias("id"),
                      F.to_date("ts").alias("date")) \
        .agg(F.avg("value").alias("value"), F.lit(1.0).alias("qa"),
             F.lit("000").alias("orbit"), F.lit("2A").alias("sensor")) \
        .select("id", "date", "orbit", "sensor", "value", "qa")
    out = smooth(daily, min_qa=0.0, sg_daywindow=15)
    return out.select("id", "date",
                      F.round("value", 6).alias("smoothed"),
                      F.round("rawval", 6).alias("rawval"))


@register("fill_spline_series")
def q_fill_spline_series(spark, sf_dir):
    """C9: FMM-spline daily gap fill — rows-only (spline not in SQL)."""
    from .operators.timeseries import fill
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.col("user_id").cast("string").alias("id"),
                      F.to_date("ts").alias("date")) \
        .agg(F.avg("value").alias("value"))
    sm = daily.select("id", "date", F.lit("000").alias("orbit"),
                      F.lit("2A").alias("sensor"), "value",
                      F.lit(1.0).alias("qa"), F.col("value").alias("rawval"))
    out = fill(sm)
    return out.select("id", "date", F.round("value", 6).alias("filled"),
                      "interpolated")


@register("cut_cycles_series")
def q_cut_cycles_series(spark, sf_dir):
    """W2/W3/W8-W10 + §3.3: cycle segmentation — rows-only."""
    from .operators.timeseries import cut_cycles, fill
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.col("user_id").cast("string").alias("id"),
                      F.to_date("ts").alias("date")) \
        .agg(F.avg("value").alias("value"))
    sm = daily.select("id", "date", F.lit("000").alias("orbit"),
                      F.lit("2A").alias("sensor"), "value",
                      F.lit(1.0).alias("qa"), F.col("value").alias("rawval"))
    return cut_cycles(fill(sm))
