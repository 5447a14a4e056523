"""Deterministic synthetic Common-Crawl-style ``pages`` table.

Shape per BASELINE.json ``input_hint``:

    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Generated entirely with Catalyst expressions over ``spark.range`` — no driver
loops, no Python UDFs, fully distributed and reproducible (hash-seeded, no
rand()). Scales linearly with ``n_urls``: the bench generates hundreds of
thousands of urls; tests use a handful.

Structure (mirrors the reference's observation model, FIXTURES.md §1):
- each url belongs to a crawl source ("orbit", 5 sources with doybase 0..4)
  and is crawled on a 5-day cadence (epoch-day % 10 ∈ {doybase, doybase+5} —
  the S2 DOP analogue, s2_dop_simpl.R:34-45), with ~``missing_pct`` slots
  dropped and ~``dup_pct`` duplicated (re-crawl same day, later hour);
- the page text embeds a seasonal metric (``ndvi=…``), a 12-class quality
  class (``class=…``, SCL analogue) and a cloud-percentage (``cld=…``) that
  the extract stage parses back — the per-row invariant is that
  strip_tags(html) is byte-identical to ``text``;
- domains are skewed: ~half of all urls live on one hot domain (d0) to
  exercise salting / AQE skew handling.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

__all__ = ["synth_pages", "PAGES_SCHEMA"]

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_START_DAY = 18263  # 2020-01-02 (epoch days); slots align per-orbit below


def _dhash(*cols):
    """Deterministic non-negative int hash (murmur3 via Spark hash())."""
    return F.abs(F.hash(*cols))


def synth_pages(
    spark: SparkSession,
    n_urls: int = 200,
    n_slots: int = 60,
    missing_pct: int = 20,
    dup_pct: int = 3,
    partitions: int | None = None,
) -> DataFrame:
    """Build the synthetic pages DataFrame (one row per crawl fetch)."""
    base = spark.range(0, n_urls * n_slots,
                       numPartitions=partitions or spark.sparkContext.defaultParallelism)
    df = base.select(
        (F.col("id") / n_slots).cast("long").alias("u"),
        F.pmod(F.col("id"), F.lit(n_slots)).cast("int").alias("slot"),
    )
    # crawl source ("orbit"): doybase = source % 10 matches kernels.series._doybase
    df = df.withColumn("src", F.pmod(F.col("u"), F.lit(5)).cast("int"))
    df = df.withColumn("orbit", F.lpad((F.col("src") * 11).cast("string"), 3, "0"))
    # 5-day cadence aligned to the source's doybase
    start = F.lit(_START_DAY) + F.pmod(F.col("src") - F.lit(_START_DAY), F.lit(5))
    df = df.withColumn("day", (start + F.col("slot") * 5).cast("long"))
    df = df.withColumn(
        "sensor",
        F.when(F.pmod(F.col("day"), F.lit(10)) == F.col("src"), "2A").otherwise("2B"),
    )
    # drop ~missing_pct% of slots deterministically
    df = df.filter(F.pmod(_dhash("u", "slot"), F.lit(100)) >= missing_pct)

    # domain skew: half the urls on the hot domain d0
    dom = F.when(F.pmod(F.col("u"), F.lit(10)) < 5, F.lit(0)) \
        .otherwise(F.pmod(F.col("u"), F.lit(10)).cast("int"))
    df = df.withColumn("dom", dom)
    df = df.withColumn(
        "url",
        F.concat(F.lit("https://d"), F.col("dom").cast("string"),
                 F.lit(".example.org/page/"), F.col("u").cast("string")),
    )
    df = df.withColumn(
        "lang",
        F.element_at(F.array(F.lit("en"), F.lit("it"), F.lit("de"), F.lit("fr")),
                     (F.pmod(_dhash("u"), F.lit(4)) + 1).cast("int")),
    )

    # seasonal double-logistic signal + deterministic noise (the page metric)
    doy = F.pmod(F.col("day"), F.lit(365)).cast("double")
    phase = (F.pmod(_dhash(F.col("u") + 17), F.lit(60)) - 30).cast("double")
    t1 = F.lit(110.0) + phase
    t2 = F.lit(250.0) + phase
    noise = (F.pmod(_dhash("u", "slot", F.lit(7)), F.lit(2001)) - 1000) / 10000.0
    value = (
        F.lit(0.08)
        + F.lit(0.75) / (F.lit(1.0) + F.exp(-(doy - t1) / F.lit(12.0)))
        - F.lit(0.75) / (F.lit(1.0) + F.exp(-(doy - t2) / F.lit(18.0)))
        + noise * F.lit(0.5)
    )
    df = df.withColumn("metric", F.round(value, 6))

    # quality class (12-class SCL analogue; mostly good, some clouds/shadows)
    qroll = F.pmod(_dhash("u", "slot", F.lit(13)), F.lit(100))
    qclass = (
        F.when(qroll < 45, 4)        # vegetation
        .when(qroll < 60, 5)         # not vegetated
        .when(qroll < 68, 6)         # water
        .when(qroll < 76, 7)         # unclassified
        .when(qroll < 84, 8)         # cloud medium
        .when(qroll < 90, 9)         # cloud high
        .when(qroll < 94, 10)        # cirrus
        .when(qroll < 97, 3)         # shadow
        .when(qroll < 99, 2)         # dark
        .otherwise(0)                # no data
    )
    df = df.withColumn("qclass", qclass.cast("int"))
    df = df.withColumn("cld", F.pmod(_dhash("u", "slot", F.lit(23)), F.lit(101)).cast("int"))

    # fetch hour within the day
    hour = F.pmod(_dhash("u", "slot", F.lit(31)), F.lit(86400))
    df = df.withColumn("warc_ts", F.timestamp_seconds(F.col("day") * 86400 + hour))

    # duplicates: re-crawl same url/slot one hour later
    dups = df.filter(F.pmod(_dhash("u", "slot", F.lit(41)), F.lit(100)) < dup_pct) \
        .withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 HOUR"))
    df = df.unionByName(dups)

    # page text (the extract invariant target) and html wrapper
    filler = F.repeat(
        F.concat(F.lit("lorem"), F.pmod(_dhash("u", "slot", F.lit(53)), F.lit(97)).cast("string"),
                 F.lit(" ipsum dolor sit amet ")),
        (F.pmod(_dhash("u", "slot", F.lit(61)), F.lit(4)) + 1).cast("int"),
    )
    text = F.concat_ws(
        " ",
        F.concat(F.lit("lang="), F.col("lang")),
        F.concat(F.lit("source="), F.col("orbit")),
        F.concat(F.lit("sensor="), F.col("sensor")),
        F.concat(F.lit("class="), F.col("qclass").cast("string")),
        F.concat(F.lit("cld="), F.col("cld").cast("string")),
        F.concat(F.lit("ndvi="), F.format_number(F.col("metric"), 6)),
        filler,
    )
    df = df.withColumn("text", text)
    df = df.withColumn(
        "html",
        F.encode(
            F.concat(F.lit("<html><head><title>"), F.col("url"),
                     F.lit("</title></head><body><p>"), F.col("text"),
                     F.lit("</p></body></html>")),
            "UTF-8",
        ),
    )
    return df.select("url", "warc_ts", "html", "text", "lang")
