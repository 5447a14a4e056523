"""Single-exchange fused ingest plan (VERDICT r7 task 1 lever a).

HashPartitioning(id) satisfies the ClusteredDistribution of the extract
aggregate, every rollup tier, and the Gorilla sink grouping — the fused
pipeline must carry exactly ONE Exchange, and its results must be
byte-identical to the default three-exchange plan.
"""

import re

import pyspark.sql.functions as F

from sen2rts_spark.operators.pipeline import rollup_gorilla_pipeline
from sen2rts_spark.operators.rollup import rollup_raw, rollup_tier
from sen2rts_spark.sources.pages import synth_pages


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"\bExchange\b", plan))


def _decoded_rows(df):
    # blob BYTES may differ across plan shapes (float aggregation order
    # changes the last ulp of the bucket means) — compare the decoded
    # series at 1e-9 plus the exact envelope metadata.
    from sen2rts_spark.operators.gorilla_sink import decode_blobs
    meta = sorted((r.id, r.chunk_start, r["count"], r.min_ts, r.max_ts)
                  for r in df.collect())
    vals = sorted((r.id, r.bucket_start, round(r.value, 9))
                  for r in decode_blobs(df).collect())
    return meta, vals


def test_fused_single_exchange_and_identical_blobs(spark):
    pages = synth_pages(spark, n_urls=60, n_slots=40, partitions=8)
    fused = rollup_gorilla_pipeline(pages, "daily", fused=True)
    default = rollup_gorilla_pipeline(pages, "daily", fused=False)
    assert _exchanges(fused) == 1
    assert _exchanges(default) >= 3
    assert _decoded_rows(fused) == _decoded_rows(default)


def test_tier_chain_exchange_free_after_partition_by_id(spark):
    obs = synth_pages(spark, n_urls=40, n_slots=30, partitions=4)
    from sen2rts_spark.operators.extract import extract_obs
    o = extract_obs(obs).select(
        "id", F.col("date").cast("timestamp").alias("ts"), "value", "qa")
    hourly = rollup_raw(o, "hourly", partition_by_id=8)
    weekly = rollup_tier(rollup_tier(hourly, "daily"), "weekly")
    # extract's own groupBy still exchanges once (no partition_by_id there);
    # the repartition is the second and LAST — three window aggs downstream
    # of it add none.
    n = _exchanges(weekly)
    assert n == 2, f"expected 2 exchanges (extract agg + id repartition), got {n}"

    # value parity with the per-tier-exchange chain
    base = rollup_tier(rollup_tier(rollup_raw(o, "hourly"), "daily"), "weekly")
    a = sorted(map(tuple, weekly.select(
        "id", "bucket_start", "count", F.round("value", 9).alias("v")).collect()))
    b = sorted(map(tuple, base.select(
        "id", "bucket_start", "count", F.round("value", 9).alias("v")).collect()))
    assert a == b
