"""Blob time-window pruning (VERDICT r6 task 7).

The sink's min_ts/max_ts envelope lets a narrow window read drop whole
blobs before decode. Three things are pinned: (1) the pruning filter is a
Catalyst Filter on the blob table UPSTREAM of the MapInArrow decode (at
100 TB it pushes to the blob index's parquet scan), (2) pruning actually
drops blobs, (3) the pruned read is value-identical to decode-everything-
then-filter.
"""

import re

import pyspark.sql.functions as F


def _weekly_blobs(spark):
    from sen2rts_spark.operators.extract import extract_obs
    from sen2rts_spark.operators.gorilla_sink import encode_blobs
    from sen2rts_spark.operators.rollup import rollup_raw
    from sen2rts_spark.sources.pages import synth_pages

    pages = synth_pages(spark, n_urls=20, n_slots=80, dup_pct=5)
    obs = extract_obs(pages).select(
        "id", F.col("date").cast("timestamp").alias("ts"), "value", "qa")
    daily = rollup_raw(obs, "daily")
    return encode_blobs(daily, "daily", chunk_days=28)


def test_window_prune_filter_precedes_decode(spark):
    from sen2rts_spark.operators.gorilla_sink import decode_blobs

    blobs = _weekly_blobs(spark).cache()
    try:
        lo_hi = blobs.agg(F.min("min_ts").alias("a"),
                          F.max("max_ts").alias("b")).first()
        span_days = (lo_hi["b"] - lo_hi["a"]).days
        assert span_days > 90  # enough chunks for pruning to mean something
        lo = F.lit(lo_hi["a"]) + F.expr("INTERVAL 40 DAYS")
        hi = F.lit(lo_hi["a"]) + F.expr("INTERVAL 68 DAYS")
        pruned = blobs.filter((F.col("max_ts") >= lo) & (F.col("min_ts") < hi))
        pts = decode_blobs(pruned).filter(
            (F.col("bucket_start") >= lo) & (F.col("bucket_start") < hi))

        # 1) plan shape: the envelope Filter sits below MapInArrow (runs
        # first), so non-matching blobs never reach the Python decode.
        # Anchor on the Filter NODE carrying the min_ts predicate (a bare
        # "min_ts" search can match the encode stage's printed output
        # schema and pass vacuously — ADVICE r7).
        plan = pts._jdf.queryExecution().executedPlan().toString()
        i_map = plan.index("MapInArrow")
        m = re.search(r"Filter .*min_ts", plan)
        assert m is not None, "envelope Filter node missing from plan"
        assert m.start() > i_map, "envelope filter must be a child of decode"

        # 2) pruning drops blobs
        n_all, n_pruned = blobs.count(), pruned.count()
        assert 0 < n_pruned < n_all

        # 3) value parity with decode-everything-then-filter
        naive = decode_blobs(blobs).filter(
            (F.col("bucket_start") >= lo) & (F.col("bucket_start") < hi))
        a = {(r["id"], r["bucket_start"]): round(r["value"], 9)
             for r in pts.collect()}
        b = {(r["id"], r["bucket_start"]): round(r["value"], 9)
             for r in naive.collect()}
        assert a == b and len(a) > 0
    finally:
        blobs.unpersist()
