"""decode_blobs_agg must equal decode_blobs + groupBy re-aggregation.

The aggregate-pushdown read (one partial row per (blob, coarse bucket),
computed inside the decode pass) is the scale path for tier re-aggregation;
its contract is exact equality with the materialize-then-aggregate plan.
"""

import pyspark.sql.functions as F
import pytest


def _blobs(spark, chunk_days=30):
    from sen2rts_spark.operators.gorilla_sink import encode_blobs
    from sen2rts_spark.operators.rollup import rollup_raw
    e = spark.range(0, 20000).select(
        (F.col("id") % 37).cast("string").alias("id"),
        F.timestamp_seconds(
            F.lit(1600000000) + (F.col("id") * 6203) % (200 * 86400)).alias("ts"),
        (F.sin(F.col("id") * 0.37) + 2.0).alias("value"),
        F.lit(1.0).alias("qa"))
    daily = rollup_raw(e, "daily")
    # small chunks force coarse buckets to straddle chunk boundaries, so the
    # cross-blob combine path is exercised, not just the in-blob reduction
    return encode_blobs(daily, "daily", chunk_days=chunk_days)


@pytest.mark.parametrize("bucket_seconds", [None, 7 * 86400])
def test_agg_matches_explode_path(spark, bucket_seconds):
    from sen2rts_spark.operators.gorilla_sink import (decode_blobs,
                                                      decode_blobs_agg)
    blobs = _blobs(spark).cache()
    try:
        agg = decode_blobs_agg(blobs, bucket_seconds=bucket_seconds)
        final = agg.groupBy("id", "bucket_start").agg(
            F.sum("n_points").alias("n"), F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
            F.round(F.sum("vsum"), 9).alias("vsum"))

        pts = decode_blobs(blobs)
        if bucket_seconds is None:
            # per-blob buckets = the encode chunks; reconstruct the chunk key
            chunk = F.window("bucket_start", "2592000 seconds")["start"]
            ref_grouped = pts.groupBy("id", chunk.alias("bucket_start"))
        else:
            b = F.timestamp_seconds(
                (F.unix_timestamp("bucket_start") / bucket_seconds)
                .cast("long") * bucket_seconds)
            ref_grouped = pts.groupBy("id", b.alias("bucket_start"))
        ref = ref_grouped.agg(
            F.count(F.lit(1)).alias("n"), F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
            F.round(F.sum("value"), 9).alias("vsum"))

        got = {tuple(r[:2]): tuple(r[2:]) for r in final.collect()}
        want = {tuple(r[:2]): tuple(r[2:]) for r in ref.collect()}
        assert got == want and len(got) > 50
    finally:
        blobs.unpersist()


def test_agg_total_count_matches_blob_header(spark):
    from sen2rts_spark.operators.gorilla_sink import decode_blobs_agg
    blobs = _blobs(spark).cache()
    try:
        n_header = blobs.agg(F.sum("count")).first()[0]
        n_agg = decode_blobs_agg(blobs, bucket_seconds=86400 * 7) \
            .agg(F.sum("n_points")).first()[0]
        assert n_header == n_agg
    finally:
        blobs.unpersist()


def test_encode_rejects_nan_values(spark):
    """NaN guard (ADVICE r5): the sink refuses NaN at encode time so the
    decode_blobs_agg == decode_blobs+groupBy equality contract holds
    unconditionally (numpy reductions propagate NaN; Spark min/max order
    it as the largest double — the two plans would silently diverge)."""
    import pytest
    from sen2rts_spark.operators.gorilla_sink import encode_blobs
    tier = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", float("nan")),
         ("a", "2024-01-02 00:00:00", 1.0)],
        "id string, bucket_start string, value double") \
        .withColumn("bucket_start", F.to_timestamp("bucket_start"))
    with pytest.raises(Exception, match="NaN"):
        encode_blobs(tier, "daily").collect()
