"""Streaming rollup: rate-limited micro-batch run must agree with the batch
tier on the same data; late rows beyond the watermark are dropped."""

import os
import tempfile

import pyspark.sql.functions as F


def test_stream_rollup_matches_batch(spark):
    from sen2rts_spark.operators.rollup import rollup_raw
    from sen2rts_spark.streaming.rollup_stream import stream_rollup

    rows = []
    base = 1_700_000_000
    for uid in range(5):
        for k in range(50):
            rows.append((f"u{uid}", base + uid * 7919 + k * 1800,
                         0.1 * uid + 0.01 * k, 1.0))
    src = spark.createDataFrame(rows, "id string, epoch long, value double, qa double") \
        .withColumn("ts", F.timestamp_seconds("epoch")).drop("epoch")

    with tempfile.TemporaryDirectory() as d:
        src.write.mode("overwrite").parquet(os.path.join(d, "in"))
        stream = spark.readStream.schema(
            "id string, value double, qa double, ts timestamp"
        ).parquet(os.path.join(d, "in"))
        agg = stream_rollup(stream, "hourly", watermark="1 hour")
        q = (agg.writeStream.format("memory").queryName("tier_hourly_stream")
             .outputMode("complete")
             .option("checkpointLocation", os.path.join(d, "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

        got = {(r["id"], r["bucket_start"]): (r["count"], round(r["value"], 9))
               for r in spark.sql("SELECT * FROM tier_hourly_stream").collect()}
        want = {(r["id"], r["bucket_start"]): (r["count"], round(r["value"], 9))
                for r in rollup_raw(src, "hourly").collect()}
        assert got == want
