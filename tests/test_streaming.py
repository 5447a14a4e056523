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


def test_stream_sketch_matches_batch(spark):
    """Streaming hll sketch tier must estimate identically to the batch
    tier on the same data (same lg_k, sparse-exact range)."""
    from sen2rts_spark.operators.rollup import rollup_sketch
    from sen2rts_spark.streaming.rollup_stream import stream_rollup_sketch
    import os, tempfile

    rows = []
    base = 1_700_000_000
    for uid in range(4):
        for k in range(60):
            rows.append((f"u{uid}", base + uid * 7919 + k * 1800, k % 17))
    src = spark.createDataFrame(rows, "id string, epoch long, key long") \
        .withColumn("ts", F.timestamp_seconds("epoch")).drop("epoch")

    with tempfile.TemporaryDirectory() as d:
        src.write.mode("overwrite").parquet(os.path.join(d, "in"))
        stream = spark.readStream.schema("id string, key long, ts timestamp") \
            .parquet(os.path.join(d, "in"))
        agg = stream_rollup_sketch(stream, "hourly", watermark="1 hour")
        q = (agg.select("id", "bucket_start", "count",
                        F.hll_sketch_estimate("key_sketch").alias("est"))
             .writeStream.format("memory").queryName("tier_sketch_stream")
             .outputMode("complete")
             .option("checkpointLocation", os.path.join(d, "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

        got = {(r["id"], r["bucket_start"]): (r["count"], r["est"])
               for r in spark.sql("SELECT * FROM tier_sketch_stream").collect()}
        want = {(r["id"], r["bucket_start"]): (r["count"], r["est"])
                for r in rollup_sketch(src, "hourly", key_col="key")
                .select("id", "bucket_start", "count",
                        F.hll_sketch_estimate("key_sketch").alias("est"))
                .collect()}
        assert got == want and len(got) > 0


def test_stateful_ewma_carries_state_across_batches(spark):
    import os, tempfile
    import pyspark.sql.functions as F
    from sen2rts_spark.streaming.rollup_stream import stream_ewma_smoother

    rows1 = [("a", 1_700_000_000 + k * 60, float(k)) for k in range(5)]
    rows2 = [("a", 1_700_000_000 + (5 + k) * 60, float(5 + k)) for k in range(5)]

    with tempfile.TemporaryDirectory() as d:
        os.makedirs(os.path.join(d, "in"))
        def mkdf(rows):
            # one file per write: file-source micro-batch order is file order,
            # and the EWMA fold needs ordered arrival
            return spark.createDataFrame(rows, "id string, epoch long, value double") \
                .withColumn("ts", F.timestamp_seconds("epoch")).drop("epoch") \
                .coalesce(1)
        def run_once():
            stream = spark.readStream \
                .schema("id string, value double, ts timestamp") \
                .option("maxFilesPerTrigger", 1).parquet(os.path.join(d, "in"))
            q = (stream_ewma_smoother(stream, alpha=0.5)
                 .writeStream.format("parquet")
                 .option("path", os.path.join(d, "out"))
                 .outputMode("append")
                 .option("checkpointLocation", os.path.join(d, "ckpt"))
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)

        mkdf(rows1).write.mode("append").parquet(os.path.join(d, "in"))
        run_once()  # first batch
        mkdf(rows2).write.mode("append").parquet(os.path.join(d, "in"))
        run_once()  # restart from checkpoint — state must carry over

        got = {r["value"]: r["smoothed"]
               for r in spark.read.parquet(os.path.join(d, "out")).collect()}
        # reference EWMA folded over ALL 10 points in order — state carried
        exp, cur = {}, None
        for v in [float(x) for x in range(10)]:
            cur = v if cur is None else 0.5 * v + 0.5 * cur
            exp[v] = cur
        for v, s in exp.items():
            assert abs(got[v] - s) < 1e-12, (v, got.get(v), s)


def test_stream_dedup_exact_suppresses_across_batches(spark):
    """First occurrence of each content hash passes; exact repeats in a
    LATER micro-batch are suppressed by carried state (the property a
    batch-mode distinct cannot give a stream). One parquet file per
    trigger forces the repeats into a separate micro-batch."""
    import os, tempfile
    from sen2rts_spark.streaming.rollup_stream import stream_dedup_exact

    base = 1_700_000_000
    texts = [f"document body {i % 4}" for i in range(8)]  # 4 distinct
    first = [(i, texts[i], base + i) for i in range(8)]
    # second wave: same 4 texts again, later but inside the watermark
    second = [(100 + i, texts[i], base + 600 + i) for i in range(8)]

    with tempfile.TemporaryDirectory() as d:
        indir = os.path.join(d, "in")
        mk = lambda rows: spark.createDataFrame(
            rows, "doc_id long, text string, epoch long") \
            .withColumn("ts", F.timestamp_seconds("epoch")).drop("epoch")
        mk(first).coalesce(1).write.mode("append").parquet(indir)
        mk(second).coalesce(1).write.mode("append").parquet(indir)

        stream = spark.readStream.schema(
            "doc_id long, text string, ts timestamp") \
            .option("maxFilesPerTrigger", 1).parquet(indir)
        q = (stream_dedup_exact(stream, watermark="1 hour")
             .writeStream.format("memory").queryName("dedup_stream")
             .outputMode("append")
             .option("checkpointLocation", os.path.join(d, "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        n_batches = len([p for p in q.recentProgress
                         if p["numInputRows"] > 0])

        out = spark.sql("SELECT * FROM dedup_stream").collect()
        # exactly one survivor per distinct text, regardless of batch order
        assert sorted(r["text"] for r in out) == sorted(set(texts))
        # the second wave was a separate trigger, so suppression crossed
        # micro-batch state, not just within-batch distinct
        assert n_batches >= 2
        # survivors are first-wave rows (their repeats arrived later)
        assert all(r["doc_id"] < 100 for r in out)
