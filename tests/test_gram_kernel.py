"""The r9 Python gram/signature kernels must reproduce the former Catalyst
constructions exactly: same distinct (doc, gram) rows as the lead()-window
shingle plan, and bit-identical MinHash signatures vs the explode +
groupBy-min plan (md5 via hashlib == Spark md5, int(hex, 16) == conv)."""

import pyspark.sql.functions as F
from pyspark.sql import Window

from sen2rts_spark.queries_docs import (N_PERMS, _KM_MOD, _ngram_rows,
                                        _shingle_rows, q_minhash_signature)

SF_DIR = "/root/testdata/sf0.001"


def _old_shingle_rows(spark, sf_dir):
    """The pre-r9 Catalyst plan: posexplode + lead() windows + distinct."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = F.filter(
        F.split(F.regexp_replace("text", r"[^a-zA-Z0-9 ]", " "), " "),
        lambda w: w != "")
    ex = d.select("doc_id", "source", F.posexplode(words).alias("pos", "w"))
    win = Window.partitionBy("doc_id").orderBy("pos")
    sh = ex.select(
        "doc_id", "source",
        F.concat_ws(" ", F.lower("w"),
                    F.lower(F.lead("w", 1).over(win)),
                    F.lower(F.lead("w", 2).over(win))).alias("s"),
        F.lead("w", 2).over(win).alias("_w2"))
    return sh.filter(F.col("_w2").isNotNull()).drop("_w2").distinct()


def test_shingle_rows_match_window_plan(spark):
    got = set(map(tuple, _shingle_rows(spark, SF_DIR).collect()))
    want = set(map(tuple, _old_shingle_rows(spark, SF_DIR).collect()))
    assert got == want and len(got) > 0


def test_ngram_rows_pred_pushes_split(spark):
    """pred must select the same rows as filtering the output (the pred
    exists because a doc_id filter cannot push through the kernel)."""
    pred = F.col("doc_id") % 10 == 0
    got = set(map(tuple,
                  _ngram_rows(spark, SF_DIR, 3, pred=pred).collect()))
    want = set(map(tuple,
                   _ngram_rows(spark, SF_DIR, 3)
                   .filter(pred).collect()))
    assert got == want and len(got) > 0


def test_minhash_signature_matches_catalyst_plan(spark):
    sig = q_minhash_signature(spark, SF_DIR)
    got = {r["doc_id"]: tuple(r[f"h{i}"] for i in range(1, N_PERMS + 1))
           for r in sig.collect()}
    # Catalyst reference: md5/conv per distinct shingle row + groupBy-min
    ex = _old_shingle_rows(spark, SF_DIR)
    h = F.md5("s")
    hp = ex.select(
        "doc_id",
        F.conv(F.substring(h, 1, 7), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(h, 8, 7), 16, 10).cast("long").alias("h2"))
    ref = hp.groupBy("doc_id").agg(*[
        F.min((F.col("h1") + F.lit(i) * F.col("h2")) % F.lit(_KM_MOD))
        .alias(f"h{i}") for i in range(1, N_PERMS + 1)])
    want = {r["doc_id"]: tuple(r[f"h{i}"] for i in range(1, N_PERMS + 1))
            for r in ref.collect()}
    assert got == want and len(got) > 0
