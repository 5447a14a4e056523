"""The numpy LSH pair kernel (r9 optimization) must reproduce the former
Catalyst join + per-pair fold BIT-exactly — same pairs, same float64 sims —
on real fixture data and on adversarial shapes (empty cells, singleton
cells, a zero vector whose cosine divides by zero)."""

import numpy as np
import pyspark.sql.functions as F

from sen2rts_spark.queries_docs import (ANN_LSH_BITS, ANN_SIM_THR,
                                        N_SIGN_BITS, NEAR_DUP_SIM,
                                        _norm_sql, _pairwise_cosine_block,
                                        q_ann_lsh_bucketed,
                                        q_dedup_embedding_near)

SF_DIR = "/root/testdata/sf0.01"


def _reference_pairs(e, key_cols, thr):
    """The pre-r9 plan: self-join on the cell key, per-pair HOF fold."""
    nrm = F.expr(_norm_sql("embedding"))
    eb = e.withColumn("nrm", nrm)
    a = eb.select(*[F.col(c).alias(f"{c}_a") for c in key_cols],
                  F.col("vec_id").alias("va"),
                  F.col("embedding").alias("ea"), F.col("nrm").alias("na_"))
    b = eb.select(*[F.col(c).alias(f"{c}_b") for c in key_cols],
                  F.col("vec_id").alias("vb"),
                  F.col("embedding").alias("eb"), F.col("nrm").alias("nb_"))
    cond = F.col("va") < F.col("vb")
    for c in key_cols:
        cond = cond & (F.col(f"{c}_a") == F.col(f"{c}_b"))
    dot = ("aggregate(zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE) * "
           "CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    sim = F.expr(dot) / (F.col("na_") * F.col("nb_"))
    return a.join(b, cond).select("va", "vb", sim.alias("sim")) \
        .filter(sim >= thr)


def _near_bucket():
    return sum((F.when(F.col("embedding")[i] >= 0, F.lit(1 << i))
                .otherwise(F.lit(0)) for i in range(N_SIGN_BITS)),
               start=F.lit(0))


def test_dedup_embedding_near_matches_join_plan(spark):
    got = {(r.va, r.vb): r.sim
           for r in q_dedup_embedding_near(spark, SF_DIR).collect()}
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet") \
        .withColumn("bucket", _near_bucket())
    want = {(r.va, r.vb): r.sim
            for r in _reference_pairs(e, ["label", "bucket"],
                                      NEAR_DUP_SIM)
            .select("va", "vb", F.round("sim", 4).alias("sim")).collect()}
    assert got == want  # exact: same pairs AND bit-identical rounded sims


def test_ann_lsh_bucketed_matches_join_plan(spark):
    got = {(r.va, r.vb): (r.sim, r.bucket)
           for r in q_ann_lsh_bucketed(spark, SF_DIR).collect()}
    bucket = sum(
        (F.when(F.col("embedding")[2 * i] - F.col("embedding")[2 * i + 1] >= 0,
                F.lit(1 << i)).otherwise(F.lit(0))
         for i in range(ANN_LSH_BITS)), start=F.lit(0))
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet") \
        .withColumn("bucket", bucket)
    ref = _reference_pairs(e, ["bucket"], ANN_SIM_THR) \
        .select("va", "vb", F.round("sim", 4).alias("sim"))
    withb = {r.vec_id: r.bucket for r in e.select("vec_id", "bucket").collect()}
    want = {(r.va, r.vb): (r.sim, withb[r.va]) for r in ref.collect()}
    assert got == want


def test_block_kernel_matches_flat_and_handles_edges():
    rng = np.random.RandomState(7)
    E = rng.randn(37, 64).astype(np.float32).astype(np.float64)
    E[5] = 0.0  # zero vector: norm 0 -> NaN sims, kept (Spark NaN ordering)
    ids = np.arange(100, 137, dtype=np.int64)
    # tiny block size forces the multi-block path
    import sen2rts_spark.queries_docs as qd
    va, vb, sim = _pairwise_cosine_block(ids, E, -2.0)  # keep everything
    assert len(va) == 37 * 36 // 2
    # sequential-order reference, one pair at a time
    exp = {}
    with np.errstate(invalid="ignore"):
        for i in range(37):
            for j in range(i + 1, 37):
                d = 0.0
                na = 0.0
                nb = 0.0
                for k in range(64):
                    d += E[i, k] * E[j, k]
                    na += E[i, k] * E[i, k]
                    nb += E[j, k] * E[j, k]
                exp[(ids[i], ids[j])] = d / (np.sqrt(na) * np.sqrt(nb))
    for a, b, s in zip(va, vb, sim):
        want = exp[(a, b)]
        assert (np.isnan(s) and np.isnan(want)) or s == want
    # NaN rows (the zero vector's pairs) survive a real threshold
    va2, vb2, sim2 = _pairwise_cosine_block(ids, E, 0.99)
    assert np.isnan(sim2).sum() == 36
    # singleton / empty cells emit nothing
    va3, vb3, sim3 = _pairwise_cosine_block(ids[:1], E[:1], 0.0)
    assert len(va3) == 0


def test_block_boundaries_are_exact(monkeypatch):
    """Force several row blocks; results must equal the single-block run."""
    import sen2rts_spark.queries_docs as qd
    rng = np.random.RandomState(11)
    E = rng.randn(50, 8).astype(np.float64)
    ids = np.arange(50, dtype=np.int64)
    one = _pairwise_cosine_block(ids, E, -2.0)
    monkeypatch.setattr(qd, "_PAIR_BLOCK_ELEMS", 350)  # blk = 7 rows
    many = qd._pairwise_cosine_block(ids, E, -2.0)
    for x, y in zip(one, many):
        assert np.array_equal(x, y)
