"""stratified_sample + embedding_quantize_int8 invariants and plan shape.

The driver gate hash-compares both against their DuckDB oracles; these
tests pin the semantic contracts a matching pair of wrong implementations
could still violate, plus the scale-relevant plan shapes.
"""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from sen2rts_spark.queries_docs import (_SAMPLE_BUCKETS, q_embedding_quantize_int8,
                                        q_stratified_sample)

SF_DIR = "/root/testdata/sf0.001"


def test_stratified_sample_balances_langs(spark):
    docs = pd.read_parquet(SF_DIR + "/documents.parquet")
    n_by_lang = docs.groupby("lang").size()
    tgt = int(n_by_lang.min())
    got = q_stratified_sample(spark, SF_DIR).toPandas()
    kept = got.groupby("lang").size()
    for lang, n in n_by_lang.items():
        rate = min(1.0, tgt / n)
        k = int(kept.get(lang, 0))
        # deterministic hash threshold: expected rate*n with binomial spread;
        # 6 sigma keeps this non-flaky while still catching a wrong threshold
        sigma = max(1.0, (n * rate * (1 - rate)) ** 0.5)
        assert abs(k - rate * n) <= 6 * sigma, (lang, k, rate * n)
    # the smallest language is kept in full (rate exactly 1.0)
    assert int(kept[n_by_lang.idxmin()]) == tgt
    # decision is per-doc deterministic: same call, same rows
    again = q_stratified_sample(spark, SF_DIR).toPandas()
    assert sorted(got.doc_id) == sorted(again.doc_id)
    assert (got.bucket < _SAMPLE_BUCKETS).all() and (got.bucket >= 0).all()


def test_quantize_error_bound_and_roundtrip(spark):
    out = q_embedding_quantize_int8(spark, SF_DIR).toPandas()
    emb = pd.read_parquet(SF_DIR + "/embeddings.parquet")
    assert len(out) == len(emb)
    # the int8 mid-rise quantizer's reconstruction error is <= scale/2
    assert (out.max_err <= out.scale / 2 + 1e-9).all()
    assert (out.scale > 0).all()  # synthetic embeddings are non-constant
    # independent numpy recomputation of one vector's codes
    row = emb.iloc[0]
    v = np.asarray(row.embedding, dtype=np.float64)
    mn, sc = v.min(), (v.max() - v.min()) / 255.0
    q = np.minimum(255.0, np.floor((v - mn) / sc + 0.5)).astype(np.int64)
    got = out[out.vec_id == row.vec_id].iloc[0]
    assert got.sum_q == q.sum() and got.sum_q2 == (q * q).sum()
    assert got.q_first == q[0] and got.q_last == q[-1]


def test_quantize_zero_shuffle_plan(spark):
    """Quantization must stay a per-row projection — no exchange anywhere
    (the 4x-smaller ANN storage path cannot afford a corpus shuffle)."""
    df = q_embedding_quantize_int8(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
