"""Measure ANN recall vs the exact cosine baseline (VERDICT r4 task 5).

For every vector as query: exact cosine top-k over the whole table vs
(a) single-bucket LSH (the ann_lsh_bucketed plan: candidates share the
query's 8-bit hyperplane bucket) and (b) multi-probe LSH (the ann_multiprobe
plan: the bucket plus all 8 Hamming-distance-1 buckets).

Runs the candidate generation + ranking in DuckDB with EXACTLY the bucket
definition the gated Spark queries use (the correctness gate proves the
Spark plan reproduces this SQL value-for-value, so the recall measured here
IS the recall of the Spark path). Writes BENCH/ANN_RECALL.json.

    python tools/ann_recall.py [sf_dir] [k]
"""

from __future__ import annotations

import json
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sen2rts_spark.queries_docs import (ANN_LSH_BITS, _ANN_BUCKET_SQL,  # noqa: E402
                                        _LLOYD_SQL)


def recall(con, sf_dir: str, k: int) -> dict:
    con.execute(f"CREATE OR REPLACE VIEW embeddings AS "
                f"SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')")
    return _ivf_suite(con, k)


def _ivf_suite(con, k: int) -> dict:
    """All probe strategies over whatever relation the ``embeddings`` view
    points at — the SAME SQL the gated Spark queries are hash-proven
    equivalent to, including the 2-iteration Lloyd refinement
    (ann_ivf_lloyd_topk)."""
    probes_hd1 = f"SELECT UNNEST(generate_series(-1, {ANN_LSH_BITS - 1})) AS j"
    base = f"""
WITH bk AS (
  SELECT vec_id, embedding, {_ANN_BUCKET_SQL} AS bucket
  FROM embeddings),
exact AS (
  SELECT q.vec_id AS qid, e.vec_id,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
           list_dot_product(q.embedding, e.embedding)
           / (sqrt(list_dot_product(q.embedding, q.embedding))
              * sqrt(list_dot_product(e.embedding, e.embedding))) DESC,
           e.vec_id) AS rk
  FROM bk q JOIN bk e ON e.vec_id <> q.vec_id),
truth AS (SELECT qid, vec_id FROM exact WHERE rk <= {k}),
single AS (
  SELECT q.vec_id AS qid, e.vec_id
  FROM bk q JOIN bk e ON e.bucket = q.bucket AND e.vec_id <> q.vec_id),
multi AS (
  SELECT q.vec_id AS qid, e.vec_id
  FROM bk q, ({probes_hd1}) j
  JOIN bk e ON e.bucket = CASE WHEN j.j = -1 THEN q.bucket
                               ELSE xor(q.bucket, 1 << j.j) END
           AND e.vec_id <> q.vec_id),
c AS (SELECT vec_id AS cell, embedding AS ce FROM bk WHERE vec_id < 16),
asgn AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             list_dot_product(c.ce, e.embedding)
             / (sqrt(list_dot_product(c.ce, c.ce))
                * sqrt(list_dot_product(e.embedding, e.embedding))) DESC,
             c.cell) AS rk
    FROM bk e, c) WHERE rk = 1),
qcell AS (
  SELECT qid, cell, rk FROM (
    SELECT q.vec_id AS qid, c.cell,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
             list_dot_product(q.embedding, c.ce)
             / (sqrt(list_dot_product(q.embedding, q.embedding))
                * sqrt(list_dot_product(c.ce, c.ce))) DESC,
             c.cell) AS rk
    FROM bk q, c)),
ivf1 AS (SELECT p.qid, a.vec_id FROM qcell p JOIN asgn a
         ON a.cell = p.cell AND a.vec_id <> p.qid WHERE p.rk <= 1),
ivf2 AS (SELECT p.qid, a.vec_id FROM qcell p JOIN asgn a
         ON a.cell = p.cell AND a.vec_id <> p.qid WHERE p.rk <= 2),
ivf4 AS (SELECT p.qid, a.vec_id FROM qcell p JOIN asgn a
         ON a.cell = p.cell AND a.vec_id <> p.qid WHERE p.rk <= 4),
ivf8 AS (SELECT p.qid, a.vec_id FROM qcell p JOIN asgn a
         ON a.cell = p.cell AND a.vec_id <> p.qid WHERE p.rk <= 8),
c0 AS (SELECT cell, ce FROM c),""" + _LLOYD_SQL("c0", "cl1") + "," \
        + _LLOYD_SQL("cl1", "cl2") + """,
asgn_l AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             list_dot_product(c.ce, e.embedding)
             / (sqrt(list_dot_product(c.ce, c.ce))
                * sqrt(list_dot_product(e.embedding, e.embedding))) DESC,
             c.cell) AS rk
    FROM bk e, cl2 c) WHERE rk = 1),
qcell_l AS (
  SELECT qid, cell, rk FROM (
    SELECT q.vec_id AS qid, c.cell,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
             list_dot_product(q.embedding, c.ce)
             / (sqrt(list_dot_product(q.embedding, q.embedding))
                * sqrt(list_dot_product(c.ce, c.ce))) DESC,
             c.cell) AS rk
    FROM bk q, cl2 c)),
ivfl1 AS (SELECT p.qid, a.vec_id FROM qcell_l p JOIN asgn_l a
          ON a.cell = p.cell AND a.vec_id <> p.qid WHERE p.rk <= 1),
ivfl2 AS (SELECT p.qid, a.vec_id FROM qcell_l p JOIN asgn_l a
          ON a.cell = p.cell AND a.vec_id <> p.qid WHERE p.rk <= 2),
ivfl4 AS (SELECT p.qid, a.vec_id FROM qcell_l p JOIN asgn_l a
          ON a.cell = p.cell AND a.vec_id <> p.qid WHERE p.rk <= 4),
ivfl8 AS (SELECT p.qid, a.vec_id FROM qcell_l p JOIN asgn_l a
          ON a.cell = p.cell AND a.vec_id <> p.qid WHERE p.rk <= 8)
"""
    out = {}
    for name, cand in (("single_bucket", "single"), ("multiprobe_hd1", "multi"),
                       ("ivf_nprobe1", "ivf1"), ("ivf_nprobe2", "ivf2"),
                       ("ivf_nprobe4", "ivf4"), ("ivf_nprobe8", "ivf8"),
                       ("ivf_lloyd_nprobe1", "ivfl1"),
                       ("ivf_lloyd_nprobe2", "ivfl2"),
                       ("ivf_lloyd_nprobe4", "ivfl4"),
                       ("ivf_lloyd_nprobe8", "ivfl8")):
        row = con.execute(base + f"""
SELECT AVG(hits / {k}.0) AS recall,
       AVG(n_cand) AS mean_candidates
FROM (
  SELECT t.qid,
         COUNT(c.vec_id) AS hits,
         ANY_VALUE(nc.n) AS n_cand
  FROM truth t
  LEFT JOIN {cand} c ON c.qid = t.qid AND c.vec_id = t.vec_id
  JOIN (SELECT qid, COUNT(*) AS n FROM {cand} GROUP BY qid) nc
    ON nc.qid = t.qid
  GROUP BY t.qid)
""").fetchone()
        out[name] = {"recall_at_k": round(row[0], 4),
                     "mean_candidates": round(row[1], 1)}
    out["n_vectors"] = con.execute(
        "SELECT COUNT(*) FROM embeddings").fetchone()[0]
    out["k"] = k
    out["bits"] = ANN_LSH_BITS
    return out


def clustered_recall(k: int) -> dict:
    """The same suite over a corpus with GENUINE cluster structure — a
    deterministic 16-component Gaussian mixture (seed 42, 512 vectors,
    d=64, sigma=0.35). The fixture embeddings are isotropic noise
    (within-label cosine 0.0016), which information-theoretically caps ANY
    coarse quantizer's top-k recall near the scanned fraction; this section
    shows the SAME Lloyd pipeline reaching its design recall when the data
    has the structure IVF exploits."""
    import numpy as np
    import pandas as pd
    rng = np.random.default_rng(42)
    K, per, d = 16, 32, 64
    centers = rng.normal(0, 1, (K, d))
    X = np.repeat(centers, per, axis=0) + rng.normal(0, 0.35, (K * per, d))
    df = pd.DataFrame({"vec_id": np.arange(len(X)),
                       "embedding": [row.astype(np.float32).tolist()
                                     for row in X]})
    con = duckdb.connect()
    con.execute(f"SET threads={os.environ.get('ANN_RECALL_THREADS', '4')}")
    con.register("synth", df)
    con.execute("CREATE OR REPLACE VIEW embeddings AS "
                "SELECT vec_id, embedding FROM synth")
    out = _ivf_suite(con, k)
    out["corpus"] = "gaussian_mixture_16x32_d64_sigma0.35_seed42"
    return out


def planted_recall(con, sf_dir: str, sim_target: float = 0.95) -> dict:
    """Recall on planted near-duplicates — the dedup use-case.

    The fixture embeddings are random (near-orthogonal), so top-k cosine
    among them is noise and ANY hashing scheme has low top-k recall there;
    what dedup_embedding_near needs is recall on genuinely-similar pairs.
    Plant one perturbed copy per vector at cosine ~ sim_target and measure
    how often each probe strategy's candidate set contains the source."""
    import numpy as np
    base = con.execute(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    rng = np.random.default_rng(42)
    E = np.array([r[1] for r in base], dtype=np.float64)
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    # unit noise orthogonalized against e keeps the cosine exact in expectation
    noise = rng.normal(size=E.shape)
    noise -= (noise * E).sum(axis=1, keepdims=True) * E
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    alpha = float(np.sqrt(1 - sim_target ** 2))
    dup = sim_target * E + alpha * noise

    def bucket(M):
        bits = (M[:, 0:2 * ANN_LSH_BITS:2] - M[:, 1:2 * ANN_LSH_BITS:2]) >= 0
        return (bits.astype(np.int64) * (1 << np.arange(ANN_LSH_BITS))).sum(1)

    bsrc, bdup = bucket(E), bucket(dup)
    same = bsrc == bdup
    hd = np.array([bin(int(x)).count("1") for x in bsrc ^ bdup])

    # IVF: does the perturbed copy probe the cell its source is assigned to?
    C = E[:16]  # sampled centroids, same rule as ann_ivf_topk
    csim_src = E @ C.T / np.linalg.norm(C, axis=1)
    csim_dup = dup @ C.T / np.linalg.norm(C, axis=1)
    src_cell = csim_src.argmax(1)
    dup_rank = (-csim_dup).argsort(1)
    ivf = {f"ivf_nprobe{n}_recall":
           round(float((dup_rank[:, :n] == src_cell[:, None]).any(1).mean()), 4)
           for n in (1, 2, 4)}
    return {
        "sim_planted": sim_target,
        "single_bucket_recall": round(float(same.mean()), 4),
        "multiprobe_hd1_recall": round(float((hd <= 1).mean()), 4),
        "multiprobe_hd2_recall": round(float((hd <= 2).mean()), 4),
        **ivf,
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    con = duckdb.connect()
    # cap threads so this can run beside the scaling collector (500-vector
    # corpus; DuckDB would otherwise grab all 32 cores)
    con.execute(f"SET threads={os.environ.get('ANN_RECALL_THREADS', '4')}")
    res = {"sf_dir": sf_dir, **recall(con, sf_dir, k),
           "clustered_corpus": clustered_recall(k),
           "planted_near_dup": {
               f"sim_{s}": planted_recall(con, sf_dir, s)
               for s in (0.9, 0.95, 0.99)}}
    path = os.path.join(REPO, "BENCH", "ANN_RECALL.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
