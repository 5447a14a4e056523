"""Training-data pipeline queries: dedup, similarity search, text analysis,
multimodal plumbing — over the ``documents`` and ``embeddings`` tables.

Hash-based ops use md5() (identical hex output in Spark and DuckDB) so the
oracles compare exactly; engine-specific hashes (murmur3) are avoided in
oracled queries. SimHash reassembles md5-derived 32-bit words with
conditional sums, so even the bit-majority fold is oracled.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Window

from .queries import load, register, spread as _spread


# --------------------------------------------------------------------------
# Deduplication
# --------------------------------------------------------------------------

@register("dedup_exact", """
SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM documents GROUP BY md5(text) HAVING COUNT(*) > 1
""")
def q_dedup_exact(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return (d.groupBy(F.md5("text").alias("h"))
            .agg(F.min("doc_id").alias("keep_id"),
                 F.count(F.lit(1)).alias("n_copies"))
            .filter(F.col("n_copies") > 1))


_SHINGLES_SQL = """
  SELECT doc_id,
         list_distinct([lower(w3[i]) || ' ' || lower(w3[i+1]) || ' ' || lower(w3[i+2])
                        for i in range(1, len(w3) - 1)]) AS sh
  FROM (SELECT doc_id, string_split(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g'), ' ') AS w0,
               list_filter(string_split(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g'), ' '),
                           w -> w <> '') AS w3
        FROM documents)
  WHERE len(w3) >= 3
"""

# MinHash-LSH parameters. n_permutations = N_BANDS * ROWS_PER_BAND salted
# md5 permutations; both the Spark plans and the DuckDB oracles are generated
# from these, so the signature width is a config change, not a rewrite.
# 8 bands x 4 rows (32 permutations) is a realistic near-dup setting
# (collision prob ~= 1-(1-s^4)^8: 0.986 at s=0.8, 0.07 at s=0.3); the gate
# runs it as-is at sf0.01.
N_BANDS = 8
ROWS_PER_BAND = 4
N_PERMS = N_BANDS * ROWS_PER_BAND

# Kirsch-Mitzenmacher permutation family: ONE md5 per shingle, split into
# two 28-bit halves (h1, h2), perm_i = (h1 + i*h2) mod 2^31-1. Equivalent
# LSH guarantees to independent hashes (Kirsch & Mitzenmacher 2006), 32x
# fewer digest computations than the round-2 salted-md5-per-perm scheme
# (the signature stage was 32 md5 calls per shingle row). All arithmetic
# stays below 2^34, safe in BIGINT for both engines (DuckDB errors on
# int64 overflow rather than wrapping, so the bound matters).
_KM_MOD = 2147483647
_HP_SQL = """
  SELECT doc_id,
         CAST('0x' || substr(md5(s), 1, 7) AS BIGINT) AS h1,
         CAST('0x' || substr(md5(s), 8, 7) AS BIGINT) AS h2
  FROM (SELECT doc_id, UNNEST(sh) AS s FROM shingles)
"""
_SIG_MINS_SQL = ", ".join(
    f"MIN((h1 + {i} * h2) % {_KM_MOD}) AS h{i}"
    for i in range(1, N_PERMS + 1))
_BANDS_SQL = "\n  UNION ALL\n".join(
    "  SELECT doc_id, " + " || '_' || ".join(
        f"h{b * ROWS_PER_BAND + r + 1}" for r in range(ROWS_PER_BAND))
    + f" AS band FROM sig"
    for b in range(N_BANDS))
_CAND_SQL = f"""
hp AS ({_HP_SQL}),
sig AS (
  SELECT doc_id, {_SIG_MINS_SQL}
  FROM hp GROUP BY doc_id),
bands AS (
{_BANDS_SQL}),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
"""


def _band_rows(sig):
    """signature df → (doc_id, band) rows, one per band, single pass."""
    bands = [
        F.concat_ws("_", *[F.col(f"h{b * ROWS_PER_BAND + r + 1}")
                           for r in range(ROWS_PER_BAND)])
        for b in range(N_BANDS)
    ]
    return sig.select("doc_id", F.explode(F.array(*bands)).alias("band"))


def _lsh_candidate_pairs(sig, hot_bucket_cap=None, band_rows=None):
    """Candidate pairs sharing >=1 LSH band, computed in ONE pass over the
    signature: groupBy(band) + in-bucket pair expansion. The former
    band-self-join evaluated the (expensive) signature subtree once per join
    side; this plan shuffles the band rows once and never recomputes.

    Pair expansion is quadratic in bucket size — by definition of LSH
    candidates. ``hot_bucket_cap=K`` bounds that: buckets with <= K members
    expand exhaustively; hotter buckets emit STAR pairs only (the smallest
    doc_id as representative, paired with every other member) — linear in
    bucket size, so no stage is quadratic in the largest bucket. Downstream
    exact-verify then clusters via the representative (union-find semantics:
    members of one bucket are mutually candidate through the hub). Default
    None = exhaustive, matching the DuckDB oracle's pair semantics exactly.
    """
    g = (_band_rows(sig) if band_rows is None else band_rows).groupBy("band").agg(
        F.sort_array(F.collect_set("doc_id")).alias("ds")) \
        .filter(F.size("ds") > 1)
    all_pairs = F.expr(
        "flatten(transform(ds, (a, i) -> "
        "transform(slice(ds, i + 2, size(ds) - i - 1), "
        "b -> struct(a AS doc_a, b AS doc_b))))")
    if hot_bucket_cap is not None:
        star = F.expr(
            "transform(slice(ds, 2, size(ds) - 1), "
            "b -> struct(ds[0] AS doc_a, b AS doc_b))")
        pairs = F.when(F.size("ds") <= F.lit(int(hot_bucket_cap)), all_pairs) \
            .otherwise(star)
    else:
        pairs = all_pairs
    return g.select(F.explode(pairs).alias("p")) \
        .select("p.doc_a", "p.doc_b").distinct()


# The oracle's tokenization, replicated in Python: replace every char
# outside [a-zA-Z0-9 ] with a space on the ORIGINAL-case text, split on
# single spaces, drop empties. The character class is pure ASCII, so the
# substitution is semantically identical in Java regex (the former Catalyst
# regexp_replace), Python re, and DuckDB's RE2 for ANY input; every kept
# char is ASCII alphanumeric, so the per-word lower() the kernels apply is
# locale-free and byte-identical to Spark's/DuckDB's lower().
_WS_CLEAN = None  # compiled lazily inside workers (re is cheap, import once)


def _py_tokens(text):
    import re
    global _WS_CLEAN
    if _WS_CLEAN is None:
        _WS_CLEAN = re.compile(r"[^a-zA-Z0-9 ]")
    return [w for w in _WS_CLEAN.sub(" ", text).split(" ") if w]


def _gram_kernel(n, cols):
    """mapInPandas kernel: (cols..., text) rows -> (cols..., s) rows, one
    per DISTINCT lowercase n-word gram. Tokenization AND gram assembly run
    batched in the worker (guide §4.2) because every Catalyst formulation
    measured far slower at sf1.0: lead() windows cost a doc_id exchange +
    sort + a distinct exchange over all gram rows (3.4 s); per-row
    transform(slice(), array_join()) is interpreted per gram (4.6 s for
    the 5-gram corpus); and a Catalyst-side tokenize projection gets
    pushed BELOW the spread exchange by the optimizer, serializing the
    regex onto the single scan task (measured 2.4 s wall regardless of
    parallelism). In-kernel tokenization rides the spread: raw text
    shuffles once (MBs), then every stage is engine-wide."""
    def _fn(batches):
        for pdf in batches:
            reps, grams = [], []
            key_vals = [pdf[c] for c in cols]
            for vals in zip(*key_vals, pdf["text"]):
                text = vals[-1]
                if text is None:
                    continue
                toks = [w.lower() for w in _py_tokens(text)]
                if len(toks) < n:
                    continue
                gs = {" ".join(toks[i:i + n])
                      for i in range(len(toks) - n + 1)}
                reps.append((vals[:-1], len(gs)))
                grams.extend(gs)
            out = {}
            for ci, c in enumerate(cols):
                out[c] = np.repeat(
                    np.asarray([r[0][ci] for r in reps], dtype=object),
                    [r[1] for r in reps])
            out["s"] = grams
            yield pd.DataFrame(out)
    return _fn


def _shingle_rows(spark, sf_dir):
    """(doc_id, source, s) — distinct 3-word shingles, one row each,
    assembled in the batched gram kernel over the Catalyst tokenizer (see
    _gram_kernel; replaces the lead()-window + distinct plan, whose two
    all-gram-rows exchanges dominated the MinHash family at sf1.0)."""
    src = _spread(load(spark, sf_dir, "documents"), "doc_id") \
        .select("doc_id", "source", "text")
    return src.mapInPandas(_gram_kernel(3, ("doc_id", "source")),
                           "doc_id long, source string, s string")


def _minhash_sig_kernel(batches):
    """Fused shingle -> md5 -> Kirsch-Mitzenmacher mins, one doc per output
    row. Python's hashlib.md5 hexdigest is byte-identical to Spark's md5()
    (same algorithm, lowercase hex over the UTF-8 bytes), int(hex, 16)
    matches conv(hex, 16, 10), and the per-permutation arithmetic
    (h1 + i*h2) % 2^31-1 stays exact in int64 (< 2^34), so every signature
    value is bit-identical to the former explode + groupBy-min plan while
    the 2.6 M gram rows never leave the worker: the signature query needs
    NO shuffle at all (grams of one doc live in one row)."""
    import hashlib
    K = np.arange(1, N_PERMS + 1, dtype=np.int64)
    for pdf in batches:
        ids, counts, h1s, h2s = [], [], [], []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            if text is None:
                continue
            toks = [w.lower() for w in _py_tokens(text)]
            if len(toks) < 3:
                continue
            gs = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
            for g in gs:
                hx = hashlib.md5(g.encode()).hexdigest()
                h1s.append(int(hx[:7], 16))
                h2s.append(int(hx[7:14], 16))
            ids.append(doc_id)
            counts.append(len(gs))
        if not ids:
            continue
        H1 = np.asarray(h1s, dtype=np.int64)
        H2 = np.asarray(h2s, dtype=np.int64)
        P = (H1[:, None] + K[None, :] * H2[:, None]) % _KM_MOD
        offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
        mins = np.minimum.reduceat(P, offs, axis=0)
        out = {"doc_id": np.asarray(ids, dtype=np.int64)}
        for i in range(N_PERMS):
            out[f"h{i + 1}"] = mins[:, i]
        yield pd.DataFrame(out)


@register("minhash_signature", f"""
WITH shingles AS ({_SHINGLES_SQL}),
hp AS ({_HP_SQL})
SELECT doc_id, {_SIG_MINS_SQL}
FROM hp GROUP BY doc_id
""")
def q_minhash_signature(spark, sf_dir):
    """MinHash over 3-word shingles, Kirsch-Mitzenmacher permutations:
    one md5 per shingle split into 28-bit (h1, h2), perm_i = (h1 + i·h2)
    mod 2^31-1 — 32 integer mins per doc instead of 32 digests per
    shingle. Fused into one Arrow-batched kernel (r9): tokenization, gram
    assembly, md5 and the 32 mins all in the worker — the former plan
    exploded 2.6 M gram rows through a distinct and a groupBy-min
    exchange (3.6 s at sf1.0); the fused kernel keeps each doc's grams in
    its row, zero exchanges past the input spread."""
    src = _spread(load(spark, sf_dir, "documents"), "doc_id").select("doc_id", "text")
    schema = "doc_id long, " + ", ".join(
        f"h{i} long" for i in range(1, N_PERMS + 1))
    return src.mapInPandas(_minhash_sig_kernel, schema)


@register("minhash_lsh_candidates", f"""
WITH shingles AS ({_SHINGLES_SQL}),
{_CAND_SQL}
SELECT doc_a, doc_b FROM cand
""")
def q_minhash_lsh_candidates(spark, sf_dir):
    """LSH banding: N_BANDS bands × ROWS_PER_BAND rows; candidate pairs share
    a band bucket. The band hash is the shuffle key — one shuffle, in-bucket
    pair expansion, no recomputation of the signature subtree."""
    return _lsh_candidate_pairs(q_minhash_signature(spark, sf_dir))


_HOT_CAP = 8

@register("minhash_lsh_capped", f"""
WITH shingles AS ({_SHINGLES_SQL}),
{_CAND_SQL.split('cand AS')[0]}
bands2 AS (
  SELECT doc_id, band FROM bands
  UNION ALL
  SELECT doc_id, 'PLANTED_HOT' AS band FROM documents WHERE doc_id % 7 = 3),
bl AS (
  SELECT band, list_sort(list(DISTINCT doc_id)) AS ds
  FROM bands2 GROUP BY band HAVING COUNT(DISTINCT doc_id) > 1),
mem AS (
  SELECT band, UNNEST(ds) AS doc_id, len(ds) AS n, ds[1] AS hub FROM bl)
SELECT DISTINCT doc_a, doc_b FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM mem a JOIN mem b ON a.band = b.band AND a.doc_id < b.doc_id
  WHERE a.n <= {_HOT_CAP}
  UNION ALL
  SELECT hub AS doc_a, doc_id AS doc_b FROM mem
  WHERE n > {_HOT_CAP} AND doc_id <> hub)
""")
def q_minhash_lsh_capped(spark, sf_dir):
    """The PRODUCTION-shaped LSH plan: hot-bucket star-pair cap ON, gated
    against a planted hot bucket (round-3 VERDICT missing #5).

    Every ``doc_id % 7 == 3`` document (~14% of the corpus — far above the
    cap) is injected into one synthetic band bucket; real buckets flow
    through unchanged. With ``hot_bucket_cap=8``, buckets of <= 8 members
    expand exhaustively and hotter ones emit only (min-doc hub, member)
    star pairs — the DuckDB oracle mirrors exactly that rule, so the gate
    hash-verifies the capped emission itself, not just the exhaustive path
    (which tests/test_lsh_hot_bucket.py covers at the unit level).
    """
    sig = q_minhash_signature(spark, sf_dir)
    planted = load(spark, sf_dir, "documents") \
        .filter(F.col("doc_id") % 7 == 3) \
        .select("doc_id", F.lit("PLANTED_HOT").alias("band"))
    rows = _band_rows(sig).unionByName(planted)
    return _lsh_candidate_pairs(sig, hot_bucket_cap=_HOT_CAP, band_rows=rows)


# connected-components rounds for dedup_cluster: each round does one
# neighbor-min propagation (+1 hop) AND one pointer jump (label <- label
# of label, ~doubling the covered radius), so labels converge for any
# component of diameter <= ~2**_CC_ITERS. LSH near-dup components are
# hub-and-chain shaped with tiny diameters; 6 rounds covers ~64 hops.
_CC_ITERS = 6


@register("dedup_cluster", f"""
WITH RECURSIVE shingles AS ({_SHINGLES_SQL}),
{_CAND_SQL},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM cand),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node)
SELECT node AS doc_id, MIN(lbl) AS cluster_rep,
       node = MIN(lbl) AS is_survivor
FROM reach GROUP BY node
""")
def q_dedup_cluster(spark, sf_dir):
    """Duplicate-cluster assignment: connected components over the MinHash-
    LSH candidate graph, then keep the min-doc_id representative per
    component (the survivor a dedup pipeline retains).

    The Spark plan is the alternating min-label-propagation + pointer-
    jumping family of distributed CC (Kiveris et al., "Connected Components
    in MapReduce and Beyond" — public algorithm): per round, (1) every node
    takes the min label over its neighbors (edges join + groupBy-min — one
    shuffle keyed on dst), (2) every node re-reads the label OF its label
    (self-join on the label table), which roughly doubles the radius a
    label has travelled, giving convergence in O(log diameter) rounds with
    a FIXED _CC_ITERS = {_CC_ITERS} (diameter <= ~2**{_CC_ITERS}; LSH
    components are hub-shaped and far shallower). No driver-side
    convergence loop — the round count is static. Each round references
    the label table 4x, so lineage is truncated every 2nd round with a
    LAZY localCheckpoint (no job at plan-construction; without it the
    plan holds 4**iters copies of the LSH subtree — see
    operators/graph.py for the 4**cadence bound).
    At 100 TB each round is 2 bounded shuffles of |V| + |E| rows;
    singleton docs stay their own cluster. The oracle recomputes
    components exactly via a recursive CTE (bidirected reachability, min
    label per node).
    """
    from sen2rts_spark.operators.graph import connected_components
    pairs = q_minhash_lsh_candidates(spark, sf_dir)
    edges = pairs.select(F.col("doc_a").alias("src"),
                         F.col("doc_b").alias("dst"))
    verts = load(spark, sf_dir, "documents").select("doc_id")
    return connected_components(verts, edges, iters=_CC_ITERS)


# the exact quality expression gated by quality_score, shared so the
# survivor ranking below stays value-identical to that row's oracle
_QUALITY_SQL = """ROUND(LEAST(length(text) / 500.0, 1.0) * 0.5
           + (1.0 - LEAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
                          * 1.0 / NULLIF(length(text), 0), 1.0)) * 0.3
           + LEAST((length(text) - length(replace(lower(text), ' the ', 'xxxxx')))
                   / 5.0 / 10.0, 1.0) * 0.2, 6)"""


@register("dedup_survivors", f"""
WITH RECURSIVE shingles AS ({_SHINGLES_SQL}),
{_CAND_SQL},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM cand),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
clusters AS (
  SELECT node AS doc_id, MIN(lbl) AS cluster_rep FROM reach GROUP BY node),
scored AS (
  SELECT c.cluster_rep, c.doc_id, {_QUALITY_SQL} AS quality
  FROM clusters c JOIN documents d ON d.doc_id = c.doc_id),
ranked AS (
  SELECT cluster_rep, doc_id, quality,
         ROW_NUMBER() OVER (PARTITION BY cluster_rep
                            ORDER BY quality DESC, doc_id) AS rk,
         COUNT(*) OVER (PARTITION BY cluster_rep) AS n_members
  FROM scored)
SELECT cluster_rep, doc_id AS survivor_id, quality AS best_quality,
       n_members
FROM ranked WHERE rk = 1 AND n_members >= 2
""")
def q_dedup_survivors(spark, sf_dir):
    """Retention end of the dedup pipeline: per duplicate CLUSTER, keep the
    highest-quality member (quality_score's exact expression; ties broken
    by lowest doc_id). pairs → clusters (`dedup_cluster`) → survivors is
    the full near-dedup decision a training-data pipeline applies; the
    min-id `is_survivor` column on dedup_cluster is the id-stable variant,
    this row is the quality-ranked one.

    Plan: the CC label table joins quality (both keyed on doc_id — one
    shuffle), then ONE groupBy(cluster_rep) computes n_members and the
    argmax member via max_by over a (quality, -doc_id) struct — an
    all-partial-aggregatable single shuffle, no window sort. Only
    clusters with >= 2 members survive to the output (singletons are
    trivially retained). At 100 TB both shuffles move |V| rows of three
    scalar columns; the LSH candidate subtree is shared with
    dedup_cluster and lineage-truncated once (lazy localCheckpoint).
    """
    cc = q_dedup_cluster(spark, sf_dir).select("doc_id", "cluster_rep")
    qual = q_quality_score(spark, sf_dir)
    per = cc.join(qual, "doc_id").groupBy("cluster_rep").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max_by(
            F.struct(F.col("doc_id").alias("survivor_id"),
                     F.col("quality").alias("best_quality")),
            F.struct(F.col("quality"), (-F.col("doc_id")).alias("nid"))
        ).alias("best"))
    return per.filter(F.col("n_members") >= 2).select(
        "cluster_rep", F.col("best.survivor_id").alias("survivor_id"),
        F.col("best.best_quality").alias("best_quality"), "n_members")


@register("ngram_jaccard_pairs", f"""
WITH shingles AS ({_SHINGLES_SQL}),
{_CAND_SQL}
SELECT c.doc_a, c.doc_b,
       ROUND(len(list_intersect(a.sh, b.sh)) * 1.0
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6)
       AS jaccard
FROM cand c
JOIN shingles a ON a.doc_id = c.doc_a
JOIN shingles b ON b.doc_id = c.doc_b
WHERE len(list_intersect(a.sh, b.sh)) * 1.0
      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.2
""")
def q_ngram_jaccard_pairs(spark, sf_dir):
    """Exact n-gram Jaccard, restricted to MinHash-LSH candidate pairs.

    Round 1 blocked on the ``source`` column, which is quadratic in the
    largest block (a hot source — Common Crawl has few — explodes). The LSH
    candidate set bounds the pair count by actual signature collisions
    instead of block sizes; the exact intersect then verifies each candidate.
    Candidate-filtered semantics are mirrored in the oracle.
    """
    sets = _shingle_rows(spark, sf_dir) \
        .groupBy("doc_id").agg(F.collect_set("s").alias("sh"))
    cand = _lsh_candidate_pairs(q_minhash_signature(spark, sf_dir))
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sha"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("shb"))
    j = cand.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect("sha", "shb"))
    uni = F.size("sha") + F.size("shb") - inter
    jac = inter / uni
    return j.select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard")) \
        .filter(jac >= 0.2)


@register("simhash_64", """
WITH toks AS (
  SELECT doc_id,
         UNNEST(list_filter(string_split_regex(lower(text), '\\s+'),
                            w -> w <> '')) AS w
  FROM documents),
h AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) AS h_hi,
         CAST('0x' || substr(md5(w), 9, 8) AS BIGINT) AS h_lo
  FROM toks),
v AS (
  SELECT doc_id, COUNT(*) AS n,
""" + ",\n".join(
    f"         SUM((h_hi >> {k}) & 1) AS vh{k}, SUM((h_lo >> {k}) & 1) AS vl{k}"
    for k in range(32)) + """
  FROM h GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(""" + " + ".join(
    f"(CASE WHEN v.vh{k} * 2 >= v.n THEN {1 << k} ELSE 0 END)"
    for k in range(32)) + """, 0) AS sim_hi,
       COALESCE(""" + " + ".join(
    f"(CASE WHEN v.vl{k} * 2 >= v.n THEN {1 << k} ELSE 0 END)"
    for k in range(32)) + """, 0) AS sim_lo
FROM documents d LEFT JOIN v ON d.doc_id = v.doc_id
""")
def q_simhash_64(spark, sf_dir):
    """64-bit SimHash per document: bit-majority over md5-derived 2x32-bit
    token hashes, entirely in Catalyst (explode → 64 conditional SUMs →
    bit reassembly). No Python in the plan; md5 makes the hash portable to
    the DuckDB oracle (emitted as two 32-bit words to avoid signed-64
    overflow differences between engines). Replaces the round-1 per-document
    Python loop with per-token hashlib.md5 calls."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"),
                    lambda w: w != "")
    ex = d.select("doc_id", F.explode(toks).alias("w"))
    md5w = F.md5("w")
    h = ex.select(
        "doc_id",
        F.conv(F.substring(md5w, 1, 8), 16, 10).cast("long").alias("h_hi"),
        F.conv(F.substring(md5w, 9, 8), 16, 10).cast("long").alias("h_lo"))
    aggs = [F.count(F.lit(1)).alias("n")]
    for k in range(32):
        aggs.append(F.sum(F.shiftright("h_hi", k).bitwiseAND(F.lit(1)))
                    .alias(f"vh{k}"))
        aggs.append(F.sum(F.shiftright("h_lo", k).bitwiseAND(F.lit(1)))
                    .alias(f"vl{k}"))
    v = h.groupBy("doc_id").agg(*aggs)

    def _word(prefix):
        out = F.lit(0).cast("long")
        for k in range(32):
            out = out + F.when(F.col(f"{prefix}{k}") * 2 >= F.col("n"),
                               F.lit(1 << k)).otherwise(F.lit(0))
        return out

    return (d.select("doc_id").join(v, "doc_id", "left")
            .select("doc_id",
                    F.coalesce(_word("vh"), F.lit(0)).cast("long").alias("sim_hi"),
                    F.coalesce(_word("vl"), F.lit(0)).cast("long").alias("sim_lo")))


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------

@register("token_count", """
SELECT doc_id,
       len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens,
       length(text) AS n_chars_m
FROM documents
""")
def q_token_count(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda w: w != "")
    return d.select("doc_id", F.size(toks).alias("n_tokens"),
                    F.length("text").alias("n_chars_m"))


@register("quality_score", """
SELECT doc_id,
       ROUND(LEAST(length(text) / 500.0, 1.0) * 0.5
           + (1.0 - LEAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
                          * 1.0 / NULLIF(length(text), 0), 1.0)) * 0.3
           + LEAST((length(text) - length(replace(lower(text), ' the ', 'xxxxx')))
                   / 5.0 / 10.0, 1.0) * 0.2, 6) AS quality
FROM documents
""")
def q_quality_score(spark, sf_dir):
    """Quality scoring: length + punctuation-ratio + stopword-density mix."""
    d = load(spark, sf_dir, "documents")
    length = F.length("text")
    punct = F.length(F.regexp_replace("text", r"[a-zA-Z0-9 ]", ""))
    the_cnt = (length - F.length(F.replace(F.lower(F.col("text")),
                                           F.lit(" the "), F.lit("xxxxx")))) / 5.0
    score = (F.least(length / 500.0, F.lit(1.0)) * 0.5
             + (1.0 - F.least(punct / F.nullif(length.cast("double"), F.lit(0.0)),
                              F.lit(1.0))) * 0.3
             + F.least(the_cnt / 10.0, F.lit(1.0)) * 0.2)
    return d.select("doc_id", F.round(score, 6).alias("quality"))


@register("lang_id_heuristic", """
WITH scores AS (
  SELECT doc_id, lang,
         (length(lower(text)) - length(replace(lower(text), ' the ', ''))) / 5
       + (length(lower(text)) - length(replace(lower(text), ' and ', ''))) / 5 AS en_score,
         (length(lower(text)) - length(replace(lower(text), ' der ', ''))) / 5
       + (length(lower(text)) - length(replace(lower(text), ' und ', ''))) / 5 AS de_score,
         (length(lower(text)) - length(replace(lower(text), ' le ', ''))) / 4
       + (length(lower(text)) - length(replace(lower(text), ' et ', ''))) / 4 AS fr_score
  FROM documents)
SELECT doc_id, lang,
       CASE WHEN en_score >= de_score AND en_score >= fr_score AND en_score > 0 THEN 'en'
            WHEN de_score >= fr_score AND de_score > 0 THEN 'de'
            WHEN fr_score > 0 THEN 'fr'
            ELSE 'unknown' END AS lang_pred
FROM scores
""")
def q_lang_id_heuristic(spark, sf_dir):
    """Language-ID by stopword densities (n-gram heuristic)."""
    d = load(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))

    def cnt(pat):
        return (F.length(low) - F.length(F.replace(low, F.lit(pat), F.lit("")))) \
            / len(pat)

    en = cnt(" the ") + cnt(" and ")
    de = cnt(" der ") + cnt(" und ")
    fr = cnt(" le ") + cnt(" et ")
    pred = (F.when((en >= de) & (en >= fr) & (en > 0), "en")
            .when((de >= fr) & (de > 0), "de")
            .when(fr > 0, "fr")
            .otherwise("unknown"))
    return d.select("doc_id", "lang", pred.alias("lang_pred"))


@register("doc_fingerprint", """
SELECT doc_id,
       substr(md5(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 16) AS fp
FROM documents
""")
def q_doc_fingerprint(spark, sf_dir):
    """Document fingerprint: md5 of whitespace-normalized lowercase text."""
    d = load(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    return d.select("doc_id", F.substring(F.md5(norm), 1, 16).alias("fp"))


# --------------------------------------------------------------------------
# Similarity search over embeddings
# --------------------------------------------------------------------------

_DOT = ("aggregate(zip_with(qe, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
def _norm_sql(col: str) -> str:
    """L2-norm fold of an array column; a norm precomputed per ROW with
    this fold is bit-identical to the same fold run inside a pair.

    Why this stays a higher-order-function fold and not an unrolled
    64-term expression: an unrolled chain compiles into one WholeStage-
    Codegen method whose bytecode exceeds HotSpot's JIT limit, so the
    whole stage runs bytecode-INTERPRETED — measured 5x SLOWER than the
    interpreted HOF fold (2.6 s vs 0.53 s over 1.25 M rows at 32 cores).
    Where the fold count is per-PAIR rather than per-row, the hot queries
    route around Catalyst entirely via the numpy pair kernel below."""
    return (f"sqrt(aggregate({col}, CAST(0.0 AS DOUBLE), "
            "(acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))")


def _sim_pre():
    """Cosine over pre-joined norms: every ANN scoring stage folds each
    vector's norm once per ROW (nq_/ne_ columns) instead of re-folding both
    arrays inside every candidate pair — 3 O(dim) folds per pair -> 1."""
    return F.expr(_DOT) / (F.col("nq_") * F.col("ne_"))


# row-block budget (elements of the per-block sim matrix): 4M doubles
# = 32 MB per in-flight block, the worker-memory bound of a hot cell
_PAIR_BLOCK_ELEMS = 4_000_000


def _pairwise_cosine_block(ids, E, thr):
    """All (i < j) cosine pairs of one LSH cell with sim >= thr, batched in
    numpy with the SAME float64 operation order as the Catalyst fold it
    replaces, so every emitted sim is bit-identical to the former per-pair
    expression (and to the DuckDB oracle values):

    - elements are cast float32 -> float64 up front (= CAST(x AS DOUBLE));
    - dot and norm accumulate ONE dimension at a time, left to right, from
      0.0 (``P += outer(c_k, c_k)`` / ``s += c_k * c_k`` — exactly the
      ``(acc, v) -> acc + v`` fold order);
    - sim = dot / (norm_a * norm_b), the same two-operand order;
    - the threshold keeps NaN (Spark and DuckDB both order NaN above every
      number, so ``sim >= thr`` is true for a NaN sim).

    Guide §4.2: the quadratic pair expansion is exactly the "hand whole
    batches to vectorized native code" case — the former plan evaluated an
    interpreted O(dim) fold per candidate pair (~11 us/pair; 14.9 s for the
    1.25 M sf1.0 near-dup pairs), and an unrolled Catalyst chain is worse
    (the WholeStageCodegen method outgrows HotSpot's JIT limit and runs
    bytecode-interpreted — measured 5x slower than the fold). Row blocks
    bound memory to O(block x m), so a hot cell cannot OOM a worker.

    ids must be sorted ascending so i < j implies va < vb.
    Returns (va, vb, sim) numpy arrays.
    """
    m = E.shape[0]
    s = np.zeros(m)
    for k in range(E.shape[1]):
        c = E[:, k]
        s += c * c
    nrm = np.sqrt(s)
    blk = max(1, _PAIR_BLOCK_ELEMS // max(m, 1))
    out_a, out_b, out_s = [], [], []
    for i0 in range(0, m - 1, blk):
        i1 = min(i0 + blk, m)
        P = np.zeros((i1 - i0, m))
        for k in range(E.shape[1]):
            c = E[:, k]
            P += np.multiply.outer(c[i0:i1], c)
        with np.errstate(invalid="ignore", divide="ignore"):
            # zero-norm vectors yield inf/NaN sims, exactly like the
            # former Catalyst division — the threshold handles them
            S = P / np.multiply.outer(nrm[i0:i1], nrm)
        # upper-triangle (global i < j) pairs within this row block
        ii, jj = np.nonzero(
            np.arange(m)[None, :] > (i0 + np.arange(i1 - i0))[:, None])
        v = S[ii, jj]
        keep = (v >= thr) | np.isnan(v)
        out_a.append(ids[i0 + ii[keep]])
        out_b.append(ids[jj[keep]])
        out_s.append(v[keep])
    if not out_a:
        z = np.zeros(0)
        return z.astype(np.int64), z.astype(np.int64), z
    return (np.concatenate(out_a), np.concatenate(out_b),
            np.concatenate(out_s))


def _pair_sims_kernel(thr, extra_cols=()):
    """applyInPandas kernel over one LSH cell: emit (va, vb, sim[, group
    cols]) for every in-cell pair with sim >= thr (raw, un-rounded sims —
    the caller rounds in Catalyst exactly as before). Null embeddings are
    dropped up front: they can only produce null sims, which the former
    per-pair filter dropped too."""
    def _fn(pdf):
        pdf = pdf[pdf["embedding"].notna()]
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"va": np.zeros(0, np.int64),
                                 "vb": np.zeros(0, np.int64),
                                 "sim": np.zeros(0),
                                 **{c: pd.Series([], dtype=pdf[c].dtype)
                                    for c in extra_cols}})
        E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        va, vb, sim = _pairwise_cosine_block(ids, E, thr)
        out = {"va": va, "vb": vb, "sim": sim}
        for c in extra_cols:
            out[c] = np.full(len(va), pdf[c].iloc[0])
        return pd.DataFrame(out)
    return _fn


@register("ann_cosine_topk", """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 3),
sims AS (
  SELECT q.qid, e.vec_id,
         ROUND(list_dot_product(q.qe, e.embedding)
               / (sqrt(list_dot_product(q.qe, q.qe))
                  * sqrt(list_dot_product(e.embedding, e.embedding))), 4) AS sim
  FROM q JOIN embeddings e ON e.vec_id <> q.qid)
SELECT qid, vec_id, sim FROM (
  SELECT qid, vec_id, sim,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
  FROM sims) WHERE rk <= 5
""")
def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k (the exactness baseline for ANN).

    The query side is tiny → broadcast; the scan side streams. JVM-side
    higher-order functions do the fold — no Python in the hot path.
    """
    e = load(spark, sf_dir, "embeddings") \
        .withColumn("ne_", F.expr(_norm_sql("embedding")))
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"),
        F.col("ne_").alias("nq_"))
    # _spread: the scored side streams against the broadcast query set —
    # parallelize it past the one-row-group scan
    j = F.broadcast(q).join(_spread(e, "vec_id"), F.col("vec_id") != F.col("qid"))
    sim = F.round(_sim_pre(), 4)
    sims = j.select("qid", "vec_id", sim.alias("sim"))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), "vec_id")
    return sims.select("qid", "vec_id", "sim",
                       F.row_number().over(w).alias("rk")) \
        .filter(F.col("rk") <= 5).select("qid", "vec_id", "sim")


# ANN-LSH hyperplane family: bit i = sign of embedding[2i] - embedding[2i+1]
# (normal e_2i - e_2i+1 — deterministic, distinct from the sign-bucket family
# used by dedup_embedding_near, and exactly expressible in both engines).
# 8 bits = 256 buckets (needs dim >= 16; the fixture embeddings are 64-dim).
ANN_LSH_BITS = 8
ANN_SIM_THR = 0.3
_ANN_BUCKET_SQL = " + ".join(
    f"(CASE WHEN embedding[{2 * i + 1}] - embedding[{2 * i + 2}] >= 0 "
    f"THEN {1 << i} ELSE 0 END)"
    for i in range(ANN_LSH_BITS))


def ann_lsh_pairs(e, hot_bucket_cap=None):
    """(va, vb, bucket, ea, eb) candidate pairs within a hyperplane bucket.

    ``hot_bucket_cap=K``: buckets with more than K members contribute only
    star pairs — the bucket representative (min vec_id) joined against every
    other member — so pair count is linear, not quadratic, in hot-bucket
    size. Default None = exhaustive in-bucket pairs (the oracle semantics).
    """
    bucket = sum(
        (F.when(F.col("embedding")[2 * i] - F.col("embedding")[2 * i + 1] >= 0,
                F.lit(1 << i)).otherwise(F.lit(0))
         for i in range(ANN_LSH_BITS)), start=F.lit(0))
    withb = e.withColumn("bucket", bucket)
    left = withb
    if hot_bucket_cap is not None:
        w = Window.partitionBy("bucket")
        left = (withb
                .withColumn("_bn", F.count(F.lit(1)).over(w))
                .withColumn("_rep", F.min("vec_id").over(w))
                .filter((F.col("_bn") <= F.lit(int(hot_bucket_cap)))
                        | (F.col("vec_id") == F.col("_rep")))
                .drop("_bn", "_rep"))
    # carry the vector norm computed once per ROW: consumers that divide by
    # ||a||*||b|| would otherwise re-fold both arrays inside every pair
    nrm = F.expr(_norm_sql("embedding"))
    # _spread: the pair expansion happens on the STREAMED side of the
    # (planner-chosen) broadcast join — parallelize it past the one-row-group
    # scan; the build side stays as the planner sizes it
    a = _spread(left, "vec_id").select(
        F.col("vec_id").alias("va"), F.col("embedding").alias("ea"),
        "bucket", nrm.alias("na_"))
    b = withb.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"),
                     F.col("bucket").alias("bucket_b"), nrm.alias("nb_"))
    return a.join(b, (F.col("bucket") == F.col("bucket_b"))
                  & (F.col("va") < F.col("vb")))


@register("ann_lsh_bucketed", f"""
WITH bk AS (
  SELECT vec_id, embedding, {_ANN_BUCKET_SQL} AS bucket FROM embeddings),
pairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb, a.bucket,
         list_dot_product(a.embedding, b.embedding)
         / (sqrt(list_dot_product(a.embedding, a.embedding))
            * sqrt(list_dot_product(b.embedding, b.embedding))) AS sim
  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT va, vb, ROUND(sim, 4) AS sim, bucket
FROM pairs WHERE sim >= {ANN_SIM_THR}
""")
def q_ann_lsh_bucketed(spark, sf_dir):
    """Scale path for similarity search: hyperplane LSH — embeddings hashed
    into {2**ANN_LSH_BITS} sign buckets by coordinate-difference hyperplanes;
    neighbors searched within the bucket only (bucket = the shuffle key, no
    all-pairs join). The deterministic hyperplane family makes the whole
    path oracle-able; production would use seeded random normals + multiple
    tables, same plan shape. Hot-bucket star-pair capping available via
    ann_lsh_pairs(hot_bucket_cap=K); the gate runs exhaustive to match the
    oracle."""
    e = load(spark, sf_dir, "embeddings")
    bucket = sum(
        (F.when(F.col("embedding")[2 * i] - F.col("embedding")[2 * i + 1] >= 0,
                F.lit(1 << i)).otherwise(F.lit(0))
         for i in range(ANN_LSH_BITS)), start=F.lit(0))
    # In-bucket pair expansion + scoring via the numpy pair kernel (guide
    # §4.2): one shuffle keyed on the hyperplane bucket — the former join
    # key — then batched bit-identical cosines per cell (see
    # _pairwise_cosine_block; 782 k pairs at sf1.0 took 9.1 s through the
    # interpreted per-pair fold). ann_lsh_pairs remains the generic
    # (capped) pair generator for callers that need the join form.
    # _spread on the bucket key — one reused exchange, AQE-coalesce-proof
    # (see q_dedup_embedding_near)
    withb = _spread(e.select("vec_id", bucket.alias("bucket"), "embedding"),
                    "bucket")
    out = withb.groupBy("bucket") \
        .applyInPandas(_pair_sims_kernel(ANN_SIM_THR, extra_cols=("bucket",)),
                       "va long, vb long, sim double, bucket int")
    return out.select("va", "vb", F.round("sim", 4).alias("sim"), "bucket")


@register("ann_multiprobe", f"""
WITH bk AS (
  SELECT vec_id, embedding, {_ANN_BUCKET_SQL} AS bucket FROM embeddings),
q AS (SELECT vec_id AS qid, embedding AS qe, bucket AS qb
      FROM bk WHERE vec_id < 3),
probes AS (
  SELECT qid, qe, CASE WHEN j = -1 THEN qb ELSE xor(qb, 1 << j) END AS pb
  FROM q, (SELECT UNNEST(generate_series(-1, {ANN_LSH_BITS - 1})) AS j)),
sims AS (
  SELECT p.qid, e.vec_id,
         ROUND(list_dot_product(p.qe, e.embedding)
               / (sqrt(list_dot_product(p.qe, p.qe))
                  * sqrt(list_dot_product(e.embedding, e.embedding))), 4) AS sim
  FROM probes p JOIN bk e ON e.bucket = p.pb AND e.vec_id <> p.qid)
SELECT qid, vec_id, sim FROM (
  SELECT qid, vec_id, sim,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
  FROM sims) WHERE rk <= 5
""")
def q_ann_multiprobe(spark, sf_dir):
    """Multi-probe LSH top-k — the production recall path (VERDICT r4 task
    5): each query probes its own hyperplane bucket PLUS every bucket at
    Hamming distance 1 (ANN_LSH_BITS+1 = 9 probes), recovering neighbors that
    fell just across one hyperplane — the standard multi-probe trick (Lv et
    al., VLDB'07) that buys the recall of many hash tables for one table's
    storage. Probe buckets are distinct per query and each candidate lives
    in exactly one bucket, so no dedup stage is needed. The probe list is a
    tiny broadcast; the scan side shuffles on its bucket only — same
    scale-safe plan shape as ann_lsh_bucketed, ~(b+1)/2^b of the table
    scanned per query instead of 1/2^b. Recall vs the exact baseline
    (ann_cosine_topk, same queries) is recorded in BENCH/ANN_RECALL.json."""
    e = load(spark, sf_dir, "embeddings")
    bucket = sum(
        (F.when(F.col("embedding")[2 * i] - F.col("embedding")[2 * i + 1] >= 0,
                F.lit(1 << i)).otherwise(F.lit(0))
         for i in range(ANN_LSH_BITS)), start=F.lit(0))
    withb = e.withColumn("bucket", bucket) \
        .withColumn("ne_", F.expr(_norm_sql("embedding")))
    q = withb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"),
        F.col("bucket").alias("qb"), F.col("ne_").alias("nq_"))
    probe_cols = [F.col("qb")] + [F.col("qb").bitwiseXOR(F.lit(1 << j))
                                  for j in range(ANN_LSH_BITS)]
    probes = q.select("qid", "qe", "nq_",
                      F.explode(F.array(*probe_cols)).alias("pb"))
    j = F.broadcast(probes).join(
        withb, (F.col("bucket") == F.col("pb"))
        & (F.col("vec_id") != F.col("qid")))
    sim = F.round(_sim_pre(), 4)
    sims = j.select("qid", "vec_id", sim.alias("sim"))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), "vec_id")
    return sims.select("qid", "vec_id", "sim",
                       F.row_number().over(w).alias("rk")) \
        .filter(F.col("rk") <= 5).select("qid", "vec_id", "sim")


@register("ann_ivf_topk", """
WITH c AS (SELECT vec_id AS cell, embedding AS ce FROM embeddings WHERE vec_id < 16),
asim AS (
  SELECT e.vec_id, e.embedding, c.cell,
         ROUND(list_dot_product(c.ce, e.embedding)
               / (sqrt(list_dot_product(c.ce, c.ce))
                  * sqrt(list_dot_product(e.embedding, e.embedding))), 4) AS csim
  FROM embeddings e, c),
assign AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT vec_id, embedding, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY csim DESC, cell) AS rk
    FROM asim) WHERE rk = 1),
q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 3),
qprobe AS (
  SELECT qid, qe, cell FROM (
    SELECT q.qid, q.qe, c.cell,
           ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
             ROUND(list_dot_product(q.qe, c.ce)
                   / (sqrt(list_dot_product(q.qe, q.qe))
                      * sqrt(list_dot_product(c.ce, c.ce))), 4) DESC,
             c.cell) AS rk
    FROM q, c) WHERE rk <= 2),
sims AS (
  SELECT p.qid, a.vec_id,
         ROUND(list_dot_product(p.qe, a.embedding)
               / (sqrt(list_dot_product(p.qe, p.qe))
                  * sqrt(list_dot_product(a.embedding, a.embedding))), 4) AS sim
  FROM qprobe p JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.qid)
SELECT qid, vec_id, sim FROM (
  SELECT qid, vec_id, sim,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
  FROM sims) WHERE rk <= 5
""")
def q_ann_ivf_topk(spark, sf_dir):
    """IVF-flat ANN top-k — the second production scale path next to
    multi-probe LSH (the coarse-quantizer family: Jégou et al., TPAMI'11).

    Deterministic sampled centroids (the 16 lowest vec_ids — random-sample
    init without Lloyd iterations, so the whole index is SQL-reproducible
    and the gate is value-level; a k-means refinement would only move the
    centroids, not the plan). Plan shape at 100 TB: the centroid table is
    a broadcast both times it is used; cell assignment is a map-side
    broadcast nested loop (C cosines per row — the canonical IVF assign
    cost) folded by ``groupBy(vec_id).max_by`` with map-side partials (no
    window sort over the full table); the probe set (nprobe=2 cells per
    query) is a tiny broadcast, so the candidate join touches only the
    probed cells' rows — candidates bounded by nprobe × cell occupancy,
    never all-pairs. Ties in argmax/probe rank are broken by cell id on
    1e-4-rounded cosines, so both engines select identically.
    """
    e = load(spark, sf_dir, "embeddings") \
        .withColumn("ne_", F.expr(_norm_sql("embedding")))
    cents = e.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("qe"),
        F.col("ne_").alias("nq_"))
    csim = F.round(_sim_pre(), 4)
    # assignment: argmax cosine over the broadcast centroids, lowest cell
    # wins ties (struct ordering: csim desc via max, then -cell).
    # _spread: the C-cosines-per-row assign scan streams against the
    # broadcast centroids — parallelize it past the one-row-group scan
    asim = F.broadcast(cents).crossJoin(_spread(e, "vec_id")) \
        .select("vec_id", "embedding", "ne_", "cell", csim.alias("csim"))
    assign = asim.groupBy("vec_id").agg(
        F.max_by("cell", F.struct(F.col("csim"), -F.col("cell"))).alias("cell"),
        F.any_value("embedding").alias("embedding"),
        F.any_value("ne_").alias("ne_"))
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"),
        F.col("ne_").alias("nq_"))
    # probe the nprobe=2 nearest cells per query (centroid plays the
    # corpus role here: its qe/nq_ become embedding/ne_)
    qsim = F.broadcast(q).crossJoin(
        cents.select("cell", F.col("qe").alias("embedding"),
                     F.col("nq_").alias("ne_"))) \
        .select("qid", "qe", "nq_", "cell", csim.alias("csim"))
    wq = Window.partitionBy("qid").orderBy(F.desc("csim"), "cell")
    qprobe = qsim.withColumn("rk", F.row_number().over(wq)) \
        .filter(F.col("rk") <= 2).select("qid", "qe", "nq_", "cell")
    j = F.broadcast(qprobe).join(
        assign.withColumnRenamed("cell", "acell"),
        (F.col("acell") == F.col("cell"))
        & (F.col("vec_id") != F.col("qid")))
    sim = F.round(_sim_pre(), 4)
    sims = j.select("qid", "vec_id", sim.alias("sim"))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), "vec_id")
    return sims.select("qid", "vec_id", "sim",
                       F.row_number().over(w).alias("rk")) \
        .filter(F.col("rk") <= 5).select("qid", "vec_id", "sim")


# One Lloyd/k-means assignment+update round as DuckDB CTEs (cN = input
# centroid relation with (cell, ce); produces cN_out). Unrolled twice in
# the ann_ivf_lloyd_topk oracle below — k-means is a fixed small number of
# deterministic relational steps, so it IS SQL-expressible.
def _LLOYD_SQL(cin: str, cout: str) -> str:
    return f"""
a_{cout} AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             ROUND(list_dot_product(c.ce, e.embedding)
                   / (sqrt(list_dot_product(c.ce, c.ce))
                      * sqrt(list_dot_product(e.embedding, e.embedding))), 4)
             DESC, c.cell) AS rk
    FROM embeddings e, {cin} c) WHERE rk = 1),
{cout} AS (
  SELECT cell, list(ROUND(mv, 6) ORDER BY pos) AS ce FROM (
    SELECT cell, pos, AVG(CAST(val AS DOUBLE)) AS mv FROM (
      SELECT cell, UNNEST(embedding) AS val,
             generate_subscripts(embedding, 1) AS pos FROM a_{cout})
    GROUP BY cell, pos) GROUP BY cell)"""


@register("ann_ivf_lloyd_topk", """
WITH c0 AS (SELECT vec_id AS cell, embedding AS ce FROM embeddings
            WHERE vec_id < 16),""" + _LLOYD_SQL("c0", "c1") + ","
            + _LLOYD_SQL("c1", "c2") + """,
assign AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             ROUND(list_dot_product(c.ce, e.embedding)
                   / (sqrt(list_dot_product(c.ce, c.ce))
                      * sqrt(list_dot_product(e.embedding, e.embedding))), 4)
             DESC, c.cell) AS rk
    FROM embeddings e, c2 c) WHERE rk = 1),
q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 3),
qprobe AS (
  SELECT qid, qe, cell FROM (
    SELECT q.qid, q.qe, c.cell,
           ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
             ROUND(list_dot_product(q.qe, c.ce)
                   / (sqrt(list_dot_product(q.qe, q.qe))
                      * sqrt(list_dot_product(c.ce, c.ce))), 4) DESC,
             c.cell) AS rk
    FROM q, c2 c) WHERE rk <= 4),
sims AS (
  SELECT p.qid, a.vec_id,
         ROUND(list_dot_product(p.qe, a.embedding)
               / (sqrt(list_dot_product(p.qe, p.qe))
                  * sqrt(list_dot_product(a.embedding, a.embedding))), 4) AS sim
  FROM qprobe p JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.qid)
SELECT qid, vec_id, sim FROM (
  SELECT qid, vec_id, sim,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
  FROM sims) WHERE rk <= 5
""")
def q_ann_ivf_lloyd_topk(spark, sf_dir):
    """IVF-flat ANN with a Lloyd-refined coarse quantizer (VERDICT r6
    task 4 — closes ann_ivf_topk's quality gap: sampled centroids give
    0.31 uniform-vector recall at nprobe 2; refined centroids raise every
    operating point, and on genuinely clustered corpora reach recall 1.0
    at nprobe 2 — BENCH/ANN_RECALL.json).

    Two k-means iterations, each pure DataFrame ops: assignment is the
    broadcast-centroid argmax (identical shape to the query-time assign),
    the update is posexplode → groupBy(cell, pos) avg → array_sort
    re-assembly — 2 bounded shuffles per iteration of |V|·d rows, the
    canonical distributed-k-means plan. Centroid components round to 6dp
    each iteration so both engines' float summation agrees; cosines round
    to 4dp with cell-id tie-break, as everywhere in the ANN family. At
    100 TB the quantizer trains on a SAMPLE (e.g. TABLESAMPLE or
    vec_id % s = 0 — still one broadcast per iteration); the full-table
    training here keeps the gate oracle-exact. Probe fan-out nprobe=4."""
    # _spread once at the source: all three broadcast-centroid assign scans
    # and the norm projection reuse the same engine-width exchange instead of
    # the one-row-group scan
    e = _spread(load(spark, sf_dir, "embeddings"), "vec_id") \
        .withColumn("ne_", F.expr(_norm_sql("embedding")))
    csim = F.round(_sim_pre(), 4)
    cents = e.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cell"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("qe")) \
        .withColumn("nq_", F.expr(_norm_sql("qe")))
    for _ in range(2):
        asim = F.broadcast(cents).crossJoin(e) \
            .select("vec_id", "embedding", "ne_", "cell", csim.alias("csim"))
        assign = asim.groupBy("vec_id").agg(
            F.max_by("cell", F.struct(F.col("csim"),
                                      -F.col("cell"))).alias("cell"),
            F.any_value("embedding").alias("embedding"),
            F.any_value("ne_").alias("ne_"))
        comp = assign.select(
            "cell", F.posexplode("embedding").alias("pos", "val"))
        cents = comp.groupBy("cell", "pos") \
            .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("mv")) \
            .groupBy("cell").agg(
                F.expr("transform(array_sort(collect_list(struct(pos, mv))),"
                       " x -> x.mv)").alias("qe")) \
            .withColumn("nq_", F.expr(_norm_sql("qe")))
    asim = F.broadcast(cents).crossJoin(e) \
        .select("vec_id", "embedding", "ne_", "cell", csim.alias("csim"))
    assign = asim.groupBy("vec_id").agg(
        F.max_by("cell", F.struct(F.col("csim"), -F.col("cell"))).alias("cell"),
        F.any_value("embedding").alias("embedding"),
        F.any_value("ne_").alias("ne_"))
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"),
        F.col("ne_").alias("nq_"))
    qsim = F.broadcast(q).crossJoin(
        cents.select("cell", F.col("qe").alias("embedding"),
                     F.col("nq_").alias("ne_"))) \
        .select("qid", "qe", "nq_", "cell", csim.alias("csim"))
    wq = Window.partitionBy("qid").orderBy(F.desc("csim"), "cell")
    qprobe = qsim.withColumn("rk", F.row_number().over(wq)) \
        .filter(F.col("rk") <= 4).select("qid", "qe", "nq_", "cell")
    j = F.broadcast(qprobe).join(
        assign.withColumnRenamed("cell", "acell"),
        (F.col("acell") == F.col("cell"))
        & (F.col("vec_id") != F.col("qid")))
    sim = F.round(_sim_pre(), 4)
    sims = j.select("qid", "vec_id", sim.alias("sim"))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), "vec_id")
    return sims.select("qid", "vec_id", "sim",
                       F.row_number().over(w).alias("rk")) \
        .filter(F.col("rk") <= 5).select("qid", "vec_id", "sim")


# --- production-threshold ANN recall gate (VERDICT r5 task 5) -------------
# 16-bit hyperplane signatures + full Hamming-<=2 multi-probe (1+16+120 =
# 137 probe buckets/query) over a corpus with DETERMINISTIC planted
# near-dups: twin_i = base_i + 0.2 * rot(base_i) in double arithmetic,
# giving cosine >= 0.979 per pair (well inside the sim>=0.9 near-dup band)
# while genuinely crossing hyperplanes (mean Hamming distance 1.0; 3/50
# pairs land past hd2). The Spark side runs the REAL probe-expansion
# search; the oracle pins each pair's found flag via the mathematically
# equivalent hamming(sig_q, sig_b) <= 2 predicate and hard-codes
# recall_ok = TRUE, so recall >= 0.9 at production settings is part of
# the hash-gated output (measured: 47/50 = 0.94).
ANN_PROD_BITS = 16
ANN_PROD_SCALE = "0.2"


def _sig16(col: str):
    """16-bit hyperplane signature of a double-array column (0-based)."""
    return sum((F.when(F.expr(f"{col}[{2 * j}] - {col}[{2 * j + 1}]") >= 0,
                       F.lit(1 << j)).otherwise(F.lit(0))
                for j in range(ANN_PROD_BITS)), start=F.lit(0))


_PROD_SIG_SQL = " + ".join(
    f"(CASE WHEN {{c}}[{2 * j + 1}] - {{c}}[{2 * j + 2}] >= 0 "
    f"THEN {1 << j} ELSE 0 END)" for j in range(ANN_PROD_BITS))


@register("ann_production_recall", f"""
WITH base AS (
  SELECT vec_id,
         list_transform(generate_series(1, 64),
                        i -> CAST(embedding[i] AS DOUBLE)) AS b
  FROM embeddings WHERE vec_id % 10 = 0),
tw AS (
  SELECT vec_id, b,
         list_transform(generate_series(1, 64),
                        i -> b[i] + {ANN_PROD_SCALE} * b[(i % 64) + 1]) AS t
  FROM base),
sig AS (
  SELECT vec_id,
         {_PROD_SIG_SQL.format(c='t')} AS sq,
         {_PROD_SIG_SQL.format(c='b')} AS sb,
         list_dot_product(t, b)
         / (sqrt(list_dot_product(t, t))
            * sqrt(list_dot_product(b, b))) AS sim
  FROM tw)
SELECT vec_id AS base_id, vec_id + 100000 AS twin_id,
       ROUND(sim, 4) AS sim,
       CAST(bit_count(CAST(xor(sq, sb) AS BIGINT)) AS INT) AS hd,
       bit_count(CAST(xor(sq, sb) AS BIGINT)) <= 2 AND sim >= 0.9 AS found,
       TRUE AS recall_ok
FROM sig
""")
def q_ann_production_recall(spark, sf_dir):
    """Near-dup retrieval at production ANN settings, value-gated.

    Plan shape at 100 TB: signatures are pure Catalyst projections; the
    probe set (137 buckets x planted queries) is a broadcast; candidates
    join on the bucket key only (shuffle key = bucket, never all-pairs);
    the partner check is a broadcast left join. ``found`` comes out of the
    actual probe-join search — the oracle's hamming predicate is the
    independent recomputation — and ``recall_ok`` pins recall >= 0.9.
    """
    e = load(spark, sf_dir, "embeddings")
    dbl = F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
    base = e.select("vec_id", dbl.alias("b"))
    twin = F.expr(f"transform(sequence(0, 63), "
                  f"i -> b[i] + {ANN_PROD_SCALE}D * b[(i + 1) % 64])")
    planted = base.filter(F.col("vec_id") % 10 == 0) \
        .select("vec_id", "b", twin.alias("t"))
    corpus = base.select("vec_id", F.col("b").alias("v")) \
        .unionAll(planted.select((F.col("vec_id") + 100000).alias("vec_id"),
                                 F.col("t").alias("v"))) \
        .withColumn("bucket", _sig16("v")) \
        .withColumn("nv_", F.expr(
            "sqrt(aggregate(v, CAST(0.0 AS DOUBLE), "
            "(acc, x) -> acc + x * x))"))
    qs = planted.select(
        (F.col("vec_id") + 100000).alias("qid"),
        F.col("t").alias("qe"), _sig16("t").alias("qsig"),
        F.expr("sqrt(aggregate(t, CAST(0.0 AS DOUBLE), "
               "(acc, x) -> acc + x * x))").alias("nq_"))
    masks = ([0] + [1 << i for i in range(ANN_PROD_BITS)]
             + [(1 << i) | (1 << j) for i in range(ANN_PROD_BITS)
                for j in range(i + 1, ANN_PROD_BITS)])
    probes = qs.select(
        "qid", "qe", "nq_",
        F.explode(F.array(*[F.col("qsig").bitwiseXOR(F.lit(m))
                            for m in masks])).alias("pb"))
    cand = F.broadcast(probes).join(
        corpus, (F.col("bucket") == F.col("pb"))
        & (F.col("vec_id") != F.col("qid")))
    dot = ("aggregate(zip_with(qe, v, (x, y) -> x * y), CAST(0.0 AS DOUBLE), "
           "(acc, p) -> acc + p)")
    # norms pre-folded per row (nq_ on the probe side, nv_ on the corpus)
    csim = F.expr(dot) / (F.col("nq_") * F.col("nv_"))
    hits = cand.filter(csim >= 0.9) \
        .select("qid", F.col("vec_id").alias("hit_id"))
    pair_dot = ("aggregate(zip_with(t, b, (x, y) -> x * y), "
                "CAST(0.0 AS DOUBLE), (acc, p) -> acc + p)")
    pair_nt = ("sqrt(aggregate(t, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x))")
    pair_nb = ("sqrt(aggregate(b, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x))")
    pair_sim = F.expr(pair_dot) / (F.expr(pair_nt) * F.expr(pair_nb))
    pairs = planted.select(
        F.col("vec_id").alias("base_id"),
        (F.col("vec_id") + 100000).alias("twin_id"),
        F.round(pair_sim, 4).alias("sim"),
        F.bit_count(_sig16("t").bitwiseXOR(_sig16("b"))).cast("int")
        .alias("hd"))
    res = pairs.join(
        hits.select(F.col("qid").alias("twin_id"), "hit_id"),
        ["twin_id"], "left") \
        .withColumn("found",
                    F.coalesce(F.col("hit_id") == F.col("base_id"),
                               F.lit(False)))
    found_any = res.groupBy("base_id", "twin_id", "sim", "hd").agg(
        F.max("found").alias("found"))
    rec = found_any.agg(
        (F.avg(F.col("found").cast("double")) >= 0.9).alias("recall_ok"))
    return found_any.crossJoin(F.broadcast(rec))


@register("embedding_norms", """
SELECT vec_id, label,
       ROUND(sqrt(list_dot_product(embedding, embedding)), 4) AS l2norm
FROM embeddings
""")
def q_embedding_norms(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    return e.select("vec_id", "label",
                    F.round(F.expr(_norm_sql("embedding")), 4).alias("l2norm"))


@register("label_centroid_distance", """
WITH un AS (
  SELECT vec_id, label,
         UNNEST(embedding) AS x,
         UNNEST(range(1, len(embedding) + 1)) AS i
  FROM embeddings),
cent AS (
  SELECT label, i, AVG(CAST(x AS DOUBLE)) AS c FROM un GROUP BY label, i)
SELECT u.vec_id, u.label,
       ROUND(sqrt(SUM((CAST(u.x AS DOUBLE) - c.c) ** 2)), 4) AS dist
FROM un u JOIN cent c ON u.label = c.label AND u.i = c.i
GROUP BY u.vec_id, u.label
""")
def q_label_centroid_distance(spark, sf_dir):
    """IVF building block: per-label centroid + distance of each member.

    Dimension-independent plan: posexplode to (vec_id, label, i, x) rows,
    groupBy(label, i) for the centroids, broadcast-join back on (label, i),
    sum of squared deltas per vec. No driver-side action in the query path
    and no per-dimension Catalyst columns (a 768-dim embedding would bloat
    a per-dim projection; the exploded plan is width-agnostic)."""
    e = load(spark, sf_dir, "embeddings")
    un = e.select(
        "vec_id", "label",
        F.posexplode("embedding").alias("i", "x")) \
        .withColumn("x", F.col("x").cast("double"))
    cent = un.groupBy("label", "i").agg(F.avg("x").alias("c"))
    j = un.join(F.broadcast(cent), ["label", "i"])
    return (j.groupBy("vec_id", "label")
            .agg(F.round(F.sqrt(F.sum((F.col("x") - F.col("c")) ** 2)), 4)
                 .alias("dist"))
            .select("vec_id", "label", "dist"))


# --------------------------------------------------------------------------
# Multimodal plumbing (binary columns + typed metadata; decode stubbed)
# --------------------------------------------------------------------------

@register("media_metadata", """
SELECT doc_id, octet_length(encode(text)) AS n_bytes, lang,
       substr(md5(text), 1, 8) AS content_key
FROM documents
""")
def q_media_metadata(spark, sf_dir):
    """Opaque binary payload + typed metadata columns (the multimodal model:
    media as BinaryType, schema-side metadata)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
        "lang",
        F.substring(F.md5("text"), 1, 8).alias("content_key"))


@register("media_feature_extract", """
WITH pos AS (
  SELECT doc_id, UNNEST(range(1, length(text) + 1)) AS i, text
  FROM documents),
h AS (
  SELECT doc_id, ascii(substr(text, CAST(i AS INT), 1)) % 16 AS b FROM pos),
c AS (
  SELECT doc_id, b, COUNT(*) AS n FROM h GROUP BY doc_id, b),
grid AS (
  SELECT d.doc_id, CAST(g.b AS INT) AS b
  FROM documents d, (SELECT UNNEST(range(0, 16)) AS b) g)
SELECT grid.doc_id, grid.b AS bucket, COALESCE(c.n, 0) AS n
FROM grid LEFT JOIN c ON grid.doc_id = c.doc_id AND grid.b = c.b
""")
def q_media_feature_extract(spark, sf_dir):
    """Decode/feature-extract over binary media via mapInPandas.

    The actual image/audio decode is STUBBED (no codec libs in this
    environment) with a deterministic byte-histogram 'feature' (exact
    integer counts per 16-bucket — chosen integral so the DuckDB oracle can
    hash-verify the whole Arrow plumbing end-to-end); the Spark side —
    binary column in, fixed-width feature vector out inside the worker,
    Arrow batching, schema declaration — is the real multimodal path under
    test. Output is EXPLODED to (doc_id, bucket, n) rows (16 per doc): the
    driver harness canonicalizes results via pandas sort, which cannot
    order an array<long> column (round-2 ERR `unhashable type: 'list'`).
    """
    d = load(spark, sf_dir, "documents") \
        .select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))

    def _fn(batches):
        buckets = np.arange(16, dtype=np.int32)
        for pdf in batches:
            ids, hists = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = np.frombuffer(bytes(payload), dtype=np.uint8)
                # STUB: stands in for image decode + pooling; deterministic
                hists.append(np.bincount(buf % 16, minlength=16).astype(np.int64))
                ids.append(doc_id)
            if not ids:
                continue
            yield pd.DataFrame({
                "doc_id": np.repeat(np.asarray(ids, dtype=np.int64), 16),
                "bucket": np.tile(buckets, len(ids)),
                "n": np.concatenate(hists),
            })

    return d.mapInPandas(_fn, "doc_id long, bucket int, n long")


# 4 sign-bit hyperplanes / sim >= 0.25: tuned so the synthetic embeddings
# (max pairwise cosine 0.47 — no planted near-dups) still produce verifiable
# rows through the prefilter; production near-dup settings would be ~8-16
# bits, sim >= 0.92, with multi-probe for sign-boundary recall.
N_SIGN_BITS = 4
NEAR_DUP_SIM = 0.25
_SIGN_BUCKET_SQL = " + ".join(
    f"(CASE WHEN embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
    for i in range(N_SIGN_BITS))


@register("dedup_embedding_near", f"""
WITH bk AS (
  SELECT vec_id, label, embedding,
         {_SIGN_BUCKET_SQL} AS bucket
  FROM embeddings),
pairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         list_dot_product(a.embedding, b.embedding)
         / (sqrt(list_dot_product(a.embedding, a.embedding))
            * sqrt(list_dot_product(b.embedding, b.embedding))) AS sim
  FROM bk a JOIN bk b
    ON a.label = b.label AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT va, vb, ROUND(sim, 4) AS sim FROM pairs WHERE sim >= {NEAR_DUP_SIM}
""")
def q_dedup_embedding_near(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs with an LSH prefilter.

    Round 1 blocked on ``label`` alone — quadratic in the largest label.
    The join key is now (label, sign-bucket): N_SIGN_BITS (= 4) deterministic
    sign-bit hyperplanes on dims 0..3 split each label cell up to 2**4 = 16
    ways, bounding the pair space by actual bucket occupancy. Near-identical
    vectors agree on a sign bit unless that coordinate is near zero — the
    candidate-filtered semantics (recall traded for a bound) are mirrored
    exactly in the oracle. NEAR_DUP_SIM = 0.25 is a fixture-driven stand-in:
    the synthetic embeddings' max pairwise cosine is 0.47 (no planted
    near-dups), so the production >= 0.92 threshold would verify nothing.
    Production settings: 8-16 sign bits, sim >= 0.92, multi-probe of
    neighbouring buckets for sign-boundary recall.
    """
    e = load(spark, sf_dir, "embeddings")
    bucket = sum(
        (F.when(F.col("embedding")[i] >= 0, F.lit(1 << i)).otherwise(F.lit(0))
         for i in range(N_SIGN_BITS)), start=F.lit(0))
    # The pair expansion + cosine verify runs in the numpy pair kernel
    # (guide §4.2): ONE shuffle keyed on the (label, sign-bucket) cell —
    # exactly the former join key — then each cell's (va < vb) pairs are
    # scored batched with the fold's float64 operation order, bit-identical
    # to the previous per-pair Catalyst expression (see
    # _pairwise_cosine_block). Replaces a broadcast join whose interpreted
    # O(dim) fold per candidate pair dominated the query (measured
    # ~11 us/pair, 14.9 s at sf1.0 for 1.25 M pairs). Raw sims cross the
    # boundary; the ROUND stays in Catalyst as before.
    # _spread on the cell key: the groupBy reuses this one exchange, and the
    # explicit engine-width count stops AQE coalescing the (tiny-by-bytes)
    # kernel input to one partition, which would serialize the per-cell
    # Python calls (measured 1.10 -> 0.62 s at sf0.1)
    eb = _spread(e.select("vec_id", "label", bucket.alias("bucket"),
                          "embedding"), "label", "bucket")
    out = eb.groupBy("label", "bucket") \
        .applyInPandas(_pair_sims_kernel(NEAR_DUP_SIM),
                       "va long, vb long, sim double")
    return out.select("va", "vb", F.round("sim", 4).alias("sim"))


@register("token_count_bpe_ish", """
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
       len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_ws_tokens
FROM documents
""")
def q_token_count_bpe_ish(spark, sf_dir):
    """Token counting: whitespace + a BPE-ish regex segmentation (letters /
    digits / single punctuation marks), both engines via regexp_extract_all."""
    d = load(spark, sf_dir, "documents")
    # Spark SQL literals process backslash escapes — double them
    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
    ws = F.filter(F.split("text", " "), lambda w: w != "")
    return d.select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all(text, '{pat}', 0)"))
        .alias("n_bpe_tokens"),
        F.size(ws).alias("n_ws_tokens"))


# --------------------------------------------------------------------------
# Corpus-statistics operators (Gopher-style repetition, document frequency)
# --------------------------------------------------------------------------

@register("repetition_ratio", """
WITH words AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') AS w
  FROM documents),
grams AS (
  SELECT doc_id, len(w) - 4 AS total,
         len(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                            || w[i+3] || ' ' || w[i+4]
                            for i in range(1, len(w) - 3)])) AS uniq
  FROM words WHERE len(w) >= 5)
SELECT doc_id, total AS n_grams,
       ROUND(1.0 - uniq / total, 6) AS rep_ratio
FROM grams
""")
def q_repetition_ratio(spark, sf_dir):
    """Duplicate word-5-gram fraction per document (the Gopher/MassiveText
    repetition signal used to drop boilerplate-heavy docs). Tokenize once
    via posexplode, 5-grams from lead() windows (same CollapseProject-safe
    shape as _shingle_rows), one groupBy(doc_id)."""
    d = load(spark, sf_dir, "documents")
    words = F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
    ex = d.select("doc_id", F.posexplode(words).alias("pos", "w"))
    win = Window.partitionBy("doc_id").orderBy("pos")
    g = ex.select(
        "doc_id",
        F.concat_ws(" ", "w", *[F.lead("w", i).over(win) for i in range(1, 5)])
        .alias("g"),
        F.lead("w", 4).over(win).alias("_w4")).filter(F.col("_w4").isNotNull())
    agg = g.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.countDistinct("g").alias("uniq"))
    return agg.select(
        "doc_id", "n_grams",
        F.round(F.lit(1.0) - F.col("uniq") / F.col("n_grams"), 6)
        .alias("rep_ratio"))


@register("term_doc_freq", """
WITH words AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split_regex(lower(text), '\\s+'),
                                   w -> w <> '')) AS ws
  FROM documents),
df AS (
  SELECT word, COUNT(*) AS df
  FROM (SELECT doc_id, UNNEST(ws) AS word FROM words) GROUP BY word)
SELECT word, df,
       ROUND(df / (SELECT COUNT(*) FROM documents), 6) AS df_frac
FROM df
ORDER BY df DESC, word
LIMIT 100
""")
def q_term_doc_freq(spark, sf_dir):
    """Document frequency of the top-100 terms (inverted-index /
    boilerplate-detection building block): explode DISTINCT words per doc
    (map-side dedup bounds the shuffle by vocab x docs, not tokens), one
    groupBy(word), deterministic (df DESC, word) top-k. The corpus size
    enters as a broadcast single-row aggregate, not a driver-side
    ``.count()`` — the whole plan stays one lazy DAG (VERDICT r5 task 7)."""
    d = load(spark, sf_dir, "documents")
    n_docs = d.agg(F.count(F.lit(1)).cast("double").alias("_n_docs"))
    words = F.array_distinct(
        F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != ""))
    df = d.select("doc_id", F.explode(words).alias("word")) \
        .groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    return df.crossJoin(F.broadcast(n_docs)).select(
        "word", "df",
        F.round(F.col("df") / F.col("_n_docs"), 6).alias("df_frac")) \
        .orderBy(F.desc("df"), "word").limit(100)


# --------------------------------------------------------------------------
# Benchmark decontamination
# --------------------------------------------------------------------------

# Window size for contamination matching. 3-word shingles flag ~60% of the
# corpus on generic-phrase collisions (measured at sf0.01); 5-word spans flag
# only genuinely overlapping documents (planted near-dups: 88 shared 5-grams
# for a dup pair vs 0 for unrelated docs). Production pipelines use 8-13
# (GPT-3 appendix C uses 13-gram overlap); 5 keeps the synthetic fixture's
# planted dups detectable.
_DECONTAM_N = 5
# Deterministic in-corpus "benchmark" split: doc_id % _DECONTAM_MOD == 0 is
# the eval set (10% of docs — includes planted near-dup partners at every
# test SF, so the query result is non-trivial).
_DECONTAM_MOD = 10

_DECONTAM_IDX_SQL = " || ' ' || ".join(
    f"lower(w3[i+{k}])" for k in range(_DECONTAM_N))
_DECONTAM_NGRAMS_SQL = f"""
  SELECT doc_id,
         list_distinct([{_DECONTAM_IDX_SQL}
                        for i in range(1, len(w3) - {_DECONTAM_N - 2})]) AS sh
  FROM (SELECT doc_id,
               list_filter(string_split(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g'), ' '),
                           w -> w <> '') AS w3
        FROM documents)
  WHERE len(w3) >= {_DECONTAM_N}
"""


def _ngram_rows(spark, sf_dir, n, pred=None):
    """(doc_id, s) — distinct n-word shingles, one row each, assembled in
    the batched gram kernel (see _gram_kernel: the former per-row
    transform(slice(), array_join()) was interpreted per gram — 4.6 s at
    sf1.0 for the 5-gram corpus — while the kernel builds the same strings
    batched in ~1 s engine-wide). No exchange past the (env-gated) input
    spread: each doc's grams are assembled inside its own row.

    ``pred``: optional filter applied to the documents SCAN. Catalyst
    cannot push a doc_id filter through the opaque kernel, so callers that
    want only a split of the corpus (decontamination's eval vs train
    branches) must filter BEFORE gram assembly — passing it here keeps the
    pushdown explicit."""
    d = load(spark, sf_dir, "documents")
    if pred is not None:
        d = d.filter(pred)
    src = _spread(d, "doc_id").select("doc_id", "text")
    return src.mapInPandas(_gram_kernel(n, ("doc_id",)),
                           "doc_id long, s string")


@register("decontaminate_ngram", f"""
WITH shingles AS ({_DECONTAM_NGRAMS_SQL}),
ng AS (SELECT doc_id, UNNEST(sh) AS s FROM shingles),
ev AS (SELECT DISTINCT s, doc_id AS eval_id
       FROM ng WHERE doc_id % {_DECONTAM_MOD} = 0),
hits AS (SELECT c.doc_id, c.s, e.eval_id
         FROM ng c JOIN ev e ON c.s = e.s
         WHERE c.doc_id % {_DECONTAM_MOD} <> 0)
SELECT doc_id,
       COUNT(DISTINCT s) AS n_hits,
       COUNT(DISTINCT eval_id) AS n_eval_docs
FROM hits GROUP BY doc_id
""")
def q_decontaminate_ngram(spark, sf_dir):
    """Benchmark decontamination: flag training documents sharing any
    {n}-word span with the eval/benchmark split (GPT-3-style n-gram overlap
    decontamination; the eval set here is the deterministic doc_id %
    _DECONTAM_MOD == 0 split of the same corpus — no external data).

    Scale design: the eval side is SMALL by construction (benchmark suites
    are megabytes against a 100 TB corpus), so its distinct n-grams are
    BROADCAST — the corpus side is a scan + projection + broadcast-hash
    semi-ish join with NO corpus-wide shuffle; only matched (doc, s,
    eval_id) hit rows reach the groupBy exchange. The eval-side filter
    (doc_id % mod = 0 stands in for "read the benchmark table") is pushed
    to its own scan. Output: per contaminated doc, distinct shared n-grams
    and distinct eval docs hit — the removal decision (n_hits >= tau) is a
    downstream filter.
    """
    # split BEFORE gram assembly (the _ngram_rows pred): a doc_id filter
    # cannot push through the opaque gram kernel, and filtering after would
    # assemble every gram twice
    ev = _ngram_rows(spark, sf_dir, _DECONTAM_N,
                     pred=F.col("doc_id") % _DECONTAM_MOD == 0) \
        .select("s", F.col("doc_id").alias("eval_id")).distinct()
    corpus = _ngram_rows(spark, sf_dir, _DECONTAM_N,
                         pred=F.col("doc_id") % _DECONTAM_MOD != 0)
    hits = corpus.join(F.broadcast(ev), "s")
    return hits.groupBy("doc_id").agg(
        F.countDistinct("s").alias("n_hits"),
        F.countDistinct("eval_id").alias("n_eval_docs"))


# --------------------------------------------------------------------------
# Corpus mixture / sampling and embedding storage
# --------------------------------------------------------------------------

# Hash-threshold resolution for deterministic sampling decisions.
_SAMPLE_BUCKETS = 65536


@register("stratified_sample", f"""
WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
t AS (SELECT MIN(n) AS tgt FROM c),
r AS (SELECT lang, LEAST(1.0, CAST(tgt AS DOUBLE) / CAST(n AS DOUBLE)) AS rate
      FROM c, t),
b AS (SELECT doc_id, lang,
             ('0x' || substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
               % {_SAMPLE_BUCKETS} AS bucket
      FROM documents)
SELECT b.doc_id, b.lang, b.bucket, round(r.rate, 9) AS rate
FROM b JOIN r ON b.lang = r.lang
WHERE CAST(b.bucket AS DOUBLE) / {_SAMPLE_BUCKETS} < r.rate
""")
def q_stratified_sample(spark, sf_dir):
    """Language-balanced corpus sampling: downsample every language to the
    size of the smallest one with a DETERMINISTIC per-doc hash threshold
    (keep iff md5-bucket/65536 < target/n_lang). The standard corpus-mixing
    primitive (rebalance a web crawl's language skew before training).

    Scale design: the per-lang rates come from ONE small count aggregate
    (|langs| rows) joined back as a BROADCAST — the corpus side is scan →
    hash projection → filter with zero wide shuffle and no driver action.
    Hash-threshold sampling (vs rand()) is idempotent under task retries,
    stable when the corpus grows (each doc's keep/drop decision is
    independent of partitioning and row order), and resumable — the
    properties a 100 TB training-data pipeline needs from its sampler.
    """
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("n"))
    tgt = counts.agg(F.min("n").alias("tgt"))
    rates = counts.crossJoin(F.broadcast(tgt)).select(
        "lang",
        F.least(F.lit(1.0),
                F.col("tgt").cast("double") / F.col("n").cast("double"))
         .alias("rate"))
    bucket = F.conv(F.substring(
        F.md5(F.concat(F.lit("smp:"), F.col("doc_id").cast("string"))),
        1, 8), 16, 10).cast("long") % _SAMPLE_BUCKETS
    b = d.select("doc_id", "lang", bucket.alias("bucket"))
    return b.join(F.broadcast(rates), "lang") \
        .filter(F.col("bucket").cast("double") / _SAMPLE_BUCKETS
                < F.col("rate")) \
        .select("doc_id", "lang", "bucket", F.round("rate", 9).alias("rate"))


# int8 (offset-binary, 0..255) scalar quantization: q = floor((v-mn)/sc+.5).
_QERR_SQL = ("list_aggregate(list_transform(e, v -> "
             "abs(v - mn - LEAST(255.0, floor((v - mn) / sc + 0.5)) * sc)), "
             "'max')")
_QSUM_SQL = ("list_transform(e, v -> CAST(LEAST(255.0, "
             "floor((v - mn) / sc + 0.5)) AS BIGINT))")


@register("embedding_quantize_int8", f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e
  FROM embeddings),
st AS (
  SELECT vec_id, e, list_aggregate(e, 'min') AS mn,
         (list_aggregate(e, 'max') - list_aggregate(e, 'min')) / 255.0 AS sc
  FROM base),
qz AS (
  SELECT vec_id, sc,
         CASE WHEN sc = 0 THEN 0.0 ELSE {_QERR_SQL} END AS max_err,
         CASE WHEN sc = 0 THEN NULL ELSE {_QSUM_SQL} END AS q
  FROM st)
SELECT vec_id, round(sc, 9) AS scale, round(max_err, 9) AS max_err,
       COALESCE(list_aggregate(q, 'sum'), 0) AS sum_q,
       COALESCE(list_aggregate(list_transform(q, x -> x * x), 'sum'), 0)
         AS sum_q2,
       COALESCE(q[1], 0) AS q_first, COALESCE(q[-1], 0) AS q_last
FROM qz
""")
def q_embedding_quantize_int8(spark, sf_dir):
    """Per-vector int8 scalar quantization for the embedding store: map each
    float32 vector to 256 offset-binary levels over its own [min, max]
    range and report the quantization scale, max reconstruction error, and
    code checksums (sum, sum-of-squares, first/last code).

    Scale design: a pure per-row Catalyst projection — zero shuffle, zero
    Python. At 100 TB this is the storage path for ANN: int8 codes are 4x
    smaller than float32, so IVF cell scans (ann_ivf_lloyd_topk) read a
    quarter of the bytes at a bounded, per-vector-reported error
    (max_err <= scale/2 by construction — asserted in pytest). Constant
    vectors (scale 0) quantize to all-zero codes with zero error.
    """
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda v: v.cast("double")).alias("e"))
    st = e.select(
        "vec_id", "e", F.array_min("e").alias("mn"),
        ((F.array_max("e") - F.array_min("e")) / 255.0).alias("sc"))
    code = lambda v: F.least(F.lit(255.0), F.floor(
        (v - F.col("mn")) / F.col("sc") + 0.5)).cast("long")
    err = F.array_max(F.transform(
        "e", lambda v: F.abs(v - F.col("mn")
                             - code(v).cast("double") * F.col("sc"))))
    qz = st.select(
        "vec_id", "sc",
        F.when(F.col("sc") == 0, F.lit(0.0)).otherwise(err).alias("max_err"),
        F.when(F.col("sc") == 0, F.lit(None)).otherwise(
            F.transform("e", code)).alias("q"))
    zsum = lambda c: F.coalesce(
        F.aggregate(c, F.lit(0).cast("long"), lambda a, v: a + v), F.lit(0))
    return qz.select(
        "vec_id", F.round("sc", 9).alias("scale"),
        F.round("max_err", 9).alias("max_err"),
        zsum(F.col("q")).alias("sum_q"),
        zsum(F.transform("q", lambda x: x * x)).alias("sum_q2"),
        F.coalesce(F.element_at("q", 1), F.lit(0)).alias("q_first"),
        F.coalesce(F.element_at("q", -1), F.lit(0)).alias("q_last"))
