"""Gorilla-compressed blob sink/source for rollup tiers.

One blob per (id, chunk) where chunk groups ``chunk_days`` of buckets —
bounded blob size regardless of series length. Encode/decode are Arrow-batched
pandas UDF stages (the codec itself is the kernel in kernels/gorilla.py);
the blob table is the storage unit of the retention service:

    blobs(id string, tier string, chunk_start timestamp, blob binary,
          count int, min_ts timestamp, max_ts timestamp)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..kernels.gorilla import gorilla_decode, gorilla_encode

__all__ = ["encode_blobs", "decode_blobs", "BLOB_SCHEMA"]

BLOB_SCHEMA = ("id string, tier string, chunk_start timestamp, blob binary, "
               "count int, min_ts timestamp, max_ts timestamp")


def encode_blobs(tier_df: DataFrame, tier: str, chunk_days: int = 366,
                 num_partitions: int | None = None) -> DataFrame:
    """Rollup tier → one Gorilla blob per (id, chunk_days window).

    Hash-partitioned on (id, chunk), sorted within partitions, then a single
    mapInPandas pass walks group runs on raw numpy arrays — no per-group
    pandas objects, one Arrow batch out per batch in (the applyInPandas
    per-group dispatch was ~15x slower at 3000 series, see operators/grouped.py).
    """
    chunk_secs = chunk_days * 86400
    with_chunk = tier_df.withColumn(
        "chunk", F.window("bucket_start", f"{chunk_secs} seconds")["start"])
    parts = num_partitions or tier_df.sparkSession.sparkContext.defaultParallelism
    arranged = with_chunk.select("id", "chunk", "bucket_start", "value") \
        .repartition(parts, "id", "chunk") \
        .sortWithinPartitions("id", "chunk", "bucket_start")

    def _stream(batches):
        carry = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            ids = pdf["id"].to_numpy()
            chunks = pdf["chunk"].to_numpy()
            ts = (pdf["bucket_start"].to_numpy().astype("datetime64[s]")
                  .astype(np.int64))
            vals = pdf["value"].to_numpy(dtype=np.float64)
            n = len(ids)
            change = np.concatenate(
                ([True], (ids[1:] != ids[:-1]) | (chunks[1:] != chunks[:-1])))
            starts = np.flatnonzero(change)
            ends = np.concatenate((starts[1:], [n]))
            out = {"id": [], "tier": [], "chunk_start": [], "blob": [],
                   "count": [], "min_ts": [], "max_ts": []}
            # hold the last run back — it may continue in the next batch
            for s, e in zip(starts[:-1], ends[:-1]):
                out["id"].append(ids[s])
                out["tier"].append(tier)
                out["chunk_start"].append(chunks[s])
                out["blob"].append(gorilla_encode(ts[s:e], vals[s:e]))
                out["count"].append(e - s)
                out["min_ts"].append(pdf["bucket_start"].iloc[s])
                out["max_ts"].append(pdf["bucket_start"].iloc[e - 1])
            carry = pdf.iloc[starts[-1]:].copy()
            if out["id"]:
                yield pd.DataFrame(out)
        if carry is not None and len(carry):
            ts = (carry["bucket_start"].to_numpy().astype("datetime64[s]")
                  .astype(np.int64))
            vals = carry["value"].to_numpy(dtype=np.float64)
            yield pd.DataFrame({
                "id": [carry["id"].iloc[0]], "tier": [tier],
                "chunk_start": [carry["chunk"].iloc[0]],
                "blob": [gorilla_encode(ts, vals)],
                "count": [len(ts)],
                "min_ts": [carry["bucket_start"].iloc[0]],
                "max_ts": [carry["bucket_start"].iloc[-1]],
            })

    return arranged.mapInPandas(_stream, schema=BLOB_SCHEMA)


def decode_blobs(blobs: DataFrame) -> DataFrame:
    """Blob table → long (id, tier, bucket_start, value) via mapInPandas."""

    def _fn(batches):
        for pdf in batches:
            ids, tiers, ts_all, vals_all = [], [], [], []
            for rid, rtier, rblob in zip(pdf["id"], pdf["tier"], pdf["blob"]):
                ts, vals = gorilla_decode(bytes(rblob))
                ids.extend([rid] * len(ts))
                tiers.extend([rtier] * len(ts))
                ts_all.append(ts)
                vals_all.append(vals)
            yield pd.DataFrame({
                "id": ids,
                "tier": tiers,
                "bucket_start": pd.to_datetime(
                    np.concatenate(ts_all) if ts_all else np.array([], dtype=np.int64),
                    unit="s"),
                "value": np.concatenate(vals_all) if vals_all else
                    np.array([], dtype=np.float64),
            })

    return blobs.mapInPandas(
        _fn, schema="id string, tier string, bucket_start timestamp, value double")
