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


def encode_blobs(tier_df: DataFrame, tier: str, chunk_days: int = 366) -> DataFrame:
    """Rollup tier → one Gorilla blob per (id, chunk_days window)."""
    chunk_secs = chunk_days * 86400

    def _fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_start")
        ts = (pdf["bucket_start"].astype("int64") // 10 ** 9).to_numpy()
        vals = pdf["value"].to_numpy(dtype=np.float64)
        blob = gorilla_encode(ts, vals)
        return pd.DataFrame([{
            "id": pdf["id"].iloc[0],
            "tier": tier,
            "chunk_start": pdf["chunk"].iloc[0],
            "blob": blob,
            "count": len(ts),
            "min_ts": pdf["bucket_start"].iloc[0],
            "max_ts": pdf["bucket_start"].iloc[-1],
        }])

    with_chunk = tier_df.withColumn(
        "chunk", F.window("bucket_start", f"{chunk_secs} seconds")["start"])
    return with_chunk.groupBy("id", "chunk").applyInPandas(_fn, schema=BLOB_SCHEMA)


def decode_blobs(blobs: DataFrame) -> DataFrame:
    """Blob table → long (id, tier, bucket_start, value) via mapInPandas."""

    def _fn(batches):
        for pdf in batches:
            ids, tiers, ts_all, vals_all = [], [], [], []
            for _, row in pdf.iterrows():
                ts, vals = gorilla_decode(bytes(row["blob"]))
                ids.extend([row["id"]] * len(ts))
                tiers.extend([row["tier"]] * len(ts))
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
