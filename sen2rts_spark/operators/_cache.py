"""Bounded persist helper for the global-rescale pattern.

``extract_pheno`` / ``fit_curves`` persist the filled frame so the min/max
aggregate job materializes the cache and the downstream cycle join reads
InMemoryTableScan instead of re-running the fill→smooth lineage (see
tests/test_single_scan.py). The cache must outlive the operator call — the
returned plan is lazy and reads it at the caller's terminal action — so an
immediate unpersist is impossible. Instead each new call evicts the frame
persisted by the previous call, bounding a long session to ONE live cache
per pattern (round-3 ADVICE: unbounded growth competed with shuffle memory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_live: list[DataFrame] = []


def persist_swap(df: DataFrame) -> DataFrame:
    """Persist ``df``; unpersist whatever the previous call persisted."""
    while _live:
        _live.pop().unpersist(False)
    df = df.persist()
    _live.append(df)
    return df


def release() -> None:
    """Explicitly drop the live cache (call after the terminal action)."""
    while _live:
        _live.pop().unpersist(False)
