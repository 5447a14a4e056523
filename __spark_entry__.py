"""Driver contract for the spark-graft builder (PySpark target).

``entry``      — flagship pipeline smoke on sf0.001
``queries``    — operator registry (sen2rts_spark.queries + _ts + _docs)
``oracle_sql`` — matching DuckDB oracles (omitted for non-SQL-expressible
                 per-series kernels → rows-only checks)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

SF0001 = "/root/testdata/sf0.001"

_PYFILES_SENT: set = set()


def _ensure_pyfiles(spark: SparkSession) -> None:
    """Make sen2rts_spark importable on executor Python workers regardless of
    the driver's CWD: build dist/sen2rts_spark.zip once and addPyFile it."""
    key = id(spark.sparkContext)
    if key in _PYFILES_SENT:
        return
    zip_path = os.path.join(_REPO, "dist", "sen2rts_spark.zip")
    try:
        import subprocess
        subprocess.run([sys.executable,
                        os.path.join(_REPO, "tools", "build_pyfiles.py")],
                       check=True, capture_output=True)
    except Exception:  # noqa: BLE001 — fall back to a stale zip if present
        pass
    if os.path.exists(zip_path):
        spark.sparkContext.addPyFile(zip_path)
    _PYFILES_SENT.add(key)
    try:
        from sen2rts_spark.session import prewarm_python_workers
        prewarm_python_workers(spark)
    except Exception:  # noqa: BLE001 — prewarm is best-effort setup
        pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: events → daily rollup tier → Gorilla blobs → per-user stats.

    Exercises the headline path (scan → continuous aggregate → compressed
    sink) plus a decode verification join, all on sf0.001.
    """
    import pyspark.sql.functions as F

    _ensure_pyfiles(spark)
    from sen2rts_spark.operators.gorilla_sink import decode_blobs, encode_blobs
    from sen2rts_spark.operators.rollup import rollup_raw

    events = spark.read.parquet(f"{SF0001}/events.parquet").select(
        F.col("user_id").cast("string").alias("id"), "ts", "value",
        F.lit(1.0).alias("qa"))
    daily = rollup_raw(events, "daily")
    blobs = encode_blobs(daily, "daily")
    decoded = decode_blobs(blobs).groupBy("id").agg(
        F.count(F.lit(1)).alias("points_decoded"))
    return (
        blobs.groupBy("id").agg(
            F.sum("count").alias("points"),
            F.sum(F.length("blob")).alias("blob_bytes"),
        )
        .join(decoded, "id")
        .withColumn("roundtrip_ok", F.col("points") == F.col("points_decoded"))
        .select("id", "points", "blob_bytes", "roundtrip_ok")
        .orderBy("id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sen2rts_spark import queries as q

    def _wrap(fn):
        def inner(spark, sf_dir):
            _ensure_pyfiles(spark)
            return fn(spark, sf_dir)
        inner.__name__ = getattr(fn, "__name__", "query")
        inner.__doc__ = fn.__doc__
        return inner

    return {name: _wrap(fn) for name, fn in q.queries().items()}


def oracle_sql() -> dict[str, str]:
    from sen2rts_spark import queries as q
    return q.oracle_sql()
