"""Reference-shaped API facade.

One function per exported reference entry point, with the reference's
parameter names and defaults, so a sen2rts user can switch call-for-call:

    R (sen2rts)                      PySpark (sen2rts_spark.api)
    ------------------------------   ------------------------------------
    extract_s2ts(paths, sf, ...)     extract_s2ts(pages_df, fun=...)
    smooth_s2ts(ts, min_qa=0.2,...)  smooth_s2ts(ts_df, min_qa=0.2, ...)
    fill_s2ts(ts, frequency=...)     fill_s2ts(ts_df, frequency=..., ...)
    cut_cycles(ts, ...)              cut_cycles(ts_df, ...)
    fit_curve(ts, cycles, fit=...)   fit_curve(ts_df, cycles_df, fit=...)
    extract_pheno(data, method,trs)  extract_pheno(ts_df, cycles_df, ...)
    aggregate_pheno(data, pheno,...) aggregate_pheno(ts_df, pheno_df, ...)
    assign_season(pheno, ...)        assign_season(pheno_df, ...)
    detect_forages(ts, pheno, ...)   detect_forages(ts_df, pheno_df, ...)
    load_s2paths(paths, ...)         load_s2paths(spark, paths, ...)

Differences from the reference (by design, documented in SURVEY.md):
- tables are Spark DataFrames, not in-memory data.tables; every stage is a
  lazy plan;
- the fit object is flattened (fit_curve returns the long fitted table; the
  reference's nested list is an R-ism — s2fit_to_s2ts.R:6-20 is the shape we
  return directly);
- extract_pheno takes (ts, cycles) and runs the fit internally (the
  reference splits fit_curve/extract_pheno because its fit object is a
  driver-side list; here both are one distributed plan).
"""

from __future__ import annotations

from .operators.extract import extract_obs as _extract_obs
from .operators.pheno_tools import aggregate_pheno, assign_season  # noqa: F401
from .operators.pheno_tools import detect_forages  # noqa: F401
from .operators.pheno_tools import fit_curves as fit_curve  # noqa: F401
from .operators.timeseries import cut_cycles  # noqa: F401
from .operators.timeseries import extract_pheno  # noqa: F401
from .operators.timeseries import fill as fill_s2ts  # noqa: F401
from .operators.timeseries import smooth as smooth_s2ts  # noqa: F401
from .sources.paths import load_s2paths  # noqa: F401

__all__ = ["extract_s2ts", "smooth_s2ts", "fill_s2ts", "cut_cycles",
           "fit_curve", "extract_pheno", "aggregate_pheno", "assign_season",
           "detect_forages", "load_s2paths", "as_s2ts", "print_s2ts",
           "pivot_values"]

# column contract of an s2ts table (s2ts-class.R:56-96: mandatory date/id/
# value, optional orbit/sensor/quality + stage-added columns)
S2TS_REQUIRED = ("id", "date", "value")
S2TS_OPTIONAL = ("orbit", "sensor", "qa", "rawval", "interpolated")


def extract_s2ts(pages, fun: str = "mean"):
    """pages(url, warc_ts, html, text, lang) → obs_raw (extract_s2ts.R:370-420)."""
    return _extract_obs(pages, fun=fun)


def as_s2ts(df, id_col: str = "id", date_col: str = "date",
            value_col: str = "value"):
    """Coerce a DataFrame to the s2ts column contract (as.s2ts,
    s2ts-class.R:234-273): rename the key columns, check the mandatory
    trio, order by (id, date). Unknown extra columns pass through, like the
    reference keeps extra data.table columns."""
    import pyspark.sql.functions as F
    out = df
    for src, dst in ((id_col, "id"), (date_col, "date"), (value_col, "value")):
        if src != dst:
            out = out.withColumnRenamed(src, dst)
    missing = [c for c in S2TS_REQUIRED if c not in out.columns]
    if missing:
        raise ValueError(f"not an s2ts table: missing column(s) {missing}")
    out = out.withColumn("date", F.col("date").cast("date"))
    return out.orderBy("id", "date")


def pivot_values(df, col: str = "value", id_col: str = "id",
                 date_col: str = "date", ids=None):
    """Wide accessor: one row per date, one column per id, cell = that
    series' ``col`` at that date ($value/$qa dcast semantics,
    s2ts-class.R:289-308). The s2ts key is unique per (id, date), so
    first() is deterministic. Rows where every id is NA are dropped, like
    the reference accessor's na-omitted cast.

    ``ids``: explicit pivot values. Passing them skips Spark's extra
    distinct-scan to discover the columns — at scale the id universe should
    come from the catalog, not a pass over the data.
    """
    import pyspark.sql.functions as F
    piv = df.groupBy(date_col).pivot(id_col, ids) if ids is not None \
        else df.groupBy(date_col).pivot(id_col)
    wide = piv.agg(F.first(col))
    value_cols = [c for c in wide.columns if c != date_col]
    keep = None
    for c in value_cols:
        cond = F.col(c).isNotNull()
        keep = cond if keep is None else (keep | cond)
    return wide.filter(keep) if keep is not None else wide


def print_s2ts(df, n: int = 10) -> str:
    """Textual preview in the shape of print.s2ts (s2ts-class.R:369-414):
    a header with series count / date range / column list, then the first
    ``n`` rows. Returns the string (and prints it) — the reference's plot
    surface is out of scope for a headless engine."""
    import pyspark.sql.functions as F
    stats = df.agg(
        F.countDistinct("id").alias("n_id"),
        F.min("date").alias("d0"), F.max("date").alias("d1"),
        F.count(F.lit(1)).alias("rows")).first()
    head = df.orderBy("id", "date").limit(n)
    lines = [
        f"# s2ts table: {stats['rows']} records, {stats['n_id']} series, "
        f"dates {stats['d0']} .. {stats['d1']}",
        f"# columns: {', '.join(df.columns)}",
        head._show_string(n, 0, False),
    ]
    text = "\n".join(lines)
    print(text)
    return text
