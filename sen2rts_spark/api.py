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
           "detect_forages", "load_s2paths"]


def extract_s2ts(pages, fun: str = "mean"):
    """pages(url, warc_ts, html, text, lang) → obs_raw (extract_s2ts.R:370-420)."""
    return _extract_obs(pages, fun=fun)
