"""Per-series pipeline operators: smooth → fill → cut_cycles → pheno.

Each operator is one ``applyInPandas`` over ``groupBy(id)`` — the reference's
per-id R loops (smooth_s2ts.R:182,197; fill_s2ts.R:75; cut_cycles.R body)
become Arrow-batched numpy kernels executed in parallel across millions of
series; the only shuffle is the hash partition on id, reused stage to stage.

Scale note: a series must be colocated for its kernel, so per-series stages
cannot be salted — series length is bounded instead by rolling up to the
daily tier BEFORE smoothing (SURVEY.md §4.3). Kernel errors on degenerate
series (e.g. shorter than the SG window) yield NULL smoothed values rather
than failing the task (deviation from the reference, which errors the run).
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..kernels.cycles import cut_cycles_series
from ..kernels.dlog import fit_with_fallback
from ..kernels.pheno import pheno_deriv, pheno_gu, pheno_kl, pheno_trs
from ..kernels.series import fill_series, smooth_series

__all__ = ["smooth", "fill", "cut_cycles", "extract_pheno", "SMOOTH_SCHEMA",
           "FILL_SCHEMA", "CYCLES_SCHEMA", "PHENO_SCHEMA", "PHENO_GU_SCHEMA",
           "PHENO_KL_SCHEMA"]

SMOOTH_SCHEMA = ("id string, date date, orbit string, sensor string, "
                 "value double, qa double, rawval double")
FILL_SCHEMA = SMOOTH_SCHEMA + ", interpolated boolean"
CYCLES_SCHEMA = ("id string, year int, cycle int, begin date, end date, "
                 "maxval date, weight double")
PHENO_SCHEMA = (CYCLES_SCHEMA +
                ", sos date, eos date, los int, pop date, mgs double, "
                "rsp double, rau double, peak double, msp double, mau double")
PHENO_GU_SCHEMA = (CYCLES_SCHEMA +
                   ", UD date, SD date, DD date, RD date, maxline double, "
                   "baseline double, prr double, psr double, "
                   "plateau_slope double")
PHENO_KL_SCHEMA = (CYCLES_SCHEMA +
                   ", Greenup date, Maturity date, Senescence date, "
                   "Dormancy date")

_EPOCH = _dt.date(1970, 1, 1)


def _days_from_dates(s: pd.Series) -> np.ndarray:
    return np.array([(d - _EPOCH).days if d is not None else -1
                     for d in s], dtype=np.int64)


def _dates_from_days(days) -> list:
    return [_EPOCH + _dt.timedelta(days=int(d)) for d in days]


def smooth(obs: DataFrame, min_qa: float = 0.2, noise_dir: str = "low",
           spike: float = 0.25, spike_window: int = 5, sg_daywindow: int = 15,
           sg_polynom: int = 2, sg_n: int = 3,
           max_extrapolation: float = 0.1, filter_type: str = "savgol",
           whittaker_lambda: float = 100.0) -> DataFrame:
    """obs_raw → obs_smoothed (adds rawval; value = smoothed or NULL)."""

    def _fn(pdf: pd.DataFrame) -> pd.DataFrame:
        days = _days_from_dates(pdf["date"])
        try:
            out = smooth_series(
                days,
                pdf["value"].to_numpy(dtype=np.float64),
                pdf["qa"].to_numpy(dtype=np.float64) if "qa" in pdf else None,
                pdf["sensor"].to_numpy(dtype=object),
                pdf["orbit"].to_numpy(dtype=object),
                min_qa=min_qa, noise_dir=noise_dir, spike=spike,
                spike_window=spike_window, sg_daywindow=sg_daywindow,
                sg_polynom=sg_polynom, sg_n=sg_n,
                max_extrapolation=max_extrapolation,
                filter_type=filter_type, whittaker_lambda=whittaker_lambda,
            )
        except Exception:
            # degenerate series (too short / all-NaN): keep rows, NULL smooth
            srt = np.lexsort((pdf["orbit"].to_numpy(dtype=object),
                              pdf["sensor"].to_numpy(dtype=object), days))
            out = {
                "days": days[srt],
                "sensor": pdf["sensor"].to_numpy(dtype=object)[srt],
                "orbit": pdf["orbit"].to_numpy(dtype=object)[srt],
                "qa": pdf["qa"].to_numpy(dtype=np.float64)[srt],
                "rawval": pdf["value"].to_numpy(dtype=np.float64)[srt],
                "value": np.full(len(days), np.nan),
            }
        return pd.DataFrame({
            "id": pdf["id"].iloc[0],
            "date": _dates_from_days(out["days"]),
            "orbit": out["orbit"],
            "sensor": out["sensor"],
            "value": out["value"],
            "qa": out["qa"],
            "rawval": out["rawval"],
        })

    from .grouped import grouped_apply
    return grouped_apply(obs, ["id"], _fn, SMOOTH_SCHEMA)


def fill(smoothed: DataFrame, frequency: str = "daily",
         max_na_days: float = float("inf"),
         max_extrapolation: float = 0.1) -> DataFrame:
    """obs_smoothed → obs_filled (regular grid + interpolated flag)."""

    def _fn(pdf: pd.DataFrame) -> pd.DataFrame:
        days = _days_from_dates(pdf["date"])
        out = fill_series(
            days,
            pdf["value"].to_numpy(dtype=np.float64),
            pdf["sensor"].to_numpy(dtype=object),
            pdf["orbit"].to_numpy(dtype=object),
            passthrough={
                "qa": pdf["qa"].to_numpy(dtype=object),
                "rawval": pdf["rawval"].to_numpy(dtype=object),
            },
            frequency=frequency, max_na_days=max_na_days,
            max_extrapolation=max_extrapolation,
        )
        return pd.DataFrame({
            "id": pdf["id"].iloc[0],
            "date": _dates_from_days(out["days"]),
            "orbit": out["orbit"],
            "sensor": out["sensor"],
            "value": out["value"],
            "qa": pd.array(out["qa"], dtype="Float64"),
            "rawval": pd.array(out["rawval"], dtype="Float64"),
            "interpolated": out["interpolated"],
        })

    from .grouped import grouped_apply
    return grouped_apply(smoothed, ["id"], _fn, FILL_SCHEMA)


def cut_cycles(filled: DataFrame, **params) -> DataFrame:
    """obs_filled → cycles (one row per detected cycle)."""

    def _fn(pdf: pd.DataFrame) -> pd.DataFrame:
        days = _days_from_dates(pdf["date"])
        rows = cut_cycles_series(days, pdf["value"].to_numpy(dtype=np.float64),
                                 **params)
        if not rows:
            return None
        return pd.DataFrame({
            "id": pdf["id"].iloc[0],
            "year": [r["year"] for r in rows],
            "cycle": [r["cycle"] for r in rows],
            "begin": _dates_from_days([r["begin"] for r in rows]),
            "end": _dates_from_days([r["end"] for r in rows]),
            "maxval": _dates_from_days([r["maxval"] for r in rows]),
            "weight": [r["weight"] for r in rows],
        })

    from .grouped import grouped_apply
    return grouped_apply(filled, ["id"], _fn, CYCLES_SCHEMA)


def extract_pheno(filled: DataFrame, cycles: DataFrame, fit="gu",
                  method: str = "trs", trs: float = 0.5,
                  rescale: tuple | None = None) -> DataFrame:
    """(obs_filled ⋈ cycles) → pheno metrics per cycle.

    The rescale is GLOBAL over the whole filled table (fit_curve.R:112 — NOT
    per id, SURVEY.md §7 trap): computed as one Spark aggregate, broadcast
    into the kernel closure. The cycle slice uses date ∈ [begin, end)
    (fit_curve.R:146), so the output `end` is cycles.end − 1 day
    (extract_pheno.R:104).

    ``fit`` is a method name or a fallback chain like the reference default
    ``("gu", "klosterman")`` (fit_curve.R:73,149-156). ``method`` selects the
    extractor: "trs"/"derivatives" (sos..mau), "gu" (UD/SD/DD/RD + lines,
    PHENO_GU_SCHEMA) or "klosterman" (Greenup..Dormancy, PHENO_KL_SCHEMA) —
    extract_pheno.R:166-181. NOTE on "gu" date mapping: the reference maps
    the RD date from the SD metric (extract_pheno.R:178 — an upstream quirk
    we do NOT reproduce; RD here is the recession date itself).
    """
    joined = filled.select("id", "date", "value").join(cycles, "id")
    joined = joined.filter((F.col("date") >= F.col("begin"))
                           & (F.col("date") < F.col("end")))
    # global rescale as constant columns: literals when known, else a
    # broadcast single-row aggregate (lazy — no plan-time .first(); the
    # persist inside bounds the double consumption of `filled`)
    from .pheno_tools import _with_rescale_cols
    joined = _with_rescale_cols(filled, joined, rescale)

    if method in ("trs", "derivatives"):
        schema = PHENO_SCHEMA
        date_metrics = ("sos", "eos", "pop")
        value_metrics = ("mgs", "peak", "msp", "mau")
        raw_metrics = ("rsp", "rau")
        int_metrics = ("los",)
    elif method == "gu":
        schema = PHENO_GU_SCHEMA
        date_metrics = ("UD", "SD", "DD", "RD")
        value_metrics = ("maxline", "baseline")
        raw_metrics = ("prr", "psr", "plateau_slope")
        int_metrics = ()
    elif method == "klosterman":
        schema = PHENO_KL_SCHEMA
        date_metrics = ("Greenup", "Maturity", "Senescence", "Dormancy")
        value_metrics = ()
        raw_metrics = ()
        int_metrics = ()
    else:
        raise ValueError(f"unknown method {method!r}")

    def _fn(pdf: pd.DataFrame) -> pd.DataFrame:
        # groups arrive sorted by date (grouped_apply order=["date"])
        g0, gr = float(pdf["_g0"].iloc[0]), float(pdf["_gr"].iloc[0])
        vals = pdf["value"].to_numpy(dtype=np.float64)
        relval = (vals - g0) / gr
        fitted = fit_with_fallback(relval, fit)
        base = {
            "id": pdf["id"].iloc[0], "year": int(pdf["year"].iloc[0]),
            "cycle": int(pdf["cycle"].iloc[0]),
            "begin": pdf["date"].iloc[0], "end": pdf["date"].iloc[-1],
            "maxval": pdf["maxval"].iloc[0],
            "weight": float(pdf["weight"].iloc[0]),
        }
        if fitted is None:
            m = {k: float("nan")
                 for k in (*date_metrics, *value_metrics, *raw_metrics,
                           *int_metrics)}
        elif method == "trs":
            m = pheno_trs(fitted["predicted"], trs)
        elif method == "derivatives":
            m = pheno_deriv(fitted["predicted"], 1.0)
        elif method == "gu":
            m = pheno_gu(fitted["predicted"])
        else:
            m = pheno_kl(fitted["predicted"])
        begin = base["begin"]
        if hasattr(begin, "date"):
            begin = begin.date() if not isinstance(begin, _dt.date) else begin

        def _to_date(v):
            if v is None or (isinstance(v, float) and np.isnan(v)):
                return None
            return begin + _dt.timedelta(days=int(round(v)) - 1)

        row = dict(base)
        for k in date_metrics:
            row[k] = _to_date(m[k])
        for k in value_metrics:
            row[k] = g0 + m[k] * gr
        for k in raw_metrics:
            row[k] = m[k]
        for k in int_metrics:
            row[k] = None if np.isnan(m[k]) else int(m[k])
        return pd.DataFrame([row])[cols]

    cols = [f.strip().split()[0] for f in schema.split(",")]

    from .grouped import grouped_apply
    return grouped_apply(joined, ["id", "year", "cycle"], _fn, schema,
                         order=["date"])
