"""Phenological-metric extraction from a fitted cycle curve.

Re-creates the reference's patched ``PhenoTrs`` / ``PhenoDeriv``
(/root/reference/R/PhenoTrs.R:8-50, /root/reference/R/PhenoDeriv.R:6-90 —
patches over the public phenopix extractors) and the metric → date/value
mapping done by ``extract_pheno()`` (/root/reference/R/extract_pheno.R:52-197).

Key semantics (validated against the dt_pheno fixture):
- the threshold band is ``trs ± 0.1`` on the 0-1 rescaled curve;
- greenup requires rising derivative AND index < pop (the patch);
  senescence requires falling derivative AND index >= pop;
- sos/eos = R ``round()`` (half-to-even) of the median band index;
- msp/mau = mean over the sos±10 / eos±10 index window clipped to (0, n);
- metrics indices are 1-based; date = cycle begin + index − 1.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["pheno_trs", "pheno_deriv", "pheno_gu", "pheno_kl",
           "TRS_METRICS", "GU_METRICS", "KL_METRICS"]

TRS_METRICS = ["sos", "eos", "los", "pop", "mgs", "rsp", "rau", "peak", "msp", "mau"]
GU_METRICS = ["UD", "SD", "DD", "RD", "maxline", "baseline", "prr", "psr",
              "plateau_slope"]
KL_METRICS = ["Greenup", "Maturity", "Senescence", "Dormancy"]


def _rround(v: float) -> float:
    """R round(): IEEE half-to-even."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return math.nan
    f = math.floor(v)
    r = v - f
    if r > 0.5:
        return f + 1
    if r < 0.5:
        return f
    return f + 1 if f % 2 else f


def _greenup(ratio: np.ndarray) -> np.ndarray:
    """phenopix .Greenup: TRUE where rising, FALSE where falling, NaN else.

    Encoded as float: 1.0 / 0.0 / NaN.
    """
    d = np.concatenate(([np.nan], np.diff(ratio)))
    out = np.full(len(ratio), np.nan)
    with np.errstate(invalid="ignore"):
        out[d > 0] = 1.0
        out[d < 0] = 0.0
    return out


def pheno_trs(x: np.ndarray, trs: float = 0.5) -> dict:
    """Threshold-crossing metrics on a fitted curve (1-based index space)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    nan = math.nan
    out = {m: nan for m in TRS_METRICS}
    if n == 0 or np.all(np.isnan(x)):
        return out
    idx1 = np.arange(1, n + 1)
    peak = np.nanmax(x)
    trough = np.nanmin(x)
    ampl = peak - trough
    ratio = (x - trough) / ampl if ampl > 0 else np.zeros(n)
    pop = float(np.median(idx1[x == peak]))
    gu = _greenup(ratio)
    with np.errstate(invalid="ignore"):
        band = (ratio >= trs - 0.1) & (ratio <= trs + 0.1)
        greenup = (gu == 1.0) & (idx1 < pop)
        senescence = (gu == 0.0) & (idx1 >= pop)
    gs = idx1[greenup & band]
    es = idx1[senescence & band]
    sos = _rround(float(np.median(gs))) if len(gs) else nan
    eos = _rround(float(np.median(es))) if len(es) else nan
    los = eos - sos
    if not math.isnan(los) and los < 0:
        los = n + los
    with np.errstate(invalid="ignore"):
        mgs_mask = ratio > trs
    mgs = float(np.nanmean(x[mgs_mask])) if mgs_mask.any() else nan

    def _meanwin(center):
        if math.isnan(center):
            return nan
        ids = np.arange(int(center) - 10, int(center) + 11)
        ids = ids[(ids > 0) & (ids < n)]
        if len(ids) == 0:
            return nan
        return float(np.nanmean(x[ids - 1]))

    out.update(sos=sos, eos=eos, los=los, pop=pop, mgs=mgs,
               rsp=nan, rau=nan, peak=float(peak),
               msp=_meanwin(sos), mau=_meanwin(eos))
    return out


def pheno_deriv(x: np.ndarray, trs: float = 1.0, concavity: str = "up") -> dict:
    """Derivative metrics, patched semantics (PhenoDeriv.R:24-55).

    With the default trs=1 this reduces to max/min-slope dates like the
    public phenopix extractor; the patch lets earlier shoulder slopes
    qualify via the normalized-derivative threshold.
    """
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    nan = math.nan
    out = {m: nan for m in TRS_METRICS}
    if n == 0 or np.all(np.isnan(x)):
        return out
    idx1 = np.arange(1, n + 1)
    peak = np.nanmax(x)
    pop = float(np.median(idx1[x == peak]))
    xd = np.concatenate(([np.nan], np.diff(x)))
    xdr = np.full(n, np.nan)
    with np.errstate(invalid="ignore"):
        pos = xd >= 0
        neg = xd < 0
    if np.any(pos & ~np.isnan(xd)):
        xdr[pos] = xd[pos] / np.nanmax(xd[pos])
    if np.any(neg):
        xdr[neg] = -xd[neg] / np.nanmin(xd[neg])
    xd2 = np.concatenate(([np.nan], np.diff(xd)))
    if concavity == "down":
        xd2 = -xd2
    with np.errstate(invalid="ignore"):
        rsp_cand = np.flatnonzero((xdr >= trs) & (xd2 >= 0))
        rau_cand = np.flatnonzero((xdr <= -trs) & (xd2 >= 0))
    if len(rsp_cand):
        rsp = float(xd[rsp_cand[0]])
    else:
        with np.errstate(invalid="ignore"):
            up = xd[xd > 0]
        rsp = float(np.nanmax(up)) if len(up) else nan
    if len(rau_cand):
        rau = float(xd[rau_cand[-1]])
    else:
        with np.errstate(invalid="ignore"):
            dn = xd[xd < 0]
        rau = float(np.nanmin(dn)) if len(dn) else nan
    with np.errstate(invalid="ignore"):
        sos_set = idx1[xd == rsp]
        eos_set = idx1[xd == rau]
    sos = float(np.median(sos_set)) if len(sos_set) else nan
    eos = float(np.median(eos_set)) if len(eos_set) else nan
    los = eos - sos if not (math.isnan(sos) or math.isnan(eos)) else nan
    if not math.isnan(los) and los < 0:
        los = n + los
    if math.isnan(sos) or math.isnan(eos):
        mgs = nan
    elif sos < eos:
        mgs = float(np.nanmean(x[(idx1 > sos) & (idx1 < eos)]))
    else:
        mgs = float(np.nanmean(x[(idx1 > sos) | (idx1 < eos)]))

    def _meanwin(center):
        if math.isnan(center):
            return nan
        ids = np.arange(int(center) - 10, int(center) + 11)
        ids = ids[(ids > 0) & (ids < n)]
        return float(np.nanmean(x[ids - 1])) if len(ids) else nan

    out.update(sos=sos, eos=eos, los=los, pop=pop, mgs=mgs, rsp=rsp, rau=rau,
               peak=float(peak), msp=_meanwin(sos), mau=_meanwin(eos))
    return out


def pheno_gu(x: np.ndarray) -> dict:
    """Gu et al. 2009 "production recovery/senescence" metrics on a fitted
    daily curve (method="gu" of extract_pheno.R:52-197; the reference
    delegates to phenopix::PhenoGu — this is the published algorithm).

    In 1-based index space:
    - prr / psr: peak recovery rate (max day-to-day increase before the peak)
      and peak senescence rate (most negative decrease after it);
    - baseline / maxline: min / max of the fitted curve;
    - the recovery line (tangent at the prr point) crosses baseline at UD
      (upturn) and maxline at SD (stabilization);
    - the senescence line crosses maxline at DD (downturn) and baseline at
      RD (recession);
    - plateau_slope: least-squares slope of the curve between SD and DD.
    """
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    nan = math.nan
    out = {m: nan for m in GU_METRICS}
    if n < 3 or np.all(np.isnan(x)):
        return out
    idx1 = np.arange(1, n + 1, dtype=np.float64)
    peak = np.nanmax(x)
    pop = int(np.median(idx1[x == peak]))
    xd = np.concatenate(([np.nan], np.diff(x)))  # xd[i] = x[i] - x[i-1]
    baseline = float(np.nanmin(x))
    maxline = float(peak)
    out["baseline"], out["maxline"] = baseline, maxline

    with np.errstate(invalid="ignore"):
        rise = np.where(idx1 <= pop, xd, np.nan)
        fall = np.where(idx1 >= pop, xd, np.nan)
    if np.all(np.isnan(rise)) or np.all(np.isnan(fall)):
        return out
    prr_i = int(np.nanargmax(rise))          # 0-based index into x
    psr_i = int(np.nanargmin(fall))
    prr = float(rise[prr_i])
    psr = float(fall[psr_i])
    out["prr"], out["psr"] = prr, psr
    t_prr, t_psr = prr_i + 1.0, psr_i + 1.0  # 1-based

    if prr > 0:
        out["UD"] = t_prr - (x[prr_i] - baseline) / prr
        out["SD"] = t_prr + (maxline - x[prr_i]) / prr
    if psr < 0:
        out["DD"] = t_psr + (maxline - x[psr_i]) / psr
        out["RD"] = t_psr + (baseline - x[psr_i]) / psr

    if not (math.isnan(out["SD"]) or math.isnan(out["DD"])):
        lo = max(int(round(out["SD"])), 1)
        hi = min(int(round(out["DD"])), n)
        if hi - lo >= 1:
            seg_t = np.arange(lo, hi + 1, dtype=np.float64)
            seg_x = x[lo - 1:hi]
            ok = ~np.isnan(seg_x)
            if ok.sum() >= 2:
                out["plateau_slope"] = float(
                    np.polyfit(seg_t[ok], seg_x[ok], 1)[0])
    return out


def _local_extrema_ranked(v: np.ndarray):
    """Indices of local extrema of v (0-based interior), strongest |v| first."""
    d = np.diff(v)
    sign = np.sign(d)
    # replace zero-slope runs by the previous sign so plateaus count once
    for i in range(1, len(sign)):
        if sign[i] == 0:
            sign[i] = sign[i - 1]
    turns = np.flatnonzero(sign[1:] != sign[:-1]) + 1
    turns = turns[np.isfinite(v[turns])]
    return turns[np.argsort(-np.abs(v[turns]), kind="stable")]


def pheno_kl(x: np.ndarray) -> dict:
    """Klosterman method (method="klosterman" of extract_pheno.R; the
    reference delegates to phenopix::PhenoKl): transition dates at the
    extrema of the curvature-change rate K' of the fitted curve
    (Zhang et al. 2003, RSE 84:471-475).

    k = x'' / (1 + x'^2)^1.5; K' = dk/dt. In each half of the cycle
    (split at the curve peak) the two strongest local extrema of K',
    ordered in time, are the transition dates: (Greenup, Maturity) on the
    rising half, (Senescence, Dormancy) on the falling half. 1-based indices.
    """
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    nan = math.nan
    out = {m: nan for m in KL_METRICS}
    if n < 7 or np.all(np.isnan(x)):
        return out
    idx1 = np.arange(1, n + 1, dtype=np.float64)
    peak = np.nanmax(x)
    pop = int(np.median(idx1[x == peak]))

    d1 = np.gradient(x)
    d2 = np.gradient(d1)
    with np.errstate(invalid="ignore", over="ignore"):
        k = d2 / (1.0 + d1 ** 2) ** 1.5
    kd = np.gradient(k)

    def _two(seg_lo, seg_hi):
        # 0-based slice [seg_lo, seg_hi); returns two 1-based dates or NaNs
        seg = kd[seg_lo:seg_hi]
        if len(seg) < 5:
            return nan, nan
        cand = _local_extrema_ranked(seg)[:2]
        if len(cand) == 0:
            return nan, nan
        dates = np.sort(cand[:2]) + seg_lo + 1.0
        if len(dates) == 1:
            return float(dates[0]), nan
        return float(dates[0]), float(dates[1])

    out["Greenup"], out["Maturity"] = _two(0, pop)
    out["Senescence"], out["Dormancy"] = _two(pop - 1, n)
    return out
