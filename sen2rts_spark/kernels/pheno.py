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

__all__ = ["pheno_trs", "pheno_deriv", "TRS_METRICS"]

TRS_METRICS = ["sos", "eos", "los", "pop", "mgs", "rsp", "rau", "peak", "msp", "mau"]


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
