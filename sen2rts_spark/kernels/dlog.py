"""Gu double-logistic curve fitting (scipy-free numpy port).

Re-creates the fit used by the reference's ``fit_curve()``
(/root/reference/R/fit_curve.R:70-183, delegating to ``phenopix::GuFit``):

    y(t) = y0 + a1/(1+exp(-(t-t01)/b1))^c1 - a2/(1+exp(-(t-t02)/b2))^c2

The input cycle series (global-relval scale) is normalized with
sf = quantile(x, c(0.05, 0.95)) (type 7) — convention verified bit-exact
against the reference's cf fixture (tests/test_pheno_golden.py). The SSE is
minimized by deterministic multistart Nelder-Mead (R optim BFGS is the
reference's engine; dates extracted downstream are robust to the residual
parameter difference — golden-tested).
"""

from __future__ import annotations

import numpy as np

__all__ = ["gu_curve", "quantile7", "fit_gu", "fake_fit"]


def gu_curve(par: np.ndarray, t: np.ndarray) -> np.ndarray:
    y0, a1, a2, t01, t02, b1, b2, c1, c2 = par
    with np.errstate(over="ignore", invalid="ignore"):
        return (y0
                + a1 / (1.0 + np.exp(-(t - t01) / b1)) ** c1
                - a2 / (1.0 + np.exp(-(t - t02) / b2)) ** c2)


def quantile7(v: np.ndarray, p: float) -> float:
    """R default quantile (type 7)."""
    v = np.sort(np.asarray(v, dtype=np.float64))
    h = (len(v) - 1) * p
    lo = int(np.floor(h))
    hi = min(lo + 1, len(v) - 1)
    return float(v[lo] + (h - lo) * (v[hi] - v[lo]))


def _sse(par, x, t):
    if not np.all(np.isfinite(par)):
        return 99999.0
    pred = gu_curve(par, t)
    if not np.all(np.isfinite(pred)):
        return 99999.0
    return float(np.sum((pred - x) ** 2))


def _nelder_mead(f, x0, maxiter=2000, xatol=1e-9, fatol=1e-12):
    """Deterministic Nelder-Mead (standard coefficients, pinned init simplex)."""
    n = len(x0)
    alpha, gamma, rho, sigma = 1.0, 2.0, 0.5, 0.5
    sim = np.empty((n + 1, n))
    sim[0] = x0
    for k in range(n):
        y = np.array(x0, dtype=float)
        y[k] = y[k] + (0.05 * y[k] if y[k] != 0 else 0.00025)
        sim[k + 1] = y
    fsim = np.array([f(s) for s in sim])
    for _ in range(maxiter):
        order = np.argsort(fsim, kind="stable")
        sim, fsim = sim[order], fsim[order]
        if (np.max(np.abs(sim[1:] - sim[0])) <= xatol
                and np.max(np.abs(fsim[1:] - fsim[0])) <= fatol):
            break
        centroid = sim[:-1].mean(axis=0)
        xr = centroid + alpha * (centroid - sim[-1])
        fr = f(xr)
        if fr < fsim[0]:
            xe = centroid + gamma * (centroid - sim[-1])
            fe = f(xe)
            if fe < fr:
                sim[-1], fsim[-1] = xe, fe
            else:
                sim[-1], fsim[-1] = xr, fr
        elif fr < fsim[-2]:
            sim[-1], fsim[-1] = xr, fr
        else:
            xc = centroid + rho * (sim[-1] - centroid)
            fc = f(xc)
            if fc < fsim[-1]:
                sim[-1], fsim[-1] = xc, fc
            else:
                sim[1:] = sim[0] + sigma * (sim[1:] - sim[0])
                fsim[1:] = [f(s) for s in sim[1:]]
    order = np.argsort(fsim, kind="stable")
    return sim[order][0], fsim[order][0]


def fit_gu(x: np.ndarray):
    """Fit the 9-param Gu double-logistic to one cycle series.

    ``x`` is the cycle's values (relval scale), t = 1..n implicitly.
    Returns dict(params, predicted, sf, sse) with ``predicted`` back-scaled to
    the input scale (phenopix GuFit convention: sf = 5%/95% quantiles).
    """
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    t = np.arange(1, n + 1, dtype=np.float64)
    sf = (quantile7(x, 0.05), quantile7(x, 0.95))
    span = sf[1] - sf[0]
    if span == 0:
        span = 1.0
    xn = (x - sf[0]) / span

    d25 = quantile7(t, 0.25)
    d75 = quantile7(t, 0.75)
    # deterministic multistart: the 4 phenopix-style priors plus a seeded
    # latin-ish random sample (fixed seed — reproducible across runs/executors)
    starts = []
    for tp in ((d25, d75), (d75, d25)):
        for cc in (1.0, 3.0):
            starts.append(np.array([0.0, 1.0, 1.0, tp[0], tp[1], 0.5, 0.5, cc, cc]))
    rng = np.random.default_rng(42)
    for _ in range(36):
        starts.append(np.array([
            rng.uniform(-0.2, 0.3), rng.uniform(0.5, 2.0), rng.uniform(0.5, 2.0),
            rng.uniform(1, n), rng.uniform(1, n),
            np.exp(rng.uniform(np.log(0.3), np.log(8))),
            np.exp(rng.uniform(np.log(0.3), np.log(8))),
            np.exp(rng.uniform(np.log(0.1), np.log(8))),
            np.exp(rng.uniform(np.log(0.1), np.log(8))),
        ]))

    def f(par):
        return _sse(par, xn, t)

    coarse = []
    for p0 in starts:
        par, cost = _nelder_mead(f, p0, maxiter=300)
        coarse.append((cost, par))
    coarse.sort(key=lambda r: r[0])
    best_par, best_cost = None, np.inf
    for cost, par in coarse[:3]:
        par2, cost2 = _nelder_mead(f, par, maxiter=3000)
        par2, cost2 = _nelder_mead(f, par2, maxiter=3000)
        if cost2 < best_cost:
            best_par, best_cost = par2, cost2

    pred_n = gu_curve(best_par, t)
    predicted = pred_n * span + sf[0]
    if not np.all(np.isfinite(predicted)):
        return None
    return {"params": best_par, "predicted": predicted, "sf": sf,
            "sse": best_cost, "method": "gu"}


def fake_fit(x: np.ndarray):
    """fit = "no" (fit_curve.R:14-24): identity predicted."""
    x = np.asarray(x, dtype=np.float64)
    return {"params": None, "predicted": x.copy(), "sf": (0.0, 1.0),
            "sse": 0.0, "method": "no"}
