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

__all__ = ["gu_curve", "beck_curve", "elmore_curve", "klosterman_curve",
           "quantile7", "fit_gu", "fit_beck", "fit_elmore", "fit_klosterman",
           "fake_fit", "fit_with_fallback", "FIT_FUNS"]


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


# ---------------------------------------------------------------------------
# Alternative double-logistic families (fit_curve.R:116-129 dispatches to
# phenopix::BeckFit / ElmoreFit / KlostermanFit; the formulas below are the
# published ones — Beck et al. 2006, Elmore et al. 2012, Klosterman et al.
# 2014 / Richards-generalized sigmoids — fitted with the same deterministic
# multistart Nelder-Mead harness as the Gu fit).
# ---------------------------------------------------------------------------

def beck_curve(par: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Beck et al. 2006: mn + (mx-mn) * (S_up(t) + S_down(t) - 1)."""
    mn, mx, sos, rsp, eos, rau = par
    with np.errstate(over="ignore", invalid="ignore"):
        return mn + (mx - mn) * (1.0 / (1.0 + np.exp(-rsp * (t - sos)))
                                 + 1.0 / (1.0 + np.exp(rau * (t - eos)))
                                 - 1.0)


def elmore_curve(par: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Elmore et al. 2012 (7-param, linear 'greendown' slope m7)."""
    m1, m2, m3, m4, m5, m6, m7 = par
    with np.errstate(over="ignore", invalid="ignore"):
        return m1 + (m2 - m7 * t) * (1.0 / (1.0 + np.exp((m3 - t) / m4))
                                     - 1.0 / (1.0 + np.exp((m5 - t) / m6)))


def klosterman_curve(par: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Richards-generalized double sigmoid with linear greendown
    (Klosterman et al. 2014 family): the curvature exponents v1/v2 let each
    shoulder bend asymmetrically."""
    y0, a, d, n1, h1, v1, n2, h2, v2 = par
    with np.errstate(over="ignore", invalid="ignore"):
        s1 = (1.0 + np.exp(-h1 * (t - n1))) ** (-v1)
        s2 = (1.0 + np.exp(-h2 * (t - n2))) ** (-v2)
        return y0 + (a - d * t) * (s1 - s2)


def _fit_generic(x: np.ndarray, curve, starts, method: str,
                 coarse_iter: int = 300, refine_iter: int = 2000):
    """Shared multistart harness: normalize by sf quantiles, coarse NM on all
    starts, refine the best three, back-scale the winner."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    t = np.arange(1, n + 1, dtype=np.float64)
    sf = (quantile7(x, 0.05), quantile7(x, 0.95))
    span = sf[1] - sf[0]
    if span == 0:
        span = 1.0
    xn = (x - sf[0]) / span

    def f(par):
        if not np.all(np.isfinite(par)):
            return 99999.0
        pred = curve(par, t)
        if not np.all(np.isfinite(pred)):
            return 99999.0
        sse = float(np.sum((pred - xn) ** 2))
        # NaN input slice -> NaN sse -> 'NaN < best' always False and
        # best_par would stay None; treat non-finite residuals as a miss
        return sse if np.isfinite(sse) else 99999.0

    coarse = []
    for p0 in starts:
        par, cost = _nelder_mead(f, np.asarray(p0, dtype=np.float64),
                                 maxiter=coarse_iter)
        coarse.append((cost, par))
    coarse.sort(key=lambda r: r[0])
    best_par, best_cost = None, np.inf
    for cost, par in coarse[:3]:
        par2, cost2 = _nelder_mead(f, par, maxiter=refine_iter)
        if cost2 < best_cost:
            best_par, best_cost = par2, cost2
    if best_par is None:
        return None
    pred_n = curve(best_par, t)
    predicted = pred_n * span + sf[0]
    if not np.all(np.isfinite(predicted)):
        return None
    return {"params": best_par, "predicted": predicted, "sf": sf,
            "sse": best_cost, "method": method}


def fit_beck(x: np.ndarray):
    n = len(x)
    t25, t75 = 0.25 * n, 0.75 * n
    starts = [
        np.array([0.0, 1.0, t25, 0.5, t75, 0.5]),
        np.array([0.0, 1.0, t25, 0.1, t75, 0.1]),
        np.array([0.1, 0.9, 0.4 * n, 1.0, 0.6 * n, 1.0]),
    ]
    rng = np.random.default_rng(7)
    for _ in range(13):
        starts.append(np.array([
            rng.uniform(-0.2, 0.3), rng.uniform(0.5, 1.5),
            rng.uniform(1, n / 2), np.exp(rng.uniform(np.log(0.02), np.log(2))),
            rng.uniform(n / 2, n), np.exp(rng.uniform(np.log(0.02), np.log(2))),
        ]))
    return _fit_generic(x, beck_curve, starts, "beck")


def fit_elmore(x: np.ndarray):
    n = len(x)
    starts = [
        np.array([0.0, 1.0, 0.25 * n, 3.0, 0.75 * n, 3.0, 0.0]),
        np.array([0.1, 0.9, 0.3 * n, 8.0, 0.7 * n, 8.0, 0.001]),
    ]
    rng = np.random.default_rng(11)
    for _ in range(14):
        starts.append(np.array([
            rng.uniform(-0.2, 0.3), rng.uniform(0.5, 1.5),
            rng.uniform(1, n / 2), np.exp(rng.uniform(np.log(0.5), np.log(20))),
            rng.uniform(n / 2, n), np.exp(rng.uniform(np.log(0.5), np.log(20))),
            rng.uniform(-0.002, 0.002),
        ]))
    return _fit_generic(x, elmore_curve, starts, "elmore")


def fit_klosterman(x: np.ndarray):
    n = len(x)
    starts = [
        np.array([0.0, 1.0, 0.0, 0.25 * n, 0.5, 1.0, 0.75 * n, 0.5, 1.0]),
        np.array([0.1, 0.9, 0.0, 0.3 * n, 0.2, 2.0, 0.7 * n, 0.2, 2.0]),
    ]
    rng = np.random.default_rng(13)
    for _ in range(14):
        starts.append(np.array([
            rng.uniform(-0.2, 0.3), rng.uniform(0.5, 1.5),
            rng.uniform(-0.002, 0.002),
            rng.uniform(1, n / 2), np.exp(rng.uniform(np.log(0.05), np.log(2))),
            np.exp(rng.uniform(np.log(0.3), np.log(4))),
            rng.uniform(n / 2, n), np.exp(rng.uniform(np.log(0.05), np.log(2))),
            np.exp(rng.uniform(np.log(0.3), np.log(4))),
        ]))
    return _fit_generic(x, klosterman_curve, starts, "klosterman")


FIT_FUNS = {
    "gu": fit_gu,
    "klosterman": fit_klosterman,
    "beck": fit_beck,
    "elmore": fit_elmore,
    "no": fake_fit,
}


def fit_with_fallback(x, methods=("gu", "klosterman")):
    """Reference retry chain (fit_curve.R:149-156): try each method in order;
    success = fit did not error AND predicted is not all-NA."""
    if isinstance(methods, str):
        methods = (methods,)
    for m in methods:
        try:
            out = FIT_FUNS[m](x)
        except Exception:  # noqa: BLE001 — mirror R try(silent=TRUE)
            out = None
        if out is not None and not np.all(np.isnan(out["predicted"])):
            return out
    return None
