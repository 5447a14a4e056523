"""Weighted Whittaker-Eilers smoother (Eilers 2003, "A perfect smoother").

Solves (W + λ D'D) z = W y with D the 2nd-difference operator, via a
scipy-free banded Cholesky (the system is pentadiagonal SPD): O(n) per
series, numpy-vectorized inner products. Complements the reference's SG
filter per the north rule (SURVEY §2.10 — not present in the reference,
public-knowledge implementation).
"""

from __future__ import annotations

import numpy as np

__all__ = ["whittaker_smooth"]


def _build_banded(w: np.ndarray, lam: float) -> np.ndarray:
    """Lower-banded representation (3 diagonals) of W + lam * D2'D2."""
    n = len(w)
    # D2'D2 pentadiagonal coefficients
    main = np.full(n, 6.0)
    main[0] = main[-1] = 1.0
    main[1] = main[-2] = 5.0
    off1 = np.full(n - 1, -4.0)
    off1[0] = off1[-1] = -2.0
    off2 = np.full(n - 2, 1.0)
    if n == 1:
        main[:] = 0.0
    elif n == 2:
        main[:] = 1.0
        off1[:] = -1.0
    elif n == 3:
        main[:] = [1.0, 4.0, 1.0]
        off1[:] = [-2.0, -2.0]
    ab = np.zeros((3, n))
    ab[0] = w + lam * main
    ab[1, : n - 1] = lam * off1
    if n > 2:
        ab[2, : n - 2] = lam * off2
    return ab


def _cholesky_banded_solve(ab: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Solve A x = b for SPD banded A (bandwidth 2), in-place Cholesky."""
    n = ab.shape[1]
    L = np.zeros_like(ab)
    for j in range(n):
        s = ab[0, j]
        if j >= 1:
            s -= L[1, j - 1] ** 2
        if j >= 2:
            s -= L[2, j - 2] ** 2
        L[0, j] = np.sqrt(s)
        if j + 1 < n:
            t = ab[1, j]
            if j >= 1:
                t -= L[1, j - 1] * L[2, j - 1]
            L[1, j] = t / L[0, j]
        if j + 2 < n:
            L[2, j] = ab[2, j] / L[0, j]
    # forward substitution L y = b
    y = np.zeros(n)
    for i in range(n):
        s = b[i]
        if i >= 1:
            s -= L[1, i - 1] * y[i - 1]
        if i >= 2:
            s -= L[2, i - 2] * y[i - 2]
        y[i] = s / L[0, i]
    # back substitution L' x = y
    x = np.zeros(n)
    for i in range(n - 1, -1, -1):
        s = y[i]
        if i + 1 < n:
            s -= L[1, i] * x[i + 1]
        if i + 2 < n:
            s -= L[2, i] * x[i + 2]
        x[i] = s / L[0, i]
    return x


def whittaker_smooth(y: np.ndarray, w: np.ndarray | None = None,
                     lam: float = 100.0) -> np.ndarray:
    """Smooth y with weights w (0 = missing) and roughness penalty lam."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if n == 0:
        return y.copy()
    if w is None:
        w = np.ones(n)
    w = np.asarray(w, dtype=np.float64).copy()
    nan = np.isnan(y)
    w[nan] = 0.0
    y = np.where(nan, 0.0, y)
    if n < 3 or not np.any(w > 0):
        return np.where(nan, np.nan, y)
    ab = _build_banded(w, lam)
    return _cholesky_banded_solve(ab, w * y)
