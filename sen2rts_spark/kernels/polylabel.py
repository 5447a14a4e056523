"""Pole of inaccessibility (visual center) of a polygon.

Re-creates ``st_poi()`` (/root/reference/R/st_poi.R:19-47), which wraps
``polylabelr::poi()`` — the quadtree "polylabel" algorithm published by
Mapbox (Agafonkin 2016): refine a priority queue of square cells by the
upper bound ``signed_dist(center) + h·√2`` until the best cell's potential
improvement falls below ``precision``. Implemented from the published
algorithm description on numpy ring arrays (no geometry library in this
container).

A polygon is ``rings``: a list of (k_i, 2) float arrays — exterior first,
holes after, closed or open (the closing edge is implied). Signed distance
is positive inside, negative outside; both the inside test (even-odd ray
cast over ALL rings) and the min edge distance run vectorized over every
edge of every ring.
"""

from __future__ import annotations

import heapq
import itertools
import math

import numpy as np

__all__ = ["poi", "polygon_area", "parse_wkt_polygon"]


def _ring_edges(rings):
    """Stack every ring's edges into (a, b) arrays of shape (n_edges, 2)."""
    aa, bb = [], []
    for r in rings:
        r = np.asarray(r, dtype=np.float64)
        if len(r) >= 2 and np.array_equal(r[0], r[-1]):
            r = r[:-1]
        if len(r) < 3:
            continue
        aa.append(r)
        bb.append(np.roll(r, -1, axis=0))
    if not aa:
        raise ValueError("polygon has no ring with >= 3 points")
    return np.concatenate(aa), np.concatenate(bb)


def _signed_dist(x: float, y: float, a: np.ndarray, b: np.ndarray) -> float:
    """Distance from (x, y) to the nearest edge, negated when outside."""
    p = np.array([x, y])
    ab = b - a
    ap = p - a
    denom = np.einsum("ij,ij->i", ab, ab)
    t = np.clip(np.einsum("ij,ij->i", ap, ab) / np.where(denom == 0, 1, denom),
                0.0, 1.0)
    closest = a + t[:, None] * ab
    d2 = np.einsum("ij,ij->i", p - closest, p - closest)
    dist = math.sqrt(float(d2.min()))
    # even-odd rule over all rings' edges (holes flip parity naturally)
    ay, by = a[:, 1], b[:, 1]
    cond = (ay > y) != (by > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = a[:, 0] + (y - ay) / (by - ay) * (b[:, 0] - a[:, 0])
    inside = bool(np.count_nonzero(cond & (x < xint)) % 2)
    return dist if inside else -dist


def polygon_area(rings) -> float:
    """Absolute shoelace area: |exterior| − Σ|holes| (holes subtract)."""
    total = 0.0
    for i, r in enumerate(rings):
        r = np.asarray(r, dtype=np.float64)
        if len(r) >= 2 and np.array_equal(r[0], r[-1]):
            r = r[:-1]
        if len(r) < 3:
            continue
        x, y = r[:, 0], r[:, 1]
        a = abs(float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))) / 2
        total += a if i == 0 else -a
    return total


def poi(rings, precision: float | None = None):
    """(x, y, dist) of the pole of inaccessibility.

    ``precision`` defaults to 1/1000 of the side of the equivalent-area
    square, mirroring st_poi.R:25-27 (there the mean over the dataset; for a
    single polygon the two coincide).
    """
    a, b = _ring_edges(rings)
    if precision is None:
        precision = math.sqrt(max(polygon_area(rings), 0.0)) / 1e3 or 1e-12
    minx, miny = a.min(axis=0)
    maxx, maxy = a.max(axis=0)
    width, height = maxx - minx, maxy - miny
    cell = min(width, height)
    if cell == 0:
        return float(minx), float(miny), 0.0
    h = cell / 2

    counter = itertools.count()  # tie-break: heapq must never compare cells

    def mk(cx, cy, half):
        d = _signed_dist(cx, cy, a, b)
        return (-(d + half * math.sqrt(2)), next(counter), cx, cy, half, d)

    heap = []
    x = minx
    while x < maxx:
        y = miny
        while y < maxy:
            heapq.heappush(heap, mk(x + h, y + h, h))
            y += cell
        x += cell

    # seeds: centroid + bbox center (the published algorithm's starting best)
    cx = float(a[:, 0].mean())
    cy = float(a[:, 1].mean())
    best = mk(cx, cy, 0)
    cand = mk(minx + width / 2, miny + height / 2, 0)
    if cand[5] > best[5]:
        best = cand

    while heap:
        cell_t = heapq.heappop(heap)
        neg_pot, _, cx, cy, half, d = cell_t
        if d > best[5]:
            best = cell_t
        if -neg_pot - best[5] <= precision:
            continue
        q = half / 2
        for dx in (-q, q):
            for dy in (-q, q):
                heapq.heappush(heap, mk(cx + dx, cy + dy, q))
    return float(best[2]), float(best[3]), float(best[5])


def parse_wkt_polygon(wkt: str):
    """Minimal WKT POLYGON ((x y, ...), (...)) → list of ring arrays."""
    s = wkt.strip()
    if not s.upper().startswith("POLYGON"):
        raise ValueError(f"not a POLYGON wkt: {s[:30]}")
    body = s[s.index("("):].strip()
    assert body[0] == "(" and body[-1] == ")"
    body = body[1:-1]
    rings, depth, start = [], 0, None
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                pts = [tuple(map(float, p.split()))
                       for p in body[start:i].split(",")]
                rings.append(np.array(pts, dtype=np.float64))
    if not rings:
        raise ValueError("empty POLYGON")
    return rings
