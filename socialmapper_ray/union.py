"""Exact union of simple polygons (reference A1: ``unary_union``).

Algorithm (classic overlay-by-classification, generic position):

1. collect every edge of every input ring; split each edge at its
   intersections with all edges of OTHER polygons;
2. keep a sub-edge iff its midpoint lies on the union's boundary —
   i.e. the midpoint is not strictly interior to any other polygon
   (even-odd over that polygon's rings);
3. stitch kept sub-edges into closed rings by walking endpoint
   adjacency (in generic position every stitch vertex has degree 2);
4. classify rings: a ring contained in an odd number of other output
   rings is a hole.

Float robustness: exact for inputs in generic position (no shared
vertices / collinear overlapping edges / tangencies). Degenerate
configurations may fail to stitch — detected and raised, never
silently wrong. The synthetic worlds generate generic-position
polygons; the engine's PIP join deliberately avoids union entirely
(SURVEY.md §2.5 A1), so this operator exists for the export-shaped
uses the reference has (isochrone union before display/query).
"""

from __future__ import annotations

import numpy as np

from . import geom


def _rings_of(poly: np.ndarray) -> list[np.ndarray]:
    p = np.asarray(poly, dtype=np.float64)
    if len(p) > 1 and np.array_equal(p[0], p[-1]):
        p = p[:-1]
    return [p]


def _edges(rings: list[np.ndarray]) -> np.ndarray:
    """(m, 4) array of segments x1,y1,x2,y2 over closed rings."""
    segs = []
    for r in rings:
        nxt = np.roll(np.arange(len(r)), -1)
        segs.append(np.column_stack([r, r[nxt]]))
    return np.vstack(segs)


def _seg_intersections(seg: np.ndarray, others: np.ndarray) -> np.ndarray:
    """Parameters t in (0,1) where ``seg`` crosses any of ``others``."""
    p = seg[:2]
    r = seg[2:] - seg[:2]
    q = others[:, :2]
    s = others[:, 2:] - others[:, :2]
    rxs = r[0] * s[:, 1] - r[1] * s[:, 0]
    qp = q - p
    qpxs = qp[:, 0] * s[:, 1] - qp[:, 1] * s[:, 0]
    qpxr = qp[:, 0] * r[1] - qp[:, 1] * r[0]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = qpxs / rxs
        u = qpxr / rxs
    ok = (rxs != 0) & (t > 0) & (t < 1) & (u > 0) & (u < 1)
    return np.sort(t[ok])


def _point_in_rings(px: float, py: float, rings: list[np.ndarray]) -> bool:
    """Even-odd containment of a point in a ring set."""
    inside = False
    for r in rings:
        x, y = r[:, 0], r[:, 1]
        x2, y2 = np.roll(x, -1), np.roll(y, -1)
        cond = (y > py) != (y2 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x + (py - y) * (x2 - x) / (y2 - y)
        inside ^= bool((cond & (px < xint)).sum() % 2)
    return inside


def polygon_union(polys: list[np.ndarray], eps: float = 1e-12):
    """Union of simple polygons -> (rings, is_hole flags).

    Returns a list of (n_i, 2) rings (unclosed) plus a parallel bool
    list marking holes. Raises ValueError on non-generic inputs whose
    boundary cannot be stitched.
    """
    ring_sets = [_rings_of(p) for p in polys]
    edge_sets = [_edges(rs) for rs in ring_sets]

    # 1+2: subdivide and classify
    kept: list[tuple[tuple, tuple]] = []
    for i, edges in enumerate(edge_sets):
        others = [edge_sets[j] for j in range(len(polys)) if j != i]
        other_all = np.vstack(others) if others else np.empty((0, 4))
        for seg in edges:
            ts = _seg_intersections(seg, other_all) if len(other_all) else \
                np.empty(0)
            cuts = np.concatenate([[0.0], ts, [1.0]])
            p0 = seg[:2]
            d = seg[2:] - seg[:2]
            for a, b in zip(cuts[:-1], cuts[1:]):
                if b - a < eps:
                    continue
                mid = p0 + d * ((a + b) / 2.0)
                interior = any(
                    _point_in_rings(mid[0], mid[1], ring_sets[j])
                    for j in range(len(polys)) if j != i)
                if not interior:
                    s = p0 + d * a
                    e = p0 + d * b
                    kept.append((tuple(np.round(s, 9)),
                                 tuple(np.round(e, 9))))

    # 3: stitch rings by endpoint adjacency
    nxt: dict[tuple, list[tuple]] = {}
    for s, e in kept:
        nxt.setdefault(s, []).append(e)
    rings_out: list[np.ndarray] = []
    visited: set[tuple[tuple, tuple]] = set()
    for s, e in kept:
        if (s, e) in visited:
            continue
        ring = [s]
        cur = e
        visited.add((s, e))
        guard = 0
        while cur != s:
            ring.append(cur)
            outs = [t for t in nxt.get(cur, []) if (cur, t) not in visited]
            if not outs:
                raise ValueError(
                    "cannot stitch union boundary (degenerate input: "
                    "shared vertices / collinear edges?)")
            t = outs[0]
            visited.add((cur, t))
            cur = t
            guard += 1
            if guard > len(kept) + 1:
                raise ValueError("stitching did not terminate")
        rings_out.append(np.asarray(ring, dtype=np.float64))

    # 4: hole classification by even-odd nesting among output rings
    is_hole = []
    for k, r in enumerate(rings_out):
        probe = r.mean(axis=0)  # not guaranteed interior; use edge midpoint
        probe = (r[0] + r[1]) / 2.0
        depth = 0
        for j, other in enumerate(rings_out):
            if j == k:
                continue
            if _point_in_rings(probe[0], probe[1], [other]):
                depth += 1
        is_hole.append(depth % 2 == 1)
    return rings_out, is_hole


def union_area(polys: list[np.ndarray]) -> float:
    """Exact union area via ring signed areas (holes subtract)."""
    rings, holes = polygon_union(polys)
    total = 0.0
    for r, h in zip(rings, holes):
        x, y = r[:, 0], r[:, 1]
        a = abs((x * np.roll(y, -1) - np.roll(x, -1) * y).sum()) / 2.0
        total += -a if h else a
    return total
