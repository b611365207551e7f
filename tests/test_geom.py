"""Geometry kernel tests: PIP dual oracle (vectorized vs scalar),
WKB roundtrip, hull/centroid/simplify sanity, haversine golden values."""

from __future__ import annotations

import numpy as np

from socialmapper_ray import geom

RNG = np.random.default_rng(7)


def _scalar_pip(px, py, poly):
    """Independent scalar crossing-number implementation."""
    inside = False
    n = len(poly)
    for k in range(n):
        x1, y1 = poly[k]
        x2, y2 = poly[(k + 1) % n]
        if (y1 > py) != (y2 > py):
            xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            if px < xint:
                inside = not inside
    return inside


def _random_polys(n):
    polys = []
    for _ in range(n):
        cx, cy = RNG.uniform(-50, 50, 2)
        nv = int(RNG.integers(3, 12))
        r = RNG.uniform(0.5, 3.0)
        polys.append(geom.regular_polygon(cy, cx, r, nv,
                                          phase=float(RNG.uniform(0, 6)),
                                          flatten=float(RNG.uniform(0.5, 1.5))))
    return polys


def test_pip_matches_scalar():
    polys = _random_polys(40)
    ps = geom.PolygonSet(polys)
    px = RNG.uniform(-55, 55, 300)
    py = RNG.uniform(-55, 55, 300)
    pair_pt = np.repeat(np.arange(300), len(polys))
    pair_poly = np.tile(np.arange(len(polys)), 300)
    got = geom.points_in_polygons(px, py, ps, pair_pt, pair_poly)
    want = np.asarray([_scalar_pip(px[i], py[i], polys[j])
                       for i, j in zip(pair_pt, pair_poly)])
    assert np.array_equal(got, want)


def test_grid_index_equals_bruteforce():
    polys = _random_polys(60)
    ps = geom.PolygonSet(polys)
    idx = geom.GridIndex(ps, bin_deg=1.0)
    lon = RNG.uniform(-55, 55, 500)
    lat = RNG.uniform(-55, 55, 500)
    pt, pl = idx.query(lon, lat)
    got = set(zip(pt.tolist(), pl.tolist()))
    want = set()
    for i in range(500):
        for j, poly in enumerate(polys):
            if _scalar_pip(lon[i], lat[i], poly):
                want.add((i, j))
    assert got == want


def test_wkb_roundtrip():
    poly = geom.regular_polygon(10.0, 20.0, 1.5, 7)
    blob = geom.wkb_polygon(poly)
    kind, coords = geom.wkb_decode(blob)
    assert kind == "polygon"
    assert np.allclose(coords[:-1], poly)
    assert np.array_equal(coords[0], coords[-1])
    kind, (lon, lat) = geom.wkb_decode(geom.wkb_point(1.5, -2.5))
    assert kind == "point" and (lon, lat) == (1.5, -2.5)


def test_haversine_golden():
    # London -> Paris ~ 343.5 km
    d = geom.haversine_km(51.5074, -0.1278, 48.8566, 2.3522)
    assert abs(d - 343.5) < 1.5
    assert geom.haversine_km(0, 0, 0, 0) == 0.0


def test_centroid_and_hull():
    sq = np.asarray([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=float)
    cx, cy = geom.polygon_centroid(sq)
    assert abs(cx - 1) < 1e-12 and abs(cy - 1) < 1e-12
    pts = RNG.uniform(0, 1, (200, 2))
    hull = geom.convex_hull(pts)
    # all points inside or on hull
    ps = geom.PolygonSet([hull])
    eps = 1e-9
    inner = pts * (1 - eps) + hull.mean(axis=0) * eps
    mask = geom.points_in_polygons(inner[:, 0], inner[:, 1], ps,
                                   np.arange(200), np.zeros(200, dtype=int))
    assert mask.all()


def test_simplify_reduces_vertices():
    ang = np.linspace(0, 2 * np.pi, 200, endpoint=False)
    circle = np.column_stack([np.cos(ang), np.sin(ang)])
    out = geom.simplify_polygon(circle, 0.05)
    assert 4 <= len(out) < 60
    out2 = geom.simplify_polygon(circle, 1e-9)
    assert len(out2) == len(circle)
