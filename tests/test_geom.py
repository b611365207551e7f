"""Geometry kernel tests: PIP dual oracle (vectorized vs scalar),
WKB roundtrip, hull/centroid/simplify sanity, haversine golden values."""

from __future__ import annotations

import numpy as np
import pytest

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


def test_from_wkb_arrow_matches_loop_decoder():
    """The vectorized Arrow-buffer WKB decoder is exactly equal to the
    per-blob loop decoder — including closing-vertex handling, padding,
    bbox, 1-vertex degenerate rings, and sliced (offset != 0) arrays."""
    import struct

    import pyarrow as pa

    polys = [
        np.array([[0.0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]),  # closed
        np.array([[2.0, 2], [3, 2], [2, 3]]),                  # open
        RNG.uniform(-10, 10, (37, 2)),
    ]
    blobs = [geom.wkb_polygon(p) for p in polys]
    # hand-built 1-vertex ring (wkb_polygon would auto-close it)
    blobs.append(struct.pack("<BIII", 1, 3, 1, 1)
                 + np.array([[5.0, 5.0]], "<f8").tobytes())
    a = geom.PolygonSet.from_wkb(blobs)
    b = geom.PolygonSet.from_wkb_arrow(pa.array(blobs, pa.binary()))
    assert np.array_equal(a.verts, b.verts)
    assert np.array_equal(a.nv, b.nv)
    assert np.array_equal(a.bbox, b.bbox)
    # sliced array: nonzero arr.offset must not shift the decode
    sl = pa.array(blobs, pa.binary()).slice(1)
    c = geom.PolygonSet.from_wkb_arrow(sl)
    a1 = geom.PolygonSet.from_wkb(blobs[1:])
    assert np.array_equal(a1.verts, c.verts)
    # large_binary input path
    d = geom.PolygonSet.from_wkb_arrow(pa.array(blobs, pa.large_binary()))
    assert np.array_equal(a.verts, d.verts)
    # empty input
    e = geom.PolygonSet.from_wkb_arrow(pa.array([], pa.binary()))
    assert len(e) == 0


def test_from_wkb_arrow_rejects_garbage():
    import struct

    import pyarrow as pa

    pt = geom.wkb_point(1.0, 2.0)
    with pytest.raises(ValueError, match="non-polygon"):
        geom.PolygonSet.from_wkb_arrow(pa.array([pt], pa.binary()))
    trunc = struct.pack("<BIII", 1, 3, 1, 9) + b"\x00" * 16
    with pytest.raises(ValueError, match="truncated"):
        geom.PolygonSet.from_wkb_arrow(pa.array([trunc], pa.binary()))


def test_polygonset_take_equals_rebuild():
    polys = [RNG.uniform(-5, 5, (n, 2)) for n in (3, 8, 5, 12)]
    ps = geom.PolygonSet(polys)
    sub = ps.take([2, 0])
    rebuilt = geom.PolygonSet([polys[2], polys[0]])
    # padding width may differ; the live verts + bbox must agree
    for row, src in enumerate((2, 0)):
        nv = rebuilt.nv[row]
        assert sub.nv[row] == nv
        assert np.array_equal(sub.verts[row, :nv], rebuilt.verts[row, :nv])
    assert np.array_equal(sub.bbox, rebuilt.bbox)
    # PIP behavior identical despite wider padding
    pts = RNG.uniform(-5, 5, (500, 2))
    pair_pt = np.tile(np.arange(500), 2)
    pair_poly = np.repeat(np.arange(2), 500)
    m1 = geom.points_in_polygons(pts[:, 0], pts[:, 1], sub,
                                 pair_pt, pair_poly)
    m2 = geom.points_in_polygons(pts[:, 0], pts[:, 1], rebuilt,
                                 pair_pt, pair_poly)
    assert np.array_equal(m1, m2)


def _mixed_real_geometry_blobs():
    """Donut, two-hole polygon, MultiPolygon (one part holed), plain
    triangle — the real-geometry shapes of census zone tables."""
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    hole = np.array([[3, 3], [7, 3], [7, 7], [3, 7]], float)
    h1 = np.array([[1, 1], [2, 1], [2, 2], [1, 2]], float)
    h2 = np.array([[8, 8], [9, 8], [9, 9], [8, 9]], float)
    p1 = np.array([[20, 0], [24, 0], [24, 4], [20, 4]], float)
    p2o = np.array([[30, 0], [40, 0], [40, 10], [30, 10]], float)
    p2h = np.array([[33, 3], [37, 3], [37, 7], [33, 7]], float)
    tri = np.array([[50, 0], [60, 0], [55, 8]], float)
    return [
        geom.wkb_polygon(outer, holes=[hole]),
        geom.wkb_polygon(outer, holes=[h1, h2]),
        geom.wkb_multipolygon([p1, (p2o, [p2h])]),
        geom.wkb_polygon(tri),
    ]


def test_multi_ring_wkb_decodes_and_contains():
    """Polygons with holes and MultiPolygons decode in BOTH paths
    (scalar == vectorized, including parity-sequence layout) and the
    UNCHANGED crossing-parity PIP kernel gives even-odd containment:
    hole-interior points are OUT, each disjoint part is IN."""
    import pyarrow as pa

    blobs = _mixed_real_geometry_blobs()
    a = geom.PolygonSet.from_wkb(blobs)
    b = geom.PolygonSet.from_wkb_arrow(pa.array(blobs, pa.binary()))
    assert np.array_equal(a.verts, b.verts)
    assert np.array_equal(a.nv, b.nv)
    assert np.array_equal(a.bbox, b.bbox)
    # mixed with single-ring forces the general wave path for all rows;
    # sliced array offset must still decode correctly
    sl = pa.array(blobs, pa.binary()).slice(1)
    c = geom.PolygonSet.from_wkb_arrow(sl)
    a1 = geom.PolygonSet.from_wkb(blobs[1:])
    assert np.array_equal(a1.verts, c.verts)

    idx = geom.GridIndex(b, bin_deg=2.0)
    pts = np.array([
        [5.0, 1.0],    # donut ring area        -> in 0 (and 1)
        [5.0, 5.0],    # donut hole             -> out of 0, in 1
        [1.5, 1.5],    # two-hole poly hole 1   -> out of 1, in 0
        [22.0, 2.0],   # multi part 1           -> in 2
        [35.0, 5.0],   # multi part 2's hole    -> out
        [31.0, 1.0],   # multi part 2 ring area -> in 2
        [55.0, 3.0],   # triangle               -> in 3
        [15.0, 5.0],   # nowhere
    ])
    pt, poly = idx.query(pts[:, 0], pts[:, 1])
    got = sorted(zip(pt.tolist(), poly.tolist()))
    assert got == [(0, 0), (0, 1), (1, 1), (2, 0), (3, 2), (5, 2),
                   (6, 3)]


def test_multi_ring_parity_vs_per_ring_reference():
    """2000 random probes x mixed shapes: the parity-sequence kernel
    equals a brute per-ring even-odd reference on every pair."""
    import pyarrow as pa

    blobs = _mixed_real_geometry_blobs()
    ps = geom.PolygonSet.from_wkb_arrow(pa.array(blobs, pa.binary()))
    rings_by_blob = [geom.wkb_decode_rings(bl)[1] for bl in blobs]
    m = len(ps)
    rnd = np.column_stack([RNG.uniform(-2, 62, 2000),
                           RNG.uniform(-2, 12, 2000)])
    pp = np.repeat(np.arange(len(rnd)), m)
    pz = np.tile(np.arange(m), len(rnd))
    mask = geom.points_in_polygons(rnd[:, 0], rnd[:, 1], ps, pp,
                                   pz).reshape(len(rnd), m)

    def ring_parity(p, rings):
        cnt = 0
        for r in rings:
            r = np.asarray(r, float)
            if len(r) > 1 and (r[0] == r[-1]).all():
                r = r[:-1]
            k = len(r)
            for i in range(k):
                x1, y1 = r[i]
                x2, y2 = r[(i + 1) % k]
                if (y1 > p[1]) != (y2 > p[1]):
                    if p[0] < x1 + (p[1] - y1) * (x2 - x1) / (y2 - y1):
                        cnt ^= 1
        return cnt

    for j in range(m):
        ref = np.array([ring_parity(p, rings_by_blob[j]) for p in rnd],
                       bool)
        assert np.array_equal(mask[:, j], ref), f"poly {j}"


def test_zero_ring_wkb_rejected_both_decoders():
    import struct

    import pyarrow as pa

    empty = struct.pack("<BII", 1, 3, 0)
    with pytest.raises(ValueError, match="ring"):
        geom.wkb_decode(empty)
    with pytest.raises(ValueError, match="ring"):
        geom.PolygonSet.from_wkb_arrow(pa.array([empty], pa.binary()))
    # an empty ring inside an otherwise-valid donut is refused too
    outer = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)
    bad = (struct.pack("<BII", 1, 3, 2)
           + struct.pack("<I", len(outer)) + outer.astype("<f8").tobytes()
           + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="ring"):
        geom.PolygonSet.from_wkb_arrow(pa.array([bad], pa.binary()))
