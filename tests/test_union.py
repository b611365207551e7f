"""Exact polygon union tests (A1): known shapes, Monte Carlo area
validation, degeneracy detection, Ray stage over the zone table."""

from __future__ import annotations

import numpy as np
import pytest

from socialmapper_ray import geom, union


def sq(x0, y0, s):
    return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s],
                     [x0, y0 + s]], float)


def test_known_cases():
    assert abs(union.union_area([sq(0, 0, 1), sq(5, 5, 1)]) - 2.0) < 1e-9
    assert abs(union.union_area([sq(0, 0, 1), sq(0.5, 0.5, 1)]) - 1.75) < 1e-9
    assert abs(union.union_area([sq(0, 0, 3), sq(1, 1, 1)]) - 9.0) < 1e-9
    # single polygon passes through unchanged
    rings, holes = union.polygon_union([sq(0, 0, 2)])
    assert len(rings) == 1 and holes == [False]


def test_degenerate_inputs_raise():
    # exactly shared collinear edges are out of the generic-position
    # contract and must FAIL LOUDLY, never return a wrong area
    with pytest.raises(ValueError, match="stitch|degenerate"):
        union.polygon_union([sq(0, 0, 1), sq(1.0, 0, 1)])


def test_union_area_matches_monte_carlo():
    rng = np.random.default_rng(17)
    polys = [geom.regular_polygon(float(rng.uniform(0, 4)),
                                  float(rng.uniform(0, 4)),
                                  float(rng.uniform(0.5, 1.2)),
                                  int(rng.integers(3, 9)),
                                  phase=float(rng.uniform(0, 6)))
             for _ in range(8)]
    a = union.union_area(polys)
    pts = rng.uniform(-2, 6, (400_000, 2))
    inside = np.zeros(len(pts), bool)
    for p in polys:
        ps = geom.PolygonSet([p])
        inside |= geom.points_in_polygons(
            pts[:, 0], pts[:, 1], ps,
            np.arange(len(pts)), np.zeros(len(pts), int))
    mc = inside.mean() * 64.0
    assert abs(a - mc) / mc < 0.01


def test_exact_union_stage(ray_session):
    import ray.data as rd

    from socialmapper_ray.sources import synth
    from socialmapper_ray.stages import geometry_ops

    zones = rd.read_parquet(
        synth.table_path("/root/testdata/sf0.001", "zones"),
        columns=["wkb"])
    out = geometry_ops.exact_union(zones).to_pandas()
    assert len(out) == 1
    assert out["n_rings"].iloc[0] >= 1
    assert out["area_e6"].iloc[0] > 0
    # union area cannot exceed the sum of parts, nor be below the max part
    import pyarrow.parquet as pq

    t = pq.read_table(synth.table_path("/root/testdata/sf0.001", "zones"),
                      columns=["wkb"])
    areas = []
    for b in t["wkb"].to_pylist():
        _, c = geom.wkb_decode(b)
        x, y = c[:-1, 0], c[:-1, 1]
        areas.append(abs((x * np.roll(y, -1) - np.roll(x, -1) * y).sum()) / 2)
    total = out["area_e6"].iloc[0] / 1e6
    assert max(areas) <= total <= sum(areas) + 1e-9
