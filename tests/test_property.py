"""Hypothesis property tests for the deterministic kernels."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from socialmapper_ray import geom, tiles
from socialmapper_ray.functions import crs

lat_s = st.floats(min_value=-84.9, max_value=84.9, allow_nan=False)
lon_s = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False)


@settings(max_examples=200, deadline=None)
@given(lat=lat_s, lon=lon_s, res=st.integers(min_value=1, max_value=20))
def test_quadcell_hierarchy_property(lat, lon, res):
    child = tiles.quadcell(lat, lon, res)
    for parent_res in range(0, res):
        parent = tiles.quadcell(lat, lon, parent_res)
        assert tiles.quad_parent(child, parent_res) == parent
        assert bool(tiles.quad_contains(parent, child))


@settings(max_examples=200, deadline=None)
@given(lat=lat_s, lon=lon_s)
def test_webmercator_roundtrip_property(lat, lon):
    la, lo = crs.from_web_mercator(*crs.to_web_mercator(lat, lon))
    assert abs(float(la) - lat) < 1e-7
    assert abs(float(lo) - lon) < 1e-7


@settings(max_examples=100, deadline=None)
@given(cx=st.floats(-50, 50), cy=st.floats(-50, 50),
       r=st.floats(0.1, 5.0), n=st.integers(3, 16),
       px=st.floats(-60, 60), py=st.floats(-60, 60))
def test_pip_agrees_with_scalar_property(cx, cy, r, n, px, py):
    poly = geom.regular_polygon(cy, cx, r, n)
    ps = geom.PolygonSet([poly])
    got = geom.points_in_polygons(np.asarray([px]), np.asarray([py]), ps,
                                  np.asarray([0]), np.asarray([0]))[0]
    inside = False
    for k in range(n):
        x1, y1 = poly[k]
        x2, y2 = poly[(k + 1) % n]
        if (y1 > py) != (y2 > py):
            if px < x1 + (py - y1) * (x2 - x1) / (y2 - y1):
                inside = not inside
    assert bool(got) == inside


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.floats(-100, 100), st.floats(-100, 100)),
                min_size=3, max_size=30, unique=True))
def test_wkb_roundtrip_property(coords):
    arr = np.asarray(coords, dtype=np.float64)
    kind, back = geom.wkb_decode(geom.wkb_polygon(arr))
    assert kind == "polygon"
    assert np.array_equal(back[:-1], arr)


def test_connected_components_known_graph():
    import pandas as pd

    from socialmapper_ray.stages.dedup import connected_components

    nodes = np.arange(10)
    pairs = pd.DataFrame({"a": [0, 1, 5, 6, 7], "b": [1, 2, 6, 7, 8]})
    comp = connected_components(pairs, nodes).set_index("node")["component"]
    assert comp[0] == comp[1] == comp[2] == 0
    assert comp[5] == comp[6] == comp[7] == comp[8] == 5
    for lone in (3, 4, 9):
        assert comp[lone] == lone
