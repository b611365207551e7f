"""Choropleth rasterization (reference K6: visualization/chloropleth.py
render + save) — PNG codec round-trip, analytic fill counts,
strip-parallel equivalence, end-to-end determinism."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from socialmapper_ray import geom
from socialmapper_ray.stages import raster

RNG = np.random.default_rng(21)


def test_png_roundtrip_random():
    img = RNG.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)
    buf = raster.png_encode(img)
    assert buf[:8] == b"\x89PNG\r\n\x1a\n"
    back = raster.png_decode(buf)
    assert np.array_equal(img, back)


def test_png_encode_deterministic():
    img = RNG.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    assert raster.png_encode(img) == raster.png_encode(img)


def test_class_colors_mapping():
    cols = raster.class_colors(np.asarray([0, 1, 5, 3, -7, 99]))
    assert np.array_equal(cols[0], raster.MISSING_RGB)
    assert np.array_equal(cols[1], raster.PALETTE_YLORBR[0])
    assert np.array_equal(cols[2], raster.PALETTE_YLORBR[4])
    assert np.array_equal(cols[3], raster.PALETTE_YLORBR[2])
    # out-of-range labels fall back to missing
    assert np.array_equal(cols[4], raster.MISSING_RGB)
    assert np.array_equal(cols[5], raster.MISSING_RGB)


def test_render_analytic_half_fill(ray_session):
    """A square zone covering the left half of the bbox fills exactly
    half the pixels (pixel centers never sit on the boundary when the
    split is between pixel columns)."""
    w = h = 32
    half = geom.PolygonSet([np.array(
        [[0.0, 0.0], [0.5, 0.0], [0.5, 1.0], [0.0, 1.0]])])
    colors = np.asarray([[10, 20, 30]], dtype=np.uint8)
    img = raster.render_zones(half, colors, width=w, height=h,
                              bbox=(0.0, 0.0, 1.0, 1.0), strip_h=8)
    inside = (img == colors[0]).all(axis=2)
    assert inside.sum() == w * h // 2
    assert inside[:, : w // 2].all()
    assert (img[:, w // 2:] == raster.BACKGROUND_RGB).all()


def test_render_overlap_first_zone_wins(ray_session):
    sq = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    ps = geom.PolygonSet([sq, sq])  # identical, different colors
    colors = np.asarray([[1, 2, 3], [7, 8, 9]], dtype=np.uint8)
    img = raster.render_zones(ps, colors, width=8, height=8,
                              bbox=(0.0, 0.0, 1.0, 1.0), strip_h=4)
    assert (img == colors[0]).all()


def test_strip_parallel_equals_single_strip(ray_session):
    polys = [geom.regular_polygon(RNG.uniform(0.2, 0.8),
                                  RNG.uniform(0.2, 0.8), 0.15, 12)
             for _ in range(6)]
    ps = geom.PolygonSet(polys)
    colors = RNG.integers(0, 256, size=(6, 3), dtype=np.uint8)
    kw = dict(width=64, height=64, bbox=(0.0, 0.0, 1.0, 1.0))
    a = raster.render_zones(ps, colors, strip_h=64, **kw)   # one strip
    b = raster.render_zones(ps, colors, strip_h=7, **kw)    # ragged many
    assert np.array_equal(a, b)


def test_choropleth_raster_end_to_end(ray_session):
    """Full K6 pipeline at sf0.001: histogram accounts for every pixel,
    all 5 classes + background appear, and the run is deterministic."""
    from socialmapper_ray.pipelines import spatial as sp

    out1 = sp.choropleth_raster_q("/root/testdata/sf0.001",
                                  width=96, height=96)
    out2 = sp.choropleth_raster_q("/root/testdata/sf0.001",
                                  width=96, height=96)
    pd.testing.assert_frame_equal(
        out1.reset_index(drop=True), out2.reset_index(drop=True))
    assert out1["n_pixels"].sum() == 96 * 96
    got_classes = set(out1["class"])
    assert -1 in got_classes                      # background present
    assert {1, 2, 3, 4, 5} <= got_classes         # all quantile bins
    assert (out1["png_bytes"] > 100).all()
