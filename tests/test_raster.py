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


# ---------------------------------------------------------------------------
# Full baseline decoder: all five scanline filters, RGB + RGBA
# ---------------------------------------------------------------------------

def _apply_filter(ft: int, row: np.ndarray, prev: np.ndarray,
                  bpp: int) -> np.ndarray:
    """Reference ENCODE-side filter (RFC 2083 §6.2-6.6) as int arrays."""
    r = row.astype(np.int64)
    p = prev.astype(np.int64)
    left = np.concatenate([np.zeros(bpp, dtype=np.int64), r[:-bpp]])
    upleft = np.concatenate([np.zeros(bpp, dtype=np.int64), p[:-bpp]])
    if ft == 0:
        out = r
    elif ft == 1:
        out = r - left
    elif ft == 2:
        out = r - p
    elif ft == 3:
        out = r - (left + p) // 2
    elif ft == 4:
        est = left + p - upleft
        pa, pb, pc = (np.abs(est - left), np.abs(est - p),
                      np.abs(est - upleft))
        pred = np.where((pa <= pb) & (pa <= pc), left,
                        np.where(pb <= pc, p, upleft))
        out = r - pred
    return (out % 256).astype(np.uint8)


def _encode_with_filters(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Hand-rolled PNG with a chosen filter type per scanline."""
    import struct
    import zlib

    h, w, ch = img.shape
    bpp = ch
    flat = img.reshape(h, w * ch)
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for r in range(h):
        ft = ftypes[r % len(ftypes)]
        raw.append(ft)
        raw.extend(_apply_filter(ft, flat[r], prev, bpp).tobytes())
        prev = flat[r]
    comp = zlib.compress(bytes(raw), 6)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ctype = 2 if ch == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", comp) + chunk(b"IEND", b""))


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_png_decode_each_filter(ft):
    img = RNG.integers(0, 256, size=(11, 17, 3), dtype=np.uint8)
    buf = _encode_with_filters(img, [ft])
    assert np.array_equal(raster.png_decode(buf), img)


def test_png_decode_mixed_filters_rgba():
    img = RNG.integers(0, 256, size=(13, 9, 4), dtype=np.uint8)
    buf = _encode_with_filters(img, [0, 1, 2, 3, 4])
    assert np.array_equal(raster.png_decode(buf), img)


def test_png_decode_rejects_unsupported():
    import struct
    import zlib

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr16 = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    bad = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="unsupported"):
        raster.png_decode(bad)
    with pytest.raises(ValueError, match="not a PNG"):
        raster.png_decode(b"JFIF....")


# ---------------------------------------------------------------------------
# Annotation compositing (title + classed legend, bitmap font)
# ---------------------------------------------------------------------------

def test_annotate_choropleth_golden_hash():
    """Byte-deterministic legend/title compositing: fixed input ->
    pinned PNG sha256 (re-pin deliberately if the font or layout
    changes)."""
    import hashlib

    img = np.full((120, 220, 3), 255, np.uint8)
    img[40:80, 60:160] = raster.PALETTE_YLORBR[2]
    out = raster.annotate_choropleth(
        img, "TEST MAP 0123456789",
        [("Q1 (LOW)", tuple(raster.PALETTE_YLORBR[0])),
         ("Q5 (HIGH)", tuple(raster.PALETTE_YLORBR[4])),
         ("MISSING", tuple(raster.MISSING_RGB))])
    # input untouched (annotate returns a copy)
    assert (img[0:10, 0:10] == 255).all()
    png = raster.png_encode(out)
    digest = hashlib.sha256(png).hexdigest()
    assert raster.png_decode(png).shape == (120, 220, 3)
    assert digest == GOLDEN_ANNOTATED_SHA256


GOLDEN_ANNOTATED_SHA256 = \
    "624fdfbc75f5292bf9efff51d725c8cf3683664fe43fb48bde57ad8f1a4367c8"


def test_draw_text_clips_and_advances():
    img = np.full((10, 20, 3), 255, np.uint8)
    # text larger than the image must clip, not raise
    x_end = raster.draw_text(img, 2, 2, "WWWW", scale=3)
    assert x_end == 2 + 4 * 6 * 3
    assert (img != 255).any()
