"""Geoparsing: pull (lat, lon, name) out of web-page HTML.

The graft analogue of the reference's POI extraction (S2:
query/__init__.py:193-326 ``format_results`` flattens Overpass
nodes/ways into POI dicts; S1: pipeline/extraction.py:24-202 parses
lat/lon files with column aliases). Here the "source" is the page
itself: a ``geo.position`` <meta> tag or an inline "GPS: lat, lon"
sentence. Both patterns are parsed in one vectorized pass; precedence
is meta > inline (fixed, documented, deterministic).

Coordinates are parsed with ``pd.to_numeric`` (C strtod), so the double
obtained here is bit-identical to DuckDB's CAST of the same string —
the float leg of the byte-identity invariant.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .text import decode_html

_META_RE = r'<meta name="geo\.position" content="(-?\d+\.\d+);(-?\d+\.\d+)">'
_NAME_RE = r'<meta name="geo\.placename" content="([^"]*)">'
_INLINE_RE = r"GPS: (-?\d+\.\d+), (-?\d+\.\d+)"
_TITLE_RE = r"<title>(.*?)</title>"


def geoparse(html: pd.Series) -> pd.DataFrame:
    """html -> DataFrame(lat, lon, name, geo_kind) aligned with input.

    geo_kind in {"meta", "inline", "none"}; lat/lon are NaN for "none".
    """
    s = decode_html(html)
    meta = s.str.extract(_META_RE, flags=re.S)
    inline = s.str.extract(_INLINE_RE, flags=re.S)
    name_meta = s.str.extract(_NAME_RE, flags=re.S, expand=False)
    title = s.str.extract(_TITLE_RE, flags=re.S, expand=False)

    has_meta = meta[0].notna()
    has_inline = inline[0].notna() & ~has_meta

    lat_s = meta[0].where(has_meta, inline[0])
    lon_s = meta[1].where(has_meta, inline[1])
    lat = pd.to_numeric(lat_s, errors="coerce")
    lon = pd.to_numeric(lon_s, errors="coerce")
    kind = np.where(has_meta, "meta", np.where(has_inline, "inline", "none"))
    name = name_meta.where(has_meta & name_meta.notna(), title).fillna("")
    return pd.DataFrame({"lat": lat, "lon": lon, "name": name,
                         "geo_kind": kind}, index=html.index)


def validate_coords(lat: pd.Series, lon: pd.Series) -> pd.Series:
    """Reference M2 bounds check (util/coordinate_validation.py:27-56):
    lat in [-90, 90], lon in [-180, 180], non-null."""
    return (lat.notna() & lon.notna()
            & lat.between(-90.0, 90.0) & lon.between(-180.0, 180.0))


# ---------------------------------------------------------------------------
# Arrow-native kernels (zero pandas round-trip in the extract hot path)
# ---------------------------------------------------------------------------

_META_RE_A = (r'(?s)<meta name="geo\.position" '
              r'content="(?P<glat>-?\d+\.\d+);(?P<glon>-?\d+\.\d+)">')
_INLINE_RE_A = r"(?s)GPS: (?P<ilat>-?\d+\.\d+), (?P<ilon>-?\d+\.\d+)"
_NAME_RE_A = r'(?s)<meta name="geo\.placename" content="(?P<nm>[^"]*)">'
_TITLE_RE_A = r"(?s)<title>(?P<t>.*?)</title>"


def geoparse_arrow(html) -> dict:
    """Arrow-native :func:`geoparse`: html column -> dict of Arrow
    arrays (lat, lon, name, geo_kind), pytest-equal to the pandas
    kernel. RE2 ``extract_regex`` passes + ``if_else`` precedence; the
    string->double cast is correctly-rounded in both Arrow and glibc
    strtod, so the float leg of the byte-identity invariant holds."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .text import decode_html_arrow

    s = decode_html_arrow(html)
    meta = pc.extract_regex(s, _META_RE_A)
    inline = pc.extract_regex(s, _INLINE_RE_A)
    nm = pc.struct_field(pc.extract_regex(s, _NAME_RE_A), "nm")
    title = pc.struct_field(pc.extract_regex(s, _TITLE_RE_A), "t")

    mlat, mlon = pc.struct_field(meta, "glat"), pc.struct_field(meta, "glon")
    ilat, ilon = (pc.struct_field(inline, "ilat"),
                  pc.struct_field(inline, "ilon"))
    has_meta = pc.is_valid(mlat)
    has_inline = pc.and_(pc.is_valid(ilat), pc.invert(has_meta))

    lat = pc.cast(pc.if_else(has_meta, mlat, ilat), pa.float64())
    lon = pc.cast(pc.if_else(has_meta, mlon, ilon), pa.float64())
    kind = pc.if_else(has_meta, pa.scalar("meta"),
                      pc.if_else(has_inline, pa.scalar("inline"),
                                 pa.scalar("none")))
    name = pc.fill_null(
        pc.if_else(pc.and_(has_meta, pc.is_valid(nm)), nm, title), "")
    return {"lat": lat, "lon": lon, "name": name, "geo_kind": kind}


def validate_coords_arrow(lat, lon):
    """Arrow-native :func:`validate_coords` (False where null)."""
    import pyarrow.compute as pc

    ok_lat = pc.and_(pc.greater_equal(lat, -90.0), pc.less_equal(lat, 90.0))
    ok_lon = pc.and_(pc.greater_equal(lon, -180.0),
                     pc.less_equal(lon, 180.0))
    return pc.fill_null(pc.and_(ok_lat, ok_lon), False)
