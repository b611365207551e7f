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
