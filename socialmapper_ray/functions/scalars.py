"""Scalar column functions (GEOID slicing, units, scrubbing, slugs).

Vectorized pyarrow.compute / numpy ports of the reference's scalar
helpers (SURVEY.md §2.8):

- GEOID component extraction — string slicing state/county/tract/bg
  (reference export/preparation.py:17-69, constants.py:162-167).
- km <-> miles (reference distance/__init__.py:176-178, ``* 0.621371``).
- census sentinel scrubbing (reference
  census/services/census_service.py:262-278).
- slug normalization (reference pipeline/extraction.py:318-326).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

KM_TO_MILES = 0.621371

SENTINEL_VALUES = (-999999999.0, -888888888.0, -666666666.0, -555555555.0,
                   -222222222.0)


def geoid_components(tbl: pa.Table, geoid_col: str = "zone_id") -> pa.Table:
    """Append state_fips / county_fips / tract / block_group columns
    sliced from the 12-char GEOID (state 2 + county 3 + tract 6 + bg 1)."""
    g = tbl[geoid_col]
    tbl = tbl.append_column("state_fips", pc.utf8_slice_codeunits(g, 0, 2))
    tbl = tbl.append_column("county_fips", pc.utf8_slice_codeunits(g, 2, 5))
    tbl = tbl.append_column("tract", pc.utf8_slice_codeunits(g, 5, 11))
    tbl = tbl.append_column("block_group", pc.utf8_slice_codeunits(g, 11, 12))
    return tbl


def km_to_miles(arr: pa.ChunkedArray | pa.Array):
    return pc.multiply(arr, pa.scalar(KM_TO_MILES))


def scrub_sentinels(arr: pa.ChunkedArray | pa.Array,
                    sentinels=SENTINEL_VALUES):
    """Replace sentinel placeholder values (and negative monetary values
    below -100000) with NULL."""
    is_sent = pc.is_in(arr, value_set=pa.array(sentinels, pa.float64()))
    too_neg = pc.less(arr, pa.scalar(-100000.0))
    bad = pc.or_kleene(is_sent, too_neg)
    return pc.if_else(bad, pa.scalar(None, pa.float64()), arr)


def slugify(arr: pa.ChunkedArray | pa.Array):
    """lower + spaces->underscores (filename/label normalizer)."""
    out = pc.utf8_lower(arr)
    out = pc.replace_substring(out, " ", "_")
    out = pc.replace_substring(out, "-", "_")
    return out


# Hardcoded per-state bboxes in the reference (M3,
# query/__init__.py:222-246); here a deterministic bbox per synthetic
# state derived from its fips ordinal (same shape of lookup).
def state_bbox(state_fips: str) -> tuple[float, float, float, float]:
    s = int(state_fips)
    lat0 = 25.0 + (s % 10) * 2.4
    lon0 = -124.0 + (s // 10) * 11.0
    return (lat0, lat0 + 2.4, lon0, lon0 + 11.0)


def filter_state_bounds(tbl: pa.Table, state_fips: str,
                        lat_col: str = "lat", lon_col: str = "lon"):
    """Drop rows outside the state's bbox (M3 state-bounds filter)."""
    lat_min, lat_max, lon_min, lon_max = state_bbox(state_fips)
    m = pc.and_(
        pc.and_(pc.greater_equal(tbl[lat_col], lat_min),
                pc.less_equal(tbl[lat_col], lat_max)),
        pc.and_(pc.greater_equal(tbl[lon_col], lon_min),
                pc.less_equal(tbl[lon_col], lon_max)))
    return tbl.filter(m)


def optimize_dtypes(df, category_threshold: float = 0.5):
    """M10 dtype optimizer (reference streaming.py:432-456,
    geoparquet.py:75-97): downcast int64/float64, object->category when
    under the uniqueness threshold. pandas in/out for map_batches."""
    import numpy as np
    import pandas as pd

    out = df.copy()
    for c in out.columns:
        s = out[c]
        if s.dtype == np.int64:
            out[c] = pd.to_numeric(s, downcast="integer")
        elif s.dtype == np.float64:
            out[c] = pd.to_numeric(s, downcast="float")
        elif s.dtype == object and len(s) and \
                s.nunique(dropna=True) / max(len(s), 1) < category_threshold:
            out[c] = s.astype("category")
    return out
