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
