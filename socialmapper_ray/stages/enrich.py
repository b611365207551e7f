"""Demographic enrichment (reference J4 + A6 + M12).

Reference: long-form ACS rows merged onto the unit table by GEOID —
implemented there as a per-row boolean-mask loop (pipeline/census.py:
186-219); calculated variables are sums of component codes
(census/services/variable_service.py:40-42, e.g. households_no_vehicle
= B25044_003E + B25044_010E); sentinels scrubbed to NULL
(census_service.py:262-278).

Ray-Data-first: the demographics table is the small side -> pivot it
wide on the driver (or in one tiny groupby), ``ray.put`` the pivot once,
and left-join inside ``map_batches`` with a pandas merge per batch. No
shuffle of the big side (SURVEY.md §7.3 "broadcast small sides").
"""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq

import ray

from ..functions.scalars import scrub_sentinels

CALCULATED_VARIABLES = {
    # name -> component codes summed (reference variable_service.py:26-43)
    "total_population": ["B01003_001E"],
    "median_household_income": ["B19013_001E"],
    "households_no_vehicle": ["B25044_003E", "B25044_010E"],
    "median_age": ["B01002_001E"],
}


def pivot_demographics(demo_path: str) -> pd.DataFrame:
    """Long (geoid, variable_code, value) -> wide per-geoid pivot with
    scrubbed sentinels and calculated variables appended."""
    tbl = pq.read_table(demo_path, columns=["geoid", "variable_code", "value"])
    tbl = tbl.set_column(tbl.schema.get_field_index("value"), "value",
                         scrub_sentinels(tbl["value"]))
    df = tbl.to_pandas()
    wide = df.pivot_table(index="geoid", columns="variable_code",
                          values="value", aggfunc="first").reset_index()
    wide.columns.name = None
    for name, codes in CALCULATED_VARIABLES.items():
        cols = [c for c in codes if c in wide.columns]
        if cols:
            # pandas sum(min_count=1): all-null -> null, else null-as-0 sum
            wide[name] = wide[cols].sum(axis=1, min_count=1)
    return wide


def demographics_ref(demo_path: str):
    return ray.put(pivot_demographics(demo_path))


class Enricher:
    """Actor-pool broadcast hash join: batch LEFT JOIN demographics."""

    def __init__(self, demo_ref, on: str = "zone_id"):
        self.wide = ray.get(demo_ref)
        self.on = on

    def __call__(self, batch: pd.DataFrame):
        import pyarrow as pa

        out = batch.merge(self.wide, how="left", left_on=self.on,
                          right_on="geoid").drop(columns=["geoid"])
        # metadata-free Arrow block (see stages/extract.py rationale)
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)


def enrich(ds, demo_ref, on: str = "zone_id", concurrency=2,
           batch_size: int = 8192):
    from ..util import clamp_concurrency

    concurrency = clamp_concurrency(concurrency, 0.5)
    return ds.map_batches(Enricher,
                          fn_constructor_kwargs=dict(demo_ref=demo_ref, on=on),
                          batch_format="pandas", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=0.5)
