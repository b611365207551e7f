"""Point-in-polygon join: the engine's core spatial join (reference J1-J3).

Reference semantics: isochrone/census polygons x points intersects/
contains (census/services/spatial_block_group_service.py:63-182,
pipeline/census.py:87-139, census/infrastructure/geocoder.py:41-83 —
the external TIGER/geocoder APIs collapse into this one local join).

Ray-Data-first shape (SURVEY.md §7.1 step 3):

- the polygon side is the *small* side (census block groups are ~1e5
  rows even nationally) — built into a :class:`geom.GridIndex` once on
  the driver and broadcast via a single ``ray.put``;
- the point side streams through an **actor pool**
  (``map_batches(PIPJoiner, concurrency=N)``): the index is fetched
  from the object store once per actor in ``__init__`` (zero-copy
  plasma read), never re-shipped per batch;
- output is the join table ``(url, zone_id, ...)`` — one row per
  containment pair.

At 100 TB the probe side never shuffles: the only data movement is the
streaming read + the broadcast. For zone sets too large to broadcast,
the documented scale path is bucketing zones by coarse quadcell prefix
and joining per-bucket (zones partition key == pages ``part_key``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from .. import geom


def build_zone_index(zones_path: str, bin_deg: float = 0.5):
    """Read the zones table, build GridIndex + id array, return object ref.

    Driver-side; one ``ray.put`` for the whole job (broadcast-once).
    """
    tbl = pq.read_table(zones_path, columns=["zone_id", "wkb"])
    zone_ids = np.asarray(tbl["zone_id"].to_pylist())
    polyset = geom.PolygonSet.from_wkb(tbl["wkb"].to_pylist())
    index = geom.GridIndex(polyset, bin_deg=bin_deg)
    return ray.put((index, zone_ids))


class PIPJoiner:
    """Actor-pool stage: probe points against the broadcast zone index.

    State (the index) is materialised once per actor in ``__init__`` —
    the reference's per-run STRtree/network-cache pattern
    (isochrone/cache.py:511-579) mapped onto Ray actors.
    """

    def __init__(self, index_ref, keep_cols=("url",), lat_col="lat",
                 lon_col="lon"):
        self.index, self.zone_ids = ray.get(index_ref)
        self.keep_cols = list(keep_cols)
        self.lat_col = lat_col
        self.lon_col = lon_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        pt, poly = self.index.query(lon, lat)
        cols = {}
        for c in self.keep_cols:
            cols[c] = batch[c].take(pa.array(pt))
        cols["zone_id"] = pa.array(self.zone_ids[poly])
        return pa.table(cols)


def pip_join(points_ds, index_ref, keep_cols=("url",), concurrency=4,
             batch_size: int = 4096, num_cpus: float = 0.5,
             lat_col="lat", lon_col="lon"):
    """points x zones containment join -> Dataset of (keep_cols, zone_id)."""
    return points_ds.map_batches(
        PIPJoiner,
        fn_constructor_kwargs=dict(index_ref=index_ref, keep_cols=keep_cols,
                                   lat_col=lat_col, lon_col=lon_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


def pip_join_bruteforce(points: pd.DataFrame, zones_path: str) -> pd.DataFrame:
    """Test-only dual oracle: O(points x zones) exact join (the pattern of
    the reference's engine.py:302-344 self-check). Driver-side pandas."""
    tbl = pq.read_table(zones_path, columns=["zone_id", "wkb"])
    zone_ids = tbl["zone_id"].to_pylist()
    polyset = geom.PolygonSet.from_wkb(tbl["wkb"].to_pylist())
    n, m = len(points), len(zone_ids)
    pair_pt = np.repeat(np.arange(n), m)
    pair_poly = np.tile(np.arange(m), n)
    mask = geom.points_in_polygons(points["lon"].to_numpy(),
                                   points["lat"].to_numpy(),
                                   polyset, pair_pt, pair_poly)
    return pd.DataFrame({
        "url": points["url"].to_numpy()[pair_pt[mask]],
        "zone_id": np.asarray(zone_ids)[pair_poly[mask]],
    })
