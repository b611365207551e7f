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
    zone_ids = tbl["zone_id"].to_numpy(zero_copy_only=False)
    # vectorized Arrow-buffer WKB decode — no per-row Python even at
    # 1e6-zone tables (geom.PolygonSet.from_wkb_arrow)
    polyset = geom.PolygonSet.from_wkb_arrow(tbl["wkb"])
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
    from ..util import clamp_concurrency

    concurrency = clamp_concurrency(concurrency, num_cpus)
    return points_ds.map_batches(
        PIPJoiner,
        fn_constructor_kwargs=dict(index_ref=index_ref, keep_cols=keep_cols,
                                   lat_col=lat_col, lon_col=lon_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


# ---------------------------------------------------------------------------
# Partition-pruned variant (the 100 TB scale path)
# ---------------------------------------------------------------------------

def bucket_zones_by_cell(zones_path: str, part_res: int = 3,
                         bin_deg: float = 0.5):
    """Zones bucketed by coarse quadcell: cell -> (GridIndex, zone_ids).

    Each part_res cell registers every zone whose bbox intersects the
    cell's guaranteed-superset lat/lon bbox (tiles.quad_cell_latlon_bbox),
    so a point's partition always holds all zones that could contain it.
    This bounds the per-actor index to one partition's zones — the knob
    that keeps broadcast memory flat when the zone table outgrows a
    single broadcast (SURVEY.md §7.4 "actor-pool sizing vs broadcast
    memory"; the reference's analogue is its 5 GB network-cache cap,
    isochrone/cache.py:73).
    """
    from .. import tiles

    tbl = pq.read_table(zones_path, columns=["zone_id", "wkb"])
    zone_ids = tbl["zone_id"].to_numpy(zero_copy_only=False)
    polyset = geom.PolygonSet.from_wkb_arrow(tbl["wkb"])
    bb = polyset.bbox  # (lon_min, lat_min, lon_max, lat_max)
    buckets: dict[int, list[int]] = {}
    for cell in tiles.quad_cells_at_res(part_res):
        lat_min, lat_max, lon_min, lon_max = \
            tiles.quad_cell_latlon_bbox(int(cell))
        hit = np.flatnonzero(
            (bb[:, 0] <= lon_max) & (bb[:, 2] >= lon_min)
            & (bb[:, 1] <= lat_max) & (bb[:, 3] >= lat_min))
        if len(hit):
            buckets[int(cell)] = hit.tolist()
    out = {}
    for cell, idxs in buckets.items():
        sub = polyset.take(idxs)
        out[cell] = (geom.GridIndex(sub, bin_deg=bin_deg), zone_ids[idxs])
    return out


class PartitionedPIPJoiner:
    """Actor-pool PIP probe that looks up the per-partition index by the
    row's ``part_key`` — rows must already carry the tile stage's
    part_key at the same ``part_res`` the buckets were built with."""

    def __init__(self, buckets_ref, keep_cols=("url",), lat_col="lat",
                 lon_col="lon"):
        self.buckets = ray.get(buckets_ref)
        self.keep_cols = list(keep_cols)
        self.lat_col = lat_col
        self.lon_col = lon_col
        from .. import tiles

        sample = next(iter(self.buckets), None)
        self.part_res = (int(tiles.quad_res(np.uint64(sample)))
                         if sample is not None else None)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .. import tiles

        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        part = batch["part_key"].to_numpy(zero_copy_only=False)
        if len(part) and self.part_res is not None:
            row_res = int(tiles.quad_res(part[:1])[0])
            if row_res != self.part_res:
                raise ValueError(
                    f"part_key resolution mismatch: rows tiled at res "
                    f"{row_res} but zone buckets built at res "
                    f"{self.part_res} — a mismatch silently yields an "
                    f"empty join; re-tile with part_res={self.part_res}")
        out_pt: list[np.ndarray] = []
        out_zone: list[np.ndarray] = []
        for cell in np.unique(part):
            bucket = self.buckets.get(int(cell))
            if bucket is None:
                continue
            index, ids = bucket
            rows = np.flatnonzero(part == cell)
            pt, poly = index.query(lon[rows], lat[rows])
            out_pt.append(rows[pt])
            out_zone.append(ids[poly])
        if not out_pt:
            cols = {c: batch[c].slice(0, 0) for c in self.keep_cols}
            cols["zone_id"] = pa.array([], pa.string())
            return pa.table(cols)
        pt = np.concatenate(out_pt)
        cols = {c: batch[c].take(pa.array(pt)) for c in self.keep_cols}
        cols["zone_id"] = pa.array(np.concatenate(out_zone))
        return pa.table(cols)


def pip_join_partitioned(points_ds, zones_path: str, part_res: int = 3,
                         keep_cols=("url",), concurrency=4,
                         batch_size: int = 4096):
    """Partition-pruned PIP join: points carry part_key (tile stage at
    ``part_res``); each probe touches only its partition's zone index.

    In this single-broadcast implementation the whole bucket dict ships
    once via ray.put (fine while buckets fit one node); the multi-node
    layout shards the dict by cell across placement groups — the probe
    code is unchanged. Verified equal to the broadcast join in tests.
    """
    from ..util import clamp_concurrency

    concurrency = clamp_concurrency(concurrency, 0.5)
    buckets_ref = ray.put(bucket_zones_by_cell(zones_path, part_res))
    return points_ds.map_batches(
        PartitionedPIPJoiner,
        fn_constructor_kwargs=dict(buckets_ref=buckets_ref,
                                   keep_cols=keep_cols),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
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
