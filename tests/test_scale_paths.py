"""Scale-path equivalence tests: partition-pruned PIP == broadcast PIP,
salted dedup == plain dedup, cell-bbox superset property, hot-cell
salting."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from socialmapper_ray import tiles

SF = "/root/testdata/sf0.001"


def test_quad_cell_latlon_bbox_superset():
    """Any point must fall inside the numeric bbox of its own cell."""
    rng = np.random.default_rng(11)
    lats = rng.uniform(-88, 88, 2000)
    lons = rng.uniform(-179.9, 179.9, 2000)
    for res in (1, 3):
        cells = tiles.quadcell(lats, lons, res)
        for cell in np.unique(cells):
            rows = cells == cell
            lat_min, lat_max, lon_min, lon_max = \
                tiles.quad_cell_latlon_bbox(int(cell))
            assert (lats[rows] >= lat_min).all() and \
                   (lats[rows] <= lat_max).all(), hex(int(cell))
            assert (lons[rows] >= lon_min).all() and \
                   (lons[rows] <= lon_max).all(), hex(int(cell))


def test_quad_cell_bbox_pole():
    # the cell containing the north pole must reach lat 90
    c = int(tiles.quadcell(89.99, 10.0, 2)[()])
    lat_min, lat_max, lon_min, lon_max = tiles.quad_cell_latlon_bbox(c)
    assert lat_max == 90.0 and lon_min == -180.0 and lon_max == 180.0


def test_partitioned_pip_equals_broadcast(ray_session):
    from socialmapper_ray.sources import synth
    from socialmapper_ray.stages import extract, pip_join, tile

    synth.ensure_synth(SF)
    pages = rd.read_parquet(synth.table_path(SF, "pages"))
    pois = tile.tile_points(
        extract.extract_pois(pages).filter(expr="valid == True"))
    zones = synth.table_path(SF, "zones")

    idx = pip_join.build_zone_index(zones)
    broadcast = pip_join.pip_join(pois, idx).to_pandas()
    partitioned = pip_join.pip_join_partitioned(pois, zones).to_pandas()

    key = lambda df: sorted(map(tuple, df[["url", "zone_id"]].to_numpy()))
    assert key(broadcast) == key(partitioned)
    # and the buckets really are smaller than the full zone set
    buckets = pip_join.bucket_zones_by_cell(zones)
    sizes = [len(ids) for _, ids in buckets.values()]
    assert max(sizes) < 84  # n_zones at sf0.001


def test_salted_dedup_equals_plain(ray_session):
    from socialmapper_ray.stages import dedup

    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    plain = dedup.exact_dedup(ds).to_pandas() \
        .sort_values("text_hash").reset_index(drop=True)
    salted = dedup.exact_dedup_salted(ds).to_pandas() \
        .sort_values("text_hash").reset_index(drop=True)
    assert plain[["text_hash", "keep_id", "n_dupes"]].equals(
        salted[["text_hash", "keep_id", "n_dupes"]])


def test_salted_part_key(ray_session):
    from socialmapper_ray.stages import tile

    batch = pa.table({
        "url": [f"u{i}" for i in range(100)],
        "part_key": pa.array([7] * 50 + [9] * 50, pa.uint64()),
    })
    out = tile.salted_part_key(batch, hot_cells={7}, salt_buckets=4)
    keys = out["part_salt"].to_numpy()
    hot = keys[:50]
    cold = keys[50:]
    assert len(np.unique(hot)) > 1          # hot cell split into sub-keys
    assert len(np.unique(cold)) == 1        # cold cell untouched
    assert set(np.unique(hot)) <= {7 * 4 + s for s in range(4)}
