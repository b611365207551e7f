"""Tile stage: attach cell ids — the engine's partitioning substrate.

North-rule requirement: every point row gets an H3-style ``hexcell``
(res 7-9) and an S2-style ``quadcell`` + coarse ``part_key`` (the
"h3_prefix" of SURVEY.md §7.3) used for range partitioning, locality
and salted shuffles. Replaces the reference's DBSCAN clustering as the
unit of spatial work (isochrone/clustering.py:61-120): a cluster is now
"all rows whose quadcell shares a res-``part_res`` ancestor".

Stateless, zero-copy Arrow in/out, pure numpy kernels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import tiles

DEFAULT_HEX_RES = 7
DEFAULT_QUAD_RES = 12
DEFAULT_PART_RES = 3


def tile_batch(batch: pa.Table, hex_res: int = DEFAULT_HEX_RES,
               quad_res: int = DEFAULT_QUAD_RES,
               part_res: int = DEFAULT_PART_RES,
               lat_col: str = "lat", lon_col: str = "lon") -> pa.Table:
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    lon = batch[lon_col].to_numpy(zero_copy_only=False)
    ok = np.isfinite(lat) & np.isfinite(lon)
    safe_lat = np.where(ok, lat, 0.0)
    safe_lon = np.where(ok, lon, 0.0)
    quad = tiles.quadcell(safe_lat, safe_lon, quad_res)
    hexc = tiles.hexcell(safe_lat, safe_lon, hex_res)
    part = tiles.quad_parent(quad, part_res)
    batch = batch.append_column("quadcell", pa.array(np.where(ok, quad, 0),
                                                     pa.uint64()))
    batch = batch.append_column("hexcell", pa.array(np.where(ok, hexc, 0),
                                                    pa.uint64()))
    batch = batch.append_column("part_key", pa.array(np.where(ok, part, 0),
                                                     pa.uint64()))
    # strip any pandas metadata a pandas->arrow block conversion left on
    # the input schema: metadata dicts make block schemas unhashable,
    # forcing Ray's batcher into its slow unify path downstream
    return batch.replace_schema_metadata(None)


def tile_points(ds, **kw):
    return ds.map_batches(lambda b: tile_batch(b, **kw),
                          batch_format="pyarrow")


def salted_part_key(batch: pa.Table, hot_cells: set[int],
                    salt_buckets: int = 8) -> pa.Table:
    """Append ``part_salt`` — the skew-handling shuffle key: hot cells
    (from a cheap pre-pass count, SURVEY.md §7.4) are split into
    ``salt_buckets`` sub-keys by a hash of ``url``."""
    import zlib

    part = batch["part_key"].to_numpy(zero_copy_only=False)
    urls = batch["url"].to_pylist()
    salt = np.asarray([zlib.crc32(u.encode()) % salt_buckets for u in urls],
                      dtype=np.uint64)
    hot = np.isin(part, np.fromiter(hot_cells, dtype=np.uint64,
                                    count=len(hot_cells))) if hot_cells else \
        np.zeros(len(part), dtype=bool)
    key = np.where(hot, part * np.uint64(salt_buckets) + salt,
                   part * np.uint64(salt_buckets))
    return batch.append_column("part_salt", pa.array(key, pa.uint64()))
