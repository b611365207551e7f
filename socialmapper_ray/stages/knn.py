"""kNN POI lookup (reference J5): nearest facility per point.

Reference: distance/engine.py:54-109 (numba brute force over
n_pois x n_centroids, "95% reduction" claim) and :194-233 (BallTree
k=1). Neither numba nor sklearn exists here; the Ray-native shape is:

- **exact path** (oracle-checked): broadcast the (small) facility
  array once; each ``map_batches`` task computes a vectorized haversine
  distance matrix batch x facilities and takes the row argmin. This is
  embarrassingly parallel — no shuffle — and at 100 TB is compute-bound
  matmul-like work, the right trade while facilities fit memory
  (<= ~1e6 rows).
- **cell-pruned path** (scale path for big facility sets): facilities
  bucketed by hexcell; per point expand hex rings (tiles.hex_ring)
  until a candidate appears, then widen by the ring-bound and take the
  exact min among candidates. Verified against the exact path in
  tests/test_knn.py (dual-oracle pattern of engine.py:302-344).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .. import geom, tiles


class NearestFacility:
    """Actor-pool stage: per-row nearest facility id + distance (km)."""

    def __init__(self, centers_ref, keep_cols=("url",), lat_col="lat",
                 lon_col="lon", chunk: int = 1024):
        c = ray.get(centers_ref)
        self.c_lat = np.asarray(c["lat"], dtype=np.float64)
        self.c_lon = np.asarray(c["lon"], dtype=np.float64)
        self.c_id = np.asarray(c["center_id"])
        self.keep_cols = list(keep_cols)
        self.lat_col = lat_col
        self.lon_col = lon_col
        self.chunk = chunk

    def _nearest(self, lat: np.ndarray, lon: np.ndarray):
        n = len(lat)
        best_j = np.empty(n, dtype=np.int64)
        best_d = np.empty(n, dtype=np.float64)
        for s in range(0, n, self.chunk):
            e = min(s + self.chunk, n)
            d = geom.haversine_km(lat[s:e, None], lon[s:e, None],
                                  self.c_lat[None, :], self.c_lon[None, :])
            j = np.argmin(d, axis=1)
            best_j[s:e] = j
            best_d[s:e] = d[np.arange(e - s), j]
        return best_j, best_d

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        j, d = self._nearest(lat, lon)
        cols = {c: batch[c] for c in self.keep_cols}
        cols["nearest_center_id"] = pa.array(self.c_id[j])
        cols["distance_km"] = pa.array(d, pa.float64())
        return pa.table(cols)


def knn_nearest(points_ds, centers_ref, keep_cols=("url",), concurrency=4,
                batch_size: int = 4096, lat_col="lat", lon_col="lon"):
    from ..util import clamp_concurrency

    concurrency = clamp_concurrency(concurrency, 0.5)
    return points_ds.map_batches(
        NearestFacility,
        fn_constructor_kwargs=dict(centers_ref=centers_ref,
                                   keep_cols=keep_cols, lat_col=lat_col,
                                   lon_col=lon_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )


# ---------------------------------------------------------------------------
# Cell-pruned variant (scale path)
# ---------------------------------------------------------------------------

_KM_PER_DEG = np.pi / 180.0 * geom.EARTH_RADIUS_KM


class CellPrunedNearest:
    """Cell-bucketed exact nearest lookup with a latitude-band bound.

    Probe rows are grouped by hexcell (one candidate search per occupied
    cell, amortised over its rows). The candidate search walks facilities
    in order of |Δlat| from the group representative (two-pointer over a
    lat-sorted array) and stops once the *provable* lower bound
    ``R * |Δlat|  <=  great-circle distance`` exceeds the best candidate
    found plus twice the group radius. The radius is the EMPIRICAL max
    great-circle distance from the representative (the member mean) to
    its actual member rows — not a fixed multiple of the hex size, which
    under-covers when members sit corner-to-corner or the cell shears
    east-west at high latitude. With the measured radius the bound is
    exact for any member geometry. Verified against the brute path in
    tests/test_pipeline_spatial.py.
    """

    def __init__(self, centers_ref, res: int = 5, keep_cols=("url",),
                 lat_col="lat", lon_col="lon"):
        c = ray.get(centers_ref)
        self.c_lat = np.asarray(c["lat"], dtype=np.float64)
        self.c_lon = np.asarray(c["lon"], dtype=np.float64)
        self.c_id = np.asarray(c["center_id"])
        self.res = res
        self.size = tiles.HEX_SIZE0 / (1 << res)
        self.lat_order = np.argsort(self.c_lat, kind="stable")
        self.sorted_lat = self.c_lat[self.lat_order]
        self.keep_cols = list(keep_cols)
        self.lat_col = lat_col
        self.lon_col = lon_col

    def _candidates_for_cell(self, plat: float, plon: float,
                             r_km: float) -> np.ndarray:
        """Centers that could be nearest to any point within r_km of
        (plat, plon): walk outward in |Δlat|, stop at the geodesic bound."""
        n = len(self.sorted_lat)
        pos = int(np.searchsorted(self.sorted_lat, plat))
        lo, hi = pos - 1, pos
        best = np.inf
        visited: list[int] = []
        while lo >= 0 or hi < n:
            d_lo = plat - self.sorted_lat[lo] if lo >= 0 else np.inf
            d_hi = self.sorted_lat[hi] - plat if hi < n else np.inf
            if min(d_lo, d_hi) * _KM_PER_DEG > best + 2.0 * r_km:
                break
            if d_lo <= d_hi:
                j = self.lat_order[lo]
                lo -= 1
            else:
                j = self.lat_order[hi]
                hi += 1
            visited.append(j)
            d = float(geom.haversine_km(plat, plon,
                                        self.c_lat[j], self.c_lon[j]))
            best = min(best, d)
        return np.asarray(visited, dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        cells = tiles.hexcell(lat, lon, self.res)
        out_j = np.empty(len(lat), dtype=np.int64)
        out_d = np.empty(len(lat), dtype=np.float64)
        # group probe rows by cell so the candidate search runs once per cell
        uniq, inv = np.unique(cells, return_inverse=True)
        for ui, _cell in enumerate(uniq):
            rows = np.flatnonzero(inv == ui)
            # representative = member mean; prune radius = true max
            # member distance from it (exact bound, see class docstring)
            rlat, rlon = float(lat[rows].mean()), float(lon[rows].mean())
            r_km = float(np.max(geom.haversine_km(
                np.full(len(rows), rlat), np.full(len(rows), rlon),
                lat[rows], lon[rows]))) if len(rows) else 0.0
            cj = self._candidates_for_cell(rlat, rlon, r_km)
            d = geom.haversine_km(lat[rows, None], lon[rows, None],
                                  self.c_lat[None, cj], self.c_lon[None, cj])
            a = np.argmin(d, axis=1)
            out_j[rows] = cj[a]
            out_d[rows] = d[np.arange(len(rows)), a]
        cols = {c: batch[c] for c in self.keep_cols}
        cols["nearest_center_id"] = pa.array(self.c_id[out_j])
        cols["distance_km"] = pa.array(out_d, pa.float64())
        return pa.table(cols)


def centers_ref_from_parquet(path: str):
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    return ray.put({
        "center_id": np.asarray(t["center_id"].to_pylist()),
        "lat": t["lat"].to_numpy(),
        "lon": t["lon"].to_numpy(),
        "travel_mode": np.asarray(t["travel_mode"].to_pylist()),
    })


class RadiusJoin:
    """Actor-pool spatial RANGE join: every (point, facility) pair
    within ``radius_km`` (reference J5 widened to the range-join shape —
    distance/engine.py's matrix kernel, emitting all rows under the
    threshold instead of the argmin).

    Same broadcast-small-side topology as NearestFacility: no shuffle,
    each batch emits its own pairs. Output size is data-dependent
    (avg degree x rows); keep ``radius_km`` and batch_size sized so one
    batch's pair block fits the worker heap.
    """

    def __init__(self, centers_ref, radius_km: float, keep_cols=("url",),
                 lat_col="lat", lon_col="lon", chunk: int = 1024):
        c = ray.get(centers_ref)
        self.c_lat = np.asarray(c["lat"], dtype=np.float64)
        self.c_lon = np.asarray(c["lon"], dtype=np.float64)
        self.c_id = np.asarray(c["center_id"])
        self.radius_km = float(radius_km)
        self.keep_cols = list(keep_cols)
        self.lat_col = lat_col
        self.lon_col = lon_col
        self.chunk = chunk

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        n = len(lat)
        rows, cols_j, dists = [], [], []
        for s in range(0, n, self.chunk):
            e = min(s + self.chunk, n)
            d = geom.haversine_km(lat[s:e, None], lon[s:e, None],
                                  self.c_lat[None, :], self.c_lon[None, :])
            i, j = np.nonzero(d <= self.radius_km)
            rows.append(i + s)
            cols_j.append(j)
            dists.append(d[i, j])
        i = np.concatenate(rows) if rows else np.empty(0, np.int64)
        j = np.concatenate(cols_j) if cols_j else np.empty(0, np.int64)
        d = np.concatenate(dists) if dists else np.empty(0, np.float64)
        out = {c: batch[c].take(pa.array(i)) for c in self.keep_cols}
        out["center_id"] = pa.array(self.c_id[j])
        out["distance_km"] = pa.array(d, pa.float64())
        return pa.table(out)


def radius_join(points_ds, centers_ref, radius_km: float,
                keep_cols=("url",), concurrency=4, batch_size: int = 4096):
    from ..util import clamp_concurrency

    return points_ds.map_batches(
        RadiusJoin,
        fn_constructor_kwargs=dict(centers_ref=centers_ref,
                                   radius_km=radius_km,
                                   keep_cols=keep_cols),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=clamp_concurrency(concurrency, 0.5), num_cpus=0.5)


class TopKFacilities:
    """Actor-pool stage: k nearest facilities per point, ranked
    (reference J5 extended from argmin to true top-k — the BallTree
    k>1 form of distance/engine.py:194-233). Same broadcast topology
    as NearestFacility; per chunk one argpartition + ordered argsort
    of the k finalists."""

    def __init__(self, centers_ref, k: int = 3, keep_cols=("url",),
                 lat_col="lat", lon_col="lon", chunk: int = 1024):
        c = ray.get(centers_ref)
        self.c_lat = np.asarray(c["lat"], dtype=np.float64)
        self.c_lon = np.asarray(c["lon"], dtype=np.float64)
        self.c_id = np.asarray(c["center_id"])
        self.k = min(k, len(self.c_id))
        self.keep_cols = list(keep_cols)
        self.lat_col = lat_col
        self.lon_col = lon_col
        self.chunk = chunk

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        n = len(lat)
        k = self.k
        top_j = np.empty((n, k), dtype=np.int64)
        top_d = np.empty((n, k), dtype=np.float64)
        for s in range(0, n, self.chunk):
            e = min(s + self.chunk, n)
            d = geom.haversine_km(lat[s:e, None], lon[s:e, None],
                                  self.c_lat[None, :], self.c_lon[None, :])
            part = np.argpartition(d, k - 1, axis=1)[:, :k]
            pd_ = np.take_along_axis(d, part, axis=1)
            # order the k finalists by (distance, center ordinal) so
            # equidistant facilities rank deterministically (lexsort:
            # last key is primary)
            order = np.lexsort((part, pd_), axis=1)
            top_j[s:e] = np.take_along_axis(part, order, axis=1)
            top_d[s:e] = np.take_along_axis(pd_, order, axis=1)
        cols = {c: batch[c].take(pa.array(np.repeat(np.arange(n), k)))
                for c in self.keep_cols}
        cols["rank"] = pa.array(np.tile(np.arange(1, k + 1), n))
        cols["center_id"] = pa.array(self.c_id[top_j.ravel()])
        cols["distance_km"] = pa.array(top_d.ravel(), pa.float64())
        return pa.table(cols)


def knn_topk(points_ds, centers_ref, k: int = 3, keep_cols=("url",),
             concurrency=4, batch_size: int = 4096):
    from ..util import clamp_concurrency

    return points_ds.map_batches(
        TopKFacilities,
        fn_constructor_kwargs=dict(centers_ref=centers_ref, k=k,
                                   keep_cols=keep_cols),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=clamp_concurrency(concurrency, 0.5), num_cpus=0.5)
