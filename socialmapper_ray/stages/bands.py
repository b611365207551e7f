"""Travel-time band assignment (reference ST2, the isochrone stage).

Reference: per-POI ego-graph isochrones over an OSM road network
(isochrone/clustering.py:335-432); travel-mode speeds from
isochrone/travel_modes.py:12-152 (M13). No road network exists here, so
bands are the deterministic analytic analogue: a point reached from its
nearest facility within ``t`` minutes at the facility's travel-mode
speed falls in band ``t`` (smallest such t of 5/10/15/30). This keeps
the *stage shape* of the reference — a stateful actor-pool routing
stage holding a per-facility routing table — while making results
exactly checkable by a SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .. import geom

# km per minute per travel mode (M13 analogue, fixed constants)
MODE_SPEED_KM_MIN = {"drive": 1.0, "bike": 0.25, "walk": 0.08}
BAND_MINUTES = (5, 10, 15, 30)


class BandRouter:
    """Actor-pool stage: point -> (nearest facility, travel band).

    Routing table (facility coords + mode speeds) broadcast once,
    materialised per actor in ``__init__``.
    """

    def __init__(self, centers_ref, keep_cols=("url",), lat_col="lat",
                 lon_col="lon", chunk: int = 1024):
        c = ray.get(centers_ref)
        self.c_lat = np.asarray(c["lat"], dtype=np.float64)
        self.c_lon = np.asarray(c["lon"], dtype=np.float64)
        self.c_id = np.asarray(c["center_id"])
        self.c_speed = np.asarray(
            [MODE_SPEED_KM_MIN[m] for m in c["travel_mode"]], dtype=np.float64)
        self.keep_cols = list(keep_cols)
        self.lat_col = lat_col
        self.lon_col = lon_col
        self.chunk = chunk

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
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
        minutes = best_d / self.c_speed[best_j]
        band = np.full(n, -1, dtype=np.int64)
        for t in reversed(BAND_MINUTES):
            band = np.where(minutes <= t, t, band)
        cols = {c: batch[c] for c in self.keep_cols}
        cols["center_id"] = pa.array(self.c_id[best_j])
        cols["travel_minutes"] = pa.array(minutes, pa.float64())
        cols["band"] = pa.array(band, pa.int64())
        return pa.table(cols)


def assign_bands(points_ds, centers_ref, keep_cols=("url",), concurrency=4,
                 batch_size: int = 4096):
    from ..util import clamp_concurrency

    concurrency = clamp_concurrency(concurrency, 0.5)
    return points_ds.map_batches(
        BandRouter,
        fn_constructor_kwargs=dict(centers_ref=centers_ref,
                                   keep_cols=keep_cols),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )


def band_polygons(centers_df, n_vertices: int = 32):
    """Travel-time band POLYGONS per facility (the reference's isochrone
    artifact, K5: per-run polygon dump, isochrone/__init__.py:361-398).

    Each (center, band) becomes an n-gon approximating the band's reach
    circle at the center's mode speed; lat/lon radii account for the
    cos(lat) east-west compression. The authoritative band-assignment
    semantics stay distance-based (BandRouter, SQL-checked); these
    polygons are the exportable geometry artifact.

    centers_df: pandas with center_id, lat, lon, travel_mode.
    Returns pandas with center_id, travel_mode, band, wkb.
    """
    import pandas as pd

    from .. import geom

    rows = {"center_id": [], "travel_mode": [], "band": [], "wkb": []}
    km_per_deg = np.pi / 180.0 * geom.EARTH_RADIUS_KM
    ang = np.linspace(0.0, 2.0 * np.pi, n_vertices, endpoint=False)
    for r in centers_df.itertuples(index=False):
        speed = MODE_SPEED_KM_MIN[r.travel_mode]
        coslat = np.cos(np.radians(r.lat))
        for t in BAND_MINUTES:
            radius_km = speed * t
            dlat = radius_km / km_per_deg
            dlon = radius_km / (km_per_deg * max(coslat, 1e-9))
            poly = np.column_stack([r.lon + dlon * np.cos(ang),
                                    r.lat + dlat * np.sin(ang)])
            rows["center_id"].append(r.center_id)
            rows["travel_mode"].append(r.travel_mode)
            rows["band"].append(t)
            rows["wkb"].append(geom.wkb_polygon(poly))
    return pd.DataFrame(rows)
