"""Geometry batch operators (reference M6/M7/M9/A1) over WKB columns.

- ``simplify_zones`` — Douglas-Peucker per polygon (M6,
  isochrone/__init__.py:136-139 ``geometry.simplify(tolerance,
  preserve_topology=True)``).
- ``zone_centroids`` — shoelace area centroid (M7,
  distance/__init__.py:133-138).
- ``zone_hulls`` — convex hull per polygon (M9,
  clustering.py:412-415).
- ``hull_union`` — A1 analogue of the reference's global
  ``unary_union`` (pipeline/census.py:87): a tree-reduction convex-hull
  union (partial hull per batch -> final hull over partial vertices).
  The exact polygon union is intentionally NOT provided: at scale the
  engine's PIP join works per-polygon + dedup (SURVEY.md §2.5 A1
  mapping), and the hull is what the reference itself submits upstream
  (spatial_block_group_service.py:110-112 takes the convex hull before
  the API call).

All stages are stateless ``map_batches`` over WKB binary columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .. import geom


def _map_wkb(df: pd.DataFrame, fn, wkb_col: str = "wkb") -> list[bytes]:
    out = []
    for blob in df[wkb_col]:
        kind, coords = geom.wkb_decode(blob)
        assert kind == "polygon"
        out.append(geom.wkb_polygon(fn(coords)))
    return out


def simplify_zones(ds, tolerance: float, wkb_col: str = "wkb"):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[wkb_col] = _map_wkb(
            df, lambda c: geom.simplify_polygon(c, tolerance), wkb_col)
        return df

    return ds.map_batches(fn, batch_format="pandas")


def zone_centroids(ds, wkb_col: str = "wkb"):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        cx, cy = [], []
        for blob in df[wkb_col]:
            _, coords = geom.wkb_decode(blob)
            x, y = geom.polygon_centroid(coords)
            cx.append(x)
            cy.append(y)
        out = df.drop(columns=[wkb_col])
        out["cx"] = np.asarray(cx)
        out["cy"] = np.asarray(cy)
        return out

    return ds.map_batches(fn, batch_format="pandas")


def zone_hulls(ds, wkb_col: str = "wkb"):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[wkb_col] = _map_wkb(df, geom.convex_hull, wkb_col)
        return df

    return ds.map_batches(fn, batch_format="pandas")


def valid_polygon_mask(blobs) -> np.ndarray:
    """U4 valid-geometry filter (reference block_group_service.py:231-236
    drops null/invalid geometries): a polygon is valid when it decodes,
    has >= 3 distinct vertices and nonzero shoelace area."""
    out = np.zeros(len(blobs), dtype=bool)
    for i, blob in enumerate(blobs):
        if blob is None:
            continue
        try:
            kind, coords = geom.wkb_decode(bytes(blob))
        except Exception:  # truncated/garbage WKB -> invalid
            continue
        if kind != "polygon":
            continue
        c = coords[:-1] if (len(coords) > 1
                            and np.array_equal(coords[0], coords[-1])) \
            else coords
        if len(np.unique(c, axis=0)) < 3:
            continue
        x, y = c[:, 0], c[:, 1]
        area2 = (x * np.roll(y, -1) - np.roll(x, -1) * y).sum()
        out[i] = abs(area2) > 1e-300
    return out


def filter_valid_zones(ds, wkb_col: str = "wkb"):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return df[valid_polygon_mask(df[wkb_col].tolist())]

    return ds.map_batches(fn, batch_format="pandas")


def exact_union(ds, wkb_col: str = "wkb"):
    """A1 exact polygon union -> 1-row Dataset (multipolygon rings as a
    WKB list + exact area).

    Single combine task over the collected rings (union inputs are the
    engine's SMALL side — e.g. one run's isochrones, reference
    pipeline/census.py:87). The tree-reduction path needs hole-aware
    re-union of partial outputs and is future work; the per-polygon
    join + dedup (the engine's actual scale strategy, SURVEY §2.5 A1)
    never needs the union at all.
    """
    from .. import union as union_mod

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        polys = [geom.wkb_decode(b)[1] for b in df[wkb_col]]
        rings, holes = union_mod.polygon_union(polys)
        area = 0.0
        for r, h in zip(rings, holes):
            x, y = r[:, 0], r[:, 1]
            a = abs((x * np.roll(y, -1) - np.roll(x, -1) * y).sum()) / 2.0
            area += -a if h else a
        return pd.DataFrame({
            "n_rings": [len(rings)],
            "n_holes": [int(sum(holes))],
            "area_e6": [int(np.floor(area * 1e6))],
        })

    return ds.repartition(1).map_batches(combine, batch_format="pandas",
                                         batch_size=None)


def hull_union(ds, wkb_col: str = "wkb"):
    """-> 1-row Dataset holding the convex hull (WKB) of all polygons.

    Tree topology: per-batch partial hull (vertices collapse to <= hull
    size) -> single final hull. No driver-side geometry, no all-to-all.
    """
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pts = []
        for blob in df[wkb_col]:
            _, coords = geom.wkb_decode(blob)
            pts.append(coords)
        hull = geom.convex_hull(np.vstack(pts))
        return pd.DataFrame({wkb_col: [geom.wkb_polygon(hull)]})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        pts = []
        for blob in df[wkb_col]:
            _, coords = geom.wkb_decode(blob)
            pts.append(coords)
        hull = geom.convex_hull(np.vstack(pts))
        return pd.DataFrame({wkb_col: [geom.wkb_polygon(hull)],
                             "n_vertices": [len(hull)]})

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.repartition(1).map_batches(final, batch_format="pandas",
                                               batch_size=None)
