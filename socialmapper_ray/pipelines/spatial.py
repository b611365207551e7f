"""Spatial query entry points + DuckDB oracle SQL.

Each ``*_q(sf_dir)`` runs a Ray Data pipeline over the synthetic pages
world (sources/synth.py); each ``*_sql(d)`` builds the equivalent
DuckDB SQL over the *independent* ground-truth tables written by the
generator (pois_truth / zones / zone_edges / band_centers /
demographics under synth dir ``d``). Generation and the pipeline share
no parsing/joining code, so these SQL strings are genuine oracles for
the extract -> geoparse -> tile -> join chain (driver contract).

Convex-PIP oracle: zone polygons are CCW convex, so containment ==
``min over edges of cross((edge), (point - edge_start)) >= 0`` — plain
SQL over the exploded edge table. The engine side uses the general
crossing-number test; they agree except for points *on* an edge, which
have probability 0 in the synthetic world (documented boundary rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..functions import scalars
from ..sources import synth
from ..stages import bands as bands_mod
from ..stages import enrich as enrich_mod
from ..stages import extract as extract_mod
from ..stages import knn as knn_mod
from ..stages import pip_join as pip_mod
from ..stages import tile as tile_mod
from ..stages import zonal as zonal_mod


def _extracted_valid(sf_dir: str):
    from .flagship import read_pages

    synth.ensure_synth(sf_dir)
    ext = extract_mod.extract_pois(read_pages(sf_dir))
    return ext.filter(expr="valid == True")


# ---------------------------------------------------------------------------
# extract
# ---------------------------------------------------------------------------

def extract_pois_q(sf_dir: str):
    ds = _extracted_valid(sf_dir)
    return ds.select_columns(["url", "lat", "lon", "name", "geo_kind"])


def extract_pois_sql(d: str) -> str:
    return f"""
    SELECT url, lat, lon, name, geo_kind
    FROM read_parquet('{d}/pois_truth.parquet') WHERE has_geo
    """


# ---------------------------------------------------------------------------
# PIP join
# ---------------------------------------------------------------------------

def pip_join_q(sf_dir: str):
    ds = tile_mod.tile_points(_extracted_valid(sf_dir))
    index_ref = pip_mod.build_zone_index(synth.table_path(sf_dir, "zones"))
    return pip_mod.pip_join(ds, index_ref, keep_cols=("url",))


def pip_join_partitioned_q(sf_dir: str):
    """Scale-path partition-pruned PIP (bounded per-actor index),
    checked against the SAME SQL oracle as the broadcast join."""
    ds = tile_mod.tile_points(_extracted_valid(sf_dir))
    return pip_mod.pip_join_partitioned(
        ds, synth.table_path(sf_dir, "zones"), keep_cols=("url",))


def _pip_cte(d: str) -> str:
    return f"""
    cand AS (
      SELECT p.url, p.doc_id, p.lat, p.lon, z.zone_id
      FROM read_parquet('{d}/pois_truth.parquet') p
      JOIN read_parquet('{d}/zones.parquet') z
        ON p.lon >= z.lon_min AND p.lon <= z.lon_max
       AND p.lat >= z.lat_min AND p.lat <= z.lat_max
      WHERE p.has_geo
    ),
    pip AS (
      SELECT c.url, c.doc_id, c.zone_id
      FROM cand c
      JOIN read_parquet('{d}/zone_edges.parquet') e ON c.zone_id = e.zone_id
      GROUP BY c.url, c.doc_id, c.zone_id
      HAVING min((e.x2 - e.x1) * (c.lat - e.y1)
               - (e.y2 - e.y1) * (c.lon - e.x1)) >= 0
    )"""


def pip_join_sql(d: str) -> str:
    return f"WITH {_pip_cte(d)} SELECT url, zone_id FROM pip"


# ---------------------------------------------------------------------------
# PIP join against NON-convex (star) zones — general crossing-number path
# ---------------------------------------------------------------------------

def pip_join_concave_q(sf_dir: str):
    """Same engine code as pip_join but probing the star-zone table:
    exercises concave containment end-to-end. Oracle: crossing-number
    PARITY in SQL (identical IEEE expression per edge)."""
    ds = tile_mod.tile_points(_extracted_valid(sf_dir))
    index_ref = pip_mod.build_zone_index(
        synth.table_path(sf_dir, "zones_star"))
    return pip_mod.pip_join(ds, index_ref, keep_cols=("url",))


def pip_join_concave_sql(d: str) -> str:
    return f"""
    WITH cand AS (
      SELECT p.url, p.lat, p.lon, z.zone_id
      FROM read_parquet('{d}/pois_truth.parquet') p
      JOIN read_parquet('{d}/zones_star.parquet') z
        ON p.lon >= z.lon_min AND p.lon <= z.lon_max
       AND p.lat >= z.lat_min AND p.lat <= z.lat_max
      WHERE p.has_geo)
    SELECT url, zone_id FROM (
      SELECT c.url, c.zone_id,
        SUM(CASE WHEN ((e.y1 > c.lat) <> (e.y2 > c.lat))
              AND c.lon < e.x1 + (c.lat - e.y1) * (e.x2 - e.x1)
                                   / (e.y2 - e.y1)
            THEN 1 ELSE 0 END) AS crossings
      FROM cand c
      JOIN read_parquet('{d}/zone_star_edges.parquet') e
        ON c.zone_id = e.zone_id
      GROUP BY c.url, c.zone_id)
    WHERE crossings % 2 = 1
    """


# ---------------------------------------------------------------------------
# PIP join against donut / MultiPolygon zones — holes + multi-part path
# ---------------------------------------------------------------------------

def pip_join_holes_q(sf_dir: str):
    """Same engine code as pip_join but probing the donut/multipart
    zone table (polygons with interior rings, two-hole polygons,
    MultiPolygons — geom.parity_sequence containment). Oracle:
    crossing-number parity in SQL over EVERY ring's edges — even-odd
    over all rings is exactly hole/multi-part containment."""
    ds = tile_mod.tile_points(_extracted_valid(sf_dir))
    index_ref = pip_mod.build_zone_index(
        synth.table_path(sf_dir, "zones_donut"))
    return pip_mod.pip_join(ds, index_ref, keep_cols=("url",))


def pip_join_holes_sql(d: str) -> str:
    return f"""
    WITH cand AS (
      SELECT p.url, p.lat, p.lon, z.zone_id
      FROM read_parquet('{d}/pois_truth.parquet') p
      JOIN read_parquet('{d}/zones_donut.parquet') z
        ON p.lon >= z.lon_min AND p.lon <= z.lon_max
       AND p.lat >= z.lat_min AND p.lat <= z.lat_max
      WHERE p.has_geo)
    SELECT url, zone_id FROM (
      SELECT c.url, c.zone_id,
        SUM(CASE WHEN ((e.y1 > c.lat) <> (e.y2 > c.lat))
              AND c.lon < e.x1 + (c.lat - e.y1) * (e.x2 - e.x1)
                                   / (e.y2 - e.y1)
            THEN 1 ELSE 0 END) AS crossings
      FROM cand c
      JOIN read_parquet('{d}/zone_donut_edges.parquet') e
        ON c.zone_id = e.zone_id
      GROUP BY c.url, c.zone_id)
    WHERE crossings % 2 = 1
    """


# ---------------------------------------------------------------------------
# Zonal aggregation
# ---------------------------------------------------------------------------

def zonal_agg_q(sf_dir: str):
    ds = tile_mod.tile_points(_extracted_valid(sf_dir))
    index_ref = pip_mod.build_zone_index(synth.table_path(sf_dir, "zones"))
    joined = pip_mod.pip_join(ds, index_ref, keep_cols=("url", "n_chars"))
    agg = zonal_mod.zonal_counts(joined, value_col="n_chars")
    return agg.map_batches(
        lambda df: pd.DataFrame({
            "zone_id": df["zone_id"],
            "n_pois": df["n_pois"].astype(np.int64),
            "sum_n_chars": df["sum_n_chars"].astype(np.int64)}),
        batch_format="pandas")


def zonal_agg_sql(d: str) -> str:
    return f"""
    WITH {_pip_cte(d)}
    SELECT pip.zone_id,
           CAST(COUNT(*) AS BIGINT) AS n_pois,
           CAST(SUM(length(doc.text)) AS BIGINT) AS sum_n_chars
    FROM pip JOIN documents doc ON pip.doc_id = doc.doc_id
    GROUP BY pip.zone_id
    """


# ---------------------------------------------------------------------------
# kNN nearest facility
# ---------------------------------------------------------------------------

_HAVERSINE_SQL = """2 * 6371.0088 * asin(sqrt(
    least(1.0, sin(radians(c.lat - p.lat) / 2) ^ 2
      + cos(radians(p.lat)) * cos(radians(c.lat))
      * sin(radians(c.lon - p.lon) / 2) ^ 2)))"""


def knn_q(sf_dir: str):
    ds = _extracted_valid(sf_dir)
    centers_ref = knn_mod.centers_ref_from_parquet(
        synth.table_path(sf_dir, "band_centers"))
    out = knn_mod.knn_nearest(ds, centers_ref, keep_cols=("url",))

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        # M5 unit conversion (reference distance/__init__.py:176-178,
        # same 0.621371 constant as the SQL oracle)
        return df.assign(
            distance_miles=(df["distance_km"] * 0.621371).round(6),
            distance_km=df["distance_km"].round(6))

    return out.map_batches(fin, batch_format="pandas")


def knn_pruned_q(sf_dir: str):
    """Scale-path cell-bucketed kNN (geodesic lat-band pruning), checked
    against the SAME SQL oracle as the brute-force path."""
    ds = _extracted_valid(sf_dir)
    centers_ref = knn_mod.centers_ref_from_parquet(
        synth.table_path(sf_dir, "band_centers"))
    from ..util import clamp_concurrency

    out = ds.map_batches(
        knn_mod.CellPrunedNearest,
        fn_constructor_kwargs=dict(centers_ref=centers_ref, res=5),
        batch_format="pyarrow", batch_size=4096,
        concurrency=clamp_concurrency(4, 0.5), num_cpus=0.5)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            distance_miles=(df["distance_km"] * 0.621371).round(6),
            distance_km=df["distance_km"].round(6))

    return out.map_batches(fin, batch_format="pandas")


def knn_sql(d: str) -> str:
    return f"""
    WITH dist AS (
      SELECT p.url, c.center_id, {_HAVERSINE_SQL} AS dkm
      FROM read_parquet('{d}/pois_truth.parquet') p
      CROSS JOIN read_parquet('{d}/band_centers.parquet') c
      WHERE p.has_geo)
    SELECT url, arg_min(center_id, dkm) AS nearest_center_id,
           ROUND(min(dkm), 6) AS distance_km,
           ROUND(min(dkm) * 0.621371, 6) AS distance_miles
    FROM dist GROUP BY url
    """


# ---------------------------------------------------------------------------
# Travel-time band assignment
# ---------------------------------------------------------------------------

def bands_q(sf_dir: str):
    ds = _extracted_valid(sf_dir)
    centers_ref = knn_mod.centers_ref_from_parquet(
        synth.table_path(sf_dir, "band_centers"))
    out = bands_mod.assign_bands(ds, centers_ref, keep_cols=("url",))
    return out.select_columns(["url", "center_id", "band"])


def bands_sql(d: str) -> str:
    speeds = " ".join(
        f"WHEN '{m}' THEN {s}" for m, s in
        bands_mod.MODE_SPEED_KM_MIN.items())
    return f"""
    WITH dist AS (
      SELECT p.url, c.center_id, c.travel_mode, {_HAVERSINE_SQL} AS dkm
      FROM read_parquet('{d}/pois_truth.parquet') p
      CROSS JOIN read_parquet('{d}/band_centers.parquet') c
      WHERE p.has_geo),
    nearest AS (
      SELECT url, arg_min(center_id, dkm) AS center_id,
             min(dkm) / (CASE arg_min(travel_mode, dkm) {speeds} END)
               AS minutes
      FROM dist GROUP BY url)
    SELECT url, center_id,
           CAST(CASE WHEN minutes <= 5 THEN 5 WHEN minutes <= 10 THEN 10
                     WHEN minutes <= 15 THEN 15 WHEN minutes <= 30 THEN 30
                     ELSE -1 END AS BIGINT) AS band
    FROM nearest
    """


# ---------------------------------------------------------------------------
# Demographic enrichment of zones
# ---------------------------------------------------------------------------

def enrich_zones_q(sf_dir: str):
    synth.ensure_synth(sf_dir)
    zones = rd.read_parquet(synth.table_path(sf_dir, "zones"),
                            columns=["zone_id", "kind"])
    demo_ref = enrich_mod.demographics_ref(
        synth.table_path(sf_dir, "demographics"))
    out = enrich_mod.enrich(zones, demo_ref)
    return out.select_columns(
        ["zone_id", "kind", "total_population", "median_household_income",
         "households_no_vehicle", "median_age"])


def enrich_zones_sql(d: str) -> str:
    sents = ", ".join(str(s) for s in scalars.SENTINEL_VALUES)
    return f"""
    WITH clean AS (
      SELECT geoid, variable_code,
             CASE WHEN value IN ({sents}) OR value < -100000
                  THEN NULL ELSE value END AS v
      FROM read_parquet('{d}/demographics.parquet'))
    SELECT z.zone_id, z.kind,
      SUM(CASE WHEN variable_code = 'B01003_001E' THEN v END)
        AS total_population,
      SUM(CASE WHEN variable_code = 'B19013_001E' THEN v END)
        AS median_household_income,
      SUM(CASE WHEN variable_code IN ('B25044_003E', 'B25044_010E') THEN v END)
        AS households_no_vehicle,
      SUM(CASE WHEN variable_code = 'B01002_001E' THEN v END) AS median_age
    FROM read_parquet('{d}/zones.parquet') z
    LEFT JOIN clean ON z.zone_id = clean.geoid
    GROUP BY z.zone_id, z.kind
    """


# ---------------------------------------------------------------------------
# Scalar operators over the synthetic tables
# ---------------------------------------------------------------------------

def geoid_components_q(sf_dir: str):
    synth.ensure_synth(sf_dir)
    zones = rd.read_parquet(synth.table_path(sf_dir, "zones"),
                            columns=["zone_id"])
    out = zones.map_batches(scalars.geoid_components, batch_format="pyarrow")
    return out.select_columns(["zone_id", "state_fips", "county_fips",
                               "tract", "block_group"])


def geoid_components_sql(d: str) -> str:
    return f"""
    SELECT zone_id,
           substr(zone_id, 1, 2)  AS state_fips,
           substr(zone_id, 3, 3)  AS county_fips,
           substr(zone_id, 6, 6)  AS tract,
           substr(zone_id, 12, 1) AS block_group
    FROM read_parquet('{d}/zones.parquet')
    """


def scrub_demographics_q(sf_dir: str):
    synth.ensure_synth(sf_dir)
    demo = rd.read_parquet(synth.table_path(sf_dir, "demographics"),
                           columns=["geoid", "variable_code", "value"])

    def fn(t):
        return t.append_column("value_clean",
                               scalars.scrub_sentinels(t["value"]))

    return demo.map_batches(fn, batch_format="pyarrow") \
        .select_columns(["geoid", "variable_code", "value_clean"])


def scrub_demographics_sql(d: str) -> str:
    sents = ", ".join(str(s) for s in scalars.SENTINEL_VALUES)
    return f"""
    SELECT geoid, variable_code,
           CASE WHEN value IN ({sents}) OR value < -100000
                THEN NULL ELSE value END AS value_clean
    FROM read_parquet('{d}/demographics.parquet')
    """


def zones_union_q(sf_dir: str):
    """A1 exact polygon union of all zones (rows-only: one row with
    ring/hole counts + exact area; no SQL spatial extension exists to
    oracle it — Monte-Carlo-validated in tests)."""
    from ..stages import geometry_ops

    synth.ensure_synth(sf_dir)
    zones = rd.read_parquet(synth.table_path(sf_dir, "zones"),
                            columns=["wkb"])
    return geometry_ops.exact_union(zones)


# ---------------------------------------------------------------------------
# S1: custom-coordinates reader (alias resolution + validation)
# ---------------------------------------------------------------------------

def custom_pois_q(sf_dir: str):
    from ..sources import readers

    path = synth.aux_path(sf_dir, "custom_coords.csv")
    ds = readers.read_custom_coordinates(path)
    return ds.select_columns(["id", "name", "type", "lat", "lon"])


def custom_pois_sql(d: str) -> str:
    return f"""
    SELECT CAST(key AS VARCHAR) AS id, label AS name,
           category AS type, latitude AS lat, lng AS lon
    FROM read_csv('{d}/custom_coords.csv', header=true)
    WHERE latitude BETWEEN -90 AND 90 AND lng BETWEEN -180 AND 180
    """


# ---------------------------------------------------------------------------
# M7: zone centroids (shoelace) — WKB in the engine, edge table in SQL
# ---------------------------------------------------------------------------

def zone_centroids_q(sf_dir: str):
    from ..stages import geometry_ops

    synth.ensure_synth(sf_dir)
    zones = rd.read_parquet(synth.table_path(sf_dir, "zones"),
                            columns=["zone_id", "wkb"])
    out = geometry_ops.zone_centroids(zones)
    return out.map_batches(
        lambda df: pd.DataFrame({
            "zone_id": df["zone_id"],
            "cx": df["cx"].round(6), "cy": df["cy"].round(6)}),
        batch_format="pandas")


def zone_centroids_sql(d: str) -> str:
    return f"""
    SELECT zone_id,
           ROUND(SUM((x1 + x2) * (x1 * y2 - x2 * y1))
                 / (3 * SUM(x1 * y2 - x2 * y1)), 6) AS cx,
           ROUND(SUM((y1 + y2) * (x1 * y2 - x2 * y1))
                 / (3 * SUM(x1 * y2 - x2 * y1)), 6) AS cy
    FROM read_parquet('{d}/zone_edges.parquet')
    GROUP BY zone_id
    """


# ---------------------------------------------------------------------------
# J6: static neighbor-lookup broadcast join
# ---------------------------------------------------------------------------

def zone_neighbors_q(sf_dir: str):
    import pyarrow.parquet as pq

    import ray

    synth.ensure_synth(sf_dir)
    nb = pq.read_table(
        synth.aux_path(sf_dir, "state_neighbors.parquet")).to_pandas()
    counts = nb.groupby("state_fips").size().to_dict()
    nb_ref = ray.put(counts)

    zones = rd.read_parquet(synth.table_path(sf_dir, "zones"),
                            columns=["zone_id"])

    class NeighborLookup:
        def __init__(self, ref):
            self.counts = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            state = df["zone_id"].str[:2]
            return pd.DataFrame({
                "zone_id": df["zone_id"],
                "state_fips": state,
                "n_neighbors": state.map(self.counts).fillna(0)
                                    .astype(np.int64),
            })

    return zones.map_batches(NeighborLookup, fn_constructor_args=(nb_ref,),
                             batch_format="pandas", concurrency=2,
                             num_cpus=0.5)


def zone_neighbors_sql(d: str) -> str:
    return f"""
    SELECT z.zone_id, substr(z.zone_id, 1, 2) AS state_fips,
           CAST(COUNT(n.neighbor_fips) AS BIGINT) AS n_neighbors
    FROM read_parquet('{d}/zones.parquet') z
    LEFT JOIN read_parquet('{d}/state_neighbors.parquet') n
      ON substr(z.zone_id, 1, 2) = n.state_fips
    GROUP BY z.zone_id
    """


# ---------------------------------------------------------------------------
# J7: tract-prefix semi-join (broadcast key-set filter)
# ---------------------------------------------------------------------------

_TRACT_PREFIX_COUNT = 12


def _tract_prefixes(d: str) -> list[str]:
    """Deterministic small tract set: the first N distinct 11-char
    prefixes of the zone table (sorted)."""
    import pyarrow.parquet as pq

    ids = pq.read_table(f"{d}/zones.parquet",
                        columns=["zone_id"])["zone_id"].to_pylist()
    return sorted({z[:11] for z in ids})[:_TRACT_PREFIX_COUNT]


def tract_semijoin_q(sf_dir: str):
    """Keep zones whose GEOID[:11] is in the broadcast tract set
    (reference tiger/client.py:189-194)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    d = synth.ensure_synth(sf_dir)
    tracts = pa.array(_tract_prefixes(d))
    zones = rd.read_parquet(synth.table_path(sf_dir, "zones"),
                            columns=["zone_id", "kind"])

    def fn(t: pa.Table) -> pa.Table:
        prefix = pc.utf8_slice_codeunits(t["zone_id"], 0, 11)
        return t.filter(pc.is_in(prefix, value_set=tracts))

    return zones.map_batches(fn, batch_format="pyarrow")


def tract_semijoin_sql(d: str) -> str:
    tracts = ", ".join(f"'{t}'" for t in _tract_prefixes(d))
    return f"""
    SELECT zone_id, kind FROM read_parquet('{d}/zones.parquet')
    WHERE substr(zone_id, 1, 11) IN ({tracts})
    """


# ---------------------------------------------------------------------------
# S5: ZCTA source — prefix-partitioned fetch
# ---------------------------------------------------------------------------

_ZCTA_PREFIX_COUNT = 8


def _zcta_prefixes(d: str) -> list[str]:
    """Deterministic ZCTA prefix set (first N distinct 3-char prefixes
    of the zcta-kind zones, sorted) — the analogue of the reference's
    state-prefix ZCTA fetch (census/services/zcta_service.py:38-203)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{d}/zones.parquet", columns=["zone_id", "kind"])
    ids = [z for z, k in zip(t["zone_id"].to_pylist(),
                             t["kind"].to_pylist()) if k == "zcta"]
    return sorted({z[:3] for z in ids})[:_ZCTA_PREFIX_COUNT]


def zcta_by_prefix_q(sf_dir: str):
    """ZCTA rows fetched by code prefix (reference S5: ZCTAs are
    requested per 2/3-digit prefix batch and standardised; here the
    prefix set filters the zcta partition of the zone table with the
    same vectorized semi-join machinery as J7)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    d = synth.ensure_synth(sf_dir)
    prefixes = pa.array(_zcta_prefixes(d))
    zones = rd.read_parquet(synth.table_path(sf_dir, "zones"),
                            columns=["zone_id", "kind", "lat_min", "lat_max",
                                     "lon_min", "lon_max"])

    def fn(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["kind"], "zcta"))
        pref = pc.utf8_slice_codeunits(t["zone_id"], 0, 3)
        t = t.filter(pc.is_in(pref, value_set=prefixes))
        return pa.table({
            "zcta_code": pc.utf8_slice_codeunits(t["zone_id"], 0, 5),
            "zone_id": t["zone_id"],
            "lat_min": t["lat_min"], "lat_max": t["lat_max"],
            "lon_min": t["lon_min"], "lon_max": t["lon_max"],
        })

    return zones.map_batches(fn, batch_format="pyarrow")


def zcta_by_prefix_sql(d: str) -> str:
    prefixes = ", ".join(f"'{p}'" for p in _zcta_prefixes(d))
    return f"""
    SELECT substr(zone_id, 1, 5) AS zcta_code, zone_id,
           lat_min, lat_max, lon_min, lon_max
    FROM read_parquet('{d}/zones.parquet')
    WHERE kind = 'zcta' AND substr(zone_id, 1, 3) IN ({prefixes})
    """


# ---------------------------------------------------------------------------
# S7/ST4: geocoding through the provider chain against a gazetteer
# ---------------------------------------------------------------------------

def geocode_pois_q(sf_dir: str):
    """Geocode extracted POI names through the provider-chain engine
    (reference S7 AddressGeocodingEngine, geocoding/engine.py:52-175,
    + ST4 cache): the primary provider is a broadcast gazetteer built
    from the ground-truth POI database (name -> coords of the min
    doc_id occurrence), with the deterministic hash provider as the
    fallback for misses; the actor-local cache absorbs repeated names.
    SQL oracle: the equivalent arg_min-gazetteer join.
    """
    import pyarrow.parquet as pq

    import ray

    from ..stages import geocode as geocode_mod

    d = synth.ensure_synth(sf_dir)
    gaz = pq.read_table(f"{d}/pois_truth.parquet",
                        columns=["name", "lat", "lon", "doc_id",
                                 "has_geo"]).to_pandas()
    gaz = gaz[gaz["has_geo"]].sort_values("doc_id", kind="stable") \
        .drop_duplicates("name").sort_values("name")
    gaz_ref = ray.put((gaz["name"].to_numpy(), gaz["lat"].to_numpy(),
                       gaz["lon"].to_numpy()))

    ds = _extracted_valid(sf_dir).select_columns(["url", "name"])
    out = geocode_mod.geocode_addresses(
        ds, address_col="name",
        providers=[geocode_mod.GazetteerGeocoder(gaz_ref),
                   geocode_mod.HashGeocoder()])

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "url": df["url"], "name": df["name"],
            "lat_r": df["lat"].round(6), "lon_r": df["lon"].round(6),
            "provider": df["provider"],
        })

    return out.map_batches(fin, batch_format="pandas")


def geocode_pois_sql(d: str) -> str:
    return f"""
    WITH gaz AS (
      SELECT name, arg_min(lat, doc_id) AS lat, arg_min(lon, doc_id) AS lon
      FROM read_parquet('{d}/pois_truth.parquet') WHERE has_geo
      GROUP BY name)
    SELECT q.url, q.name,
           ROUND(g.lat, 6) AS lat_r, ROUND(g.lon, 6) AS lon_r,
           'gazetteer' AS provider
    FROM (SELECT url, name FROM read_parquet('{d}/pois_truth.parquet')
          WHERE has_geo) q
    JOIN gaz g ON q.name = g.name
    """


# ---------------------------------------------------------------------------
# K6 substitute: headless choropleth classing (quantile bins per zone)
# ---------------------------------------------------------------------------

def zone_choropleth_q(sf_dir: str, n_classes: int = 5):
    """Per-zone choropleth class table (reference K6,
    visualization/chloropleth.py:34+ quantile classification): each
    enriched zone gets its quantile bin of total_population.

    The heavy work (enrichment join) streams; the classing itself runs
    on one block because the zone table is the SMALL side by
    construction (it is the map output — ~1e5 rows nationally). Class
    boundaries replicate SQL NTILE exactly: rows sorted by
    (value, zone_id), first n%k classes get one extra row.
    """
    enriched = enrich_zones_q(sf_dir) \
        .select_columns(["zone_id", "total_population"])

    def classes(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["total_population"].notna()]
        df = df.sort_values(["total_population", "zone_id"],
                            kind="stable").reset_index(drop=True)
        n, k = len(df), n_classes
        q, r = divmod(n, k)
        sizes = np.full(k, q, dtype=np.int64)
        sizes[:r] += 1
        return pd.DataFrame({
            "zone_id": df["zone_id"],
            "total_population": df["total_population"],
            "class": np.repeat(np.arange(1, k + 1), sizes).astype(np.int64),
        })

    return enriched.repartition(1).map_batches(
        classes, batch_format="pandas", batch_size=None)


def zone_choropleth_sql(d: str) -> str:
    return f"""
    WITH clean AS (
      SELECT geoid,
             CASE WHEN value IN ({", ".join(str(s) for s in
                                            scalars.SENTINEL_VALUES)})
                    OR value < -100000 THEN NULL ELSE value END AS v
      FROM read_parquet('{d}/demographics.parquet')
      WHERE variable_code = 'B01003_001E'),
    pop AS (
      SELECT z.zone_id, SUM(clean.v) AS total_population
      FROM read_parquet('{d}/zones.parquet') z
      LEFT JOIN clean ON z.zone_id = clean.geoid
      GROUP BY z.zone_id)
    SELECT zone_id, total_population,
           CAST(NTILE(5) OVER (ORDER BY total_population, zone_id)
                AS BIGINT) AS class
    FROM pop WHERE total_population IS NOT NULL
    """


def choropleth_raster_q(sf_dir: str, width: int = 256, height: int = 256,
                        n_classes: int = 5):
    """K6 closed fully: render the classed zones to an actual image
    (reference visualization/chloropleth.py:122-196 + save:450-481 —
    quantile classes through the default YlOrBr ramp, missing zones
    lightgrey, PNG on disk) — here a from-scratch strip-parallel
    numpy rasterization + RFC-2083 PNG encoder (stages/raster.py).

    Returns the per-class pixel histogram — the checkable numeric
    shadow of the image (class -1 = background, 0 = missing-data zone,
    1..k = palette classes) plus the PNG byte size; the PNG itself is
    written under /tmp/smray_artifacts. Deterministic end-to-end: same
    input -> byte-identical PNG (golden-hash pytest).
    """
    import hashlib
    import os

    import pyarrow.parquet as pq

    from .. import geom
    from ..stages import raster

    d = synth.ensure_synth(sf_dir)
    classed = zone_choropleth_q(sf_dir, n_classes=n_classes).to_pandas()
    cls_by_zone = dict(zip(classed["zone_id"], classed["class"]))
    tbl = pq.read_table(synth.table_path(sf_dir, "zones"),
                        columns=["zone_id", "wkb"])
    zone_ids = tbl["zone_id"].to_numpy(zero_copy_only=False)
    polyset = geom.PolygonSet.from_wkb_arrow(tbl["wkb"])
    classes = np.asarray([cls_by_zone.get(z, 0) for z in zone_ids],
                         dtype=np.int64)
    colors = raster.class_colors(classes)
    img = raster.render_zones(polyset, colors, width=width, height=height)
    # the exported artifact carries the reference's annotation surface
    # (title + classed legend, ref chloropleth.py:122-196 /
    # pipeline/map.py:24-120) composited from the embedded bitmap font;
    # the HISTOGRAM below stays on the un-annotated raster — it is the
    # numeric shadow of the MAP, not of the legend pixels
    legend = [(f"Q{k}", tuple(raster.PALETTE_YLORBR[k - 1]))
              for k in range(1, n_classes + 1)]
    legend.append(("MISSING", tuple(raster.MISSING_RGB)))
    annotated = raster.annotate_choropleth(
        img, "TOTAL POPULATION BY ZONE (QUANTILES)", legend)
    png = raster.png_encode(annotated)
    out_dir = "/tmp/smray_artifacts"
    os.makedirs(out_dir, exist_ok=True)
    tag = hashlib.sha256(d.encode()).hexdigest()[:10]
    with open(os.path.join(out_dir, f"choropleth-{tag}.png"), "wb") as f:
        f.write(png)

    # pixel histogram keyed by the class each color encodes
    flat = img.reshape(-1, 3)
    color_for = {-1: raster.BACKGROUND_RGB, 0: raster.MISSING_RGB}
    for k in range(1, n_classes + 1):
        color_for[k] = raster.PALETTE_YLORBR[k - 1]
    rows = []
    for k, c in sorted(color_for.items()):
        n = int((flat == c).all(axis=1).sum())
        if n:
            rows.append({"class": int(k), "n_pixels": n,
                         "png_bytes": len(png)})
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# ST2/K5: travel-band polygon artifact as a checkable vertex table
# ---------------------------------------------------------------------------

def band_polygons_q(sf_dir: str, n_vertices: int = 32):
    """Per-(facility, band) isochrone-analogue polygons, emitted as a
    vertex table so DuckDB can recompute every coordinate (reference
    isochrone/clustering.py:388-428 builds travel-time polygons;
    K5 exports them — the WKB artifact path is
    stages/bands.band_polygons + sinks GeoParquetExporter).

    Vertex math (identical IEEE op order in SQL): radius_km = speed*t;
    dlat = radius/((pi/180)*R); dlon = dlat/max(cos(lat),1e-9);
    lon_i = lon + dlon*cos(2*pi*i/n), lat_i = lat + dlat*sin(...);
    per-row transcendental floats round to 6 on both sides.
    """
    from ..stages.bands import BAND_MINUTES, MODE_SPEED_KM_MIN

    synth.ensure_synth(sf_dir)
    centers = rd.read_parquet(synth.table_path(sf_dir, "band_centers"))
    km_per_deg = (np.pi / 180.0) * geom_earth_radius()

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        n_c = len(df)
        bands = np.asarray(BAND_MINUTES, dtype=np.float64)
        idx = np.arange(n_vertices, dtype=np.float64)
        ang = (2.0 * np.pi) * idx / float(n_vertices)
        speed = df["travel_mode"].map(MODE_SPEED_KM_MIN).to_numpy()
        lat = df["lat"].to_numpy()
        lon = df["lon"].to_numpy()
        coslat = np.maximum(np.cos(np.radians(lat)), 1e-9)
        # broadcast (centers, bands, vertices)
        radius = speed[:, None] * bands[None, :]             # (c, b)
        dlat = radius / km_per_deg
        dlon = radius / (km_per_deg * coslat[:, None])
        lon_v = lon[:, None, None] + dlon[:, :, None] * np.cos(ang)[None, None, :]
        lat_v = lat[:, None, None] + dlat[:, :, None] * np.sin(ang)[None, None, :]
        n_b, n_v = len(bands), n_vertices
        return pd.DataFrame({
            "center_id": np.repeat(df["center_id"].to_numpy(), n_b * n_v),
            "band": np.tile(np.repeat(bands.astype(np.int64), n_v), n_c),
            "vertex_idx": np.tile(np.arange(n_v, dtype=np.int64), n_c * n_b),
            "lon_r": np.round(lon_v.ravel(), 6),
            "lat_r": np.round(lat_v.ravel(), 6),
        })

    return centers.map_batches(fn, batch_format="pandas")


def geom_earth_radius() -> float:
    from .. import geom

    return geom.EARTH_RADIUS_KM


def band_polygons_sql(d: str, n_vertices: int = 32) -> str:
    from ..stages.bands import BAND_MINUTES, MODE_SPEED_KM_MIN

    speeds = " ".join(
        f"WHEN '{m}' THEN {s}" for m, s in MODE_SPEED_KM_MIN.items())
    bands = ", ".join(str(b) for b in BAND_MINUTES)
    return f"""
    WITH v AS (SELECT unnest(range({n_vertices})) AS vertex_idx),
    b AS (SELECT unnest([{bands}]) AS band),
    c AS (
      SELECT center_id, lat, lon,
             CASE travel_mode {speeds} END AS speed
      FROM read_parquet('{d}/band_centers.parquet'))
    SELECT c.center_id, CAST(b.band AS BIGINT) AS band,
           CAST(v.vertex_idx AS BIGINT) AS vertex_idx,
           ROUND(c.lon + (c.speed * b.band)
                 / ((pi()/180)*{6371.0088} * greatest(cos(radians(c.lat)), 1e-9))
                 * cos((2*pi()) * v.vertex_idx / {n_vertices}), 6) AS lon_r,
           ROUND(c.lat + (c.speed * b.band) / ((pi()/180)*{6371.0088})
                 * sin((2*pi()) * v.vertex_idx / {n_vertices}), 6) AS lat_r
    FROM c CROSS JOIN b CROSS JOIN v
    """


# ---------------------------------------------------------------------------
# A4: per-kind cluster metrics (Count/Mean/Max/Min aggregates)
# ---------------------------------------------------------------------------

def zone_area_stats_q(sf_dir: str):
    """Per-kind polygon AREA rollup (A8-adjacent geometry aggregation):
    shoelace area per zone from the WKB ring, quantized to exact e6
    integers BEFORE any aggregation (integer sums are order-exact
    across engines), then a per-kind count/sum/min/max.

    Oracle: the generator's independent zone_edges ground-truth table —
    the SQL shoelace runs over the same edge terms, so the one double
    each side rounds is numerically identical up to summation order
    (same trust model as the zone_centroids oracle).
    """
    from .. import geom

    synth.ensure_synth(sf_dir)
    zones = rd.read_parquet(synth.table_path(sf_dir, "zones"),
                            columns=["zone_id", "kind", "wkb"])

    def areas(df: pd.DataFrame) -> pd.DataFrame:
        vals = []
        for blob in df["wkb"]:
            _, coords = geom.wkb_decode(blob)
            c = np.asarray(coords, dtype=np.float64)
            if len(c) > 1 and np.array_equal(c[0], c[-1]):
                c = c[:-1]
            x, y = c[:, 0], c[:, 1]
            x2, y2 = np.roll(x, -1), np.roll(y, -1)
            a = abs((x * y2 - x2 * y).sum()) / 2.0
            # floor(x + 0.5), NOT round(): numpy/python round is
            # half-to-even while DuckDB's is half-away — an area sum
            # landing exactly on a .5e-6 boundary would flip the integer
            # between engines (same convention as the other e-scale
            # oracles; see graft hash-stability notes)
            vals.append(int(np.floor(a * 1e6 + 0.5)))
        part = pd.DataFrame({"kind": df["kind"],
                             "area_e6": np.asarray(vals, dtype=np.int64)})
        return part.groupby("kind", sort=False).agg(
            n=("area_e6", "size"), s=("area_e6", "sum"),
            lo=("area_e6", "min"), hi=("area_e6", "max")).reset_index()

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("kind", sort=False).agg(
            n=("n", "sum"), s=("s", "sum"), lo=("lo", "min"),
            hi=("hi", "max")).reset_index()
        return pd.DataFrame({
            "kind": g["kind"],
            "n_zones": g["n"].astype(np.int64),
            "sum_area_e6": g["s"].astype(np.int64),
            "min_area_e6": g["lo"].astype(np.int64),
            "max_area_e6": g["hi"].astype(np.int64)})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        # idempotent partial fold for the 2-level tree (kind count is
        # bounded; the partial count grows with input blocks)
        return df.groupby("kind", sort=False).agg(
            n=("n", "sum"), s=("s", "sum"), lo=("lo", "min"),
            hi=("hi", "max")).reset_index()

    from ..util import tree_combine

    return tree_combine(zones.map_batches(areas, batch_format="pandas"),
                        fold) \
        .map_batches(combine, batch_format="pandas", batch_size=None)


def zone_area_stats_sql(d: str) -> str:
    return f"""
    WITH area AS (
      SELECT zone_id,
             CAST(floor(1e6 * abs(SUM(x1 * y2 - x2 * y1)) / 2 + 0.5)
                  AS BIGINT) AS area_e6
      FROM read_parquet('{d}/zone_edges.parquet')
      GROUP BY zone_id),
    z AS (SELECT zone_id, kind FROM read_parquet('{d}/zones.parquet'))
    SELECT z.kind, CAST(COUNT(*) AS BIGINT) AS n_zones,
           CAST(SUM(a.area_e6) AS BIGINT) AS sum_area_e6,
           CAST(MIN(a.area_e6) AS BIGINT) AS min_area_e6,
           CAST(MAX(a.area_e6) AS BIGINT) AS max_area_e6
    FROM area a JOIN z USING (zone_id)
    GROUP BY z.kind
    """


def zone_kind_stats_q(sf_dir: str):
    """Per-kind zone stats (reference clustering.py:122-137 cluster
    metrics): the canonical Count/Mean/Max/Min grouped aggregate."""
    from ray.data.aggregate import Count, Max, Mean, Min

    synth.ensure_synth(sf_dir)
    zones = rd.read_parquet(synth.table_path(sf_dir, "zones"),
                            columns=["kind", "n_vertices"])
    agg = zones.groupby("kind").aggregate(
        Count(alias_name="n_zones"),
        Mean("n_vertices", alias_name="avg_v"),
        Max("n_vertices", alias_name="max_vertices"),
        Min("n_vertices", alias_name="min_vertices"))

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "kind": df["kind"],
            "n_zones": df["n_zones"].astype(np.int64),
            # integer-ppm mean: exact division of exact ints both sides
            "avg_vertices_ppm": np.floor(df["avg_v"] * 1e6).astype(np.int64),
            "max_vertices": df["max_vertices"].astype(np.int64),
            "min_vertices": df["min_vertices"].astype(np.int64),
        })

    return agg.map_batches(fin, batch_format="pandas")


def zone_kind_stats_sql(d: str) -> str:
    return f"""
    SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_zones,
           CAST(floor(1e6 * SUM(n_vertices) / COUNT(*)) AS BIGINT)
             AS avg_vertices_ppm,
           CAST(MAX(n_vertices) AS BIGINT) AS max_vertices,
           CAST(MIN(n_vertices) AS BIGINT) AS min_vertices
    FROM read_parquet('{d}/zones.parquet') GROUP BY kind
    """


# ---------------------------------------------------------------------------
# Network-based isochrone bands (true ST2: shortest paths on a road graph)
# ---------------------------------------------------------------------------

def network_bands_q(sf_dir: str):
    """Travel-time bands via shortest paths over the synthetic road
    lattice (reference isochrone/clustering.py:335-432): per band
    center, every network node within the 900 s horizon with its exact
    network distance and 300 s band.

    Graph broadcast once (edges_ref); sources stream through the
    NetworkBandRouter actor pool. The SQL oracle recomputes the same
    distances with a DuckDB recursive CTE — a fully independent
    shortest-path implementation.
    """
    from ..stages import network as net_mod

    d = synth.ensure_synth(sf_dir)
    edges_ref = net_mod.edges_ref_from_parquet(
        synth.table_path(sf_dir, "road_edges"))
    sources = rd.read_parquet(synth.table_path(sf_dir, "road_sources"),
                              override_num_blocks=8)
    out = net_mod.network_bands(sources, edges_ref)
    return out.map_batches(
        lambda df: pd.DataFrame({
            "center_id": df["center_id"],
            "node_id": df["node_id"].astype(np.int64),
            "dist_s": df["dist_s"].astype(np.int64),
            "band": df["band"].astype(np.int64)}),
        batch_format="pandas")


def network_bands_sql(d: str) -> str:
    from ..stages import network as net_mod

    cap, band = net_mod.MAX_DIST_S, net_mod.BAND_S
    return f"""
    WITH RECURSIVE sp(center_id, node, dist) AS (
      SELECT center_id, node_id, 0
      FROM read_parquet('{d}/road_sources.parquet')
      UNION
      SELECT sp.center_id, e.dst, sp.dist + e.w_s
      FROM sp JOIN read_parquet('{d}/road_edges.parquet') e
        ON sp.node = e.src
      WHERE sp.dist + e.w_s <= {cap}
    )
    SELECT center_id, CAST(node AS BIGINT) AS node_id,
           CAST(MIN(dist) AS BIGINT) AS dist_s,
           CAST(MIN(dist) // {band} AS BIGINT) AS band
    FROM sp GROUP BY center_id, node
    """


def network_bands_multimode_q(sf_dir: str):
    """Per-travel-mode network isochrone bands (closes reference M13:
    isochrone/travel_modes.py:12-152 default + per-highway-class speeds
    per mode). Edge travel times derive from (len_m, hw_class) via the
    integer speed table stages/network.py SPEED_KMH; each mode runs the
    same SSSP actor pool under its own horizon (MODE_CAP_S) and the
    three band tables union with a mode column. Modes genuinely
    diverge: a motorway edge is 13x faster by car than on foot, so the
    same center yields different reachable sets per mode — each checked
    exactly by an independent per-mode recursive-CTE SQL oracle.

    All modes run through ONE actor pool over a mode-expanded source
    stream (stages/network.py MultiModeBandRouter) — one pool per mode
    unioned into a single DAG can reserve every CPU of a small session
    and deadlock the upstream reads."""
    from ..stages import network as net_mod

    d = synth.ensure_synth(sf_dir)
    sources = rd.read_parquet(synth.table_path(sf_dir, "road_sources"),
                              override_num_blocks=8)
    edges_ref = net_mod.edges_ref_allmodes_from_parquet(
        synth.table_path(sf_dir, "road_edges"))
    out = net_mod.network_bands_multimode(sources, edges_ref)
    return out.map_batches(
        lambda df: pd.DataFrame({
            "mode": df["mode"],
            "center_id": df["center_id"],
            "node_id": df["node_id"].astype(np.int64),
            "dist_s": df["dist_s"].astype(np.int64),
            "band": df["band"].astype(np.int64)}),
        batch_format="pandas")


def network_bands_multimode_sql(d: str) -> str:
    from ..stages import network as net_mod

    band = net_mod.BAND_S
    parts = []
    for mode in sorted(net_mod.SPEED_KMH):
        cap = net_mod.MODE_CAP_S[mode]
        case = " ".join(
            f"WHEN '{cls}' THEN {kmh}"
            for cls, kmh in net_mod.SPEED_KMH[mode].items())
        parts.append(f"""
    (WITH RECURSIVE we AS (
      SELECT src, dst,
             GREATEST((len_m * 36) // ((CASE hw_class {case} END) * 10), 1)
               AS w
      FROM read_parquet('{d}/road_edges.parquet')
    ), sp(center_id, node, dist) AS (
      SELECT center_id, node_id, 0
      FROM read_parquet('{d}/road_sources.parquet')
      UNION
      SELECT sp.center_id, we.dst, sp.dist + we.w
      FROM sp JOIN we ON sp.node = we.src
      WHERE sp.dist + we.w <= {cap}
    )
    SELECT '{mode}' AS mode, center_id, CAST(node AS BIGINT) AS node_id,
           CAST(MIN(dist) AS BIGINT) AS dist_s,
           CAST(MIN(dist) // {band} AS BIGINT) AS band
    FROM sp GROUP BY center_id, node)""")
    return " UNION ALL ".join(parts)


def radius_join_q(sf_dir: str, radius_km: float = 200.0):
    """Spatial range join: every (POI, center) pair within 200 km
    (reference J5 widened to range semantics). Engine and oracle share
    the haversine definition to round-6 precision; a pair exactly ON
    the 200 km boundary could differ in the last ulp between numpy and
    DuckDB — probability ~0 in the synthetic world (same class as the
    documented PIP boundary rule)."""
    ds = _extracted_valid(sf_dir)
    centers_ref = knn_mod.centers_ref_from_parquet(
        synth.table_path(sf_dir, "band_centers"))
    out = knn_mod.radius_join(ds, centers_ref, radius_km,
                              keep_cols=("url",))
    return out.map_batches(
        lambda df: pd.DataFrame({
            "url": df["url"], "center_id": df["center_id"],
            "distance_km": df["distance_km"].round(6)}),
        batch_format="pandas")


def radius_join_sql(d: str, radius_km: float = 200.0) -> str:
    return f"""
    SELECT p.url, c.center_id, ROUND({_HAVERSINE_SQL}, 6) AS distance_km
    FROM read_parquet('{d}/pois_truth.parquet') p
    CROSS JOIN read_parquet('{d}/band_centers.parquet') c
    WHERE p.has_geo AND {_HAVERSINE_SQL} <= {radius_km}
    """


def knn_topk_q(sf_dir: str, k: int = 3):
    """k-nearest facilities per POI, ranked (J5 extended to true
    top-k). Deterministic: the synthetic world has no exactly
    equidistant (point, facility) pairs; ranks tie-break on distance
    sort stability mirrored by the SQL row_number ORDER BY."""
    ds = _extracted_valid(sf_dir)
    centers_ref = knn_mod.centers_ref_from_parquet(
        synth.table_path(sf_dir, "band_centers"))
    out = knn_mod.knn_topk(ds, centers_ref, k=k, keep_cols=("url",))
    return out.map_batches(
        lambda df: pd.DataFrame({
            "url": df["url"],
            "rank": df["rank"].astype(np.int64),
            "center_id": df["center_id"],
            "distance_km": df["distance_km"].round(6)}),
        batch_format="pandas")


def knn_topk_sql(d: str, k: int = 3) -> str:
    return f"""
    WITH dist AS (
      SELECT p.url, c.center_id, {_HAVERSINE_SQL} AS dkm
      FROM read_parquet('{d}/pois_truth.parquet') p
      CROSS JOIN read_parquet('{d}/band_centers.parquet') c
      WHERE p.has_geo)
    SELECT url,
           CAST(row_number() OVER (PARTITION BY url
                                   ORDER BY dkm, center_id) AS BIGINT)
             AS rank,
           center_id, ROUND(dkm, 6) AS distance_km
    FROM dist QUALIFY rank <= {k}
    """
