"""Deterministic synthetic world: Common-Crawl-style pages + spatial tables.

BASELINE.json's ``input_hint`` fixes the engine's input shape:
``pages(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)``. No external data exists in this sandbox, so this module
synthesises that table — deterministically, seeded only by the driver's
``documents.parquet`` — together with the spatial small-side tables the
reference pipeline needs (polygons ≙ census block groups / isochrones,
demographics ≙ ACS long table: reference
census/services/block_group_service.py:84-104 and
census/domain/entities.py:52-66).

Crucially the generator also writes *independent ground-truth* tables
(``pois_truth``, ``zone_edges``): the generator computes lat/lon and
embeds them into the HTML; the pipeline later re-extracts them by
parsing. Generation and extraction share no code, so DuckDB queries over
the truth tables are a genuine oracle for the extract → geoparse → PIP
chain (driver contract, /root/repo/__ray_entry__.py).

Determinism contract: every value is a pure function of ``doc_id`` (or
zone ordinal) via splitmix64 — no RNG state, no time, no row order
dependence. Coordinates are quantised to integer microdegrees and
round-tripped through their decimal string so the double embedded in
HTML, the double in the truth table, and the double parsed by the
pipeline are bit-identical (the "byte-identical per url" invariant of
BASELINE.json scaled to floats).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .. import geom

SYNTH_ROOT = "/tmp/smray_synth"

#: bump when generator output changes shape/content — stale cached
#: worlds under /tmp regenerate instead of poisoning oracle runs
SYNTH_VERSION = "7"

# World bbox (CONUS-ish, mid-latitudes)
LAT_MIN, LAT_MAX = 25.0, 49.0
LON_MIN, LON_MAX = -124.0, -67.0

CENSUS_CODES = ["B01003_001E", "B19013_001E", "B25044_003E", "B25044_010E",
                "B01002_001E"]
SENTINELS = (-999999999.0, -888888888.0, -666666666.0)

_U = np.uint64


def splitmix64(x) -> np.ndarray:
    """Deterministic integer hash (public-domain splitmix64 finalizer)."""
    z = np.atleast_1d(np.asarray(x, dtype=np.uint64))
    with np.errstate(over="ignore"):
        z = (z + _U(0x9E3779B97F4A7C15))
        z = (z ^ (z >> _U(30))) * _U(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U(27))) * _U(0x94D049BB133111EB)
        z = z ^ (z >> _U(31))
    return z if np.ndim(x) else z[0]


def _hash_unit(x, salt: int) -> np.ndarray:
    """Uniform [0, 1) doubles from integer keys, salted."""
    h = splitmix64(np.asarray(x, dtype=np.uint64) ^ _U(salt * 0x9E3779B9 + 1))
    return (h >> _U(11)).astype(np.float64) / float(1 << 53)


def _microdeg(u: np.ndarray, lo: float, hi: float):
    """Quantise uniforms to integer microdegrees in [lo, hi]; return
    (int64 microdegrees, decimal strings, exact parsed doubles)."""
    lo_u, hi_u = int(round(lo * 1e6)), int(round(hi * 1e6))
    micro = (lo_u + (u * (hi_u - lo_u)).astype(np.int64))
    strs = [f"{m // 1000000}.{m % 1000000:06d}" if m >= 0
            else f"-{(-m) // 1000000}.{(-m) % 1000000:06d}" for m in micro.tolist()]
    vals = np.asarray([float(s) for s in strs])
    return micro, strs, vals


# ---------------------------------------------------------------------------
# Pages + POI truth
# ---------------------------------------------------------------------------

_BOILER_NAV = ('<nav><a href="/">home</a> <a href="/about">about</a> '
               '<a href="/contact">contact</a></nav>')
_BOILER_FOOT = "<footer>&copy; example.org — crawled content</footer>"


def build_pages(docs: "pa.Table") -> tuple[pa.Table, pa.Table]:
    """documents rows -> (pages, pois_truth) tables.

    A page embeds its doc text verbatim between <main>…</main> markers
    (escape-free by construction: driver docs contain no '<'/'&'; an
    assert guards this) so the extraction invariant is byte-identity.
    Geo placement: ~82%% of pages carry coordinates — even doc_ids in a
    geo.position <meta>, odd doc_ids inline in the body ("GPS: lat, lon");
    doc_id %% 11 == 3 pages carry none (the invalid/missing side channel
    of reference pipeline/validation.py:11-51).
    """
    doc_id = docs["doc_id"].to_numpy()
    text = docs["text"].to_pylist()
    lang = docs["lang"].to_pylist()
    source = docs["source"].to_pylist()

    _, lat_s, lat_v = _microdeg(_hash_unit(doc_id, 101), LAT_MIN, LAT_MAX)
    _, lon_s, lon_v = _microdeg(_hash_unit(doc_id, 202), LON_MIN, LON_MAX)
    has_geo = (doc_id % 11) != 3
    inline = (doc_id % 2) == 1

    ts = (np.datetime64("2024-01-01T00:00:00", "us")
          + (splitmix64(doc_id) % _U(365 * 24 * 3600)).astype("timedelta64[s]"))

    urls, htmls = [], []
    for k in range(len(doc_id)):
        d = int(doc_id[k])
        t = text[k]
        assert "<" not in t and "&" not in t, "doc text must be markup-free"
        url = f"https://{source[k]}.example.org/doc/{d:010d}"
        name = f"poi-{d:010d}"
        geo_head = geo_body = ""
        if has_geo[k]:
            if inline[k]:
                geo_body = f"<p>GPS: {lat_s[k]}, {lon_s[k]}</p>"
            else:
                geo_head = (f'<meta name="geo.position" '
                            f'content="{lat_s[k]};{lon_s[k]}">\n'
                            f'<meta name="geo.placename" content="{name}">')
        html = (f"<!DOCTYPE html><html><head><title>{name}</title>\n"
                f"{geo_head}</head><body>{_BOILER_NAV}"
                f"<main>{t}</main>{geo_body}{_BOILER_FOOT}</body></html>")
        urls.append(url)
        htmls.append(html.encode("utf-8"))

    pages = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(ts, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": docs["text"],
        "lang": pa.array(lang, pa.string()),
    })
    truth = pa.table({
        "url": pa.array(urls, pa.string()),
        "doc_id": pa.array(doc_id),
        "lat": pa.array(np.where(has_geo, lat_v, np.nan)),
        "lon": pa.array(np.where(has_geo, lon_v, np.nan)),
        "name": pa.array([f"poi-{int(d):010d}" for d in doc_id]),
        "has_geo": pa.array(has_geo),
        "geo_kind": pa.array(np.where(~has_geo, "none",
                                      np.where(inline, "inline", "meta"))),
    })
    return pages, truth


# ---------------------------------------------------------------------------
# Zones (polygons), edges, demographics, band centers
# ---------------------------------------------------------------------------

def _geoid(z: int) -> str:
    state = z % 50 + 1
    county = (z * 7) % 200 + 1
    tract = (z * 9973) % 1000000
    bg = z % 9 + 1
    return f"{state:02d}{county:03d}{tract:06d}{bg:d}"


def build_zones(n_zones: int):
    """n_zones convex polygons + edge table + centroid columns."""
    z = np.arange(n_zones, dtype=np.uint64)
    clat = LAT_MIN + 2.0 + _hash_unit(z, 11) * (LAT_MAX - LAT_MIN - 4.0)
    clon = LON_MIN + 2.0 + _hash_unit(z, 22) * (LON_MAX - LON_MIN - 4.0)
    radius = 0.25 + _hash_unit(z, 33) * 1.25
    nv = 4 + (splitmix64(z ^ _U(44)) % _U(9)).astype(np.int64)  # 4..12
    phase = _hash_unit(z, 55) * 2.0 * np.pi
    flat = 0.6 + _hash_unit(z, 66) * 0.8
    kinds = np.asarray(["blockgroup", "zcta", "isochrone"])[
        (z % _U(3)).astype(np.int64)]

    zone_rows = {k: [] for k in
                 ("zone_id", "kind", "wkb", "lon_min", "lat_min", "lon_max",
                  "lat_max", "centroid_lon", "centroid_lat", "n_vertices")}
    e_zone, e_x1, e_y1, e_x2, e_y2 = [], [], [], [], []
    for k in range(n_zones):
        poly = geom.regular_polygon(float(clat[k]), float(clon[k]),
                                    float(radius[k]), int(nv[k]),
                                    phase=float(phase[k]),
                                    flatten=float(flat[k]))
        gid = _geoid(k)
        cx, cy = geom.polygon_centroid(poly)
        zone_rows["zone_id"].append(gid)
        zone_rows["kind"].append(str(kinds[k]))
        zone_rows["wkb"].append(geom.wkb_polygon(poly))
        zone_rows["lon_min"].append(poly[:, 0].min())
        zone_rows["lat_min"].append(poly[:, 1].min())
        zone_rows["lon_max"].append(poly[:, 0].max())
        zone_rows["lat_max"].append(poly[:, 1].max())
        zone_rows["centroid_lon"].append(cx)
        zone_rows["centroid_lat"].append(cy)
        zone_rows["n_vertices"].append(int(nv[k]))
        nxt = np.roll(np.arange(len(poly)), -1)
        for i, j in zip(range(len(poly)), nxt):
            e_zone.append(gid)
            e_x1.append(poly[i, 0]); e_y1.append(poly[i, 1])
            e_x2.append(poly[j, 0]); e_y2.append(poly[j, 1])

    zones = pa.table({
        "zone_id": pa.array(zone_rows["zone_id"]),
        "kind": pa.array(zone_rows["kind"]),
        "wkb": pa.array(zone_rows["wkb"], pa.binary()),
        "lon_min": pa.array(zone_rows["lon_min"], pa.float64()),
        "lat_min": pa.array(zone_rows["lat_min"], pa.float64()),
        "lon_max": pa.array(zone_rows["lon_max"], pa.float64()),
        "lat_max": pa.array(zone_rows["lat_max"], pa.float64()),
        "centroid_lon": pa.array(zone_rows["centroid_lon"], pa.float64()),
        "centroid_lat": pa.array(zone_rows["centroid_lat"], pa.float64()),
        "n_vertices": pa.array(zone_rows["n_vertices"], pa.int64()),
    })
    edges = pa.table({
        "zone_id": pa.array(e_zone),
        "x1": pa.array(e_x1, pa.float64()), "y1": pa.array(e_y1, pa.float64()),
        "x2": pa.array(e_x2, pa.float64()), "y2": pa.array(e_y2, pa.float64()),
    })
    return zones, edges


def build_zones_donut(n_zones: int):
    """Real-geometry zones — polygons with interior rings (holes) and
    MultiPolygons (the TIGER block-group shapes the reference handles
    via shapely, census/services/spatial_block_group_service.py:110-112)
    — plus the all-rings closed edge table for the crossing-parity SQL
    oracle (even-odd parity over EVERY ring's edges IS containment for
    holes and multi-part zones alike). Cycle of three kinds per zone:
    one-hole donut, two-hole polygon, two-part MultiPolygon whose
    second part has a hole."""
    z = np.arange(n_zones, dtype=np.uint64)
    clat = LAT_MIN + 2.5 + _hash_unit(z, 811) * (LAT_MAX - LAT_MIN - 5.0)
    clon = LON_MIN + 2.5 + _hash_unit(z, 822) * (LON_MAX - LON_MIN - 5.0)
    r_out = 0.6 + _hash_unit(z, 833) * 1.2
    nv = 6 + (splitmix64(z ^ _U(844)) % _U(5)).astype(np.int64)  # 6..10
    phase = _hash_unit(z, 855) * 2.0 * np.pi

    rows = {k: [] for k in ("zone_id", "geom_kind", "wkb", "lon_min",
                            "lat_min", "lon_max", "lat_max")}
    e_zone, e_x1, e_y1, e_x2, e_y2 = [], [], [], [], []

    def add_ring_edges(gid: str, ring: np.ndarray):
        nxt = np.roll(np.arange(len(ring)), -1)
        for i, j in zip(range(len(ring)), nxt):
            e_zone.append(gid)
            e_x1.append(ring[i, 0]); e_y1.append(ring[i, 1])
            e_x2.append(ring[j, 0]); e_y2.append(ring[j, 1])

    for k in range(n_zones):
        la, lo, r = float(clat[k]), float(clon[k]), float(r_out[k])
        n, ph = int(nv[k]), float(phase[k])
        kind = k % 3
        if kind == 0:
            outer = geom.regular_polygon(la, lo, r, n, ph)
            hole = geom.regular_polygon(la, lo, 0.45 * r, max(4, n - 2),
                                        ph + 0.3)
            rings = [outer, hole]
            blob = geom.wkb_polygon(outer, holes=[hole])
            gk = "donut"
        elif kind == 1:
            outer = geom.regular_polygon(la, lo, r, n, ph)
            h1 = geom.regular_polygon(la, lo - 0.45 * r, 0.17 * r, 5,
                                      ph + 0.5)
            h2 = geom.regular_polygon(la, lo + 0.45 * r, 0.17 * r, 6,
                                      ph + 1.1)
            rings = [outer, h1, h2]
            blob = geom.wkb_polygon(outer, holes=[h1, h2])
            gk = "two_holes"
        else:
            pa_o = geom.regular_polygon(la, lo - 0.5 * r, 0.34 * r, n, ph)
            pb_o = geom.regular_polygon(la, lo + 0.5 * r, 0.44 * r,
                                        max(5, n - 1), ph + 0.7)
            pb_h = geom.regular_polygon(la, lo + 0.5 * r, 0.18 * r, 4,
                                        ph + 1.4)
            rings = [pa_o, pb_o, pb_h]
            blob = geom.wkb_multipolygon([pa_o, (pb_o, [pb_h])])
            gk = "multi"
        gid = f"D{k:011d}"
        allv = np.vstack(rings)
        rows["zone_id"].append(gid)
        rows["geom_kind"].append(gk)
        rows["wkb"].append(blob)
        rows["lon_min"].append(allv[:, 0].min())
        rows["lat_min"].append(allv[:, 1].min())
        rows["lon_max"].append(allv[:, 0].max())
        rows["lat_max"].append(allv[:, 1].max())
        for ring in rings:
            add_ring_edges(gid, ring)

    zones = pa.table({
        "zone_id": pa.array(rows["zone_id"]),
        "geom_kind": pa.array(rows["geom_kind"]),
        "wkb": pa.array(rows["wkb"], pa.binary()),
        "lon_min": pa.array(rows["lon_min"], pa.float64()),
        "lat_min": pa.array(rows["lat_min"], pa.float64()),
        "lon_max": pa.array(rows["lon_max"], pa.float64()),
        "lat_max": pa.array(rows["lat_max"], pa.float64()),
    })
    edges = pa.table({
        "zone_id": pa.array(e_zone),
        "x1": pa.array(e_x1, pa.float64()), "y1": pa.array(e_y1, pa.float64()),
        "x2": pa.array(e_x2, pa.float64()), "y2": pa.array(e_y2, pa.float64()),
    })
    return zones, edges


def star_polygon(lat: float, lon: float, r_outer: float, r_inner: float,
                 points: int, phase: float = 0.0) -> np.ndarray:
    """Simple NON-convex star polygon (2*points vertices, alternating
    radii), CCW. Exercises the general crossing-number PIP path that
    convex zones cannot."""
    k = 2 * points
    ang = phase + np.linspace(0.0, 2.0 * np.pi, k, endpoint=False)
    radii = np.where(np.arange(k) % 2 == 0, r_outer, r_inner)
    return np.column_stack([lon + radii * np.cos(ang),
                            lat + radii * np.sin(ang)])


def build_zones_star(n_zones: int):
    """Non-convex star zones + closed edge table (for the crossing-
    parity SQL oracle)."""
    z = np.arange(n_zones, dtype=np.uint64)
    clat = LAT_MIN + 2.0 + _hash_unit(z, 311) * (LAT_MAX - LAT_MIN - 4.0)
    clon = LON_MIN + 2.0 + _hash_unit(z, 322) * (LON_MAX - LON_MIN - 4.0)
    r_out = 0.5 + _hash_unit(z, 333) * 1.5
    r_in = r_out * (0.3 + 0.3 * _hash_unit(z, 344))
    pts = 5 + (splitmix64(z ^ _U(355)) % _U(5)).astype(np.int64)  # 5..9
    phase = _hash_unit(z, 366) * 2.0 * np.pi

    rows = {k: [] for k in ("zone_id", "wkb", "lon_min", "lat_min",
                            "lon_max", "lat_max")}
    e_zone, e_x1, e_y1, e_x2, e_y2 = [], [], [], [], []
    for k in range(n_zones):
        poly = star_polygon(float(clat[k]), float(clon[k]), float(r_out[k]),
                            float(r_in[k]), int(pts[k]), float(phase[k]))
        gid = f"S{k:011d}"
        rows["zone_id"].append(gid)
        rows["wkb"].append(geom.wkb_polygon(poly))
        rows["lon_min"].append(poly[:, 0].min())
        rows["lat_min"].append(poly[:, 1].min())
        rows["lon_max"].append(poly[:, 0].max())
        rows["lat_max"].append(poly[:, 1].max())
        nxt = np.roll(np.arange(len(poly)), -1)
        for i, j in zip(range(len(poly)), nxt):
            e_zone.append(gid)
            e_x1.append(poly[i, 0]); e_y1.append(poly[i, 1])
            e_x2.append(poly[j, 0]); e_y2.append(poly[j, 1])

    zones = pa.table({
        "zone_id": pa.array(rows["zone_id"]),
        "wkb": pa.array(rows["wkb"], pa.binary()),
        "lon_min": pa.array(rows["lon_min"], pa.float64()),
        "lat_min": pa.array(rows["lat_min"], pa.float64()),
        "lon_max": pa.array(rows["lon_max"], pa.float64()),
        "lat_max": pa.array(rows["lat_max"], pa.float64()),
    })
    edges = pa.table({
        "zone_id": pa.array(e_zone),
        "x1": pa.array(e_x1, pa.float64()), "y1": pa.array(e_y1, pa.float64()),
        "x2": pa.array(e_x2, pa.float64()), "y2": pa.array(e_y2, pa.float64()),
    })
    return zones, edges


def build_demographics(zone_ids: list[str]) -> pa.Table:
    """Long-form census table (geoid, variable_code, value, year, dataset)
    mirroring CensusDataPoint (reference census/domain/entities.py:52-66),
    with sentinel values and nulls injected deterministically (reference
    M12 scrubbing, census/services/census_service.py:262-278)."""
    geoids, codes, values = [], [], []
    for zi, gid in enumerate(zone_ids):
        for ci, code in enumerate(CENSUS_CODES):
            key = np.uint64(zi * 31 + ci * 7 + 5)
            h = int(splitmix64(key))
            mod = h % 23
            if mod == 0:
                val = SENTINELS[h % len(SENTINELS)]
            elif mod == 1:
                val = None
            else:
                val = float(h % 100000)  # integer-valued double: hash-safe
            geoids.append(gid)
            codes.append(code)
            values.append(val)
    n = len(geoids)
    return pa.table({
        "geoid": pa.array(geoids),
        "variable_code": pa.array(codes),
        "value": pa.array(values, pa.float64()),
        "year": pa.array([2023] * n, pa.int32()),
        "dataset": pa.array(["acs5"] * n, pa.string()),
    })


def build_band_centers(n_centers: int) -> pa.Table:
    """Facility points for kNN / travel-time band assignment (the graft
    analogue of the reference's POI set fed to the isochrone stage)."""
    c = np.arange(n_centers, dtype=np.uint64)
    _, _, lat = _microdeg(_hash_unit(c, 71), LAT_MIN + 1, LAT_MAX - 1)
    _, _, lon = _microdeg(_hash_unit(c, 72), LON_MIN + 1, LON_MAX - 1)
    return pa.table({
        "center_id": pa.array([f"C{int(i):05d}" for i in c]),
        "lat": pa.array(lat, pa.float64()),
        "lon": pa.array(lon, pa.float64()),
        "travel_mode": pa.array(
            np.asarray(["drive", "walk", "bike"])[(c % _U(3)).astype(int)]),
    })


ROAD_GRID = 24  # grid side: 576 nodes, 2208 directed edges


def build_road_network(centers: pa.Table):
    """Synthetic road network for true network-based isochrones
    (reference isochrone/clustering.py:335-432 builds travel-time
    polygons from an OSMnx road graph; offline, the graph itself must
    be synthesised).

    A ROAD_GRID x ROAD_GRID lattice over the world bbox; every
    4-neighbor edge is bidirectional with a deterministic integer
    travel time 60..299 s (splitmix64 of the undirected edge ordinal —
    same weight both directions). Sources are the band centers snapped
    to their nearest lattice node (vectorized argmin, equirectangular
    metric — the snap is part of the generated ground truth, so the
    engine and the SQL oracle share the same source set but compute
    shortest paths through INDEPENDENT code paths).

    Returns (nodes, edges, sources) tables.
    """
    g = ROAD_GRID
    idx = np.arange(g * g, dtype=np.int64)
    row, col = idx // g, idx % g
    lat = LAT_MIN + (LAT_MAX - LAT_MIN) * (row + 0.5) / g
    lon = LON_MIN + (LON_MAX - LON_MIN) * (col + 0.5) / g
    nodes = pa.table({
        "node_id": pa.array(idx),
        "lat": pa.array(lat, pa.float64()),
        "lon": pa.array(lon, pa.float64()),
    })

    # undirected 4-neighbor edges: east (row, col->col+1), south
    east_src = idx[col < g - 1]
    south_src = idx[row < g - 1]
    u = np.concatenate([east_src, south_src])
    v = np.concatenate([east_src + 1, south_src + g])
    ordinal = np.arange(len(u), dtype=np.uint64)
    w = (_U(60) + splitmix64(ordinal + _U(777000)) % _U(240)) \
        .astype(np.int64)
    # per-highway-class speed model inputs (reference M13,
    # isochrone/travel_modes.py:12-152): a road class + physical length
    # per undirected edge; mode-dependent travel times derive from these
    # in stages/network.py (engine) and a CASE expression (SQL oracle)
    hw_names = np.asarray(["motorway", "primary", "residential", "path"])
    hw = hw_names[(splitmix64(ordinal + _U(888000)) % _U(4)).astype(int)]
    len_m = (_U(2000) + splitmix64(ordinal + _U(999000)) % _U(3000)) \
        .astype(np.int64)
    edges = pa.table({
        "src": pa.array(np.concatenate([u, v])),
        "dst": pa.array(np.concatenate([v, u])),
        "w_s": pa.array(np.concatenate([w, w])),
        "hw_class": pa.array(np.concatenate([hw, hw])),
        "len_m": pa.array(np.concatenate([len_m, len_m])),
    })

    clat = np.asarray(centers["lat"].to_numpy(zero_copy_only=False))
    clon = np.asarray(centers["lon"].to_numpy(zero_copy_only=False))
    d2 = ((clat[:, None] - lat[None, :]) ** 2
          + ((clon[:, None] - lon[None, :])
             * np.cos(np.radians(clat[:, None]))) ** 2)
    snap = idx[np.argmin(d2, axis=1)]
    sources = pa.table({
        "center_id": centers["center_id"],
        "node_id": pa.array(snap),
    })
    return nodes, edges, sources


# ---------------------------------------------------------------------------
# Materialisation (idempotent, per sf dir)
# ---------------------------------------------------------------------------

TABLES = ("pages", "pois_truth", "zones", "zone_edges", "demographics",
          "band_centers", "zones_star", "zone_star_edges",
          "zones_donut", "zone_donut_edges",
          "road_nodes", "road_edges", "road_sources")


def build_custom_coords_csv(truth: pa.Table, n: int = 200) -> str:
    """CSV with the reference's alias-column shape (S1,
    pipeline/extraction.py:24-202): latitude/lng aliases, extra columns
    destined for the tags map, plus deterministic invalid rows that the
    validator must drop."""
    t = truth.slice(0, n).to_pandas()
    lines = ["key,label,latitude,lng,category,region_tag"]
    for k, row in enumerate(t.itertuples(index=False)):
        if not row.has_geo:
            continue
        if k % 17 == 5:   # out-of-range coordinate -> must be filtered
            lat = 95.5
        else:
            lat = row.lat
        lines.append(f"K{k:05d},{row.name},{lat:.6f},{row.lon:.6f},"
                     f"library,region{k % 7}")
    return "\n".join(lines) + "\n"


def build_state_neighbors() -> pa.Table:
    """Static state-adjacency lookup (reference J6,
    census/__init__.py:334-411 hardcoded dict): synthetic linear
    adjacency state s <-> s+-1 over the 50 synthetic states."""
    a, b = [], []
    for s in range(1, 51):
        for nb in (s - 1, s + 1):
            if 1 <= nb <= 50:
                a.append(f"{s:02d}")
                b.append(f"{nb:02d}")
    return pa.table({"state_fips": pa.array(a),
                     "neighbor_fips": pa.array(b)})


def synth_dir(sf_dir: str, replicate: int = 1) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    if replicate > 1:
        base = f"{base}_x{replicate}"
    return os.path.join(SYNTH_ROOT, base)


_REPLICA_STRIDE = 100_000_000


def ensure_synth(sf_dir: str, replicate: int = 1) -> str:
    """Materialise the synthetic world for ``sf_dir`` under /tmp (once).

    ``replicate`` > 1 tiles the corpus: replica r re-derives every page
    from doc_id + r * 1e8 (new urls, new coordinates, same text — which
    also plants exact duplicates for the dedup benchmarks). Zones /
    demographics / centers stay fixed. Atomic: writes into a tmp dir
    then renames, so concurrent callers and resumed runs see either
    nothing or a complete world.
    """
    out = synth_dir(sf_dir, replicate)
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                if f.read().strip() == SYNTH_VERSION:
                    return out
        except OSError:
            pass
        import shutil

        shutil.rmtree(out, ignore_errors=True)  # stale version: rebuild
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.num_rows
    n_zones = max(40, n_docs // 6)
    n_centers = max(12, n_zones // 3)

    if replicate == 1:
        pages, truth = build_pages(docs)
    else:
        p_parts, t_parts = [], []
        for r in range(replicate):
            shifted = docs.set_column(
                docs.schema.get_field_index("doc_id"), "doc_id",
                pa.array(docs["doc_id"].to_numpy() + r * _REPLICA_STRIDE))
            p, t = build_pages(shifted)
            p_parts.append(p)
            t_parts.append(t)
        pages = pa.concat_tables(p_parts)
        truth = pa.concat_tables(t_parts)
    zones, edges = build_zones(n_zones)
    zones_star, star_edges = build_zones_star(max(20, n_zones // 4))
    zones_donut, donut_edges = build_zones_donut(max(21, n_zones // 4))
    demo = build_demographics(zones["zone_id"].to_pylist())
    centers = build_band_centers(n_centers)
    road_nodes, road_edges, road_sources = build_road_network(centers)

    tmp = out + f".tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    for name, tbl in zip(TABLES, (pages, truth, zones, edges, demo, centers,
                                  zones_star, star_edges,
                                  zones_donut, donut_edges,
                                  road_nodes, road_edges, road_sources)):
        if name == "pages":
            # pages is the big streamed input: write a DIRECTORY of
            # files so the Ray parquet reader plans one read task per
            # file (a single file = one serial read task, measured as
            # the pipeline bottleneck at 32 cpus)
            pdir = os.path.join(tmp, "pages.parquet")
            os.makedirs(pdir, exist_ok=True)
            n = tbl.num_rows
            shard_rows = max(2048, n // 32)
            k = 0
            for s in range(0, n, shard_rows):
                pq.write_table(tbl.slice(s, shard_rows),
                               os.path.join(pdir, f"part-{k:05d}.parquet"),
                               compression="snappy", row_group_size=2048)
                k += 1
            continue
        # small row groups so Ray's parquet reader can split the file
        # into blocks (a single row group = one block = no parallelism)
        pq.write_table(tbl, os.path.join(tmp, f"{name}.parquet"),
                       compression="snappy", row_group_size=2048)
    with open(os.path.join(tmp, "custom_coords.csv"), "w") as f:
        f.write(build_custom_coords_csv(truth))
    pq.write_table(build_state_neighbors(),
                   os.path.join(tmp, "state_neighbors.parquet"),
                   compression="snappy")
    with open(os.path.join(tmp, "_COMPLETE"), "w") as f:
        f.write(SYNTH_VERSION + "\n")
    import shutil

    try:
        os.rename(tmp, out)
    except OSError:
        if os.path.exists(marker):
            # a concurrent generator won the race; ours is redundant
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            # stale/partial dir (e.g. killed run): replace it
            shutil.rmtree(out, ignore_errors=True)
            os.rename(tmp, out)
    return out


def table_path(sf_dir: str, name: str, replicate: int = 1) -> str:
    assert name in TABLES, name
    return os.path.join(ensure_synth(sf_dir, replicate), f"{name}.parquet")


def aux_path(sf_dir: str, filename: str) -> str:
    """Path of a non-parquet-table artifact (custom_coords.csv,
    state_neighbors.parquet)."""
    return os.path.join(ensure_synth(sf_dir), filename)
