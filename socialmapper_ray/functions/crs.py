"""Bulk CRS transforms (reference M8), from scratch and vectorized.

The reference round-trips through pyproj Transformers built per engine
(distance/engine.py:111-151, EPSG:4326 <-> 5070; TIGER queries use
EPSG:3857, spatial_block_group_service.py:79-81). No pyproj exists
here; the engine implements the projections it actually uses:

- Web Mercator (EPSG:3857) forward/inverse — exact closed forms.
- Sinusoidal (the equal-area working projection of tiles.py).
- An Albers-style equal-area conic (EPSG:5070 parameters, spherical
  form) for metric distance work — spherical rather than ellipsoidal
  (documented delta: <0.5% at CONUS latitudes, fine for comparative
  distances; the oracle-checked distance ops use haversine directly).
- Ellipsoidal Albers on GRS80 (EPSG:5070 proper, Snyder §14).
- Ellipsoidal transverse Mercator / UTM on WGS84 (EPSG:326xx/327xx,
  Snyder §8 series forms — the reference's per-network projected CRS,
  isochrone/cache.py:569).

All functions are numpy-vectorized, stateless, and safe to call inside
``map_batches`` (per-actor "transformer" construction is unnecessary —
there is no state to build).
"""

from __future__ import annotations

import numpy as np

_R = 6378137.0  # WGS84 semi-major (Web Mercator sphere)


def to_web_mercator(lat, lon):
    """EPSG:4326 degrees -> EPSG:3857 meters (x, y)."""
    lat = np.clip(np.asarray(lat, dtype=np.float64), -85.051128, 85.051128)
    lon = np.asarray(lon, dtype=np.float64)
    x = _R * np.radians(lon)
    y = _R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def from_web_mercator(x, y):
    """EPSG:3857 meters -> EPSG:4326 degrees (lat, lon)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / _R)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / _R)) - np.pi / 2.0)
    return lat, lon


# Albers equal-area conic, EPSG:5070 parameters, spherical form
_A_LAT1, _A_LAT2 = np.radians(29.5), np.radians(45.5)
_A_LAT0, _A_LON0 = np.radians(23.0), np.radians(-96.0)
_A_N = (np.sin(_A_LAT1) + np.sin(_A_LAT2)) / 2.0
_A_C = np.cos(_A_LAT1) ** 2 + 2.0 * _A_N * np.sin(_A_LAT1)
_A_RHO0 = _R * np.sqrt(_A_C - 2.0 * _A_N * np.sin(_A_LAT0)) / _A_N


def to_albers(lat, lon):
    """EPSG:4326 degrees -> Albers (EPSG:5070-parameter, spherical)
    meters. Equal-area: right for zonal densities and comparative
    distances (the reference's distance CRS, distance/engine.py:39-50)."""
    la = np.radians(np.asarray(lat, dtype=np.float64))
    lo = np.radians(np.asarray(lon, dtype=np.float64))
    rho = _R * np.sqrt(np.maximum(_A_C - 2.0 * _A_N * np.sin(la), 0.0)) / _A_N
    theta = _A_N * (lo - _A_LON0)
    return rho * np.sin(theta), _A_RHO0 - rho * np.cos(theta)


def from_albers(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    rho = np.hypot(x, _A_RHO0 - y)
    theta = np.arctan2(x, _A_RHO0 - y)
    lat = np.arcsin(np.clip((_A_C - (rho * _A_N / _R) ** 2) / (2.0 * _A_N),
                            -1.0, 1.0))
    lon = _A_LON0 + theta / _A_N
    return np.degrees(lat), np.degrees(lon)


# ---------------------------------------------------------------------------
# Albers equal-area conic, ELLIPSOIDAL form (EPSG:5070 proper: GRS80,
# std parallels 29.5/45.5, origin 23/-96). Formulas are the public
# Snyder "Map Projections — A Working Manual" (USGS PP 1395) Albers
# ellipsoid case; this closes the documented <0.5% spherical residual.
# ---------------------------------------------------------------------------

_GRS80_A = 6378137.0
_GRS80_F = 1.0 / 298.257222101
_E2 = 2.0 * _GRS80_F - _GRS80_F ** 2
_E = np.sqrt(_E2)


def _q_authalic(sin_lat):
    """Snyder eq. 3-12: the authalic q for a given sin(latitude)."""
    es = _E * sin_lat
    return (1.0 - _E2) * (sin_lat / (1.0 - _E2 * sin_lat ** 2)
                          - np.log((1.0 - es) / (1.0 + es)) / (2.0 * _E))


def _m_scale(lat):
    """Snyder eq. 14-15: m = cos(lat)/sqrt(1 - e^2 sin^2(lat))."""
    s = np.sin(lat)
    return np.cos(lat) / np.sqrt(1.0 - _E2 * s ** 2)


_E_LAT1, _E_LAT2 = np.radians(29.5), np.radians(45.5)
_E_LAT0, _E_LON0 = np.radians(23.0), np.radians(-96.0)
_E_M1, _E_M2 = _m_scale(_E_LAT1), _m_scale(_E_LAT2)
_E_Q0 = _q_authalic(np.sin(_E_LAT0))
_E_Q1 = _q_authalic(np.sin(_E_LAT1))
_E_Q2 = _q_authalic(np.sin(_E_LAT2))
_E_N = (_E_M1 ** 2 - _E_M2 ** 2) / (_E_Q2 - _E_Q1)          # eq. 14-14
_E_C = _E_M1 ** 2 + _E_N * _E_Q1                            # eq. 14-13
_E_RHO0 = _GRS80_A * np.sqrt(_E_C - _E_N * _E_Q0) / _E_N    # eq. 14-12a


def to_albers_5070(lat, lon):
    """EPSG:4326 degrees -> EPSG:5070 meters (ellipsoidal Albers on
    GRS80 — the reference's pyproj distance CRS,
    distance/engine.py:111-151, computed from scratch)."""
    la = np.radians(np.asarray(lat, dtype=np.float64))
    lo = np.radians(np.asarray(lon, dtype=np.float64))
    q = _q_authalic(np.sin(la))
    rho = _GRS80_A * np.sqrt(np.maximum(_E_C - _E_N * q, 0.0)) / _E_N
    theta = _E_N * (lo - _E_LON0)
    return rho * np.sin(theta), _E_RHO0 - rho * np.cos(theta)


def from_albers_5070(x, y, iters: int = 8):
    """EPSG:5070 meters -> EPSG:4326 degrees. The latitude solves
    q(lat) = q by Snyder's Newton iteration (eq. 3-16); 8 rounds reach
    <1e-12 rad everywhere on CONUS."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    rho = np.hypot(x, _E_RHO0 - y)
    theta = np.arctan2(x, _E_RHO0 - y)
    q = (_E_C - (rho * _E_N / _GRS80_A) ** 2) / _E_N
    lat = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _ in range(iters):
        s = np.sin(lat)
        es = _E * s
        one = 1.0 - _E2 * s ** 2
        corr = (one ** 2 / (2.0 * np.cos(lat))) * (
            q / (1.0 - _E2) - s / one
            + np.log((1.0 - es) / (1.0 + es)) / (2.0 * _E))
        lat = lat + corr
    lon = _E_LON0 + theta / _E_N
    return np.degrees(lat), np.degrees(lon)


# ---------------------------------------------------------------------------
# Ellipsoidal transverse Mercator / UTM (WGS84, EPSG:326xx / 327xx)
# ---------------------------------------------------------------------------
# Snyder, Map Projections — A Working Manual (USGS PP 1395), §8:
# forward eqs. 8-9..8-17 + meridional arc 3-21; inverse via the
# footpoint latitude series 3-26 and eqs. 8-24/8-25. The reference
# reaches these CRSs through pyproj ("utm" per-network projected CRS,
# isochrone/cache.py:569); none exists here, so the series forms are
# implemented directly. Good to <1mm against the defining integrals
# inside a zone's ±3° width (pinned by an independent numerical
# meridian-arc integration in tests/test_geom.py).

_W_A = 6378137.0                       # WGS84 semi-major
_W_F = 1.0 / 298.257223563
_W_E2 = 2.0 * _W_F - _W_F ** 2
_W_EP2 = _W_E2 / (1.0 - _W_E2)         # e'^2
_UTM_K0 = 0.9996
_UTM_FE = 500000.0
_UTM_FN_S = 10000000.0

# meridional arc coefficients (Snyder 3-21)
_M0C = 1.0 - _W_E2 / 4.0 - 3.0 * _W_E2 ** 2 / 64.0 - 5.0 * _W_E2 ** 3 / 256.0
_M2C = 3.0 * _W_E2 / 8.0 + 3.0 * _W_E2 ** 2 / 32.0 \
    + 45.0 * _W_E2 ** 3 / 1024.0
_M4C = 15.0 * _W_E2 ** 2 / 256.0 + 45.0 * _W_E2 ** 3 / 1024.0
_M6C = 35.0 * _W_E2 ** 3 / 3072.0
_E1 = (1.0 - np.sqrt(1.0 - _W_E2)) / (1.0 + np.sqrt(1.0 - _W_E2))


def _meridian_arc(lat_rad):
    return _W_A * (_M0C * lat_rad - _M2C * np.sin(2.0 * lat_rad)
                   + _M4C * np.sin(4.0 * lat_rad)
                   - _M6C * np.sin(6.0 * lat_rad))


def utm_zone(lon) -> np.ndarray:
    """Longitude degrees -> UTM zone number 1..60."""
    lon = np.asarray(lon, dtype=np.float64)
    return (np.clip(np.floor((lon + 180.0) / 6.0), 0, 59) + 1) \
        .astype(np.int64)


def to_utm(lat, lon, zone: int, northern: bool = True):
    """EPSG:4326 degrees -> UTM meters (x, y) in the given zone
    (EPSG:326{zone} / 327{zone}). Vectorized Snyder 8-9..8-13."""
    la = np.radians(np.asarray(lat, dtype=np.float64))
    lo = np.radians(np.asarray(lon, dtype=np.float64))
    lon0 = np.radians(-183.0 + 6.0 * int(zone))
    sin_la, cos_la = np.sin(la), np.cos(la)
    nu = _W_A / np.sqrt(1.0 - _W_E2 * sin_la ** 2)           # N, eq. 4-20
    t = (sin_la / cos_la) ** 2                               # T
    c = _W_EP2 * cos_la ** 2                                 # C
    a_ = (lo - lon0) * cos_la                                # A
    m = _meridian_arc(la)
    x = _UTM_K0 * nu * (
        a_ + (1.0 - t + c) * a_ ** 3 / 6.0
        + (5.0 - 18.0 * t + t ** 2 + 72.0 * c - 58.0 * _W_EP2)
        * a_ ** 5 / 120.0) + _UTM_FE
    y = _UTM_K0 * (m + nu * (sin_la / cos_la) * (
        a_ ** 2 / 2.0
        + (5.0 - t + 9.0 * c + 4.0 * c ** 2) * a_ ** 4 / 24.0
        + (61.0 - 58.0 * t + t ** 2 + 600.0 * c - 330.0 * _W_EP2)
        * a_ ** 6 / 720.0))
    if not northern:
        y = y + _UTM_FN_S
    return x, y


def from_utm(x, y, zone: int, northern: bool = True):
    """UTM meters -> EPSG:4326 degrees (lat, lon). Vectorized Snyder
    footpoint series 3-26 + eqs. 8-24/8-25."""
    x = np.asarray(x, dtype=np.float64) - _UTM_FE
    y = np.asarray(y, dtype=np.float64)
    if not northern:
        y = y - _UTM_FN_S
    lon0 = np.radians(-183.0 + 6.0 * int(zone))
    mu = (y / _UTM_K0) / (_W_A * _M0C)
    fp = mu + (3.0 * _E1 / 2.0 - 27.0 * _E1 ** 3 / 32.0) * np.sin(2.0 * mu) \
        + (21.0 * _E1 ** 2 / 16.0 - 55.0 * _E1 ** 4 / 32.0) \
        * np.sin(4.0 * mu) \
        + (151.0 * _E1 ** 3 / 96.0) * np.sin(6.0 * mu) \
        + (1097.0 * _E1 ** 4 / 512.0) * np.sin(8.0 * mu)
    sin_fp, cos_fp = np.sin(fp), np.cos(fp)
    c1 = _W_EP2 * cos_fp ** 2
    t1 = (sin_fp / cos_fp) ** 2
    one = 1.0 - _W_E2 * sin_fp ** 2
    n1 = _W_A / np.sqrt(one)
    r1 = _W_A * (1.0 - _W_E2) / one ** 1.5
    d = x / (n1 * _UTM_K0)
    lat = fp - (n1 * (sin_fp / cos_fp) / r1) * (
        d ** 2 / 2.0
        - (5.0 + 3.0 * t1 + 10.0 * c1 - 4.0 * c1 ** 2 - 9.0 * _W_EP2)
        * d ** 4 / 24.0
        + (61.0 + 90.0 * t1 + 298.0 * c1 + 45.0 * t1 ** 2
           - 252.0 * _W_EP2 - 3.0 * c1 ** 2) * d ** 6 / 720.0)
    lon = lon0 + (d - (1.0 + 2.0 * t1 + c1) * d ** 3 / 6.0
                  + (5.0 - 2.0 * c1 + 28.0 * t1 - 3.0 * c1 ** 2
                     + 8.0 * _W_EP2 + 24.0 * t1 ** 2)
                  * d ** 5 / 120.0) / cos_fp
    return np.degrees(lat), np.degrees(lon)


def transform_batch(batch, src: str, dst: str, lat_col="lat", lon_col="lon",
                    x_col="x", y_col="y"):
    """map_batches-ready transform between named CRSs.

    src/dst in {"wgs84", "webmercator", "albers", "albers5070",
    "utm{zone}n" / "utm{zone}s" (e.g. "utm18n")}; wgs84 input uses
    lat_col/lon_col, projected input uses x_col/y_col.
    """
    import pyarrow as pa

    def _utm_args(name: str):
        if not (name.startswith("utm") and name[-1] in "ns"):
            return None
        zone = int(name[3:-1])
        if not 1 <= zone <= 60:
            raise ValueError(f"UTM zone out of range in {name!r}")
        return zone, name[-1] == "n"

    if src == "wgs84":
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        if dst == "webmercator":
            x, y = to_web_mercator(lat, lon)
        elif dst == "albers":
            x, y = to_albers(lat, lon)
        elif dst == "albers5070":
            x, y = to_albers_5070(lat, lon)
        elif _utm_args(dst):
            zone, north = _utm_args(dst)
            x, y = to_utm(lat, lon, zone, northern=north)
        else:
            raise ValueError(f"unsupported dst {dst}")
        batch = batch.append_column(x_col, pa.array(x))
        return batch.append_column(y_col, pa.array(y))
    x = batch[x_col].to_numpy(zero_copy_only=False)
    y = batch[y_col].to_numpy(zero_copy_only=False)
    if src == "webmercator":
        lat, lon = from_web_mercator(x, y)
    elif src == "albers":
        lat, lon = from_albers(x, y)
    elif src == "albers5070":
        lat, lon = from_albers_5070(x, y)
    elif _utm_args(src):
        zone, north = _utm_args(src)
        lat, lon = from_utm(x, y, zone, northern=north)
    else:
        raise ValueError(f"unsupported src {src}")
    batch = batch.append_column(lat_col, pa.array(lat))
    return batch.append_column(lon_col, pa.array(lon))
