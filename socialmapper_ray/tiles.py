"""Tiling: S2-style quadtree cells and H3-style hex cells, pure numpy.

The reference (mihiarc/socialmapper) partitions spatial work by DBSCAN
clusters of POIs (reference: socialmapper/isochrone/clustering.py:61-120)
and prunes polygon fetches by bbox overlap (isochrone/cache.py:165-211).
In this engine the partitioning substrate is a deterministic cell id
(north rule: "H3/S2 index"): every point gets

- ``quadcell`` — an S2-style cube-sphere quadtree cell id (uint64),
  hierarchical by construction (parent = bit prefix), used as the
  range-partition / shuffle key ("h3_prefix" of SURVEY.md §7.3), and
- ``hexcell`` — an H3-style axial hex cell id (uint64) on a sinusoidal
  equal-area-ish projection, used for kNN cell-ring expansion
  (SURVEY.md J5).

No third-party geo libs exist in this environment (no h3, no s2, no
shapely), so both schemes are original implementations. They are NOT
bit-compatible with Google S2 / Uber H3; they reproduce the *properties*
the engine needs: deterministic, vectorized, hierarchical (quad), and
ring-expandable (hex). Golden vectors + a scalar reference
implementation guard the vectorized code (tests/test_tiles.py).

Quadcell layout (MAX_RES = 26):
    bits 63..61  face (0..5)
    below        2*res Morton-interleaved (i,j) bits
    marker       single 1 bit at position 60 - 2*res (S2-style lsb);
                 everything below is 0.
Hierarchy follows S2 arithmetic: ``lsb = id & -id``; all descendants of
``c`` lie in ``[c - lsb + 1, c + lsb - 1]``; ``parent`` keeps the bit
prefix. This is what makes a sort by quadcell a spatial range partition.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 26

_U = np.uint64


def _u(x) -> np.ndarray:
    return np.asarray(x, dtype=np.uint64)


# ---------------------------------------------------------------------------
# Morton interleave (magic-bits spread, 26-bit safe)
# ---------------------------------------------------------------------------

def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of x so they occupy even bit positions."""
    x = x.astype(np.uint64)
    x = (x | (x << _U(16))) & _U(0x0000FFFF0000FFFF)
    x = (x | (x << _U(8))) & _U(0x00FF00FF00FF00FF)
    x = (x | (x << _U(4))) & _U(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << _U(2))) & _U(0x3333333333333333)
    x = (x | (x << _U(1))) & _U(0x5555555555555555)
    return x


def _morton2(i: np.ndarray, j: np.ndarray) -> np.ndarray:
    return (_part1by1(i) << _U(1)) | _part1by1(j)


# ---------------------------------------------------------------------------
# lat/lon -> cube face + (s, t)
# ---------------------------------------------------------------------------

def _face_st(lat: np.ndarray, lon: np.ndarray):
    """Project WGS84 degrees onto cube faces. Returns (face, s, t) with
    s, t in [0, 1). Deterministic at face boundaries (argmax tie -> lowest
    axis index)."""
    lat_r = np.radians(np.asarray(lat, dtype=np.float64))
    lon_r = np.radians(np.asarray(lon, dtype=np.float64))
    x = np.cos(lat_r) * np.cos(lon_r)
    y = np.cos(lat_r) * np.sin(lon_r)
    z = np.sin(lat_r)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # dominant axis: 0=x, 1=y, 2=z  (ties resolved to the lower index)
    axis = np.where(az > np.maximum(ax, ay), 2, np.where(ay > ax, 1, 0))
    neg = np.where(axis == 0, x < 0, np.where(axis == 1, y < 0, z < 0))
    face = (axis + np.where(neg, 3, 0)).astype(np.int64)
    d = np.where(axis == 0, x, np.where(axis == 1, y, z))
    a = np.where(axis == 0, y, np.where(axis == 1, z, x))
    b = np.where(axis == 0, z, np.where(axis == 1, x, y))
    u = a / d
    v = b / d
    s = np.clip((u + 1.0) * 0.5, 0.0, np.nextafter(1.0, 0.0))
    t = np.clip((v + 1.0) * 0.5, 0.0, np.nextafter(1.0, 0.0))
    return face, s, t


# ---------------------------------------------------------------------------
# Quadcell public API
# ---------------------------------------------------------------------------

def quadcell(lat, lon, res: int) -> np.ndarray:
    """Encode lat/lon (degrees) to a quadcell id at resolution ``res``.

    Vectorized; returns uint64 array of the broadcast shape of lat/lon.
    """
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}], got {res}")
    face, s, t = _face_st(lat, lon)
    n = 1 << res
    i = np.minimum((s * n).astype(np.uint64), _U(n - 1))
    j = np.minimum((t * n).astype(np.uint64), _U(n - 1))
    morton = _morton2(i, j)
    shift = _U(61 - 2 * res)
    marker = _U(1) << _U(60 - 2 * res)
    return (_u(face) << _U(61)) | (morton << shift) | marker


def quad_lsb(cell) -> np.ndarray:
    c = _u(cell)
    return c & (~c + _U(1))


def quad_res(cell) -> np.ndarray:
    """Resolution of each cell id (exact: marker bits are powers of two)."""
    lsb = quad_lsb(cell)
    return ((60 - np.log2(lsb.astype(np.float64)).astype(np.int64)) // 2).astype(np.int64)


def quad_parent(cell, res: int) -> np.ndarray:
    """Ancestor of each cell at coarser resolution ``res`` (bit-prefix)."""
    c = _u(cell)
    nlsb = _U(1) << _U(60 - 2 * res)
    return (c & (~nlsb + _U(1))) | nlsb


def quad_range(cell) -> tuple[np.ndarray, np.ndarray]:
    """[lo, hi] inclusive id range of all descendants (incl. self).

    Sorting by quadcell id therefore range-partitions space: a partition
    owning [lo, hi] owns an aligned block of cube-face area.
    """
    c = _u(cell)
    lsb = quad_lsb(c)
    return c - lsb + _U(1), c + lsb - _U(1)


def quad_contains(parent, child) -> np.ndarray:
    lo, hi = quad_range(parent)
    c = _u(child)
    return (c >= lo) & (c <= hi)


# ---------------------------------------------------------------------------
# H3-style hex cells (axial coordinates on a sinusoidal projection)
# ---------------------------------------------------------------------------

# Base hex size in projected degrees at res 0; halves every resolution
# (aperture 4 by area). Res 7 -> ~0.0875 deg ~ 9.7 km edge at the equator,
# comparable to H3 res 7 cell scale.
HEX_SIZE0 = 11.2
_HEX_OFF = np.int64(1) << np.int64(27)  # axial coordinate offset for packing


def _hex_size(res: int) -> float:
    return HEX_SIZE0 / (1 << res)


def _project(lat, lon):
    """Sinusoidal (equal-area) projection, degrees in -> pseudo-degrees out."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    return lon * np.cos(np.radians(lat)), lat.copy()


def _axial_round(qf: np.ndarray, rf: np.ndarray):
    """Cube-round fractional axial coords to the nearest hex center."""
    xf, zf, yf = qf, rf, -qf - rf
    rx, ry, rz = np.round(xf), np.round(yf), np.round(zf)
    dx, dy, dz = np.abs(rx - xf), np.abs(ry - yf), np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def hexcell(lat, lon, res: int) -> np.ndarray:
    """Encode lat/lon (degrees) to an H3-style hex cell id at ``res``.

    Layout: bits 63..56 res, bits 55..28 q + 2^27, bits 27..0 r + 2^27.
    """
    if not 0 <= res <= 14:
        raise ValueError(f"hex res must be in [0, 14], got {res}")
    x, y = _project(lat, lon)
    s = _hex_size(res)
    qf = (np.sqrt(3.0) / 3.0 * x - y / 3.0) / s
    rf = (2.0 / 3.0 * y) / s
    q, r = _axial_round(qf, rf)
    return (
        (_U(res) << _U(56))
        | (_u(q + _HEX_OFF) << _U(28))
        | _u(r + _HEX_OFF)
    )


def hex_unpack(cell):
    """cell -> (res, q, r) int64 arrays."""
    c = _u(cell)
    res = (c >> _U(56)).astype(np.int64)
    q = ((c >> _U(28)) & _U(0x0FFFFFFF)).astype(np.int64) - _HEX_OFF
    r = (c & _U(0x0FFFFFFF)).astype(np.int64) - _HEX_OFF
    return res, q, r


def hex_pack(res, q, r) -> np.ndarray:
    return (
        (_u(np.asarray(res)) << _U(56))
        | (_u(np.asarray(q) + _HEX_OFF) << _U(28))
        | _u(np.asarray(r) + _HEX_OFF)
    )


def hex_center_xy(cell):
    """Hex cell id -> projected (x, y) center. This is the metric space the
    kNN ring expansion reasons in: neighbor centers are exactly
    ``sqrt(3) * size`` apart here (sinusoidal projection is equal-area but
    not conformal, so geodetic re-projection distorts; pruning bounds are
    computed in this space)."""
    res, q, r = hex_unpack(cell)
    size = HEX_SIZE0 / np.power(2.0, res)
    x = size * (np.sqrt(3.0) * q + np.sqrt(3.0) / 2.0 * r)
    y = size * (1.5 * r)
    return x, y


def hex_center(cell):
    """Hex cell id -> (lat, lon) of the cell center (inverse projection).

    lon reconstruction divides by cos(lat) and is therefore sensitive far
    from the prime meridian; use :func:`hex_center_xy` for metric work.
    """
    res, q, r = hex_unpack(cell)
    size = HEX_SIZE0 / np.power(2.0, res)
    x = size * (np.sqrt(3.0) * q + np.sqrt(3.0) / 2.0 * r)
    y = size * (1.5 * r)
    lat = y
    with np.errstate(divide="ignore", invalid="ignore"):
        lon = np.where(np.abs(np.cos(np.radians(lat))) > 1e-12,
                       x / np.cos(np.radians(lat)), 0.0)
    return lat, lon


_HEX_DIRS = np.array([(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)],
                     dtype=np.int64)


def hex_ring(cell: int, k: int) -> np.ndarray:
    """Cell ids exactly k hex steps from ``cell`` (k=0 -> [cell])."""
    res, q, r = hex_unpack(np.asarray([cell]))
    res, q, r = int(res[0]), int(q[0]), int(r[0])
    if k == 0:
        return np.asarray([cell], dtype=np.uint64)
    out_q, out_r = [], []
    cq, cr = q + _HEX_DIRS[4][0] * k, r + _HEX_DIRS[4][1] * k
    for d in range(6):
        for _ in range(k):
            out_q.append(cq)
            out_r.append(cr)
            cq += int(_HEX_DIRS[d][0])
            cr += int(_HEX_DIRS[d][1])
    return hex_pack(np.full(len(out_q), res), np.asarray(out_q), np.asarray(out_r))


def hex_disk(cell: int, k: int) -> np.ndarray:
    """All cell ids within k hex steps of ``cell``."""
    return np.concatenate([hex_ring(cell, i) for i in range(k + 1)])


def quad_cells_at_res(res: int) -> np.ndarray:
    """All 6 * 4^res cell ids at resolution ``res`` (res <= ~6 practical)."""
    n = 1 << res
    i, j = np.meshgrid(np.arange(n, dtype=np.uint64),
                       np.arange(n, dtype=np.uint64))
    morton = _morton2(i.ravel(), j.ravel())
    shift = _U(61 - 2 * res)
    marker = _U(1) << _U(60 - 2 * res)
    cells = []
    for face in range(6):
        cells.append((_U(face) << _U(61)) | (morton << shift) | marker)
    return np.concatenate(cells)


def quad_cell_latlon_bbox(cell: int, boundary_samples: int = 33,
                          margin: float = 1e-6):
    """Numeric (lat_min, lat_max, lon_min, lon_max) of a cell's region.

    The cube-face cell is a rect in (s, t); its lat/lon extremes lie on
    the boundary, which we sample densely and pad with ``margin``
    degrees (plus a curvature allowance) so the result is a guaranteed-
    superset bbox for pruning registrations (tests assert the superset
    property). Cells touching a pole or the antimeridian get the full
    lat/lon range on the wrapped axis.
    """
    c = _u(cell)
    lsb = int(quad_lsb(c))
    res = int(quad_res(c))
    face = int(c >> _U(61))
    n = 1 << res
    # recover (i, j) from the morton bits
    morton = int((c & _U((1 << 61) - 1)) >> _U(61 - 2 * res))
    i = j = 0
    for b in range(res):
        i |= ((morton >> (2 * b + 1)) & 1) << b
        j |= ((morton >> (2 * b)) & 1) << b
    s0, s1 = i / n, (i + 1) / n
    t0, t1 = j / n, (j + 1) / n
    ss = np.linspace(s0, s1, boundary_samples)
    ts = np.linspace(t0, t1, boundary_samples)
    bs = np.concatenate([
        np.column_stack([ss, np.full_like(ss, t0)]),
        np.column_stack([ss, np.full_like(ss, t1)]),
        np.column_stack([np.full_like(ts, s0), ts]),
        np.column_stack([np.full_like(ts, s1), ts]),
    ])
    u = bs[:, 0] * 2.0 - 1.0
    v = bs[:, 1] * 2.0 - 1.0
    axis = face % 3
    neg = face >= 3
    d = np.full(len(u), -1.0 if neg else 1.0)
    a = u * d
    b = v * d
    if axis == 0:
        x, y, z = d, a, b
    elif axis == 1:
        y, z, x = d, a, b
    else:
        z, x, y = d, a, b
    norm = np.sqrt(x * x + y * y + z * z)
    lat = np.degrees(np.arcsin(np.clip(z / norm, -1, 1)))
    lon = np.degrees(np.arctan2(y, x))
    # lat has an interior extremum only at the poles, which sit at the
    # center of the +-z faces: a cell containing that center must widen
    # to the pole (boundary sampling alone would miss it)
    if axis == 2 and s0 <= 0.5 <= s1 and t0 <= 0.5 <= t1:
        pole = -90.0 if neg else 90.0
        lat = np.append(lat, pole)
        return (max(-90.0, float(lat.min()) - margin),
                min(90.0, float(lat.max()) + margin), -180.0, 180.0)
    # curvature allowance: boundary sampling misses at most the sagitta
    # between consecutive samples; cell angular size / samples^2 bounds it
    curv = 90.0 / n / (boundary_samples - 1)
    lat_min = float(lat.min()) - margin - curv
    lat_max = float(lat.max()) + margin + curv
    if lat_max >= 89.9 or lat_min <= -89.9 or (lon.max() - lon.min()) > 180.0:
        # pole or antimeridian crossing: be conservative on lon
        return max(-90.0, lat_min), min(90.0, lat_max), -180.0, 180.0
    lon_min = float(lon.min()) - margin - curv
    lon_max = float(lon.max()) + margin + curv
    return lat_min, lat_max, lon_min, lon_max


# ---------------------------------------------------------------------------
# Covering tokens (quadcell cover of a bbox, by corner+grid sampling)
# ---------------------------------------------------------------------------

def quad_cover_bbox(lat_min: float, lat_max: float, lon_min: float,
                    lon_max: float, res: int, samples: int = 8) -> np.ndarray:
    """Quadcells touched by a lat/lon bbox, via dense grid sampling.

    A sampled cover is a *pruning aid*, not a correctness contract: the
    PIP join uses an exact lat/lon grid index (geom.GridIndex); covers
    label zones/partitions for locality stats and partition pruning, and
    are emitted as the ``s2_tokens``-style column. Sample density is
    chosen so sample spacing < half a cell edge whenever the bbox is not
    much larger than a cell; callers sizing covers for pruning should
    pass res coarse enough that cells >= bbox extent.
    """
    la = np.linspace(lat_min, lat_max, samples)
    lo = np.linspace(lon_min, lon_max, samples)
    glat, glon = np.meshgrid(la, lo)
    cells = quadcell(glat.ravel(), glon.ravel(), res)
    return np.unique(cells)
