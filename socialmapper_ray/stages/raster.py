"""Headless choropleth rasterization (reference K6 closed fully).

Reference semantics: visualization/chloropleth.py:122-196 classes a
zone value column (census error codes -> missing), maps classes through
a sequential palette (config.py:117 default YlOrBr), paints missing
zones a neutral grey, and writes the figure to PNG
(chloropleth.py:450-481). The reference drives geopandas + matplotlib;
neither exists here, so the raster is computed from scratch:

- **class -> color** via an embedded 5-step YlOrBr ramp (ColorBrewer
  values — public domain Apache-licensed palette data);
- **zone fill** by point-in-polygon of every pixel CENTER against the
  zone polygons, reusing the engine's own broadcast
  :class:`geom.GridIndex` + crossing-number kernel — the same machinery
  the PIP join trusts, so the raster inherits its tested geometry;
- **PNG bytes** from a from-scratch encoder (zlib + crc32 only; the
  PNG format is public: RFC 2083) — no matplotlib/PIL.

Ray-Data-first: the image renders as horizontal STRIPS fanned out
through ``map_batches`` over a strip-index Dataset, with the zone
index broadcast once via ``ray.put`` (exactly the PIP-join topology).
A continent-scale raster (1e9 pixels) is just more strips; each task
touches only ``width x strip_h`` pixels and ships back run-length
countable RGB rows. The driver assembles strips in order — the
materialized artifact is the IMAGE (bounded by the requested
resolution), never the zone table or the corpus.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd

import ray

from .. import geom

#: 5-class YlOrBr sequential ramp (ColorBrewer, public), light -> dark —
#: the reference's default color_scheme (visualization/config.py:117).
PALETTE_YLORBR = np.asarray([
    [255, 255, 212],
    [254, 217, 142],
    [254, 153, 41],
    [217, 95, 14],
    [153, 52, 4],
], dtype=np.uint8)

#: reference missing_kwds color: lightgrey (chloropleth.py:177)
MISSING_RGB = np.asarray([211, 211, 211], dtype=np.uint8)
#: background (outside every zone): white
BACKGROUND_RGB = np.asarray([255, 255, 255], dtype=np.uint8)


def render_strip(index: geom.GridIndex, colors: np.ndarray,
                 row0: int, nrows: int, width: int, height: int,
                 bbox: tuple[float, float, float, float]) -> np.ndarray:
    """Render raster rows [row0, row0+nrows) -> (nrows, width, 3) uint8.

    bbox = (lon_min, lat_min, lon_max, lat_max); row 0 is the NORTH
    edge (image convention). A pixel takes the color of the FIRST zone
    (lowest polyset row) containing its center — deterministic under
    overlap; pixels in no zone stay background.
    """
    lon_min, lat_min, lon_max, lat_max = bbox
    dx = (lon_max - lon_min) / width
    dy = (lat_max - lat_min) / height
    cols = lon_min + (np.arange(width, dtype=np.float64) + 0.5) * dx
    rows = lat_max - (np.arange(row0, row0 + nrows, dtype=np.float64)
                      + 0.5) * dy
    lon = np.tile(cols, nrows)
    lat = np.repeat(rows, width)
    pt, poly = index.query(lon, lat)
    rgb = np.broadcast_to(BACKGROUND_RGB, (nrows * width, 3)).copy()
    if len(pt):
        # first zone wins: keep the lowest poly index per pixel
        order = np.lexsort((poly, pt))
        pt, poly = pt[order], poly[order]
        first = np.concatenate([[True], pt[1:] != pt[:-1]])
        rgb[pt[first]] = colors[poly[first]]
    return rgb.reshape(nrows, width, 3)


class StripRenderer:
    """Actor-pool stage: one call renders one strip row-range. The zone
    index + per-zone colors are fetched from the object store once per
    actor (broadcast-once, the PIP-join pattern)."""

    def __init__(self, index_ref, width: int, height: int,
                 bbox: tuple[float, float, float, float]):
        self.index, self.colors = ray.get(index_ref)
        self.width, self.height, self.bbox = width, height, bbox

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out_rows = []
        for row0, nrows in zip(batch["row0"].to_numpy(),
                               batch["nrows"].to_numpy()):
            rgb = render_strip(self.index, self.colors, int(row0),
                               int(nrows), self.width, self.height,
                               self.bbox)
            out_rows.append({"row0": int(row0), "nrows": int(nrows),
                             "rgb": rgb.tobytes()})
        return pd.DataFrame(out_rows)


def render_zones(polyset: geom.PolygonSet, zone_rgb: np.ndarray,
                 width: int = 512, height: int = 512,
                 bbox: tuple[float, float, float, float] | None = None,
                 strip_h: int = 64, bin_deg: float = 0.5,
                 concurrency: int = 4) -> np.ndarray:
    """Distributed strip render -> full (height, width, 3) uint8 image.

    zone_rgb: (n_zones, 3) uint8 fill colors (class palette applied by
    the caller so missing/valid coloring stays a caller policy).
    """
    import ray.data as rd

    from ..util import clamp_concurrency

    if bbox is None:
        bb = polyset.bbox
        bbox = (float(bb[:, 0].min()), float(bb[:, 1].min()),
                float(bb[:, 2].max()), float(bb[:, 3].max()))
    index = geom.GridIndex(polyset, bin_deg=bin_deg)
    ref = ray.put((index, np.ascontiguousarray(zone_rgb, dtype=np.uint8)))
    row0s = np.arange(0, height, strip_h, dtype=np.int64)
    strips = rd.from_pandas(pd.DataFrame({
        "row0": row0s,
        "nrows": np.minimum(strip_h, height - row0s),
    })).repartition(min(len(row0s), max(concurrency * 2, 1)))
    got = strips.map_batches(
        StripRenderer,
        fn_constructor_args=(ref, width, height, bbox),
        batch_format="pandas", batch_size=4,
        concurrency=clamp_concurrency(concurrency, 0.5), num_cpus=0.5,
    ).to_pandas().sort_values("row0")
    img = np.empty((height, width, 3), dtype=np.uint8)
    for _, r in got.iterrows():
        rgb = np.frombuffer(r["rgb"], dtype=np.uint8) \
            .reshape(int(r["nrows"]), width, 3)
        img[int(r["row0"]): int(r["row0"]) + int(r["nrows"])] = rgb
    return img


# ---------------------------------------------------------------------------
# PNG encoder (RFC 2083; zlib + crc32, filter type 0)
# ---------------------------------------------------------------------------

def png_encode(rgb: np.ndarray, compress_level: int = 6) -> bytes:
    """(h, w, 3) uint8 -> PNG bytes. Deterministic for fixed input."""
    if rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("png_encode expects (h, w, 3) uint8")
    h, w = rgb.shape[:2]
    # per-row filter byte 0 (None), then raw RGB
    rows = np.zeros((h, w * 3 + 1), dtype=np.uint8)
    rows[:, 1:] = rgb.reshape(h, -1)
    raw = zlib.compress(rows.tobytes(), compress_level)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", raw) + chunk(b"IEND", b""))


def png_decode(buf: bytes) -> np.ndarray:
    """From-scratch baseline-PNG decoder (RFC 2083): 8-bit truecolor
    RGB (color type 2) and RGBA (type 6), non-interlaced, all five
    scanline filters (None/Sub/Up/Average/Paeth). Returns (h, w, 3|4)
    uint8. Palette/16-bit/interlaced images are rejected LOUDLY — this
    decoder exists because no codec library ships in the target
    container, and a silent wrong decode is worse than an error.

    Filter reconstruction: Sub is a per-lane modular prefix sum
    (vectorized cumsum % 256), Up is one vector add per row; Average
    and Paeth carry an intra-row pixel dependency and run as a
    per-pixel loop vectorized across channel lanes (encoders that
    matter for round-trips here emit 0/Sub/Up).
    """
    if buf[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = b""
    while pos < len(buf):
        (ln,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4: pos + 8]
        data = buf[pos + 8: pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", buf, pos + 8 + ln)
        if crc != (zlib.crc32(tag + data) & 0xFFFFFFFF):
            raise ValueError(f"bad crc in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = \
                struct.unpack_from(">IIBBBBB", data, 0)
            if depth != 8 or ctype not in (2, 6):
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color_type={ctype}):"
                    " only 8-bit RGB/RGBA baseline is implemented")
            if ilace != 0:
                raise ValueError("interlaced PNG not supported")
        elif tag == b"IDAT":
            idat += data
        pos += 12 + ln
    if w is None:
        raise ValueError("missing IHDR")
    bpp = 3 if ctype == 2 else 4
    stride = w * bpp
    rows = np.frombuffer(zlib.decompress(idat), dtype=np.uint8) \
        .reshape(h, stride + 1)
    ftypes = rows[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for r in range(h):
        ft = int(ftypes[r])
        raw = rows[r, 1:].astype(np.int64)
        if ft == 0:
            rec = raw
        elif ft == 1:                      # Sub: per-lane prefix sum
            rec = np.cumsum(raw.reshape(w, bpp), axis=0).ravel() % 256
        elif ft == 2:                      # Up
            rec = (raw + prev) % 256
        elif ft == 3:                      # Average (intra-row recur)
            rec = np.zeros(stride, dtype=np.int64)
            left = np.zeros(bpp, dtype=np.int64)
            rp = raw.reshape(w, bpp)
            pp = prev.reshape(w, bpp)
            rr = rec.reshape(w, bpp)
            for x in range(w):
                left = (rp[x] + (left + pp[x]) // 2) % 256
                rr[x] = left
        elif ft == 4:                      # Paeth
            rec = np.zeros(stride, dtype=np.int64)
            left = np.zeros(bpp, dtype=np.int64)
            ul = np.zeros(bpp, dtype=np.int64)
            rp = raw.reshape(w, bpp)
            pp = prev.reshape(w, bpp)
            rr = rec.reshape(w, bpp)
            for x in range(w):
                p = left + pp[x] - ul
                pa, pb, pc = (np.abs(p - left), np.abs(p - pp[x]),
                              np.abs(p - ul))
                pred = np.where((pa <= pb) & (pa <= pc), left,
                                np.where(pb <= pc, pp[x], ul))
                left = (rp[x] + pred) % 256
                rr[x] = left
                ul = pp[x]
        else:
            raise ValueError(f"bad filter type {ft} in row {r}")
        out[r] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(h, w, bpp).copy()


def class_colors(classes: np.ndarray,
                 palette: np.ndarray = PALETTE_YLORBR) -> np.ndarray:
    """Class labels (1..k; 0 or negative = missing) -> (n, 3) uint8."""
    c = np.asarray(classes, dtype=np.int64)
    out = np.broadcast_to(MISSING_RGB, (len(c), 3)).copy()
    valid = (c >= 1) & (c <= len(palette))
    out[valid] = palette[c[valid] - 1]
    return out


# ---------------------------------------------------------------------------
# Annotation compositing: 5x7 bitmap font, title + classed legend
# (the reference's legend/title/label surface, chloropleth.py:122-196 +
# pipeline/map.py:24-120, drawn into the RGB array without matplotlib)
# ---------------------------------------------------------------------------

#: classic 5x7 glyphs, 7 rows of 5-bit masks (MSB = leftmost column).
FONT_5X7: dict[str, tuple[int, ...]] = {
    "A": (0x0E, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "B": (0x1E, 0x11, 0x11, 0x1E, 0x11, 0x11, 0x1E),
    "C": (0x0E, 0x11, 0x10, 0x10, 0x10, 0x11, 0x0E),
    "D": (0x1E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x1E),
    "E": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x1F),
    "F": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x10),
    "G": (0x0E, 0x11, 0x10, 0x17, 0x11, 0x11, 0x0E),
    "H": (0x11, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "I": (0x0E, 0x04, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "J": (0x07, 0x02, 0x02, 0x02, 0x02, 0x12, 0x0C),
    "K": (0x11, 0x12, 0x14, 0x18, 0x14, 0x12, 0x11),
    "L": (0x10, 0x10, 0x10, 0x10, 0x10, 0x10, 0x1F),
    "M": (0x11, 0x1B, 0x15, 0x15, 0x11, 0x11, 0x11),
    "N": (0x11, 0x19, 0x15, 0x13, 0x11, 0x11, 0x11),
    "O": (0x0E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "P": (0x1E, 0x11, 0x11, 0x1E, 0x10, 0x10, 0x10),
    "Q": (0x0E, 0x11, 0x11, 0x11, 0x15, 0x12, 0x0D),
    "R": (0x1E, 0x11, 0x11, 0x1E, 0x14, 0x12, 0x11),
    "S": (0x0F, 0x10, 0x10, 0x0E, 0x01, 0x01, 0x1E),
    "T": (0x1F, 0x04, 0x04, 0x04, 0x04, 0x04, 0x04),
    "U": (0x11, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "V": (0x11, 0x11, 0x11, 0x11, 0x11, 0x0A, 0x04),
    "W": (0x11, 0x11, 0x11, 0x15, 0x15, 0x15, 0x0A),
    "X": (0x11, 0x11, 0x0A, 0x04, 0x0A, 0x11, 0x11),
    "Y": (0x11, 0x11, 0x0A, 0x04, 0x04, 0x04, 0x04),
    "Z": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x10, 0x1F),
    "0": (0x0E, 0x11, 0x13, 0x15, 0x19, 0x11, 0x0E),
    "1": (0x04, 0x0C, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "2": (0x0E, 0x11, 0x01, 0x02, 0x04, 0x08, 0x1F),
    "3": (0x1F, 0x02, 0x04, 0x02, 0x01, 0x11, 0x0E),
    "4": (0x02, 0x06, 0x0A, 0x12, 0x1F, 0x02, 0x02),
    "5": (0x1F, 0x10, 0x1E, 0x01, 0x01, 0x11, 0x0E),
    "6": (0x06, 0x08, 0x10, 0x1E, 0x11, 0x11, 0x0E),
    "7": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x08, 0x08),
    "8": (0x0E, 0x11, 0x11, 0x0E, 0x11, 0x11, 0x0E),
    "9": (0x0E, 0x11, 0x11, 0x0F, 0x01, 0x02, 0x0C),
    " ": (0, 0, 0, 0, 0, 0, 0),
    ".": (0, 0, 0, 0, 0, 0x0C, 0x0C),
    ",": (0, 0, 0, 0, 0x0C, 0x04, 0x08),
    "-": (0, 0, 0, 0x1F, 0, 0, 0),
    ":": (0, 0x0C, 0x0C, 0, 0x0C, 0x0C, 0),
    "%": (0x18, 0x19, 0x02, 0x04, 0x08, 0x13, 0x03),
    "(": (0x02, 0x04, 0x08, 0x08, 0x08, 0x04, 0x02),
    ")": (0x08, 0x04, 0x02, 0x02, 0x02, 0x04, 0x08),
    "<": (0x02, 0x04, 0x08, 0x10, 0x08, 0x04, 0x02),
    ">": (0x08, 0x04, 0x02, 0x01, 0x02, 0x04, 0x08),
    "=": (0, 0x1F, 0, 0x1F, 0, 0, 0),
    "_": (0, 0, 0, 0, 0, 0, 0x1F),
    "/": (0x01, 0x01, 0x02, 0x04, 0x08, 0x10, 0x10),
}

#: glyph cell geometry: 5 columns + 1 spacing, 7 rows
_GW, _GH = 6, 7


def draw_text(img: np.ndarray, x: int, y: int, text: str,
              color=(0, 0, 0), scale: int = 1) -> int:
    """Blit ``text`` into ``img`` (in place) at top-left (x, y).

    Lowercase maps to uppercase (the font is caps-only); characters
    without a glyph render as space. Pixels outside the image clip
    silently. Returns the x coordinate after the last glyph.
    """
    h, w = img.shape[:2]
    col = np.asarray(color, dtype=np.uint8)
    for ch in text:
        g = FONT_5X7.get(ch) or FONT_5X7.get(ch.upper()) or FONT_5X7[" "]
        for r, bits in enumerate(g):
            for c in range(5):
                if bits & (1 << (4 - c)):
                    yy0 = y + r * scale
                    xx0 = x + c * scale
                    yy1, xx1 = min(yy0 + scale, h), min(xx0 + scale, w)
                    if yy0 < h and xx0 < w and yy0 >= 0 and xx0 >= 0:
                        img[yy0:yy1, xx0:xx1] = col
        x += _GW * scale
    return x


def annotate_choropleth(img: np.ndarray, title: str,
                        entries: list[tuple[str, tuple[int, int, int]]],
                        margin: int = 4,
                        title_scale: int = 2) -> np.ndarray:
    """Composite a TITLE (top-left) and a classed LEGEND (bottom-left:
    outlined color swatch + label per class) into a rendered choropleth
    — the annotation surface the reference draws with matplotlib
    (ref chloropleth.py:122-196 legend/classed labels,
    pipeline/map.py:24-120 title) — using only the embedded bitmap
    font. Returns a NEW array; deterministic for fixed input
    (golden-hash pytest). The title scale steps down (min 1) until the
    text fits the image width rather than clipping mid-word."""
    out = img.copy()
    while title_scale > 1 and \
            margin + len(title) * _GW * title_scale > out.shape[1]:
        title_scale -= 1
    draw_text(out, margin, margin, title, scale=title_scale)
    sw = 10                       # swatch square
    line_h = max(sw, _GH) + 4
    y0 = out.shape[0] - margin - len(entries) * line_h
    for i, (label, rgb) in enumerate(entries):
        y = y0 + i * line_h
        y1, x0, x1 = y + sw, margin, margin + sw
        out[y:y1, x0:x1] = np.asarray(rgb, dtype=np.uint8)
        # 1-px black outline so light swatches read on the background
        out[y, x0:x1] = 0
        out[y1 - 1, x0:x1] = 0
        out[y:y1, x0] = 0
        out[y:y1, x1 - 1] = 0
        draw_text(out, x1 + 4, y + (sw - _GH) // 2 + 1, label)
    return out
