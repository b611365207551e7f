"""From-scratch baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

Companion to the PNG codec in :mod:`raster` — closes the most common
real image format with zero external dependencies (this container has
no PIL/libjpeg). Scope: baseline sequential DCT (SOF0) AND progressive
DCT (SOF2: spectral selection, successive approximation, EOB runs, AC
refinement per T.81 §G), 8-bit samples, Huffman entropy coding,
grayscale or YCbCr (any 1-2 sampling factors, so 4:4:4 / 4:2:2 / 4:2:0
all decode), restart intervals. Arithmetic coding, lossless,
hierarchical and 12-bit precision raise loudly — a silent wrong decode
is worse than a refusal (same posture as the PNG path and the
multi-ring WKB decoders).

Decode pipeline: segment parse -> per-segment Huffman tables (a 16-bit
peek LUT per table: canonical JPEG codes are MSB-first prefix codes, so
one 65536-entry symbol/length lookup decodes any code in O(1)) ->
entropy decode per MCU (the sequential hot path is an inline 32-bit
bit-reservoir over packed plain-list LUTs; the progressive path favors
clarity and uses _BitReader) -> vectorized dezigzag + dequantize +
exact matrix IDCT over ALL blocks of a component at once -> plane
assembly + nearest-neighbor chroma upsample -> JFIF YCbCr->RGB.

Two encoders exist for test vectors and the JPEG sink: 4:4:4 baseline
(:func:`jpeg_encode`) and spectral-selection progressive
(:func:`jpeg_encode_progressive`) — identical quantized coefficients,
so decoding either stream of the same image is bit-identical (pinned
in tests). Decode reads tables from the FILE, so decoder correctness
never depends on the encoder's table choice. Golden tests pin
analytically-known outputs (flat blocks quantize exactly) plus
encode->decode error bounds.

Reference parity: the reference pipeline ingests arbitrary web images
via PIL (it never reimplements codecs); this module is the engine's
equivalent capability for the dominant crawl image format.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Shared constants
# ---------------------------------------------------------------------------


def _zigzag() -> np.ndarray:
    order = []
    for s in range(15):
        rs = (range(min(s, 7), max(0, s - 7) - 1, -1) if s % 2 == 0
              else range(max(0, s - 7), min(s, 7) + 1))
        for r in rs:
            order.append(r * 8 + (s - r))
    return np.asarray(order, dtype=np.int64)


ZIGZAG = _zigzag()                      # zigzag position -> raster index
UNZIG = np.argsort(ZIGZAG)              # raster index -> zigzag position


def _idct_matrix() -> np.ndarray:
    """A[u, x] = c(u)/2 * cos((2x+1)u*pi/16); spatial = A.T @ F @ A."""
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    a = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    a[0] /= np.sqrt(2.0)
    return a


_A = _idct_matrix()

# Annex-K-style quantization tables (public spec, T.81 Tables K.1/K.2)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QUANT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32, dtype=np.int64)

# Standard-shape Huffman specs (bits-per-length, then values). Any
# valid prefix code works — the decoder always reads tables from DHT.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))


def _ac_vals() -> list[int]:
    """AC value list in the standard layout: (run, size) symbols ordered
    by code length; generated, not transcribed (0x00=EOB, 0xF0=ZRL)."""
    vals = [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
            0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
            0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
            0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
            0x24, 0x33, 0x62, 0x72]
    seen = set(vals)
    for run in range(16):
        for size in range(1, 11):
            s = (run << 4) | size
            if s not in seen:
                vals.append(s)
                seen.add(s)
    return vals


AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_VALS = _ac_vals()
assert len(AC_VALS) == sum(AC_BITS) == 162


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------

def _canonical_codes(bits: list[int], vals: list[int]):
    """(value, code, length) triples per JPEG canonical assignment."""
    out = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((vals[k], code, length))
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecodeTable:
    """16-bit peek LUT: lut_sym[peek16] = symbol, lut_len[peek16] = code
    length (0 where no code matches — corrupt stream)."""

    __slots__ = ("sym", "length", "_key")

    # packed LUTs keyed by table CONTENT, shared process-wide: tables
    # are re-parsed from every file (decoder correctness never trusts
    # the encoder's choice), but almost every real JPEG ships the same
    # Annex-K tables — rebuilding the 65536-entry list per image was a
    # measured 3x decode regression before this cache.
    _PACK_CACHE: dict = {}

    def __init__(self, bits: list[int], vals: list[int]):
        self.sym = np.zeros(1 << 16, dtype=np.int16)
        self.length = np.zeros(1 << 16, dtype=np.uint8)
        for v, code, ln in _canonical_codes(bits, vals):
            lo = code << (16 - ln)
            hi = (code + 1) << (16 - ln)
            self.sym[lo:hi] = v
            self.length[lo:hi] = ln
        self._key = bytes(bits) + bytes(vals)

    def packed(self) -> list:
        """Python-list LUT of ``(length << 16) | (symbol & 0xFFFF)``
        per 16-bit peek (0 where no code matches). Built lazily, once
        per distinct table content: plain-list indexing + one
        shift/mask beats two numpy scalar extractions per symbol in the
        sequential entropy loop (see _decode_scan)."""
        lut = self._PACK_CACHE.get(self._key)
        if lut is None:
            packed = (self.length.astype(np.int32) << 16) \
                | (self.sym.astype(np.int32) & 0xFFFF)
            lut = packed.tolist()
            self._PACK_CACHE[self._key] = lut
        return lut


class _HuffEncodeTable:
    __slots__ = ("code", "length")

    def __init__(self, bits: list[int], vals: list[int]):
        self.code = {}
        self.length = {}
        for v, code, ln in _canonical_codes(bits, vals):
            self.code[v] = code
            self.length[v] = ln


# ---------------------------------------------------------------------------
# Bit I/O
# ---------------------------------------------------------------------------

class _BitReader:
    """MSB-first bit reader over UNSTUFFED entropy bytes."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data + b"\xff\xff\xff\xff"   # peek pad (all-1 bits)
        self.pos = 0
        self.nbits = 8 * len(data)

    def peek16(self) -> int:
        byte = self.pos >> 3
        v = int.from_bytes(self.data[byte:byte + 4], "big")
        return (v >> (16 - (self.pos & 7))) & 0xFFFF

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.nbits:
            raise ValueError("jpeg: entropy stream truncated")
        v = self.peek16() >> (16 - n)
        self.pos += n
        return v

    def read_symbol(self, table: _HuffDecodeTable) -> int:
        peek = self.peek16()
        ln = int(table.length[peek])
        if ln == 0 or self.pos + ln > self.nbits:
            raise ValueError("jpeg: bad Huffman code (corrupt stream)")
        self.pos += ln
        return int(table.sym[peek])


def _extend(v: int, s: int) -> int:
    """JPEG magnitude decode: s-bit value -> signed coefficient."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


class _BitWriter:
    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:               # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)   # pad with 1-bits


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def jpeg_decode(blob: bytes) -> np.ndarray:
    """JPEG bytes -> (H, W, C) uint8 (C = 1 or 3, RGB).

    Baseline sequential (SOF0) and progressive (SOF2: spectral
    selection + successive approximation, EOB runs, AC refinement per
    T.81 §G) Huffman streams decode; arithmetic, lossless, hierarchical
    and 12-bit streams raise — refused, never mis-decoded."""
    if len(blob) < 4 or blob[0:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI marker")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecodeTable] = {}
    huff_ac: dict[int, _HuffDecodeTable] = {}
    frame = None
    restart_interval = 0
    prog_coef = None                     # progressive: accumulated coeffs
    prog_geo = None
    prog_g = None
    i = 2
    n = len(blob)
    while True:
        if i + 2 > n:
            raise ValueError("jpeg: truncated before SOS")
        if blob[i] != 0xFF:
            raise ValueError("jpeg: expected marker")
        marker = blob[i + 1]
        i += 2
        if marker == 0xD8:
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue                     # standalone markers
        if marker == 0xD9:               # EOI (standalone)
            if frame is not None and frame.get("prog") and prog_coef:
                return _assemble(frame, frame["comps"], qt, prog_coef,
                                 prog_geo[0], prog_geo[1])
            raise ValueError("jpeg: EOI before a decodable scan")
        if i + 2 > n:
            raise ValueError("jpeg: truncated before SOS")
        (seg_len,) = struct.unpack_from(">H", blob, i)
        if seg_len < 2 or i + seg_len > n:
            raise ValueError("jpeg: truncated or overrunning segment")
        seg = blob[i + 2: i + seg_len]
        i += seg_len
        if marker == 0xC4:               # DHT
            p = 0
            while p < len(seg):
                tc_th = seg[p]
                bits = list(seg[p + 1: p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17: p + 17 + nv])
                table = _HuffDecodeTable(bits, vals)
                if tc_th >> 4 == 0:
                    huff_dc[tc_th & 15] = table
                else:
                    huff_ac[tc_th & 15] = table
                p += 17 + nv
        elif marker == 0xDB:             # DQT
            p = 0
            while p < len(seg):
                pq_tq = seg[p]
                if pq_tq >> 4 == 0:
                    q = np.frombuffer(seg, np.uint8, 64, p + 1) \
                        .astype(np.int64)
                    p += 65
                else:                    # 16-bit precision
                    q = np.frombuffer(seg, ">u2", 64, p + 1) \
                        .astype(np.int64)
                    p += 129
                qt[pq_tq & 15] = q
        elif marker in (0xC0, 0xC2):     # SOF0 baseline / SOF2 progressive
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(
                    ">BBB", seg, 6 + 3 * c)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "prog": marker == 0xC2}
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "jpeg: only baseline sequential (SOF0) and progressive "
                f"(SOF2) DCT are supported (got SOF marker "
                f"0x{marker:02X}; arithmetic/lossless/12-bit streams "
                "are refused, not mis-decoded)")
        elif marker == 0xDD:             # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:             # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            scan = []
            scan_ids = []
            for c in range(ns):
                cs, td_ta = struct.unpack_from(">BB", seg, 1 + 2 * c)
                ci, comp = next(
                    (j, cc) for j, cc in enumerate(frame["comps"])
                    if cc["id"] == cs)
                scan.append((comp, td_ta >> 4, td_ta & 15))
                scan_ids.append(ci)
            if not frame.get("prog"):
                return _decode_scan(blob, i, frame, scan, qt, huff_dc,
                                    huff_ac, restart_interval)
            ss_, se_, ahal = struct.unpack_from(">BBB", seg, 1 + 2 * ns)
            if prog_coef is None:
                mcus_x, mcus_y, geo = _prog_geometry(frame)
                prog_geo = (mcus_x, mcus_y)
                prog_coef = [np.zeros((g["bx"] * g["by"], 64),
                                      dtype=np.int32) for g in geo]
                prog_g = geo
            i = _decode_progressive_scan(
                blob, i, frame, scan, scan_ids, prog_coef, prog_g,
                prog_geo[0], prog_geo[1], huff_dc, huff_ac,
                restart_interval, ss_, se_, ahal >> 4, ahal & 15)
        # else: APPn / COM / unknown -> skipped
    raise ValueError("jpeg: no SOS segment")


def _split_entropy(blob: bytes, i: int):
    """Entropy-coded bytes from offset i: unstuff FF00, split at RSTn,
    stop at the next true marker. Returns (segments, stuffed-length)."""
    data = np.frombuffer(blob, dtype=np.uint8, count=len(blob) - i,
                         offset=i)
    ff = np.flatnonzero(data == 0xFF)
    segs: list[bytes] = []
    keep_start = 0
    drops: list[int] = []
    parts: list[tuple[int, int, list[int]]] = []
    for f in ff.tolist():
        if f + 1 >= len(data):
            raise ValueError("jpeg: dangling 0xFF at end of stream")
        nxt = data[f + 1]
        if nxt == 0x00:
            drops.append(f + 1)          # stuffed zero
        elif 0xD0 <= nxt <= 0xD7:        # restart marker
            parts.append((keep_start, f, drops))
            drops = []
            keep_start = f + 2
        else:                            # real marker terminates scan
            parts.append((keep_start, f, drops))
            raw = data.tobytes()
            out = []
            for s, e, dr in parts:
                b = bytearray(raw[s:e])
                for d in reversed(dr):
                    del b[d - s]
                out.append(bytes(b))
            return out, f
    raise ValueError("jpeg: scan not terminated by a marker (no EOI)")


def _decode_scan(blob, i, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval):
    h, w = frame["h"], frame["w"]
    comps = [s[0] for s in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 2 or vmax > 2:
        raise ValueError("jpeg: sampling factors beyond 1-2 unsupported")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    n_mcus = mcus_x * mcus_y

    segments, _ = _split_entropy(blob, i)
    per_seg = restart_interval if restart_interval else n_mcus
    if -(-n_mcus // per_seg) != len(segments):
        raise ValueError(
            f"jpeg: expected {-(-n_mcus // per_seg)} entropy segments "
            f"for {n_mcus} MCUs at restart interval {per_seg}, got "
            f"{len(segments)}")

    # entropy decode: per component, zigzag coeff rows in MCU-block
    # order. The loop is sequential by nature (Huffman code boundaries
    # are data-dependent), so it is written as an INLINE 32-bit
    # bit-reservoir with packed plain-list LUTs: one refill + one peek
    # serves both the symbol AND its magnitude bits, and there are no
    # per-symbol function calls or numpy scalar extractions. Measured
    # 2.9x over the _BitReader-per-symbol form (the class remains for
    # hand-assembled test streams). Semantics and error messages are
    # unchanged and pinned by tests/test_jpeg.py.
    for _, td, ta in scan:
        if huff_dc.get(td) is None or huff_ac.get(ta) is None:
            raise ValueError("jpeg: scan references missing "
                             "Huffman table")
    plan = [(ci, comp["h"] * comp["v"],
             huff_dc[td].packed(), huff_ac[ta].packed())
            for ci, (comp, td, ta) in enumerate(scan)]
    coeffs = [np.zeros((n_mcus * c["h"] * c["v"], 64), dtype=np.int32)
              for c in comps]
    rows = [c.tolist() for c in coeffs]      # plain lists while decoding
    block_n = [0] * len(comps)
    mcu = 0
    for seg_bytes in segments:
        data = seg_bytes + b"\xff" * 12   # peek pad (refill may load up
        #                                   to 8 bytes past the stream)
        limit = 8 * len(seg_bytes)
        acc = 0        # bit reservoir, nb live low bits
        nb = 0
        pos = 0        # next byte to load
        used = 0       # bits consumed (truncation check)
        pred = [0] * len(comps)
        for _ in range(min(per_seg, n_mcus - mcu)):
            for ci, nblocks, dc_lut, ac_lut in plan:
                comp_rows = rows[ci]
                for _b in range(nblocks):
                    row = comp_rows[block_n[ci]]
                    if nb < 32:
                        acc = ((acc & ((1 << nb) - 1)) << 32) \
                            | int.from_bytes(data[pos:pos + 4], "big")
                        pos += 4
                        nb += 32
                    e = dc_lut[(acc >> (nb - 16)) & 0xFFFF]
                    ln = e >> 16
                    if ln == 0 or used + ln > limit:
                        raise ValueError(
                            "jpeg: bad Huffman code (corrupt stream)")
                    s = e & 0xFFFF
                    if s > 11:
                        raise ValueError("jpeg: invalid DC category")
                    if s:
                        if used + ln + s > limit:
                            raise ValueError(
                                "jpeg: entropy stream truncated")
                        t = ln + s
                        v = (acc >> (nb - t)) & ((1 << s) - 1)
                        nb -= t
                        used += t
                        pred[ci] += v if v >= (1 << (s - 1)) \
                            else v - (1 << s) + 1
                    else:
                        nb -= ln
                        used += ln
                    row[0] = pred[ci]
                    k = 1
                    while k < 64:
                        if nb < 32:
                            acc = ((acc & ((1 << nb) - 1)) << 32) \
                                | int.from_bytes(data[pos:pos + 4],
                                                 "big")
                            pos += 4
                            nb += 32
                        e = ac_lut[(acc >> (nb - 16)) & 0xFFFF]
                        ln = e >> 16
                        if ln == 0 or used + ln > limit:
                            raise ValueError(
                                "jpeg: bad Huffman code (corrupt stream)")
                        s = e & 15
                        if s == 0:
                            nb -= ln
                            used += ln
                            if ((e >> 4) & 15) == 15:
                                k += 16          # ZRL
                                continue
                            break                # EOB
                        k += (e >> 4) & 15
                        if k > 63:
                            raise ValueError("jpeg: AC run overflow")
                        if used + ln + s > limit:
                            raise ValueError(
                                "jpeg: entropy stream truncated")
                        t = ln + s
                        v = (acc >> (nb - t)) & ((1 << s) - 1)
                        nb -= t
                        used += t
                        row[k] = v if v >= (1 << (s - 1)) \
                            else v - (1 << s) + 1
                        k += 1
                    block_n[ci] += 1
            mcu += 1
    coeffs = [np.asarray(r, dtype=np.int32).reshape(c.shape)
              for r, c in zip(rows, coeffs)]

    # convert MCU-block order -> raster block order, then the shared
    # dequant/IDCT/assembly (also used by the progressive path)
    raster = []
    for ci, comp in enumerate(comps):
        ch, cv = comp["h"], comp["v"]
        perm = np.arange(n_mcus * cv * ch) \
            .reshape(mcus_y, mcus_x, cv, ch) \
            .transpose(0, 2, 1, 3).reshape(-1)
        raster.append(coeffs[ci][perm])
    return _assemble(frame, comps, qt, raster, mcus_x, mcus_y)


def _prog_geometry(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    geo = []
    for c in comps:
        bx, by = mcus_x * c["h"], mcus_y * c["v"]      # padded grid
        cw = -(-frame["w"] * c["h"] // hmax)           # true samples
        chh = -(-frame["h"] * c["v"] // vmax)
        geo.append({"bx": bx, "by": by,
                    "tbx": -(-cw // 8), "tby": -(-chh // 8)})
    return mcus_x, mcus_y, geo


def _decode_progressive_scan(blob, i, frame, scan, scan_ids, coef, geo,
                             mcus_x, mcus_y, huff_dc, huff_ac, ri,
                             ss, se, ah, al):
    """One progressive scan (ITU-T T.81 §G): spectral selection +
    successive approximation, DC (interleaved or single-component) and
    AC (single-component only, EOB runs, refinement correction bits).
    Updates the per-component zigzag-order coefficient arrays in place;
    returns the offset of the next marker.

    Clarity over speed on purpose: progressive is the long-tail format
    (the hot sequential path has the inline-reservoir loop); this path
    uses _BitReader and plain block iteration.
    """
    if ah != 0 and ah != al + 1:
        raise ValueError("jpeg: invalid successive approximation "
                         f"(Ah={ah}, Al={al})")
    if ss == 0:
        if se != 0:
            raise ValueError(
                "jpeg: invalid progressive scan header (Ss=0 needs "
                "Se=0 — a full-band scan is not valid progressive)")
        tabs = []
        for (comp, td, ta), _ in zip(scan, scan_ids):
            if ah == 0:
                t = huff_dc.get(td)
                if t is None:
                    raise ValueError("jpeg: scan references missing "
                                     "Huffman table")
                tabs.append(t)
            else:
                tabs.append(None)        # DC refinement: raw bits only
    else:
        if len(scan) != 1:
            raise ValueError("jpeg: progressive AC scan must be "
                             "single-component")
        if not 1 <= ss <= se <= 63:
            raise ValueError("jpeg: invalid spectral band")
        t = huff_ac.get(scan[0][2])
        if t is None:
            raise ValueError("jpeg: scan references missing Huffman "
                             "table")
        tabs = [t]

    # block sequence for this scan: list of (si, comp_index, raster_idx)
    if len(scan) > 1:                    # interleaved (DC scans only)
        units = []
        for my in range(mcus_y):
            for mx in range(mcus_x):
                mcu = []
                for si, (comp, _, _) in enumerate(scan):
                    ci = scan_ids[si]
                    ch, cv = comp["h"], comp["v"]
                    for r in range(cv):
                        for c in range(ch):
                            mcu.append((si, ci,
                                        (my * cv + r) * geo[ci]["bx"]
                                        + mx * ch + c))
                units.append(mcu)
    else:                                # non-interleaved: true grid
        ci = scan_ids[0]
        g = geo[ci]
        units = [[(0, ci, by_ * g["bx"] + bx_)]
                 for by_ in range(g["tby"]) for bx_ in range(g["tbx"])]

    segments, end = _split_entropy(blob, i)
    per_seg = ri if ri else len(units)
    if -(-len(units) // per_seg) != len(segments):
        raise ValueError(
            f"jpeg: expected {-(-len(units) // per_seg)} entropy "
            f"segments for {len(units)} units at restart interval "
            f"{per_seg}, got {len(segments)}")

    p1 = 1 << al
    m1 = -p1
    u = 0
    for seg_bytes in segments:
        rd = _BitReader(seg_bytes)
        pred = [0] * len(scan)
        eobrun = 0
        for mcu in units[u:u + per_seg]:
            for si, ci, idx in mcu:
                row = coef[ci][idx]
                if ss == 0 and ah == 0:            # DC first
                    s = rd.read_symbol(tabs[si])
                    if s > 11:
                        raise ValueError("jpeg: invalid DC category")
                    if s:
                        pred[si] += _extend(rd.read_bits(s), s)
                    row[0] = pred[si] << al
                elif ss == 0:                      # DC refinement
                    if rd.read_bits(1):
                        row[0] |= p1
                elif ah == 0:                      # AC first
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = rd.read_symbol(tabs[0])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16            # ZRL
                                continue
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += rd.read_bits(r)
                            break                  # EOB(n)
                        k += r
                        if k > se:
                            raise ValueError("jpeg: AC run overflow")
                        row[k] = _extend(rd.read_bits(s), s) << al
                        k += 1
                else:                              # AC refinement (G.1.2.3)
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = rd.read_symbol(tabs[0])
                            r, s = rs >> 4, rs & 15
                            val = 0
                            if s == 0:
                                if r < 15:
                                    eobrun = 1 << r
                                    if r:
                                        eobrun += rd.read_bits(r)
                                    break          # correction tail below
                                # r == 15: skip 16 zero-history coeffs
                            else:
                                if s != 1:
                                    raise ValueError(
                                        "jpeg: invalid AC refinement "
                                        "magnitude")
                                val = p1 if rd.read_bits(1) else m1
                            while k <= se:
                                c = row[k]
                                if c != 0:
                                    if rd.read_bits(1) and not (c & p1):
                                        row[k] = c + (p1 if c >= 0
                                                      else m1)
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if val and k <= se:
                                row[k] = val
                            k += 1
                    if eobrun > 0:
                        while k <= se:
                            c = row[k]
                            if c != 0:
                                if rd.read_bits(1) and not (c & p1):
                                    row[k] = c + (p1 if c >= 0 else m1)
                            k += 1
                        eobrun -= 1
            u += 1
    return i + end


def _assemble(frame, comps, qt, raster_coeffs, mcus_x, mcus_y):
    """Per-component zigzag coefficient rows in RASTER block order over
    the MCU-padded grid -> dequant + dezigzag + exact matrix IDCT ->
    plane assembly + chroma upsample + colorspace, all vectorized."""
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for ci, comp in enumerate(comps):
        q = qt.get(comp["tq"])
        if q is None:
            raise ValueError("jpeg: missing quantization table")
        zz = raster_coeffs[ci].astype(np.float64) * q[np.newaxis, :]
        rast = np.zeros_like(zz)
        rast[:, ZIGZAG] = zz             # zigzag position -> raster
        blocks = rast.reshape(-1, 8, 8)
        spatial = np.einsum("ux,nuv,vy->nxy", _A, blocks, _A) + 128.0
        ch, cv = comp["h"], comp["v"]
        bx, by = mcus_x * ch, mcus_y * cv
        plane = spatial.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(by * 8, bx * 8)
        # crop to the component's true size, then upsample to full res
        cw = -(-w * ch // hmax)
        chh = -(-h * cv // vmax)
        plane = plane[:chh, :cw]
        if ch != hmax or cv != vmax:
            plane = np.repeat(np.repeat(plane, vmax // cv, axis=0),
                              hmax // ch, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        gray = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    if len(planes) != 3:
        raise ValueError("jpeg: only 1- or 3-component scans supported")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (4:4:4 or grayscale; test vectors + JPEG sink)
# ---------------------------------------------------------------------------

def _quality_tables(quality: int):
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    lq = np.clip((QUANT_LUMA * scale + 50) // 100, 1, 255)
    cq = np.clip((QUANT_CHROMA * scale + 50) // 100, 1, 255)
    return lq.astype(np.int64), cq.astype(np.int64)


def _fdct_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float64, H/W multiples of 8 -> (n_blocks, 8, 8) DCT
    coefficients in raster block order (row-major)."""
    hh, ww = plane.shape
    blocks = plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3) \
        .reshape(-1, 8, 8)
    return np.einsum("xu,nxy,yv->nuv", _A.T, blocks, _A.T)


def _encode_block(emit_v: list, emit_l: list, zz: list, last_nz: int,
                  pred: int, dc_code: list, dc_len: list, ac_code: list,
                  ac_len: list) -> int:
    """Emit one block's (value, bit-length) pairs onto the shared
    lists (packed into bytes once per image by _pack_bits — the
    per-symbol _BitWriter.write calls were ~45% of encode time)."""
    dc = zz[0]
    diff = dc - pred
    s = diff.bit_length() if diff >= 0 else (-diff).bit_length()
    emit_v.append(dc_code[s])
    emit_l.append(dc_len[s])
    if s:
        emit_v.append(diff if diff >= 0 else diff + (1 << s) - 1)
        emit_l.append(s)
    run = 0
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            emit_v.append(ac_code[0xF0])                   # ZRL
            emit_l.append(ac_len[0xF0])
            run -= 16
        s = v.bit_length() if v >= 0 else (-v).bit_length()
        sym = (run << 4) | s
        emit_v.append(ac_code[sym])
        emit_l.append(ac_len[sym])
        emit_v.append(v if v >= 0 else v + (1 << s) - 1)
        emit_l.append(s)
        run = 0
    if last_nz < 63:
        emit_v.append(ac_code[0x00])                       # EOB
        emit_l.append(ac_len[0x00])
    return dc


def _pack_bits(vals: list, lens: list) -> bytes:
    """Vectorized MSB-first bit packing + JPEG FF00 byte stuffing.

    Codes are <= 16 bits and start at bit offsets with sub-byte phase
    <= 7, so every item fits the top 23 bits of a 64-bit window
    anchored at its starting byte; disjoint bit ranges make the
    scatter an ADD (np.add.at) with no carries. Final partial byte is
    1-padded per the spec (the _BitWriter.flush convention)."""
    if not vals:
        return b""
    v = np.asarray(vals, dtype=np.uint64)
    ln = np.asarray(lens, dtype=np.uint64)
    ends = np.cumsum(ln)
    offs = ends - ln
    total = int(ends[-1])
    pad = (-total) % 8
    if pad:                                   # 1-bit padding to a byte
        v = np.append(v, np.uint64((1 << pad) - 1))
        ln = np.append(ln, np.uint64(pad))
        offs = np.append(offs, np.uint64(total))
        total += pad
    nbytes = total // 8
    words = v << (np.uint64(64) - (offs & np.uint64(7)) - ln)
    byte0 = (offs >> np.uint64(3)).astype(np.int64)
    buf = np.zeros(nbytes + 8, dtype=np.uint8)
    for j in range(8):
        b = ((words >> np.uint64(8 * (7 - j))) & np.uint64(0xFF)) \
            .astype(np.uint8)
        np.add.at(buf, byte0 + j, b)
    buf = buf[:nbytes]
    ff = np.flatnonzero(buf == 0xFF)
    if len(ff):
        buf = np.insert(buf, ff + 1, 0)       # byte stuffing
    return buf.tobytes()


def jpeg_encode(img: np.ndarray, quality: int = 90) -> bytes:
    """(H, W, 3) RGB or (H, W)/(H, W, 1) grayscale uint8 -> baseline
    JPEG bytes (4:4:4, no subsampling — exactness over size)."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.dtype != np.uint8 or img.ndim != 3 \
            or img.shape[2] not in (1, 3):
        raise ValueError("jpeg_encode: need (H, W, 1|3) uint8")
    h, w, nc = img.shape
    lq, cq = _quality_tables(quality)
    f = img.astype(np.float64)
    if nc == 3:
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]
        qts = [lq, cq, cq]
        tsel = [0, 1, 1]
    else:
        planes = [f[..., 0]]
        qts = [lq]
        tsel = [0]

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    dc_tabs = [_HuffEncodeTable(DC_LUMA_BITS, DC_LUMA_VALS),
               _HuffEncodeTable(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_tabs = [_HuffEncodeTable(AC_BITS, AC_VALS),
               _HuffEncodeTable(AC_BITS, AC_VALS)]

    comp_zz = []
    comp_rows = []
    comp_last = []
    for p, q in zip(planes, qts):
        pad = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") - 128.0
        coef = _fdct_blocks(pad).reshape(-1, 64)
        zzc = np.round(coef[:, ZIGZAG] / q[np.newaxis, :]).astype(np.int64)
        comp_zz.append(zzc)
        comp_rows.append(zzc.tolist())
        # highest nonzero zigzag index per block, vectorized (0 when
        # the AC tail is all zero — DC handled separately)
        comp_last.append((63 - np.argmax(zzc[:, ::-1] != 0, axis=1))
                         * (zzc[:, 1:] != 0).any(axis=1))

    out = bytearray()
    out += b"\xff\xd8"                                        # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + bytes([1, 1, 0, 0, 1, 0, 1, 0, 0])                  # APP0
    for tq, q in enumerate([lq] if nc == 1 else [lq, cq]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) \
            + bytes(int(v) for v in q)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for c in range(nc):
        out += bytes([c + 1, 0x11, tsel[c]])
    for cls, tabs, bits, vals in (
            (0, dc_tabs, (DC_LUMA_BITS, DC_CHROMA_BITS),
             (DC_LUMA_VALS, DC_CHROMA_VALS)),
            (1, ac_tabs, (AC_BITS, AC_BITS), (AC_VALS, AC_VALS))):
        for t in range(1 if nc == 1 else 2):
            payload = bytes(bits[t]) + bytes(vals[t])
            out += b"\xff\xc4" + struct.pack(">HB", 3 + len(payload),
                                             (cls << 4) | t) + payload
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for c in range(nc):
        out += bytes([c + 1, (tsel[c] << 4) | tsel[c]])
    out += bytes([0, 63, 0])

    # per-component Huffman code/length LOOKUP LISTS (dict-of-int ->
    # dense list: symbol values are < 256)
    def _lists(t: _HuffEncodeTable):
        code = [0] * 256
        length = [0] * 256
        for sym, c in t.code.items():
            code[sym] = c
            length[sym] = t.length[sym]
        return code, length

    plan = []
    for c in range(nc):
        dc_c, dc_l = _lists(dc_tabs[tsel[c]])
        ac_c, ac_l = _lists(ac_tabs[tsel[c]])
        plan.append((comp_rows[c], comp_last[c].tolist(),
                     dc_c, dc_l, ac_c, ac_l))

    emit_v: list = []
    emit_l: list = []
    nbx, nby = pw // 8, ph // 8
    pred = [0] * nc
    for bi in range(nby * nbx):
        for c, (rows, lasts, dc_c, dc_l, ac_c, ac_l) in enumerate(plan):
            pred[c] = _encode_block(emit_v, emit_l, rows[bi], lasts[bi],
                                    pred[c], dc_c, dc_l, ac_c, ac_l)
    out += _pack_bits(emit_v, emit_l)
    out += b"\xff\xd9"                                        # EOI
    return bytes(out)


def jpeg_encode_progressive(img: np.ndarray, quality: int = 90,
                            bands=((1, 20), (21, 63))) -> bytes:
    """Progressive (SOF2) twin of :func:`jpeg_encode`: IDENTICAL
    quantized coefficients (same fdct / quality tables / zigzag),
    emitted as an interleaved DC-first scan plus per-component banded
    AC scans (spectral selection, Al=0) with EOB runs — decoding either
    stream yields bit-identical pixels (pinned in
    tests/test_jpeg_progressive.py). The decoder additionally handles
    successive-approximation and AC-refinement scans; this encoder
    emits the spectral-selection script, which any spec-compliant
    progressive decoder accepts.

    AC scans use a near-flat two-length Huffman table over all 256 rs
    symbols because the Annex-K table lacks the EOBn symbols
    progressive needs; decoders read tables from the file, so the
    choice only costs bytes, never correctness.
    """
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.dtype != np.uint8 or img.ndim != 3 \
            or img.shape[2] not in (1, 3):
        raise ValueError("jpeg_encode_progressive: need (H, W, 1|3) uint8")
    h, wd, nc = img.shape
    lq, cq = _quality_tables(quality)
    f = img.astype(np.float64)
    if nc == 3:
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
                  0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]
        qts, tsel = [lq, cq, cq], [0, 1, 1]
    else:
        planes, qts, tsel = [f[..., 0]], [lq], [0]
    ph, pw = -(-h // 8) * 8, -(-wd // 8) * 8
    comp_zz = []
    for p, q in zip(planes, qts):
        pad = np.pad(p, ((0, ph - h), (0, pw - wd)), mode="edge") - 128.0
        coef = _fdct_blocks(pad).reshape(-1, 64)
        comp_zz.append(np.round(coef[:, ZIGZAG] / q[np.newaxis, :])
                       .astype(np.int64))

    dc_tabs = [_HuffEncodeTable(DC_LUMA_BITS, DC_LUMA_VALS),
               _HuffEncodeTable(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    prog_ac_bits = [0] * 7 + [128, 128] + [0] * 7
    prog_ac_vals = list(range(256))
    ac_tab = _HuffEncodeTable(prog_ac_bits, prog_ac_vals)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) \
            + body

    def cat(v):
        return v.bit_length() if v >= 0 else (-v).bit_length()

    out = bytearray(b"\xff\xd8")
    for tq, q in enumerate([lq] if nc == 1 else [lq, cq]):
        out += seg(0xDB, bytes([tq]) + bytes(int(x) for x in q))
    sof = struct.pack(">BHHB", 8, h, wd, nc)
    for c in range(nc):
        sof += bytes([c + 1, 0x11, tsel[c]])
    out += seg(0xC2, sof)
    for t in range(1 if nc == 1 else 2):
        db, dv = ((DC_LUMA_BITS, DC_LUMA_VALS),
                  (DC_CHROMA_BITS, DC_CHROMA_VALS))[t]
        out += seg(0xC4, bytes([t]) + bytes(db) + bytes(dv))
        out += seg(0xC4, bytes([0x10 | t]) + bytes(prog_ac_bits)
                   + bytes(prog_ac_vals))

    def sos(comps_td_ta, ss, se, ah, al):
        body = bytes([len(comps_td_ta)])
        for cid, td, ta in comps_td_ta:
            body += bytes([cid, (td << 4) | ta])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    # scan 1: interleaved DC first (4:4:4 -> one block per comp per MCU)
    out += sos([(c + 1, tsel[c], 0) for c in range(nc)], 0, 0, 0, 0)
    w = _BitWriter()
    pred = [0] * nc
    n_blocks = comp_zz[0].shape[0]
    for bi in range(n_blocks):
        for c in range(nc):
            dc = int(comp_zz[c][bi, 0])
            diff = dc - pred[c]
            pred[c] = dc
            s = cat(diff)
            w.write(dc_tabs[tsel[c]].code[s], dc_tabs[tsel[c]].length[s])
            if s:
                w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    w.flush()
    out += w.out

    # AC scans: per component, per spectral band, with EOB runs
    for c in range(nc):
        for ss, se in bands:
            out += sos([(c + 1, 0, tsel[c])], ss, se, 0, 0)
            w = _BitWriter()
            eobrun = 0

            def flush_eob(w=w):
                nonlocal eobrun
                while eobrun > 0:
                    r = min(eobrun.bit_length() - 1, 14)
                    ext = min(eobrun, (2 << r) - 1) - (1 << r)
                    w.write(ac_tab.code[r << 4], ac_tab.length[r << 4])
                    if r:
                        w.write(ext, r)
                    eobrun -= (1 << r) + ext

            for bi in range(n_blocks):
                zz = comp_zz[c][bi]
                nz = [k for k in range(ss, se + 1) if zz[k]]
                if not nz:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                k = ss
                for k2 in nz:
                    run = 0
                    while k < k2:
                        if zz[k] == 0:
                            run += 1
                        k += 1
                    while run > 15:
                        w.write(ac_tab.code[0xF0], ac_tab.length[0xF0])
                        run -= 16
                    v = int(zz[k2])
                    s = cat(v)
                    w.write(ac_tab.code[(run << 4) | s],
                            ac_tab.length[(run << 4) | s])
                    w.write(v if v >= 0 else v + (1 << s) - 1, s)
                    k = k2 + 1
                if nz[-1] < se:
                    eobrun += 1
            flush_eob()
            w.flush()
            out += w.out
    out += b"\xff\xd9"
    return bytes(out)
