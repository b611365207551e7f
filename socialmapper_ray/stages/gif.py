"""From-scratch GIF codec (GIF87a/89a, variable-width LZW).

Third member of the image-codec family (PNG in :mod:`raster`, JPEG in
:mod:`jpeg`) — covers the remaining common crawl image format with
zero external dependencies. Scope: logical screen + global/local
color tables, real variable-width LZW decode (code growth to 12 bits,
CLEAR/EOI, deferred-clear tolerant) and encode, interlaced images
(4-pass row order), multi-frame animations with graphic-control
disposal methods 0/1 (leave) and 2 (restore background), transparency
via the GCE index. Malformed headers, truncated sub-blocks, and
out-of-range codes raise loudly (the PNG/JPEG/WAV/AVI refusal
posture).

GIF is LOSSLESS, so the ``media_gif_decode`` gate pins the decoder
bit-exactly on ANY content: the synthesized pixel-index pattern is
uniform over the palette by construction, making every decoded-channel
sum closed-form in the DuckDB oracle.

Reference parity: the reference ingests GIFs via PIL; this module is
the engine's equivalent capability.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

import numpy as np
import pandas as pd


class GifFrame(NamedTuple):
    image: np.ndarray        # (h, w, 3) uint8, composited canvas
    delay_cs: int            # centiseconds from the GCE (0 if none)


class GifData(NamedTuple):
    width: int
    height: int
    frames: list             # [GifFrame]


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code_size: int, n_expected: int
                ) -> np.ndarray:
    """GIF LZW bitstream -> pixel indices (uint8, length n_expected)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # bit reader: LSB-first (GIF convention, opposite of JPEG)
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    # table: list of byte sequences; entries 0..clear-1 are singletons
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("gif: LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("gif: invalid first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):         # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("gif: LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= n_expected:
            # some encoders omit EOI; stop once the image is full
            break
    if len(out) < n_expected:
        raise ValueError(
            f"gif: LZW yielded {len(out)} of {n_expected} pixels")
    return np.frombuffer(bytes(out[:n_expected]), np.uint8)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Pixel indices -> GIF LZW bitstream (real compression, dict-based;
    emits CLEAR when the table hits 4096 per spec)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prev = b""
    for b in indices.astype(np.uint8).tobytes():
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes([b])
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate([np.arange(start, h, step)
                            for start, step in _INTERLACE_PASSES])
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _sub_blocks(blob: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(blob):
            raise ValueError("gif: truncated sub-block chain")
        n = blob[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        if pos + n > len(blob):
            raise ValueError("gif: truncated sub-block")
        chunks.append(blob[pos:pos + n])
        pos += n


def gif_decode(blob: bytes) -> GifData:
    """GIF bytes -> :class:`GifData` (all frames composited onto the
    logical screen). Raises ``ValueError`` on malformed input."""
    if len(blob) < 13 or blob[:4] != b"GIF8" or blob[4:6] not in \
            (b"7a", b"9a"):
        raise ValueError("gif: not a GIF87a/GIF89a file")
    w, h, packed, bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        if pos + 3 * n > len(blob):
            raise ValueError("gif: truncated global color table")
        gct = np.frombuffer(blob, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None:
        canvas[:] = gct[bg if bg < len(gct) else 0]
    frames: list[GifFrame] = []
    transparent = None
    disposal = 0
    delay = 0
    prev_canvas = canvas.copy()

    while True:
        if pos >= len(blob):
            raise ValueError("gif: missing trailer")
        block = blob[pos]
        pos += 1
        if block == 0x3B:                # trailer
            break
        if block == 0x21:                # extension
            if pos + 1 > len(blob):
                raise ValueError("gif: truncated extension")
            label = blob[pos]
            pos += 1
            body, pos = _sub_blocks(blob, pos)
            if label == 0xF9 and len(body) >= 4:       # graphic control
                flags = body[0]
                delay = struct.unpack_from("<H", body, 1)[0]
                transparent = body[3] if flags & 1 else None
                disposal = (flags >> 2) & 7
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block 0x{block:02X}")
        # image descriptor
        if pos + 9 > len(blob):
            raise ValueError("gif: truncated image descriptor")
        il, it, iw, ih, ipack = struct.unpack_from("<HHHHB", blob, pos)
        pos += 9
        ct = gct
        if ipack & 0x80:                 # local color table
            n = 2 << (ipack & 7)
            if pos + 3 * n > len(blob):
                raise ValueError("gif: truncated local color table")
            ct = np.frombuffer(blob, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("gif: image without any color table")
        if il + iw > w or it + ih > h:
            raise ValueError("gif: frame rectangle outside screen")
        if pos >= len(blob):
            raise ValueError("gif: truncated before LZW data")
        mcs = blob[pos]
        pos += 1
        if not 2 <= mcs <= 8:
            raise ValueError(f"gif: bad LZW min code size {mcs}")
        data, pos = _sub_blocks(blob, pos)
        idx = _lzw_decode(data, mcs, iw * ih).reshape(ih, iw)
        if ipack & 0x40:
            idx = _deinterlace(idx)
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("gif: pixel index beyond color table")

        prev_canvas = canvas.copy()
        region = ct[idx]                 # (ih, iw, 3)
        tgt = canvas[it:it + ih, il:il + iw]
        if transparent is not None:
            mask = idx != transparent
            tgt[mask] = region[mask]
        else:
            tgt[:] = region
        frames.append(GifFrame(canvas.copy(), delay))
        if disposal == 2:                # restore to background color
            fill = ct[bg] if gct is not None and bg < len(gct) \
                else np.zeros(3, np.uint8)
            canvas[it:it + ih, il:il + iw] = fill
        elif disposal == 3:              # restore to previous
            canvas = prev_canvas.copy()
        transparent = None
        disposal = 0
        delay = 0
    if not frames:
        raise ValueError("gif: no image data")
    return GifData(w, h, frames)


def gif_encode(frames, palette: np.ndarray, delays_cs=None,
               transparent: int | None = None,
               interlace: bool = False) -> bytes:
    """Index frames ((h, w) uint8, all same size) + (n, 3) palette ->
    GIF89a bytes. Real LZW compression; multi-frame inputs get a GCE
    per frame."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    h, w = frames[0].shape
    palette = np.asarray(palette, dtype=np.uint8)
    n = len(palette)
    if not 2 <= n <= 256:
        raise ValueError("gif_encode: palette size must be 2..256")
    bits = max(1, int(n - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), np.uint8)
    pal[:n] = palette
    mcs = max(2, bits)
    if delays_cs is None:
        delays_cs = [0] * len(frames)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    for fi, f in enumerate(frames):
        f = np.asarray(f, dtype=np.uint8)
        if f.shape != (h, w):
            raise ValueError("gif_encode: mixed frame sizes")
        if int(f.max(initial=0)) >= n:
            raise ValueError("gif_encode: index beyond palette")
        if len(frames) > 1 or transparent is not None:
            flags = (1 if transparent is not None else 0)
            out += bytes([0x21, 0xF9, 4, flags])
            out += struct.pack("<H", delays_cs[fi])
            out += bytes([transparent or 0, 0])
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h,
                                     0x40 if interlace else 0)
        rows = f
        if interlace:
            order = np.concatenate([np.arange(s, h, st)
                                    for s, st in _INTERLACE_PASSES])
            rows = f[order]
        out += bytes([mcs])
        data = _lzw_encode(rows.reshape(-1), mcs)
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# Actor-pool decode stage
# ---------------------------------------------------------------------------

class GifImageDecoder:
    """REAL GIF decode stage: payload bytes -> first-frame stats +
    frame count, via the from-scratch LZW decoder. Same actor-pool
    shape and payload-dropped contract as the PNG/JPEG/WAV/AVI
    decoders; GIF is lossless, so sum_r/g/b are EXACT integers over
    the first frame (the gate's closed-form oracle)."""

    _COLS = (("height", np.int64), ("width", np.int64),
             ("n_frames", np.int64), ("sum_r", np.int64),
             ("sum_g", np.int64), ("sum_b", np.int64))

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop(columns=[self.payload_col])
        if df.empty:
            for c, dt in self._COLS:
                out[c] = pd.Series(dtype=dt)
            return out
        rows = []
        for blob in df[self.payload_col]:
            g = gif_decode(bytes(blob))
            first = g.frames[0].image.astype(np.int64)
            rows.append({"height": g.height, "width": g.width,
                         "n_frames": len(g.frames),
                         "sum_r": int(first[..., 0].sum()),
                         "sum_g": int(first[..., 1].sum()),
                         "sum_b": int(first[..., 2].sum())})
        for c, dt in self._COLS:
            out[c] = np.asarray([r[c] for r in rows], dtype=dt)
        return out
