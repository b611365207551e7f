"""From-scratch AVI (RIFF 'AVI ') MJPEG container + frame sampling.

Closes the video half of the multimodal decode gap with zero external
dependencies: Motion-JPEG stores each frame as an independent baseline
JPEG, so the from-scratch T.81 codec (stages/jpeg.py) decodes real
video frames and only the container (the public Microsoft AVI RIFF
form: LIST hdrl {avih, LIST strl {strh, strf}} + LIST movi {00dc...}
+ idx1) needs parsing — a word-aligned RIFF chunk walk, same machinery
as the WAV reader (stages/audio.py).

Scope: single video stream, 'MJPG' compression, '00dc'/'00db' frame
chunks. Multi-stream files, non-MJPEG compression, truncated chunks
and header/stream inconsistencies raise loudly (the PNG/JPEG/WAV
refusal posture).

Frame sampling is the scale lever: a crawl video is minutes of frames
but a feature extractor needs a handful, so :class:`MjpegVideoDecoder`
decodes every ``stride``-th frame and never materializes the rest —
per-payload work is O(n_frames / stride) decode + O(n_frames) offsets.

The ``media_mjpeg_frames`` gate is pinned exact: synthesized flat-gray
frames encoded at quality 100 decode bit-exactly (all-ones quant
tables; DC-only blocks — proven in tests/test_jpeg.py), so the DuckDB
oracle recomputes every output integer, including the decoded-luma
sum, in closed form from the synthesis parameters.

Reference parity: the reference ingests video via ffmpeg-backed
readers (external codecs it never reimplements); this module is the
engine's equivalent capability for the one video codec expressible
with the tools in this container.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

import numpy as np
import pandas as pd


class AviInfo(NamedTuple):
    width: int
    height: int
    rate: int            # frames per second = rate / scale
    scale: int
    usec_per_frame: int
    n_frames: int
    frames: list         # [(offset, size)] of raw JPEG bytes in blob


# ---------------------------------------------------------------------------
# Container parse / write
# ---------------------------------------------------------------------------

def _chunks(blob: bytes, pos: int, end: int):
    """Word-aligned RIFF chunk walk over blob[pos:end]; yields
    (fourcc, body_start, body_size, list_type|None)."""
    while pos + 8 <= end:
        cid = blob[pos:pos + 4]
        csize = struct.unpack_from("<I", blob, pos + 4)[0]
        body = pos + 8
        if body + csize > end:
            raise ValueError(f"avi_parse: chunk {cid!r} overruns file")
        ltype = blob[body:body + 4] if cid in (b"LIST", b"RIFF") else None
        yield cid, body, csize, ltype
        pos = body + csize + (csize & 1)


def avi_parse(blob: bytes) -> AviInfo:
    """AVI bytes -> :class:`AviInfo`. Raises ``ValueError`` on anything
    malformed, truncated, multi-stream, or non-MJPEG."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("avi_parse: not a RIFF/AVI file")
    riff_size = struct.unpack_from("<I", blob, 4)[0]
    if riff_size + 8 > len(blob):
        raise ValueError("avi_parse: truncated RIFF payload")
    end = 8 + riff_size

    avih = strh = strf = None
    frames: list[tuple[int, int]] = []
    for cid, body, csize, ltype in _chunks(blob, 12, end):
        if cid == b"LIST" and ltype == b"hdrl":
            for c2, b2, s2, lt2 in _chunks(blob, body + 4, body + csize):
                if c2 == b"avih":
                    avih = blob[b2:b2 + s2]
                elif c2 == b"LIST" and lt2 == b"strl":
                    for c3, b3, s3, _ in _chunks(blob, b2 + 4, b2 + s2):
                        if c3 == b"strh" and strh is None:
                            strh = blob[b3:b3 + s3]
                        elif c3 == b"strf" and strf is None:
                            strf = blob[b3:b3 + s3]
        elif cid == b"LIST" and ltype == b"movi":
            for c2, b2, s2, _ in _chunks(blob, body + 4, body + csize):
                if c2[2:] in (b"dc", b"db"):
                    frames.append((b2, s2))
    if avih is None or strh is None or strf is None:
        raise ValueError("avi_parse: missing avih/strh/strf header")

    usec, _, _, _, total = struct.unpack_from("<IIIII", avih, 0)
    streams = struct.unpack_from("<I", avih, 24)[0]
    width, height = struct.unpack_from("<II", avih, 32)
    if streams != 1:
        raise ValueError(f"avi_parse: {streams} streams — only single-"
                         "stream MJPEG AVI is supported")
    fcc_type, fcc_handler = strh[0:4], strh[4:8]
    if fcc_type != b"vids":
        raise ValueError(f"avi_parse: stream type {fcc_type!r} != 'vids'")
    scale, rate, _start, length = struct.unpack_from("<IIII", strh, 20)
    compression = strf[16:20]
    if fcc_handler not in (b"MJPG", b"mjpg") \
            or compression not in (b"MJPG", b"mjpg"):
        raise ValueError(
            f"avi_parse: compression {compression!r} — only MJPG is "
            "supported (each frame an independent baseline JPEG)")
    if scale == 0 or rate == 0:
        raise ValueError("avi_parse: zero rate/scale")
    if len(frames) != total or len(frames) != length:
        raise ValueError(
            f"avi_parse: header says {total}/{length} frames, movi has "
            f"{len(frames)}")
    return AviInfo(width, height, rate, scale, usec, len(frames), frames)


def avi_encode_mjpeg(frames: list[np.ndarray], rate: int, scale: int = 1,
                     quality: int = 100) -> bytes:
    """uint8 frames (all same HxW[, C]) -> single-stream MJPEG AVI.
    ``rate/scale`` is the frame rate; ``usec/frame`` must be integral
    (1e6 * scale % rate == 0) so downstream durations stay exact."""
    from .jpeg import jpeg_encode

    if not frames:
        raise ValueError("avi_encode_mjpeg: need at least one frame")
    h, w = frames[0].shape[:2]
    if (1_000_000 * scale) % rate:
        raise ValueError("avi_encode_mjpeg: non-integral usec/frame")
    usec = 1_000_000 * scale // rate
    blobs = []
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("avi_encode_mjpeg: mixed frame sizes")
        blobs.append(jpeg_encode(f, quality=quality))
    max_sz = max(len(b) for b in blobs)

    avih = struct.pack("<IIIIIIIIII", usec, max_sz * rate // scale, 0,
                       0x10, len(blobs), 0, 1, max_sz, w, h) + b"\x00" * 16
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIII", 0, 0, 0, 0,
                                            scale, rate, 0, len(blobs))
            + struct.pack("<IiI", max_sz, -1, 0)
            + struct.pack("<hhhh", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body \
            + (b"\x00" if len(body) & 1 else b"")

    strl = chunk(b"strh", strh) + chunk(b"strf", strf)
    hdrl = chunk(b"avih", avih) + chunk(b"LIST", b"strl" + strl)

    movi = bytearray(b"movi")
    idx = bytearray()
    for b in blobs:
        # idx1 offset convention: from the 'movi' fourcc position
        idx += b"00dc" + struct.pack("<III", 0x10, len(movi), len(b))
        movi += chunk(b"00dc", b)

    body = chunk(b"LIST", b"hdrl" + hdrl) + chunk(b"LIST", bytes(movi)) \
        + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + bytes(body)


# ---------------------------------------------------------------------------
# Actor-pool decode stage
# ---------------------------------------------------------------------------

class MjpegVideoDecoder:
    """REAL video decode stage: MJPEG-AVI payload bytes -> container
    metadata + decoded-frame features for every ``stride``-th frame,
    via the from-scratch RIFF walk + T.81 JPEG decoder. Same actor-pool
    shape and payload-dropped contract as the image/audio decoders;
    corrupt containers, non-MJPEG codecs and frames whose decoded size
    disagrees with the header raise.

    ``sum_y_q`` is the integer sum over sampled frames of each frame's
    mean luma, exact when frames are flat (floor-rounded otherwise —
    documented, and the gate uses flat frames)."""

    _COLS = (("n_frames", np.int64), ("fps_milli", np.int64),
             ("width", np.int64), ("height", np.int64),
             ("duration_us", np.int64), ("n_sampled", np.int64),
             ("dec_w", np.int64), ("dec_h", np.int64),
             ("sum_y_q", np.int64))

    def __init__(self, payload_col: str = "payload", stride: int = 2):
        from .jpeg import jpeg_decode

        self.payload_col = payload_col
        self.stride = max(1, int(stride))
        self._decode = jpeg_decode

    def _one(self, blob: bytes) -> dict:
        info = avi_parse(blob)
        sum_y = 0
        n_sampled = 0
        dec_w = dec_h = -1
        for off, size in info.frames[::self.stride]:
            img = self._decode(blob[off:off + size])
            if dec_w < 0:
                dec_h, dec_w = img.shape[:2]
            elif (dec_h, dec_w) != img.shape[:2]:
                raise ValueError("MjpegVideoDecoder: mixed frame sizes")
            if img.shape[2] == 3:
                luma = (0.299 * img[..., 0] + 0.587 * img[..., 1]
                        + 0.114 * img[..., 2])
            else:
                luma = img[..., 0]
            sum_y += int(np.floor(float(luma.mean())))
            n_sampled += 1
        if dec_w >= 0 and (dec_w, dec_h) != (info.width, info.height):
            raise ValueError(
                f"MjpegVideoDecoder: decoded {dec_w}x{dec_h} != header "
                f"{info.width}x{info.height}")
        return {"n_frames": info.n_frames,
                "fps_milli": (1000 * info.rate) // info.scale,
                "width": info.width, "height": info.height,
                "duration_us": info.n_frames * info.usec_per_frame,
                "n_sampled": n_sampled, "dec_w": dec_w, "dec_h": dec_h,
                "sum_y_q": sum_y}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop(columns=[self.payload_col])
        if df.empty:
            for c, dt in self._COLS:
                out[c] = pd.Series(dtype=dt)
            return out
        rows = [self._one(bytes(b)) for b in df[self.payload_col]]
        for c, dt in self._COLS:
            out[c] = np.asarray([r[c] for r in rows], dtype=dt)
        return out
