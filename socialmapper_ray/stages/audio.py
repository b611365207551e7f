"""From-scratch WAV (RIFF/WAVE) codec + vectorized audio features.

Companion to the PNG (stages/raster.py) and JPEG (stages/jpeg.py)
codecs — closes the audio half of the multimodal decode gap with zero
external dependencies: RIFF/WAVE PCM needs only ``struct`` + numpy.
Format scope (the public Multimedia Programming Interface / RIFF WAVE
spec and the RFC 2361 WAVE format registry):

- PCM (format 1): 8-bit unsigned, 16-bit, 24-bit packed, 32-bit.
- IEEE float (format 3): float32 / float64.
- WAVE_FORMAT_EXTENSIBLE (0xFFFE): sub-format resolved from the first
  two GUID bytes; PCM / float accepted.
- Any channel count; unknown chunks (LIST, fact, cue, bext, ...) are
  skipped per spec (word-aligned chunk walk).

Compressed formats (ADPCM, MP3-in-WAV, mu-law, ...), truncated files
and malformed headers raise loudly — same refusal posture as the PNG /
JPEG / multi-ring-WKB decoders: a silent wrong decode is worse than an
error.

Feature extraction is exact-integer on purpose: the actor stage emits
native-unit integer features (peak, sum of squares, zero-crossing
count) so the ``media_wav_decode`` gate can be pinned against a
closed-form DuckDB oracle with NO float tolerance — the oracle computes
the same integers from the synthesis parameters, so any decode error of
even one sample flips the hash.

Reference parity: the reference ingests audio via librosa/soundfile
(external codecs it never reimplements); this module is the engine's
equivalent capability for the dominant uncompressed audio container.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

import numpy as np
import pandas as pd


class WavData(NamedTuple):
    """Decoded WAV: ``samples`` is (n_frames, channels) — int64 in the
    file's native units for PCM, float64 for IEEE-float files."""

    samples: np.ndarray
    sample_rate: int
    bits: int
    fmt: int            # 1 = PCM, 3 = IEEE float


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

_FMT_PCM = 1
_FMT_FLOAT = 3
_FMT_EXTENSIBLE = 0xFFFE


def wav_decode(blob: bytes) -> WavData:
    """RIFF/WAVE bytes -> :class:`WavData`. Raises ``ValueError`` on
    anything malformed, truncated, or compressed."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("wav_decode: not a RIFF/WAVE file")
    riff_size = struct.unpack_from("<I", blob, 4)[0]
    if riff_size + 8 > len(blob):
        raise ValueError("wav_decode: truncated RIFF payload")

    fmt = None
    data = None
    pos = 12
    end = 8 + riff_size
    while pos + 8 <= end:
        cid = blob[pos:pos + 4]
        csize = struct.unpack_from("<I", blob, pos + 4)[0]
        body_at = pos + 8
        if body_at + csize > end:
            raise ValueError(f"wav_decode: chunk {cid!r} overruns file")
        if cid == b"fmt ":
            fmt = _parse_fmt(blob[body_at:body_at + csize])
        elif cid == b"data":
            data = blob[body_at:body_at + csize]
        # word alignment: chunks pad to even length
        pos = body_at + csize + (csize & 1)
    if fmt is None:
        raise ValueError("wav_decode: missing fmt chunk")
    if data is None:
        raise ValueError("wav_decode: missing data chunk")

    code, channels, rate, block_align, bits = fmt
    if channels < 1:
        raise ValueError("wav_decode: zero channels")
    if block_align != channels * ((bits + 7) // 8):
        raise ValueError(
            f"wav_decode: block_align {block_align} inconsistent with "
            f"{channels}ch x {bits}-bit")
    if len(data) % block_align:
        raise ValueError("wav_decode: data chunk not frame-aligned")

    if code == _FMT_PCM:
        flat = _decode_pcm(data, bits)
    elif code == _FMT_FLOAT:
        flat = _decode_float(data, bits)
    else:
        raise ValueError(
            f"wav_decode: compressed/unsupported WAV format {code} — only "
            "PCM (1) and IEEE float (3) are supported")
    return WavData(flat.reshape(-1, channels), rate, bits, code)


def _parse_fmt(body: bytes) -> tuple[int, int, int, int, int]:
    if len(body) < 16:
        raise ValueError("wav_decode: fmt chunk too short")
    code, channels, rate, _byte_rate, block_align, bits = \
        struct.unpack_from("<HHIIHH", body, 0)
    if code == _FMT_EXTENSIBLE:
        # cbSize(2) + validbits(2) + channelmask(4) + GUID(16); the
        # GUID's first two bytes are the real format code.
        if len(body) < 40:
            raise ValueError("wav_decode: extensible fmt chunk too short")
        code = struct.unpack_from("<H", body, 24)[0]
    return code, channels, rate, block_align, bits


def _decode_pcm(data: bytes, bits: int) -> np.ndarray:
    if bits == 8:                      # unsigned, offset-128 storage
        return np.frombuffer(data, np.uint8).astype(np.int64) - 128
    if bits == 16:
        return np.frombuffer(data, "<i2").astype(np.int64)
    if bits == 24:                     # packed 3-byte little-endian
        u = np.frombuffer(data, np.uint8).reshape(-1, 3).astype(np.int64)
        v = u[:, 0] | (u[:, 1] << 8) | (u[:, 2] << 16)
        return v - ((v & 0x800000) << 1)           # sign-extend bit 23
    if bits == 32:
        return np.frombuffer(data, "<i4").astype(np.int64)
    raise ValueError(f"wav_decode: unsupported PCM bit depth {bits}")


def _decode_float(data: bytes, bits: int) -> np.ndarray:
    if bits == 32:
        return np.frombuffer(data, "<f4").astype(np.float64)
    if bits == 64:
        return np.frombuffer(data, "<f8").astype(np.float64)
    raise ValueError(f"wav_decode: unsupported float bit depth {bits}")


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------

def wav_encode(samples: np.ndarray, sample_rate: int, bits: int = 16,
               fmt: int = _FMT_PCM) -> bytes:
    """(n,) or (n, channels) samples -> RIFF/WAVE bytes.

    PCM input is native-unit integers (8-bit: [-128, 127] stored
    offset-128; 16/24/32-bit: signed, range-checked). Float input
    (``fmt=3``) is stored as IEEE float32/float64 verbatim.
    """
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError("wav_encode: need (n,) or (n, channels)")
    channels = s.shape[1]

    if fmt == _FMT_PCM:
        s = s.astype(np.int64)
        lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
        if bits == 8:
            lo, hi = -128, 127
        if s.size and (s.min() < lo or s.max() > hi):
            raise ValueError(f"wav_encode: samples out of {bits}-bit range")
        flat = s.reshape(-1)
        if bits == 8:
            payload = (flat + 128).astype(np.uint8).tobytes()
        elif bits == 16:
            payload = flat.astype("<i2").tobytes()
        elif bits == 24:
            v = flat & 0xFFFFFF
            b3 = np.empty((flat.size, 3), np.uint8)
            b3[:, 0] = v & 0xFF
            b3[:, 1] = (v >> 8) & 0xFF
            b3[:, 2] = (v >> 16) & 0xFF
            payload = b3.tobytes()
        elif bits == 32:
            payload = flat.astype("<i4").tobytes()
        else:
            raise ValueError(f"wav_encode: unsupported PCM bit depth {bits}")
    elif fmt == _FMT_FLOAT:
        if bits == 32:
            payload = s.astype("<f4").reshape(-1).tobytes()
        elif bits == 64:
            payload = s.astype("<f8").reshape(-1).tobytes()
        else:
            raise ValueError(f"wav_encode: unsupported float depth {bits}")
    else:
        raise ValueError(f"wav_encode: unsupported format {fmt}")

    block_align = channels * ((bits + 7) // 8)
    byte_rate = sample_rate * block_align
    fmt_body = struct.pack("<HHIIHH", fmt, channels, sample_rate,
                           byte_rate, block_align, bits)
    out = bytearray()
    out += b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    out += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        out += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WAVE" + bytes(out)


# ---------------------------------------------------------------------------
# Feature extraction (exact-integer, vectorized)
# ---------------------------------------------------------------------------

def wav_features(blob: bytes) -> dict:
    """Decode + exact-integer features. Float-format files are
    quantized to int16 units (round-half-away) so every output stays an
    integer. Zero-crossing count is strict sign flips on channel 0
    (``s[i-1] * s[i] < 0``) — exact for any signal without zero
    samples, documented as such."""
    w = wav_decode(blob)
    if w.fmt == _FMT_FLOAT:
        q = np.sign(w.samples) * np.floor(np.abs(w.samples) * 32767 + 0.5)
        s = q.astype(np.int64)
        bits_out = 16
    else:
        s = w.samples
        bits_out = w.bits
    n, channels = s.shape
    c0 = s[:, 0]
    return {
        "sample_rate": w.sample_rate,
        "channels": channels,
        "bits": bits_out,
        "n_samples": n,
        "duration_us": (n * 1_000_000) // w.sample_rate,
        "peak_q": int(np.abs(s).max()) if n else 0,
        "sumsq_q": int((s.astype(object) ** 2).sum()) if n and bits_out > 24
        else int(np.square(s).sum()) if n else 0,
        "zcr_count": int(np.count_nonzero(c0[1:] * c0[:-1] < 0)) if n else 0,
    }


class WavAudioDecoder:
    """REAL audio decode stage: WAV payload bytes -> native-unit
    integer features, via the from-scratch RIFF/WAVE parser above —
    struct + numpy only, no codec library. Same actor-pool shape and
    payload-dropped output contract as the PNG/JPEG image decoders
    (stages/multimodal.py); corrupt or compressed payloads raise."""

    _COLS = (("sample_rate", np.int64), ("channels", np.int64),
             ("bits", np.int64), ("n_samples", np.int64),
             ("duration_us", np.int64), ("peak_q", np.int64),
             ("sumsq_q", np.int64), ("zcr_count", np.int64))

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop(columns=[self.payload_col])
        if df.empty:
            for c, dt in self._COLS:
                out[c] = pd.Series(dtype=dt)
            return out
        rows = [wav_features(bytes(b)) for b in df[self.payload_col]]
        for c, dt in self._COLS:
            out[c] = np.asarray([r[c] for r in rows], dtype=dt)
        return out
