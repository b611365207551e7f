"""From-scratch MJPEG-AVI container tests (stages/video.py).

Golden strategy mirrors test_jpeg.py/test_audio.py: flat-gray frames
at quality 100 decode bit-exactly (all-ones quant tables, DC-only
blocks — pinned in test_jpeg.py), so every decoded-frame feature is
analytic. The container walk is exercised on spec-legal layouts the
writer never emits (extra LIST/JUNK chunks) and refuses malformed or
non-MJPEG streams.
"""

import struct

import numpy as np
import pandas as pd
import pytest

from socialmapper_ray.stages.video import (MjpegVideoDecoder, avi_parse,
                                           avi_encode_mjpeg)

RNG = np.random.default_rng(20260818)


def gray_frames(vals, h=16, w=32):
    return [np.full((h, w), v, dtype=np.uint8) for v in vals]


# ---------------------------------------------------------------------------
# Mux / demux
# ---------------------------------------------------------------------------

def test_parse_roundtrip_header_fields():
    blob = avi_encode_mjpeg(gray_frames([10, 20, 30]), rate=25)
    info = avi_parse(blob)
    assert (info.width, info.height) == (32, 16)
    assert (info.rate, info.scale, info.usec_per_frame) == (25, 1, 40000)
    assert info.n_frames == 3 and len(info.frames) == 3


def test_fractional_fps_scale():
    blob = avi_encode_mjpeg(gray_frames([5, 6]), rate=25, scale=2)  # 12.5fps
    info = avi_parse(blob)
    assert info.usec_per_frame == 80000
    assert (info.rate, info.scale) == (25, 2)


def test_non_integral_usec_per_frame_refused():
    with pytest.raises(ValueError, match="usec"):
        avi_encode_mjpeg(gray_frames([1]), rate=30)    # 1e6/30 not integral


def test_frames_decode_exactly():
    """Flat-gray q100 frames come back bit-exact through the full
    mux -> parse -> per-frame JPEG decode path."""
    from socialmapper_ray.stages.jpeg import jpeg_decode

    vals = [0, 77, 128, 255]
    blob = avi_encode_mjpeg(gray_frames(vals, h=24, w=40), rate=10)
    info = avi_parse(blob)
    for (off, size), v in zip(info.frames, vals):
        img = jpeg_decode(blob[off:off + size])
        assert img.shape == (24, 40, 1)
        assert (img == v).all()


def test_color_frames_roundtrip_bounds():
    frames = [RNG.integers(0, 256, (16, 16, 3)).astype(np.uint8)
              for _ in range(2)]
    blob = avi_encode_mjpeg(frames, rate=20, quality=100)
    from socialmapper_ray.stages.jpeg import jpeg_decode

    info = avi_parse(blob)
    for (off, size), src in zip(info.frames, frames):
        img = jpeg_decode(blob[off:off + size])
        # q100 4:4:4: error bounded by YCbCr<->RGB rounding only
        assert np.abs(img.astype(int) - src.astype(int)).max() <= 2


def test_extra_chunks_skipped():
    """JUNK padding and an extra INFO list are spec-legal; the walk
    must skip them (word-aligned) without losing frames."""
    blob = avi_encode_mjpeg(gray_frames([9, 9]), rate=10)
    junk = b"JUNK" + struct.pack("<I", 5) + b"abcde\x00"
    info_list = b"LIST" + struct.pack("<I", 10) + b"INFO" \
        + b"ISFT" + struct.pack("<I", 2) + b"x\x00"
    body = blob[12:] + junk + info_list
    blob2 = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body
    info = avi_parse(blob2)
    assert info.n_frames == 2


# ---------------------------------------------------------------------------
# Refusals
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mutate,msg", [
    (lambda b: b[:16], "RIFF/AVI|truncated"),
    (lambda b: b[:8] + b"WAVE" + b[12:], "RIFF/AVI"),
    (lambda b: b.replace(b"MJPG", b"H264"), "MJPG|vids"),
    (lambda b: b.replace(b"avih", b"avix"), "missing"),
])
def test_malformed_raises(mutate, msg):
    blob = avi_encode_mjpeg(gray_frames([1, 2]), rate=10)
    with pytest.raises(ValueError, match=msg):
        avi_parse(mutate(blob))


def test_frame_count_mismatch_raises():
    blob = bytearray(avi_encode_mjpeg(gray_frames([1, 2, 3]), rate=10))
    i = blob.index(b"avih") + 8 + 16                   # dwTotalFrames
    blob[i:i + 4] = struct.pack("<I", 7)
    with pytest.raises(ValueError, match="frames"):
        avi_parse(bytes(blob))


def test_mixed_frame_sizes_refused_on_encode():
    with pytest.raises(ValueError, match="mixed"):
        avi_encode_mjpeg([np.zeros((8, 8), np.uint8),
                          np.zeros((8, 16), np.uint8)], rate=10)


# ---------------------------------------------------------------------------
# Stage contract
# ---------------------------------------------------------------------------

def test_decoder_stage_sampling_and_features():
    vals = [10, 20, 30, 40, 50]                        # stride 2 -> 0,2,4
    df = pd.DataFrame({
        "media_id": [1],
        "payload": [avi_encode_mjpeg(gray_frames(vals), rate=25)]})
    out = MjpegVideoDecoder(stride=2)(df)
    row = out.iloc[0]
    assert "payload" not in out.columns
    assert (row.n_frames, row.n_sampled) == (5, 3)
    assert (row.fps_milli, row.duration_us) == (25000, 200000)
    assert (row.width, row.height) == (32, 16)
    assert (row.dec_w, row.dec_h) == (32, 16)
    assert row.sum_y_q == 10 + 30 + 50                 # exact flat decode
    empty = MjpegVideoDecoder()(df.iloc[:0])
    assert list(empty.columns) == list(out.columns)


def test_decoder_stage_stride_one_decodes_all():
    vals = [3, 5, 7]
    df = pd.DataFrame({
        "media_id": [1],
        "payload": [avi_encode_mjpeg(gray_frames(vals), rate=10)]})
    row = MjpegVideoDecoder(stride=1)(df).iloc[0]
    assert row.n_sampled == 3 and row.sum_y_q == sum(vals)


def test_decoder_stage_corrupt_payload_raises():
    df = pd.DataFrame({"media_id": [1], "payload": [b"garbage bytes"]})
    with pytest.raises(ValueError):
        MjpegVideoDecoder()(df)


def test_decoder_header_dims_must_match_decoded():
    blob = bytearray(avi_encode_mjpeg(gray_frames([1, 2]), rate=10))
    i = blob.index(b"avih") + 8 + 32                   # dwWidth
    blob[i:i + 4] = struct.pack("<I", 99)
    df = pd.DataFrame({"media_id": [1], "payload": [bytes(blob)]})
    with pytest.raises(ValueError, match="header"):
        MjpegVideoDecoder()(df)
