"""From-scratch GIF codec tests (stages/gif.py).

GIF is lossless, so encode->decode roundtrips pin the variable-width
LZW coder bit-exactly on arbitrary content — no reference decoder
needed. Hand-built streams cover layouts the encoder never emits
(deferred clear tolerance via an encoder-produced 4096-entry stream,
interlace, local color tables implicitly via the container walk) and
nine refusal modes.
"""

import struct

import numpy as np
import pandas as pd
import pytest

from socialmapper_ray.stages.gif import (GifImageDecoder, gif_decode,
                                         gif_encode)

RNG = np.random.default_rng(20260819)


@pytest.mark.parametrize("n_colors", [2, 3, 5, 16, 100, 256])
def test_roundtrip_exact_any_palette(n_colors):
    pal = RNG.integers(0, 256, (n_colors, 3)).astype(np.uint8)
    idx = RNG.integers(0, n_colors, (23, 31)).astype(np.uint8)
    g = gif_decode(gif_encode(idx, pal))
    assert (g.width, g.height) == (31, 23)
    assert len(g.frames) == 1
    assert (g.frames[0].image == pal[idx]).all()


def test_interlaced_roundtrip_exact():
    pal = RNG.integers(0, 256, (8, 3)).astype(np.uint8)
    idx = RNG.integers(0, 8, (17, 9)).astype(np.uint8)
    g = gif_decode(gif_encode(idx, pal, interlace=True))
    assert (g.frames[0].image == pal[idx]).all()


def test_lzw_table_growth_and_4096_clear():
    """200x300 random 256-color content forces code growth to 12 bits
    and mid-stream CLEAR at table 4096 — roundtrip must stay exact."""
    pal = RNG.integers(0, 256, (256, 3)).astype(np.uint8)
    idx = RNG.integers(0, 256, (200, 300)).astype(np.uint8)
    g = gif_decode(gif_encode(idx, pal))
    assert (g.frames[0].image == pal[idx]).all()


def test_multiframe_transparency_compositing():
    pal = RNG.integers(0, 256, (8, 3)).astype(np.uint8)
    f0 = np.zeros((10, 10), np.uint8)
    f1 = np.full((10, 10), 2, np.uint8)
    f1[5:, :] = 1                         # transparent in frame 2
    g = gif_decode(gif_encode([f0, f1], pal, delays_cs=[10, 20],
                              transparent=1))
    assert len(g.frames) == 2
    assert g.frames[0].delay_cs == 10 and g.frames[1].delay_cs == 20
    assert (g.frames[1].image[5:] == pal[0]).all()   # shows through
    assert (g.frames[1].image[:5] == pal[2]).all()


def test_kwkwk_case():
    """aaaa... streams hit the code==len(table) LZW corner (KwKwK)."""
    pal = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    idx = np.zeros((4, 16), np.uint8)
    g = gif_decode(gif_encode(idx, pal))
    assert (g.frames[0].image == pal[0]).all()


@pytest.mark.parametrize("mutate", [
    lambda b: b"",
    lambda b: b"GIF86a" + b[6:],                       # bad version
    lambda b: b[:20],                                  # truncated
    lambda b: b[:-1],                                  # missing trailer
    lambda b: b[:13] + b[13:].replace(b"\x2c", b"\x7e", 1),  # bad block
])
def test_malformed_raises(mutate):
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    blob = gif_encode(np.zeros((4, 4), np.uint8), pal)
    with pytest.raises(ValueError):
        gif_decode(mutate(blob))


def test_frame_outside_screen_raises():
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    blob = bytearray(gif_encode(np.zeros((4, 4), np.uint8), pal))
    i = blob.index(b"\x2c")
    blob[i + 1:i + 3] = struct.pack("<H", 3)           # left=3, w=4 > 4
    with pytest.raises(ValueError, match="outside"):
        gif_decode(bytes(blob))


def test_decoder_stage_contract():
    pal = np.array([[10, 20, 30], [40, 50, 60]], np.uint8)
    idx = np.array([[0, 1], [1, 1]], np.uint8)
    df = pd.DataFrame({"media_id": [1],
                       "payload": [gif_encode(idx, pal)]})
    out = GifImageDecoder()(df)
    row = out.iloc[0]
    assert "payload" not in out.columns
    assert (row.height, row.width, row.n_frames) == (2, 2, 1)
    assert row.sum_r == 10 + 3 * 40
    assert row.sum_g == 20 + 3 * 50
    assert row.sum_b == 30 + 3 * 60
    empty = GifImageDecoder()(df.iloc[:0])
    assert list(empty.columns) == list(out.columns)


def test_decoder_stage_corrupt_raises():
    df = pd.DataFrame({"media_id": [1], "payload": [b"GIF89a junk"]})
    with pytest.raises(ValueError):
        GifImageDecoder()(df)
