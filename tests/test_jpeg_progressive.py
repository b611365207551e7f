"""Progressive JPEG decode tests (stages/jpeg.py, T.81 §G).

Two independent oracles, neither sharing code with the decoder:

1. A fully HAND-ASSEMBLED single-block stream whose four scans (DC
   first, DC refinement, AC first, AC refinement with a newly-nonzero
   coefficient and buffered correction bits) were derived on paper from
   the spec; expected pixels come from the module's IDCT applied to the
   hand-chosen coefficients.
2. The module's spectral-selection progressive ENCODER (DC + banded AC
   scans with EOB runs, no successive approximation), a separate code
   path from the decoder; for any image its progressive
   stream must decode to EXACTLY the same pixels as the baseline
   encoder's stream (identical quantized coefficients -> identical
   IDCT).
"""

import struct

import numpy as np
import pytest

from socialmapper_ray.stages import jpeg
from socialmapper_ray.stages.jpeg import (_A, _BitWriter, _HuffEncodeTable,
                                          AC_BITS, AC_VALS, DC_LUMA_BITS,
                                          DC_LUMA_VALS, ZIGZAG, jpeg_decode,
                                          jpeg_encode)
from socialmapper_ray.stages.jpeg import jpeg_encode_progressive \
    as encode_progressive


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dqt_ones() -> bytes:
    return _seg(0xDB, bytes([0]) + bytes([1] * 64))


def _dht(tc: int, th: int, bits, vals) -> bytes:
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))


def _sof2(h: int, w: int, comps) -> bytes:
    body = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hv, tq in comps:
        body += bytes([cid, hv, tq])
    return _seg(0xC2, body)


def _sos(comps_td_ta, ss: int, se: int, ah: int, al: int) -> bytes:
    body = bytes([len(comps_td_ta)])
    for cid, td, ta in comps_td_ta:
        body += bytes([cid, (td << 4) | ta])
    body += bytes([ss, se, (ah << 4) | al])
    return _seg(0xDA, body)


def _cat(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def _put(wtr, table, sym):
    wtr.write(table.code[sym], table.length[sym])


def _put_mag(wtr, v, s):
    wtr.write(v if v >= 0 else v + (1 << s) - 1, s)


DC_T = _HuffEncodeTable(DC_LUMA_BITS, DC_LUMA_VALS)
AC_T = _HuffEncodeTable(AC_BITS, AC_VALS)


def test_progressive_single_block_hand_assembled():
    """8x8 grayscale, all-ones quant, coefficients (zigzag positions):
    DC=5, k1=+3, k4=-2, k6=+1. Four scans exercise every kernel:
    DC first (Al=1), DC refine, AC first (Al=1: k6 invisible), AC
    refine (k1 gains its low bit, k4 does not, k6 appears as a new
    coefficient after a 3-zero-history run, correction bits buffered
    past the EOB)."""
    out = bytearray(b"\xff\xd8")
    out += _dqt_ones()
    out += _sof2(8, 8, [(1, 0x11, 0)])
    out += _dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht(1, 0, AC_BITS, AC_VALS)

    # scan 1: DC first, Al=1 -> codes 5>>1 = 2 (category 2, bits '10')
    out += _sos([(1, 0, 0)], 0, 0, 0, 1)
    w = _BitWriter()
    s = _cat(2)
    _put(w, DC_T, s)
    _put_mag(w, 2, s)
    w.flush()
    out += w.out

    # scan 2: DC refinement, Al=0 -> raw bit (5 & 1) = 1
    out += _sos([(1, 0, 0)], 0, 0, 1, 0)
    w = _BitWriter()
    w.write(1, 1)
    w.flush()
    out += w.out

    # scan 3: AC first, Ss=1..63, Al=1. Magnitudes >>1: k1: 3>>1=1,
    # k4: 2>>1=1 (negative), k6: 1>>1=0 (absent). Stream: (r0,s1)+,
    # (r2,s1)-, EOB.
    out += _sos([(1, 0, 0)], 1, 63, 0, 1)
    w = _BitWriter()
    _put(w, AC_T, 0x01)
    _put_mag(w, 1, 1)
    _put(w, AC_T, 0x21)
    _put_mag(w, -1, 1)
    _put(w, AC_T, 0x00)
    w.flush()
    out += w.out

    # scan 4: AC refinement, Ss=1..63, Ah=1, Al=0. New nonzero k6
    # (+1): symbol (r=3 zero-history, s=1) + sign bit 1, then the
    # BUFFERED correction bits for k1 (|3|&1=1) and k4 (|2|&1=0);
    # then EOB with no pending bits.
    out += _sos([(1, 0, 0)], 1, 63, 1, 0)
    w = _BitWriter()
    _put(w, AC_T, 0x31)
    w.write(1, 1)          # sign of the new +1
    w.write(1, 1)          # k1 correction: bit set -> 2 -> 3
    w.write(0, 1)          # k4 correction: bit clear -> stays -2
    _put(w, AC_T, 0x00)    # EOB
    w.flush()
    out += w.out
    out += b"\xff\xd9"

    img = jpeg_decode(bytes(out))
    assert img.shape == (8, 8, 1)

    zz = np.zeros(64)
    zz[0], zz[1], zz[4], zz[6] = 5, 3, -2, 1
    rast = np.zeros(64)
    rast[ZIGZAG] = zz
    expected = np.clip(np.round(
        _A.T @ rast.reshape(8, 8) @ _A + 128.0), 0, 255).astype(np.uint8)
    assert (img[:, :, 0] == expected).all()


@pytest.mark.parametrize("shape,quality", [
    ((8, 8), 90), ((24, 24, 3), 90), ((17, 13), 75),
    ((16, 40, 3), 100), ((8, 8), 50)])
def test_progressive_equals_baseline(shape, quality):
    """Same quantized coefficients -> the progressive stream must
    decode to EXACTLY the baseline stream's pixels."""
    rng = np.random.default_rng(hash(shape) % (1 << 32))
    img = rng.integers(0, 256, shape).astype(np.uint8)
    base = jpeg_decode(jpeg_encode(img, quality))
    prog = jpeg_decode(encode_progressive(img, quality))
    assert prog.shape == base.shape
    assert (prog == base).all()


def test_progressive_flat_exact_and_eob_runs():
    """Flat image at q100: every AC band is empty -> the AC scans are
    pure EOB runs spanning all blocks (eobrun > 1 decode path); pixels
    must come back bit-exact."""
    img = np.full((40, 64), 201, np.uint8)        # 40 blocks
    out = jpeg_decode(encode_progressive(img, 100))
    assert (out == 201).all()


def test_progressive_gradient_multiband():
    """Smooth gradient: energy concentrated in low band -> band 2 is
    mostly EOB runs while band 1 carries coefficients; still exact vs
    baseline."""
    y, x = np.mgrid[0:32, 0:48]
    img = ((x * 3 + y * 2) % 256).astype(np.uint8)
    base = jpeg_decode(jpeg_encode(img, 85))
    prog = jpeg_decode(encode_progressive(img, 85,
                                          bands=((1, 5), (6, 62),
                                                 (63, 63))))
    assert (prog == base).all()


def test_progressive_invalid_headers_raise():
    img = np.full((8, 8), 10, np.uint8)
    blob = bytearray(encode_progressive(img, 90))
    # full-band scan labeled progressive (the old SOF0->SOF2 flip shape)
    base = bytearray(jpeg_encode(img, 90))
    i = base.find(b"\xff\xc0")
    base[i + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive|Se=0"):
        jpeg_decode(bytes(base))
    del blob


def test_arithmetic_and_lossless_still_refused():
    img = np.full((8, 8), 10, np.uint8)
    blob = bytearray(jpeg_encode(img, 90))
    i = blob.find(b"\xff\xc0")
    for sof in (0xC3, 0xC9, 0xCA, 0xCB):
        b2 = bytearray(blob)
        b2[i + 1] = sof
        with pytest.raises(ValueError, match="refused"):
            jpeg_decode(bytes(b2))


def test_progressive_truncated_raises():
    img = np.full((8, 8), 10, np.uint8)
    blob = encode_progressive(img, 90)
    with pytest.raises(ValueError):
        jpeg_decode(blob[:-4])


def test_progressive_420_subsampled_hand_assembled():
    """16x16 flat-color 4:2:0 progressive: interleaved DC scan walks
    4 Y + 1 Cb + 1 Cr blocks per MCU while the per-component AC scans
    walk each component's TRUE block grid (2x2 for Y, 1x1 for chroma) —
    the padded-vs-true-grid indexing this pins is where subsampling
    bugs hide. Flat color + all-ones quant -> exact pixels."""
    # flat YCbCr (200, 120, 140) -> DC per block: (v-128)*8
    yv, cb, cr = 200, 120, 140
    out = bytearray(b"\xff\xd8")
    out += _dqt_ones()
    out += _sof2(16, 16, [(1, 0x22, 0), (2, 0x11, 0), (3, 0x11, 0)])
    out += _dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht(1, 0, AC_BITS, AC_VALS)

    # scan 1: interleaved DC first, Al=0. One MCU: Y x4, Cb, Cr.
    out += _sos([(1, 0, 0), (2, 0, 0), (3, 0, 0)], 0, 0, 0, 0)
    w = _BitWriter()
    for diffs in ([(yv - 128) * 8, 0, 0, 0], [(cb - 128) * 8],
                  [(cr - 128) * 8]):
        for d in diffs:
            s = _cat(d)
            _put(w, DC_T, s)
            if s:
                _put_mag(w, d, s)
    w.flush()
    out += w.out

    # AC scans: per component over its TRUE grid (Y: 4 blocks, chroma:
    # 1 each); flat -> one EOB per block
    for cid, nblocks in ((1, 4), (2, 1), (3, 1)):
        out += _sos([(cid, 0, 0)], 1, 63, 0, 0)
        w = _BitWriter()
        for _ in range(nblocks):
            _put(w, AC_T, 0x00)
        w.flush()
        out += w.out
    out += b"\xff\xd9"

    img = jpeg_decode(bytes(out))
    assert img.shape == (16, 16, 3)
    # flat YCbCr -> flat RGB via the JFIF matrix (same rounding as the
    # baseline decoder's flat-color tests)
    r = round(yv + 1.402 * (cr - 128))
    g = round(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
    b = round(yv + 1.772 * (cb - 128))
    assert (img[..., 0] == r).all()
    assert (img[..., 1] == g).all()
    assert (img[..., 2] == b).all()


def test_progressive_420_odd_dims_chroma_grid():
    """20x12 4:2:0: chroma true grid is ceil(10/8) x ceil(6/8) = 2x1
    blocks while the padded grid is 2x1 MCU -> Y 4x2... the AC scan
    block counts differ from the padded grid on BOTH axes. Flat color,
    exact decode."""
    yv, cb, cr = 99, 128, 128                     # gray chroma
    h, wd = 12, 20
    mcus_x, mcus_y = 2, 1                         # ceil(20/16), ceil(12/16)
    out = bytearray(b"\xff\xd8")
    out += _dqt_ones()
    out += _sof2(h, wd, [(1, 0x22, 0), (2, 0x11, 0), (3, 0x11, 0)])
    out += _dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht(1, 0, AC_BITS, AC_VALS)

    out += _sos([(1, 0, 0), (2, 0, 0), (3, 0, 0)], 0, 0, 0, 0)
    w = _BitWriter()
    pred = {1: 0, 2: 0, 3: 0}
    for _mcu in range(mcus_x * mcus_y):
        for cid, nb, v in ((1, 4, yv), (2, 1, cb), (3, 1, cr)):
            for _ in range(nb):
                d = (v - 128) * 8 - pred[cid]
                pred[cid] = (v - 128) * 8
                s = _cat(d)
                _put(w, DC_T, s)
                if s:
                    _put_mag(w, d, s)
    w.flush()
    out += w.out

    # true grids: Y ceil(20/8) x ceil(12/8) = 3x2 = 6 blocks (padded
    # grid is 4x2!); chroma ceil(10/8) x ceil(6/8) = 2x1 = 2 blocks
    for cid, nblocks in ((1, 6), (2, 2), (3, 2)):
        out += _sos([(cid, 0, 0)], 1, 63, 0, 0)
        w = _BitWriter()
        for _ in range(nblocks):
            _put(w, AC_T, 0x00)
        w.flush()
        out += w.out
    out += b"\xff\xd9"

    img = jpeg_decode(bytes(out))
    assert img.shape == (h, wd, 3)
    assert (img[..., 0] == yv).all()
    assert (img[..., 1] == yv).all() and (img[..., 2] == yv).all()
