"""From-scratch baseline JPEG codec tests (stages/jpeg.py).

Golden strategy: flat blocks quantize EXACTLY (DC-only streams whose
quantized DC is an integer multiple), so expected pixels are analytic —
no reference decoder needed. The 4:2:0 and restart-interval streams are
hand-assembled with the module's own bit-writer so the decoder is
exercised on layouts the 4:4:4 encoder never emits.
"""

import struct

import numpy as np
import pytest

from socialmapper_ray.stages import jpeg
from socialmapper_ray.stages.jpeg import (_BitWriter, _HuffEncodeTable,
                                          _quality_tables, jpeg_decode,
                                          jpeg_encode)

RNG = np.random.default_rng(20260818)


def test_flat_gray_exact():
    """(v-128)*8 divisible by the DC quantizer -> bit-exact decode."""
    for v in (128, 200):
        img = np.full((16, 24), v, np.uint8)
        out = jpeg_decode(jpeg_encode(img, 90))
        assert out.shape == (16, 24, 1)
        assert (out == v).all()


def test_flat_color_exact_and_shape():
    img = np.zeros((8, 16, 3), np.uint8)
    img[...] = (50, 100, 150)
    out = jpeg_decode(jpeg_encode(img, 95))
    assert out.shape == (8, 16, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_gradient_roundtrip_bounds_nonmultiple_of_8():
    x = np.linspace(0, 255, 37)[None, :]
    y = np.linspace(0, 255, 29)[:, None]
    img = np.clip(np.stack([x + 0 * y, y + 0 * x, (x + y) / 2], -1),
                  0, 255).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(img, 95))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 3.0 and err.max() < 40


def test_noise_q100_nearly_lossless():
    img = RNG.integers(0, 256, (40, 56), np.uint8).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(img, 100))
    err = np.abs(out[..., 0].astype(int) - img.astype(int))
    assert err.max() <= 2


def _hand_stream(h, w, comps, dri, mcu_emit, quality=90):
    """Assemble a baseline JPEG with arbitrary sampling factors.
    comps: [(h_samp, v_samp, tq)], mcu_emit(writer, dc_tabs, ac_tab,
    preds, mcu_index) encodes one MCU."""
    lq, cq = _quality_tables(quality)
    out = bytearray(b"\xff\xd8")
    for tq, q in enumerate((lq, cq)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) \
            + bytes(int(v) for v in q)
    nc = len(comps)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for c, (hs, vs, tq) in enumerate(comps):
        out += bytes([c + 1, (hs << 4) | vs, tq])
    specs = ((0, 0, jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS),
             (0, 1, jpeg.DC_CHROMA_BITS, jpeg.DC_CHROMA_VALS),
             (1, 0, jpeg.AC_BITS, jpeg.AC_VALS),
             (1, 1, jpeg.AC_BITS, jpeg.AC_VALS))
    for cls, t, bits, vals in specs:
        payload = bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">HB", 3 + len(payload),
                                         (cls << 4) | t) + payload
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for c in range(nc):
        t = 0 if c == 0 else 1
        out += bytes([c + 1, (t << 4) | t])
    out += bytes([0, 63, 0])

    dc_tabs = (_HuffEncodeTable(jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS),
               _HuffEncodeTable(jpeg.DC_CHROMA_BITS, jpeg.DC_CHROMA_VALS))
    ac_tabs = (_HuffEncodeTable(jpeg.AC_BITS, jpeg.AC_VALS),) * 2
    hmax = max(c[0] for c in comps)
    vmax = max(c[1] for c in comps)
    n_mcus = (-(-w // (8 * hmax))) * (-(-h // (8 * vmax)))
    wtr = _BitWriter()
    preds = [0] * nc
    seg = bytearray()
    rst = 0
    for m in range(n_mcus):
        if dri and m and m % dri == 0:
            wtr.flush()
            seg += wtr.out
            seg += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            wtr = _BitWriter()
            preds = [0] * nc
        mcu_emit(wtr, dc_tabs, ac_tabs, preds, m)
    wtr.flush()
    seg += wtr.out
    return bytes(out) + bytes(seg) + b"\xff\xd9"


def _emit_dc_block(wtr, dc_t, ac_t, dc_quant, pred):
    """One DC-only block: category+bits for (dc_quant - pred), EOB."""
    diff = dc_quant - pred
    s = int(abs(diff)).bit_length()
    wtr.write(dc_t.code[s], dc_t.length[s])
    if s:
        wtr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    wtr.write(ac_t.code[0x00], ac_t.length[0x00])
    return dc_quant


def test_420_subsampled_flat_exact():
    """Hand-built 4:2:0 stream of a flat YCbCr image: chroma upsampling
    of a constant plane is method-independent, so the decode is
    analytic. y=158, cb=149, cr=107 chosen so (v-128)*8 is divisible by
    the q90 DC quantizers (exact quantization)."""
    lq, cq = _quality_tables(90)
    yv, cbv, crv = 158, 149, 107
    dcs = [round((yv - 128) * 8 / int(lq[0])),
           round((cbv - 128) * 8 / int(cq[0])),
           round((crv - 128) * 8 / int(cq[0]))]
    assert dcs[0] * int(lq[0]) == (yv - 128) * 8        # exactness
    assert dcs[1] * int(cq[0]) == (cbv - 128) * 8

    def emit(wtr, dc_tabs, ac_tabs, preds, m):
        for _ in range(4):                               # 4 Y blocks
            preds[0] = _emit_dc_block(wtr, dc_tabs[0], ac_tabs[0],
                                      dcs[0], preds[0])
        preds[1] = _emit_dc_block(wtr, dc_tabs[1], ac_tabs[1],
                                  dcs[1], preds[1])
        preds[2] = _emit_dc_block(wtr, dc_tabs[1], ac_tabs[1],
                                  dcs[2], preds[2])

    blob = _hand_stream(24, 40, [(2, 2, 0), (1, 1, 1), (1, 1, 1)],
                        dri=0, mcu_emit=emit)
    out = jpeg_decode(blob)
    assert out.shape == (24, 40, 3)
    exp = np.clip(np.round([
        yv + 1.402 * (crv - 128),
        yv - 0.344136 * (cbv - 128) - 0.714136 * (crv - 128),
        yv + 1.772 * (cbv - 128)]), 0, 255).astype(np.uint8)
    assert (out.reshape(-1, 3) == exp).all()


def test_restart_intervals_flat_exact():
    """DRI=2 grayscale stream with RST markers and per-segment DC
    prediction reset — flat value decodes exactly across segments."""
    lq, _ = _quality_tables(90)
    v = 200
    dcq = round((v - 128) * 8 / int(lq[0]))
    assert dcq * int(lq[0]) == (v - 128) * 8

    def emit(wtr, dc_tabs, ac_tabs, preds, m):
        preds[0] = _emit_dc_block(wtr, dc_tabs[0], ac_tabs[0], dcq,
                                  preds[0])

    blob = _hand_stream(8, 48, [(1, 1, 0)], dri=2, mcu_emit=emit)
    assert b"\xff\xd0" in blob or b"\xff\xd1" in blob
    out = jpeg_decode(blob)
    assert out.shape == (8, 48, 1)
    assert (out == v).all()


def test_corrupt_and_unsupported_raise():
    good = jpeg_encode(np.full((8, 8), 99, np.uint8), 90)
    for bad in (b"", b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff\xdb",
                good[:-12], good[:20]):
        with pytest.raises(ValueError):
            jpeg_decode(bad)
    # progressive (SOF2) now DECODES (tests/test_jpeg_progressive.py),
    # but a baseline-shaped full-band scan relabeled SOF2 is invalid
    # progressive (Ss=0 requires Se=0) and must still refuse loudly
    prog = bytearray(good)
    i = prog.find(b"\xff\xc0")
    prog[i + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        jpeg_decode(bytes(prog))
    # arithmetic / lossless SOF markers stay refused
    arith = bytearray(good)
    arith[i + 1] = 0xC9
    with pytest.raises(ValueError, match="refused"):
        jpeg_decode(bytes(arith))


def test_decoder_reads_tables_from_file_not_module():
    """Decoding must use the DHT/DQT segments of the stream: doubling
    the DC quantizer in the FILE doubles the decoded deviation from
    128, proving no module-table shortcut."""
    img = np.full((8, 8), 158, np.uint8)
    blob = bytearray(jpeg_encode(img, 90))
    q = blob.find(b"\xff\xdb")
    lq, _ = _quality_tables(90)
    assert blob[q + 5] == int(lq[0])
    out1 = jpeg_decode(bytes(blob))
    blob[q + 5] = int(lq[0]) * 2      # double DC quantizer in-file
    out2 = jpeg_decode(bytes(blob))
    assert (out1 == 158).all()
    d1 = int(out1[0, 0, 0]) - 128
    d2 = int(out2[0, 0, 0]) - 128
    assert d2 == 2 * d1


def test_jpeg_decoder_stage_matches_direct_decode(ray_session):
    """Actor-pool JpegImageDecoder over a Dataset == direct codec calls
    (the media stage contract: payload dropped, stats out)."""
    import pandas as pd
    import ray.data as rd

    from socialmapper_ray.stages import multimodal

    imgs = [RNG.integers(0, 256, (12, 16, 3), np.uint8).astype(np.uint8)
            for _ in range(6)]
    blobs = [jpeg_encode(im, 90) for im in imgs]
    df = pd.DataFrame({"media_id": np.arange(6, dtype=np.int64),
                       "payload": blobs})
    out = multimodal.decode_media(
        rd.from_pandas(df), decoder_cls=multimodal.JpegImageDecoder) \
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    assert "payload" not in out.columns
    assert (out["height"] == 12).all() and (out["width"] == 16).all()
    for k, blob in enumerate(blobs):
        px = jpeg_decode(blob).reshape(-1, 3).mean(axis=0)
        assert abs(out["mean_r"][k] - round(px[0], 6)) < 1e-9
        assert abs(out["mean_b"][k] - round(px[2], 6)) < 1e-9
