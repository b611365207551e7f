"""Multimodal kernels: REAL resize / frame-sample math over the stub
decode (stages/multimodal.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from socialmapper_ray.stages import multimodal as mm


def naive_bilinear(img, out_h, out_w):
    """Independent per-pixel loop implementation (test oracle)."""
    h, w = img.shape[:2]
    im = img.astype(np.float64)
    out = np.empty((out_h, out_w) + img.shape[2:], dtype=np.float64)
    for oy in range(out_h):
        for ox in range(out_w):
            y = (oy + 0.5) * h / out_h - 0.5
            x = (ox + 0.5) * w / out_w - 0.5
            y0 = int(np.clip(np.floor(y), 0, h - 1))
            x0 = int(np.clip(np.floor(x), 0, w - 1))
            y1 = min(y0 + 1, h - 1)
            x1 = min(x0 + 1, w - 1)
            wy = min(max(y - y0, 0.0), 1.0)
            wx = min(max(x - x0, 0.0), 1.0)
            top = im[y0, x0] + (im[y0, x1] - im[y0, x0]) * wx
            bot = im[y1, x0] + (im[y1, x1] - im[y1, x0]) * wx
            out[oy, ox] = top + (bot - top) * wy
    return out


def test_bilinear_matches_naive_loop():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(7, 5, 3), dtype=np.uint8)
    for oh, ow in [(3, 3), (14, 10), (1, 1), (7, 5)]:
        got = mm.bilinear_resize(img, oh, ow)
        want = naive_bilinear(img, oh, ow)
        assert np.allclose(got, want, atol=1e-12), (oh, ow)


def test_bilinear_constant_invariance():
    img = np.full((8, 8, 3), 77, dtype=np.uint8)
    out = mm.bilinear_resize(img, 3, 5)
    assert np.allclose(out, 77.0)


def test_bilinear_identity_resize():
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, size=(6, 6), dtype=np.uint8)
    out = mm.bilinear_resize(img, 6, 6)
    assert np.allclose(out, img.astype(np.float64))


def test_fake_decode_deterministic():
    a = mm.fake_decode_image(b"hello", 16, 16)
    b = mm.fake_decode_image(b"hello", 16, 16)
    c = mm.fake_decode_image(b"world", 16, 16)
    assert a.shape == (16, 16, 3) and a.dtype == np.uint8
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_sample_frames_stride_and_cap():
    blob = bytes(range(256)) * 40            # 40 frames of 256 bytes
    picks = mm.sample_frames(blob, every_k=4, max_frames=8)
    assert [i for i, _ in picks] == [0, 4, 8, 12, 16, 20, 24, 28]
    assert all(len(f) == mm.FRAME_BYTES for _, f in picks)
    short = mm.sample_frames(b"xy", every_k=4)   # sub-frame payload
    assert [i for i, _ in short] == [0]


def test_media_stages_run_in_ray(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "media_id": np.arange(6, dtype=np.int64),
        "payload": [bytes([i]) * (mm.FRAME_BYTES * 10) for i in range(6)],
    })
    ds = rd.from_pandas(df)
    thumbs = mm.media_thumbs(ds).to_pandas()
    assert len(thumbs) == 6
    assert "payload" not in thumbs.columns
    assert len(thumbs["thumb"].iloc[0]) == 4 * 4 * 3
    frames = mm.media_frames(ds).to_pandas()
    # 10 frames, every 4th -> indices 0,4,8 per media row
    assert len(frames) == 6 * 3
    assert sorted(frames["frame_index"].unique()) == [0, 4, 8]
    assert len(frames["features"].iloc[0]) == mm.FEATURE_DIM


def test_png_image_decoder_real_decode(ray_session):
    """REAL decode path: PNG payloads built by the from-scratch encoder
    decode through the actor-pool stage to exact pixel stats."""
    import ray.data as rd

    from socialmapper_ray.stages import multimodal
    from socialmapper_ray.stages.raster import png_encode

    imgs = [multimodal.fake_decode_image(bytes([i]), 8, 8)
            for i in range(12)]
    df = pd.DataFrame({
        "media_id": np.arange(12, dtype=np.int64),
        "payload": [png_encode(im) for im in imgs]})
    out = multimodal.decode_media(
        rd.from_pandas(df), decoder_cls=multimodal.PngImageDecoder,
        batch_size=5).to_pandas().sort_values("media_id") \
        .reset_index(drop=True)
    assert out["height"].eq(8).all() and out["width"].eq(8).all()
    assert out["channels"].eq(3).all()
    want_means = np.vstack([im.reshape(-1, 3).mean(axis=0) for im in imgs])
    got = out[["mean_r", "mean_g", "mean_b"]].to_numpy()
    assert np.allclose(got, np.round(want_means, 6))


def test_png_image_decoder_raises_on_corrupt(ray_session):
    import ray.data as rd

    from socialmapper_ray.stages import multimodal

    df = pd.DataFrame({"media_id": [0], "payload": [b"not a png"]})
    with pytest.raises(Exception, match="not a PNG"):
        multimodal.decode_media(
            rd.from_pandas(df),
            decoder_cls=multimodal.PngImageDecoder).to_pandas()
