"""Multimodal columns: opaque binary payloads + actor-pool decode stages.

Image/audio/video arrive as ``binary`` columns with typed metadata.
No decode libraries exist in this container (no PIL/ffmpeg/librosa),
so every decoder here is from scratch: REAL paths cover PNG
(:class:`PngImageDecoder`, RFC 2083), baseline JPEG
(:class:`JpegImageDecoder`, ITU-T T.81), WAV/PCM audio
(``stages/audio.WavAudioDecoder``, RIFF/WAVE) and MJPEG-AVI video
(``stages/video.MjpegVideoDecoder``, RIFF 'AVI ' + per-frame JPEG).
Formats that genuinely need external codecs (MP3, AAC, H.264, VP9)
raise loudly via ``RealDecoder`` with the integration point
documented. ``FakeDecoder`` remains as the plumbing exerciser: schema
contract, small batch sizes for wide binary rows, actor-pool
signature, fixed-width ``list<float>`` output layout — all tested
(tests/test_multimodal.py), so swapping in a codec-library decoder is
a one-class change.

Scale notes: binary payloads dominate block size; callers should read
media tables with a reduced ``target_max_block_size`` / small
``batch_size`` (SURVEY.md §7.4 "wide binary rows") and drop the payload
column in the decode stage output, exactly as the extract stage drops
``html``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

FEATURE_DIM = 8


class FakeDecoder:
    """Deterministic stand-in decode: payload bytes -> FEATURE_DIM floats.

    Stateful-stage shape: per-actor init (where a real model would
    load), per-batch vectorized __call__.
    """

    def __init__(self, feature_dim: int = FEATURE_DIM,
                 payload_col: str = "payload"):
        from ..sources.synth import splitmix64

        self.dim = feature_dim
        self.payload_col = payload_col
        self._mix = splitmix64

    def _features(self, blob: bytes) -> np.ndarray:
        import zlib

        seed = np.uint64(zlib.crc32(blob))
        h = self._mix(seed + np.arange(self.dim, dtype=np.uint64))
        return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        feats = np.vstack([self._features(b) for b in df[self.payload_col]])
        out = df.drop(columns=[self.payload_col])
        out["n_bytes"] = df[self.payload_col].str.len().astype(np.int64)
        out["features"] = list(feats)
        return out


class RealDecoder:
    """Integration point for codec-library decoders (ffmpeg / librosa —
    compressed audio/video formats like MP3/AAC/H.264 need external
    codecs this container lacks).

    Importing those libs here must raise loudly rather than silently
    degrade. Formats expressible without external codecs decode for
    REAL: PNG (:class:`PngImageDecoder`), baseline JPEG
    (:class:`JpegImageDecoder`), WAV/PCM audio
    (``stages/audio.WavAudioDecoder``) and MJPEG-AVI video
    (``stages/video.MjpegVideoDecoder``).
    """

    def __init__(self, *a, **kw):
        raise NotImplementedError(
            "no compressed-codec libraries (MP3/AAC/H.264/VP9) in this "
            "container; subclass with e.g. ffmpeg in __init__-loaded "
            "state and swap the class name in decode_media(). The stage "
            "contract (batch in, payload dropped, slim typed columns "
            "out) is defined by FakeDecoder; real from-scratch paths "
            "exist for PNG, baseline JPEG, WAV/PCM and MJPEG-AVI.")


class PngImageDecoder:
    """REAL image decode stage: baseline-PNG payload bytes -> pixels
    (stages/raster.py png_decode, a from-scratch RFC 2083 decoder —
    zlib + numpy only) -> per-image stats. Same actor-pool shape as
    FakeDecoder; payload dropped on output (wide-binary rule).

    Output: height, width, channels, mean_r/g/b (ROUND 6). A payload
    that is not a decodable baseline PNG raises — corrupt media must
    surface, not pass as zeros.
    """

    def __init__(self, payload_col: str = "payload"):
        from .raster import png_decode

        self.payload_col = payload_col
        self._decode = png_decode

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop(columns=[self.payload_col])
        if df.empty:
            for c, dt in (("height", np.int64), ("width", np.int64),
                          ("channels", np.int64), ("mean_r", np.float64),
                          ("mean_g", np.float64), ("mean_b", np.float64)):
                out[c] = pd.Series(dtype=dt)
            return out
        hs, ws, cs, means = [], [], [], []
        for blob in df[self.payload_col]:
            img = self._decode(bytes(blob))
            hs.append(img.shape[0])
            ws.append(img.shape[1])
            cs.append(img.shape[2])
            means.append(img[..., :3].reshape(-1, 3).mean(axis=0))
        m = np.vstack(means)
        out["height"] = np.asarray(hs, dtype=np.int64)
        out["width"] = np.asarray(ws, dtype=np.int64)
        out["channels"] = np.asarray(cs, dtype=np.int64)
        out["mean_r"] = np.round(m[:, 0], 6)
        out["mean_g"] = np.round(m[:, 1], 6)
        out["mean_b"] = np.round(m[:, 2], 6)
        return out


class JpegImageDecoder:
    """REAL image decode stage: JPEG payload bytes -> pixels
    (stages/jpeg.py jpeg_decode, a from-scratch ITU-T T.81 decoder for
    baseline AND progressive streams — struct + numpy only) ->
    per-image stats. Same actor-pool shape and output contract as
    :class:`PngImageDecoder`; payload dropped on output (wide-binary
    rule). Arithmetic/lossless/corrupt payloads raise — they must
    surface, not pass as zeros."""

    def __init__(self, payload_col: str = "payload"):
        from .jpeg import jpeg_decode

        self.payload_col = payload_col
        self._decode = jpeg_decode

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop(columns=[self.payload_col])
        if df.empty:
            for c, dt in (("height", np.int64), ("width", np.int64),
                          ("channels", np.int64), ("mean_r", np.float64),
                          ("mean_g", np.float64), ("mean_b", np.float64)):
                out[c] = pd.Series(dtype=dt)
            return out
        hs, ws, cs, means = [], [], [], []
        for blob in df[self.payload_col]:
            img = self._decode(bytes(blob))
            hs.append(img.shape[0])
            ws.append(img.shape[1])
            cs.append(img.shape[2])
            rgb = img if img.shape[2] == 3 else np.repeat(img, 3, axis=2)
            means.append(rgb.reshape(-1, 3).mean(axis=0))
        m = np.vstack(means)
        out["height"] = np.asarray(hs, dtype=np.int64)
        out["width"] = np.asarray(ws, dtype=np.int64)
        out["channels"] = np.asarray(cs, dtype=np.int64)
        out["mean_r"] = np.round(m[:, 0], 6)
        out["mean_g"] = np.round(m[:, 1], 6)
        out["mean_b"] = np.round(m[:, 2], 6)
        return out


def decode_media(ds, decoder_cls=FakeDecoder, concurrency=None,
                 batch_size: int = 256, payload_col: str = "payload",
                 num_cpus: float = 1.0):
    """Actor-pool decode stage over a binary payload column.

    Decode is CPU-bound (per-image entropy coding / IDCT), so the
    default pool auto-sizes to half the cluster's non-reserved CPUs via
    :func:`util.clamp_concurrency` — the other half stays free for the
    upstream read/encode tasks feeding the pool. Measured at sf0.1 /
    32 cpus on the JPEG bench (interleaved in-process min-of-3): the
    old fixed concurrency=2 read 13.1 s; the auto-sized FIXED pool
    6.1 s. An autoscaling ``(1, max)`` pool was tried and rejected —
    13.2 s best, 2x slower in every interleaved round: Ray's
    backlog-driven scale-up never reaches full width within a
    seconds-long job, so short decode jobs run underponied. Default
    num_cpus=1.0: whole-core actors beat 0.5-cpu double-booking for
    this kernel (6.1 s vs 7.1 s — SMT sharing, see BASELINE.md r1
    calibration). A fixed ``concurrency`` hint still overrides (and is
    itself clamped so an oversized hint cannot starve the feed: the
    measured 7x stall mode in util.py).

    Small batch_size on purpose: batches of wide binary rows must fit
    the actor heap (per actor: batch_size x payload bytes; aggregate:
    x pool size — shrink batch_size for megapixel payloads).
    """
    from ..util import clamp_concurrency

    pool = clamp_concurrency(concurrency if concurrency is not None
                             else 1 << 16, num_cpus_per_actor=num_cpus)
    return ds.map_batches(
        decoder_cls,
        fn_constructor_kwargs=dict(payload_col=payload_col),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=pool,
        num_cpus=num_cpus,
    )


# ---------------------------------------------------------------------------
# Image kernels (REAL vectorized numpy — only the byte->pixels decode is
# stubbed, since no codec libraries exist in this container)
# ---------------------------------------------------------------------------

def fake_decode_image(blob: bytes, h: int = 32, w: int = 32) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 'decoded image' derived from the
    payload bytes — the stub half of the pipeline. Everything after
    this call (resize, pooling, sampling) is real image math."""
    import zlib

    from ..sources.synth import splitmix64

    seed = np.uint64(zlib.crc32(blob))
    idx = np.arange(h * w * 3, dtype=np.uint64) + seed * np.uint64(1 << 20)
    return (splitmix64(idx) >> np.uint64(56)).astype(np.uint8) \
        .reshape(h, w, 3)


def bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Vectorized bilinear resample (align_corners=False / half-pixel
    centers, the OpenCV/PIL convention). Works for (H, W) and
    (H, W, C); float64 output in [0, 255]."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int64)
    x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)
    wx = np.clip(xs - x0, 0.0, 1.0)
    im = img.astype(np.float64)
    # gather the four corners with outer-indexed fancy indexing
    a = im[np.ix_(y0, x0)]
    b = im[np.ix_(y0, x1)]
    c = im[np.ix_(y1, x0)]
    d = im[np.ix_(y1, x1)]
    wyv = wy[:, None, None] if im.ndim == 3 else wy[:, None]
    wxv = wx[None, :, None] if im.ndim == 3 else wx[None, :]
    top = a + (b - a) * wxv
    bot = c + (d - c) * wxv
    return top + (bot - top) * wyv


class ImageThumbStage:
    """Actor-pool stage: payload -> decode (stub) -> REAL bilinear
    thumbnail -> slim output (thumb flattened as list<float> plus
    per-channel means). Payload dropped on output (wide-binary rule).
    """

    def __init__(self, payload_col: str = "payload", src_hw: int = 32,
                 thumb_hw: int = 4):
        self.payload_col = payload_col
        self.src_hw = src_hw
        self.thumb_hw = thumb_hw

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop(columns=[self.payload_col])
        if df.empty:
            out["thumb"] = pd.Series(dtype=object)
            for c in ("mean_r", "mean_g", "mean_b"):
                out[c] = pd.Series(dtype=np.float64)
            return out
        thumbs, means = [], []
        for blob in df[self.payload_col]:
            img = fake_decode_image(blob, self.src_hw, self.src_hw)
            th = bilinear_resize(img, self.thumb_hw, self.thumb_hw)
            thumbs.append(np.round(th, 6).ravel())
            means.append(th.mean(axis=(0, 1)))
        m = np.vstack(means)
        out["thumb"] = thumbs
        out["mean_r"] = np.round(m[:, 0], 6)
        out["mean_g"] = np.round(m[:, 1], 6)
        out["mean_b"] = np.round(m[:, 2], 6)
        return out


FRAME_BYTES = 256


def sample_frames(blob: bytes, every_k: int = 4,
                  max_frames: int = 8) -> list[tuple[int, bytes]]:
    """Deterministic frame sampling plumbing: the payload is treated as
    a concatenation of FRAME_BYTES-sized frames (the stub container
    format); every k-th frame is selected up to ``max_frames``. Returns
    [(frame_index, frame_bytes)] — the real part is the explode shape
    and the stride/cap policy, exactly how ffmpeg-backed sampling would
    slot in."""
    n_frames = max(1, len(blob) // FRAME_BYTES)
    picks = list(range(0, n_frames, every_k))[:max_frames]
    return [(i, blob[i * FRAME_BYTES:(i + 1) * FRAME_BYTES])
            for i in picks]


class FrameSampleStage:
    """Actor-pool stage: one media row -> one row per sampled frame
    (media_id, frame_index, frame features via the stub decode)."""

    def __init__(self, payload_col: str = "payload",
                 id_col: str = "media_id", every_k: int = 4,
                 max_frames: int = 8):
        self.payload_col = payload_col
        self.id_col = id_col
        self.every_k = every_k
        self.max_frames = max_frames
        self.decoder = FakeDecoder()

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids, fidx, feats = [], [], []
        for mid, blob in zip(df[self.id_col], df[self.payload_col]):
            for i, frame in sample_frames(blob, self.every_k,
                                          self.max_frames):
                ids.append(mid)
                fidx.append(i)
                feats.append(self.decoder._features(frame))
        if not ids:
            # keep the id column's dtype so empty blocks unify with
            # non-empty ones (np.asarray([]) would yield float64)
            return pd.DataFrame({
                self.id_col: df[self.id_col].iloc[:0],
                "frame_index": pd.Series(dtype=np.int64),
                "features": pd.Series(dtype=object),
            })
        return pd.DataFrame({
            self.id_col: pd.Series(ids).to_numpy(),
            "frame_index": np.asarray(fidx, dtype=np.int64),
            "features": feats,
        })


def media_thumbs(ds, concurrency=2, batch_size: int = 256, **kw):
    return ds.map_batches(ImageThumbStage, fn_constructor_kwargs=kw,
                          batch_format="pandas", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=0.5)


def media_frames(ds, concurrency=2, batch_size: int = 256, **kw):
    return ds.map_batches(FrameSampleStage, fn_constructor_kwargs=kw,
                          batch_format="pandas", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=0.5)


# Re-export: the GIF decode stage lives with its codec (stages/gif.py)
# but is addressed through this module like the other media decoders.
from .gif import GifImageDecoder  # noqa: E402,F401
