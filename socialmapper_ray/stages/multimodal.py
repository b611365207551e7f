"""Multimodal columns: opaque binary payloads + actor-pool decode stages.

Image/audio/video arrive as ``binary`` columns with typed metadata.
No decode libraries exist in this container (no PIL/ffmpeg/librosa), so
the decode kernel is STUBBED: ``FakeDecoder`` produces a deterministic
feature vector from the payload bytes, and ``RealDecoder`` raises
``NotImplementedError`` with the integration point documented. The
Ray-side plumbing — schema contract, small batch sizes for wide binary
rows, actor-pool signature, fixed-width ``list<float>`` output layout —
is real and tested (tests/test_multimodal.py), so swapping in a real
decoder is a one-class change.

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
    """Integration point for an actual decoder (PIL / ffmpeg / librosa).

    Not available in this environment — importing those libs here must
    raise loudly rather than silently degrade.
    """

    def __init__(self, *a, **kw):
        raise NotImplementedError(
            "no media decode libraries in this container; subclass with "
            "e.g. PIL.Image.open(io.BytesIO(blob)) in __init__-loaded "
            "state and swap the class name in decode_media(). The stage "
            "contract (batch in, payload dropped, fixed-width 'features' "
            "list<float> out) is defined by FakeDecoder.")


def decode_media(ds, decoder_cls=FakeDecoder, concurrency=2,
                 batch_size: int = 256, payload_col: str = "payload"):
    """Actor-pool decode stage over a binary payload column.

    Small batch_size on purpose: batches of wide binary rows must fit
    the actor heap (batch_size x payload x concurrency).
    """
    return ds.map_batches(
        decoder_cls,
        fn_constructor_kwargs=dict(payload_col=payload_col),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )
