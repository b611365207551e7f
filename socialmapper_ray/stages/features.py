"""Per-page text-feature stage: the compute-dense middle of a corpus run.

A real Common-Crawl pipeline spends most of its CPU here: per-document
signatures (MinHash bands for near-dup, SimHash, rolling fingerprint)
and quality scores, computed in one pass so the corpus is read once.
Stateless ``map_batches`` (pure functions of text), slim output (the
signatures, not the shingles).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions import text as tx
from . import dedup


def text_features_batch(df: pd.DataFrame,
                        text_col: str = "text") -> pd.DataFrame:
    texts = df[text_col]
    sigs = dedup.minhash_signatures_batch(texts)
    rows_per_band = dedup.NUM_PERM // dedup.LSH_BANDS
    # first LSH band hash as a compact near-dup blocking key
    seg = sigs[:, :rows_per_band]
    acc = np.full(len(df), np.uint64(1469598103934665603), dtype=np.uint64)
    for r in range(rows_per_band):
        acc = (acc ^ seg[:, r]) * np.uint64(1099511628211)
    out = df.copy()
    out["minhash_band0"] = acc
    out["simhash"] = dedup.simhash64(texts)
    out["fingerprint"] = tx.doc_fingerprint(texts)
    out["token_count"] = tx.token_count(texts)
    out["stop_count"] = tx.stopword_count(texts)
    out["alpha_ratio_ppm"] = tx.alpha_ratio_scaled(texts)
    import pyarrow as pa

    # emit a metadata-free Arrow block (see stages/extract.py rationale)
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


def with_text_features(ds, batch_size: int = 1024):
    return ds.map_batches(text_features_batch, batch_format="pandas",
                          batch_size=batch_size)
