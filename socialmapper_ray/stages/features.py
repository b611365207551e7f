"""Per-page text-feature stage: the compute-dense middle of a corpus run.

A real Common-Crawl pipeline spends most of its CPU here: per-document
signatures (MinHash bands for near-dup, SimHash, rolling fingerprint)
and quality scores, computed in one pass so the corpus is read once.
Stateless ``map_batches`` (pure functions of text), slim output (the
signatures, not the shingles).

Arrow in, Arrow out: pass-through columns are reused zero-copy; only
the text column materialises as python strings (the signature kernels
hash python tokens regardless), wrapped once in a pandas Series for the
C-level string kernels. No whole-table pandas round-trip.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import text as tx
from . import dedup


def text_features_batch(tbl: pa.Table, text_col: str = "text") -> pa.Table:
    texts = tbl[text_col].to_pylist()
    s = pd.Series(texts, dtype=object)
    # tokenize + crc32 ONCE per batch; every signature kernel consumes
    # the same (flat hashes, segments) — this stage previously ran the
    # python tokenizer THREE times per batch (minhash, simhash,
    # fingerprint), the dominant cost of a corpus pass
    th = dedup._batch_token_hashes(texts)
    sigs = dedup.minhash_signatures_batch(texts, token_hashes=th)
    rows_per_band = dedup.NUM_PERM // dedup.LSH_BANDS
    # first LSH band hash as a compact near-dup blocking key
    seg = sigs[:, :rows_per_band]
    acc = np.full(len(texts), np.uint64(1469598103934665603), dtype=np.uint64)
    for r in range(rows_per_band):
        acc = (acc ^ seg[:, r]) * np.uint64(1099511628211)
    cols = {name: tbl[name] for name in tbl.column_names}
    cols["minhash_band0"] = pa.array(acc, pa.uint64())
    cols["simhash"] = pa.array(
        dedup.simhash64(s, token_hashes=th).astype(np.uint64),
        pa.uint64())
    cols["fingerprint"] = pa.array(
        tx.doc_fingerprint(s, token_hashes=th).to_numpy(dtype=np.uint64),
        pa.uint64())
    # token_count == segment lengths of the shared tokenization (both
    # define tokens as the whitespace split of non-empty trimmed text)
    cols["token_count"] = pa.array(th[1][1:] - th[1][:-1], pa.int64())
    cols["stop_count"] = pa.array(tx.stopword_count(s).to_numpy(), pa.int64())
    cols["alpha_ratio_ppm"] = pa.array(tx.alpha_ratio_scaled(s).to_numpy(),
                                       pa.int64())
    return pa.table(cols)


def with_text_features(ds, batch_size: int = 1024):
    return ds.map_batches(text_features_batch, batch_format="pyarrow",
                          batch_size=batch_size)
