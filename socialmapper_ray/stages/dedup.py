"""Deduplication suite over document tables (training-data ops).

Beyond the reference's exact keyed dedup (U2/A2,
export/preparation.py:143-187), this adds the large-corpus dedup family
a 100 TB text pipeline needs:

- exact content dedup: md5(text) -> hash-partitioned groupby, keep
  min(id). One shuffle of (hash, id) pairs only — text never moves.
- MinHash + LSH near-dup: per-batch vectorized signatures (word
  3-shingles -> crc32 -> 64 universal-hash permutations), banded into
  (band_id, band_hash) keys, candidate pairs from a groupby over bands,
  then **exact** Jaccard verification of candidates (output precision 1;
  recall is the standard LSH probability, tested at small scale).
- SimHash: 64-bit weighted-bit signature; hamming<=k near-dups found by
  4x16-bit pigeonhole blocking.

All signatures are pure functions of the text (deterministic at any
parallelism). Pair emission dedupes via the shuffle itself
(groupby(pair)), not driver state.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Count, Min, Sum

_WS = re.compile(r"\s+")

NUM_PERM = 64
LSH_BANDS = 32          # 32 bands x 2 rows
_MERSENNE = np.uint64((1 << 61) - 1)
_RNG = np.random.default_rng(20240817)
_A = _RNG.integers(1, 1 << 60, NUM_PERM, dtype=np.uint64) | np.uint64(1)
_B = _RNG.integers(0, 1 << 60, NUM_PERM, dtype=np.uint64)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def add_text_hash(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    batch = batch.copy()
    batch["text_hash"] = [hashlib.md5(t.encode("utf-8")).hexdigest()
                          for t in batch[text_col]]
    return batch


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """-> (text_hash, keep_id, n_dupes): hash-partitioned exact dedup."""
    hashed = ds.map_batches(
        lambda b: add_text_hash(b, text_col)[["text_hash", id_col]],
        batch_format="pandas")
    return hashed.groupby("text_hash").aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="n_dupes"))


def exact_dedup_salted(ds, id_col: str = "doc_id", text_col: str = "text",
                       salt_buckets: int = 8):
    """Skew-safe exact dedup: salt the shuffle key (SURVEY.md §7.3).

    A viral duplicate (one text repeated millions of times) would send
    every copy to ONE reducer in the plain groupby. Salting splits each
    text_hash across ``salt_buckets`` sub-keys, reduces per sub-key
    (min/count partials), then runs a second, tiny groupby over one row
    per (hash, salt). Verified equal to :func:`exact_dedup` in tests.
    """
    import numpy as np

    def hash_and_salt(b: pd.DataFrame) -> pd.DataFrame:
        out = add_text_hash(b, text_col)[["text_hash", id_col]]
        out["salt"] = (out[id_col].to_numpy() % salt_buckets).astype(np.int64)
        return out

    salted = ds.map_batches(hash_and_salt, batch_format="pandas")
    per_salt = salted.groupby(["text_hash", "salt"]).aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="n"))
    return per_salt.groupby("text_hash").aggregate(
        Min("keep_id", alias_name="keep_id"), Sum("n", alias_name="n_dupes"))


# ---------------------------------------------------------------------------
# Shingles + MinHash
# ---------------------------------------------------------------------------

def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """crc32 of each word-k-shingle (sorted-unique uint64)."""
    ws = _WS.split(text.strip()) if text.strip() else []
    if len(ws) < k:
        ws = ws + [""] * (k - len(ws))
    sh = [" ".join(ws[i: i + k]) for i in range(len(ws) - k + 1)]
    return np.unique(np.asarray(
        [zlib.crc32(s.encode("utf-8")) for s in sh], dtype=np.uint64))


def minhash_signature(sh: np.ndarray) -> np.ndarray:
    """(NUM_PERM,) uint64 via universal hashing mod a Mersenne prime."""
    if len(sh) == 0:
        return np.full(NUM_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    # (perm, shingle) matrix; modular arithmetic stays in uint64 because
    # a, b, shingles < 2^61 and we reduce mod 2^61-1 via Python ints only
    # where overflow is possible -> use object-free trick with float? No:
    # use (a * sh + b) mod p with uint64 overflow-safe split multiply.
    out = np.empty(NUM_PERM, dtype=np.uint64)
    for i in range(NUM_PERM):
        prod = (int(_A[i]) * sh.astype(object) + int(_B[i])) % int(_MERSENNE)
        out[i] = np.uint64(min(prod))
    return out


def minhash_signatures_batch(texts: pd.Series, k: int = 3) -> np.ndarray:
    """(n, NUM_PERM) uint64 — vectorized over the permutation axis.

    crc32 values are < 2^32 and a, b < 2^60, so a*sh+b can overflow
    uint64; compute in float128-free fashion by splitting a into
    (hi<<32 + lo) and reducing mod p = 2^61-1 with uint64 ops only.
    """
    n = len(texts)
    out = np.empty((n, NUM_PERM), dtype=np.uint64)
    p = np.uint64((1 << 61) - 1)
    a_lo = _A & np.uint64(0xFFFFFFFF)
    a_hi = _A >> np.uint64(32)
    for row, t in enumerate(texts):
        sh = shingle_hashes(t, k)  # < 2^32
        if len(sh) == 0:
            out[row] = np.iinfo(np.uint64).max
            continue
        # a*sh = (a_hi*sh)<<32 + a_lo*sh ; each product < 2^60
        lo = a_lo[:, None] * sh[None, :]                     # < 2^92? no: <2^32*2^32=2^64 -> safe? a_lo<2^32, sh<2^32 -> product < 2^64: borderline
        hi = a_hi[:, None] * sh[None, :]                     # a_hi < 2^28 -> < 2^60 safe
        # reduce (hi << 32 + lo + b) mod p using mod-p identity 2^61 = 1:
        # x = hi*2^32 + lo ; hi*2^32 mod p = ((hi<<32) mod 2^61) + (hi>>29)
        hi32 = ((hi << np.uint64(32)) & p) + (hi >> np.uint64(29))
        x = hi32 + (lo & p) + (lo >> np.uint64(61)) + _B[:, None]
        x = (x & p) + (x >> np.uint64(61))
        x = np.where(x >= p, x - p, x)
        out[row] = x.min(axis=1)
    return out


def lsh_band_rows(batch: pd.DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> pd.DataFrame:
    """Explode each doc into LSH_BANDS (band_id, band_hash, id) rows."""
    sigs = minhash_signatures_batch(batch[text_col])
    rows_per_band = NUM_PERM // LSH_BANDS
    n = len(batch)
    band_hash = np.empty((n, LSH_BANDS), dtype=np.uint64)
    for b in range(LSH_BANDS):
        seg = sigs[:, b * rows_per_band:(b + 1) * rows_per_band]
        h = np.uint64(1469598103934665603)
        acc = np.full(n, h, dtype=np.uint64)
        for r in range(rows_per_band):
            acc = (acc ^ seg[:, r]) * np.uint64(1099511628211)
        band_hash[:, b] = acc
    ids = np.repeat(batch[id_col].to_numpy(), LSH_BANDS)
    return pd.DataFrame({
        "band_id": np.tile(np.arange(LSH_BANDS, dtype=np.int64), n),
        "band_hash": band_hash.ravel(),
        id_col: ids,
    })


def candidate_pairs(ds, id_col: str = "doc_id", text_col: str = "text"):
    """LSH candidate pairs (a < b), deduped by a groupby on the pair."""
    bands = ds.map_batches(
        lambda b: lsh_band_rows(b, id_col, text_col), batch_format="pandas")

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []}, dtype=np.int64)
        ii, jj = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[ii], "b": ids[jj]})

    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        emit_pairs, batch_format="pandas")
    return pairs.groupby(["a", "b"]).aggregate(Count(alias_name="n_bands"))


def jaccard(a_sh: np.ndarray, b_sh: np.ndarray) -> float:
    inter = len(np.intersect1d(a_sh, b_sh, assume_unique=True))
    union = len(a_sh) + len(b_sh) - inter
    return inter / union if union else 1.0


def verify_pairs(pairs_df: pd.DataFrame, texts_by_id: dict,
                 threshold: float = 0.5) -> pd.DataFrame:
    """Exact-Jaccard filter of candidate pairs. ``texts_by_id`` is the
    broadcast small side (at scale: a join against the doc table keyed by
    id, shuffled on id — documented alternative)."""
    cache: dict[int, np.ndarray] = {}

    def sh(i):
        if i not in cache:
            cache[i] = shingle_hashes(texts_by_id[i])
        return cache[i]

    keep_a, keep_b, sims = [], [], []
    for a, b in zip(pairs_df["a"], pairs_df["b"]):
        s = jaccard(sh(int(a)), sh(int(b)))
        if s >= threshold:
            keep_a.append(int(a))
            keep_b.append(int(b))
            sims.append(s)
    return pd.DataFrame({"a": keep_a, "b": keep_b, "jaccard": sims})


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(texts: pd.Series) -> np.ndarray:
    """64-bit SimHash over whitespace tokens (crc32 -> splitmix64 bits)."""
    from ..sources.synth import splitmix64

    out = np.empty(len(texts), dtype=np.uint64)
    bit_idx = np.arange(64, dtype=np.uint64)
    for row, t in enumerate(texts.tolist()):
        ws = _WS.split(t.strip()) if t.strip() else []
        if not ws:
            out[row] = 0
            continue
        toks, counts = np.unique(ws, return_counts=True)
        h = splitmix64(np.asarray(
            [zlib.crc32(w.encode("utf-8")) for w in toks], dtype=np.uint64))
        bits = ((h[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
        score = ((bits * 2 - 1) * counts[:, None].astype(np.int64)).sum(axis=0)
        out[row] = np.uint64(
            int("".join("1" if s > 0 else "0" for s in score[::-1]), 2))
    return out


def simhash_blocks(batch: pd.DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> pd.DataFrame:
    """Explode into 4 x 16-bit pigeonhole blocks: any pair with hamming
    distance <= 3 shares at least one exact block."""
    sig = simhash64(batch[text_col])
    n = len(batch)
    blocks = np.empty((n, 4), dtype=np.uint64)
    for i in range(4):
        blocks[:, i] = (sig >> np.uint64(16 * i)) & np.uint64(0xFFFF)
    return pd.DataFrame({
        "block_id": np.tile(np.arange(4, dtype=np.int64), n),
        "block_val": blocks.ravel(),
        id_col: np.repeat(batch[id_col].to_numpy(), 4),
        "simhash": np.repeat(sig, 4),
    })


def simhash_pairs(ds, max_hamming: int = 3, id_col: str = "doc_id",
                  text_col: str = "text"):
    """Near-dup pairs by SimHash blocking + exact hamming verify."""
    blocks = ds.map_batches(
        lambda b: simhash_blocks(b, id_col, text_col), batch_format="pandas")

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col).sort_values(id_col)
        ids = g[id_col].to_numpy()
        sigs = g["simhash"].to_numpy().astype(np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": [], "hamming": []},
                                dtype=np.int64)
        ii, jj = np.triu_indices(len(ids), k=1)
        x = np.bitwise_xor(sigs[ii], sigs[jj])
        ham = np.asarray([bin(int(v)).count("1") for v in x], dtype=np.int64)
        ok = ham <= max_hamming
        return pd.DataFrame({"a": ids[ii][ok], "b": ids[jj][ok],
                             "hamming": ham[ok]})

    pairs = blocks.groupby(["block_id", "block_val"]).map_groups(
        emit, batch_format="pandas")
    return pairs.groupby(["a", "b"]).aggregate(
        Min("hamming", alias_name="hamming"))
