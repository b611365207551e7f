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

Published foundations (public literature): MinHash resemblance
estimation — Broder, "On the resemblance and containment of documents"
(SEQUENCES 1997); banded LSH — Leskovec/Rajaraman/Ullman, "Mining of
Massive Datasets" ch. 3; SimHash — Charikar, "Similarity estimation
techniques from rounding algorithms" (STOC 2002) with the
pigeonhole-block hamming search of Manku/Jain/Das Sarma (WWW 2007).
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd

from ray.data.aggregate import Count, Min, Sum

_WS = re.compile(r"\s+")

NUM_PERM = 64
LSH_BANDS = 32          # 32 bands x 2 rows
_RNG = np.random.default_rng(20240817)
# multiplicative-linear permutations mod 2^32, computed in int64 so the
# products stay exact AND vectorize with SIMD (numpy uint64 multiply has
# no SIMD path and measured 13x slower): a odd < 2^31 -> a*x < 2^63.
_A = (_RNG.integers(1, 1 << 31, NUM_PERM, dtype=np.int64) | np.int64(1))
_B = _RNG.integers(0, 1 << 31, NUM_PERM, dtype=np.int64)
_MASK32 = np.int64((1 << 32) - 1)


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

_SHINGLE_C = (np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F),
              np.uint64(0x165667B19E3779F9))


def _token_hashes(text: str) -> np.ndarray:
    ws = _WS.split(text.strip()) if text.strip() else []
    return np.asarray([zlib.crc32(w.encode("utf-8")) for w in ws],
                      dtype=np.uint64)


def _shingles_from_tokens(th: np.ndarray, k: int = 3) -> np.ndarray:
    """32-bit word-k-shingle hashes: a weighted uint64 combine of k
    consecutive token crc32s, splitmix64-mixed, top 32 bits kept (so the
    universal-hash machinery below stays overflow-safe)."""
    from ..sources.synth import splitmix64

    if len(th) < k:
        th = np.concatenate([th, np.zeros(k - len(th), dtype=np.uint64)])
    with np.errstate(over="ignore"):
        acc = np.zeros(len(th) - k + 1, dtype=np.uint64)
        for i in range(k):
            acc = acc + _SHINGLE_C[i] * th[i: len(th) - k + 1 + i]
    return splitmix64(acc) >> np.uint64(32)


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Sorted-unique 32-bit shingle hashes of a document (uint64 dtype)."""
    return np.unique(_shingles_from_tokens(_token_hashes(text), k))


def _universal_min(sh: np.ndarray, segments: np.ndarray) -> np.ndarray:
    """Per-segment min of (a*sh + b) mod 2^32 for all NUM_PERM (a, b).

    sh: concatenated 32-bit shingle hashes of all docs in the batch;
    segments: start offset of each doc (len n+1). Returns (n, NUM_PERM)
    uint64. Exact int64 arithmetic (a < 2^31, sh < 2^32 -> a*sh < 2^63).
    """
    x = sh.astype(np.int64)
    h = (( _A[:, None] * x[None, :]) + _B[:, None]) & _MASK32
    mins = np.minimum.reduceat(h, segments[:-1], axis=1)   # (NUM_PERM, n)
    return mins.T.astype(np.uint64)


def minhash_signature(sh: np.ndarray) -> np.ndarray:
    """(NUM_PERM,) uint64 — scalar reference path (exact python-int
    arithmetic) used as the dual oracle for the vectorized batch."""
    if len(sh) == 0:
        return np.full(NUM_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    out = np.empty(NUM_PERM, dtype=np.uint64)
    vals = [int(v) for v in sh]
    for i in range(NUM_PERM):
        a, b = int(_A[i]), int(_B[i])
        out[i] = np.uint64(min(((a * v + b) & 0xFFFFFFFF) for v in vals))
    return out


def minhash_signatures_batch(texts: pd.Series, k: int = 3) -> np.ndarray:
    """(n, NUM_PERM) uint64 — fully vectorized over the batch.

    One pass builds all token hashes, one rolling combine builds all
    shingles, one (NUM_PERM x total_shingles) matrix computes every
    permutation, and ``np.minimum.reduceat`` takes per-doc minima.
    Matches :func:`minhash_signature` over :func:`shingle_hashes`
    exactly (min is insensitive to the duplicate shingles we skip
    deduplicating here).
    """
    parts = []
    segs = [0]
    for t in texts:
        sh = _shingles_from_tokens(_token_hashes(t), k)
        parts.append(sh)
        segs.append(segs[-1] + len(sh))
    if not parts or segs[-1] == 0:
        return np.full((len(texts), NUM_PERM), np.iinfo(np.uint64).max,
                       dtype=np.uint64)
    flat = np.concatenate(parts)
    return _universal_min(flat, np.asarray(segs, dtype=np.int64))


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


def candidate_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                    driver_row_limit: int = 5_000_000):
    """LSH candidate pairs (a < b) with a band-occurrence count.

    The signature/banding stage always runs distributed. The pair
    emission has two paths:

    - band rows fit comfortably on the driver (< driver_row_limit):
      collect and emit pairs with one vectorized pandas groupby —
      Ray's map_groups pays per-group overhead across the (hundreds of
      thousands of) tiny band buckets, measured ~5 s vs ~0.1 s here;
    - otherwise the fully distributed path: groupby(band).map_groups
      to emit, groupby(pair) to dedupe (the exchange pattern that
      scales to 10^12 docs, where band rows are ~32x corpus rows).
    """
    bands = ds.map_batches(
        lambda b: lsh_band_rows(b, id_col, text_col), batch_format="pandas")

    # size the emission path from the INPUT count (metadata-only for
    # parquet sources — avoids materialising the band rows twice)
    n_rows = ds.count() * LSH_BANDS
    if n_rows <= driver_row_limit:
        df = bands.to_pandas()
        df = df.sort_values(id_col, kind="stable")
        out_a, out_b = [], []
        for _, g in df.groupby(["band_id", "band_hash"], sort=False):
            ids = g[id_col].to_numpy()
            if len(ids) < 2:
                continue
            ii, jj = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ii])
            out_b.append(ids[jj])
        if not out_a:
            pairs = pd.DataFrame({"a": np.empty(0, np.int64),
                                  "b": np.empty(0, np.int64)})
        else:
            pairs = pd.DataFrame({"a": np.concatenate(out_a),
                                  "b": np.concatenate(out_b)})
        agg = pairs.groupby(["a", "b"], sort=False).size() \
                   .reset_index(name="n_bands")
        import ray.data as rd

        return rd.from_pandas(agg)

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
# Character n-gram Jaccard (exact, vectorized)
# ---------------------------------------------------------------------------

_NGRAM_DIM = 1 << 16


def _char_ngram_matrix(texts, n: int = 3) -> np.ndarray:
    """(n_docs, 2^16) float32 binary presence matrix of hashed char
    n-grams. Collisions under the 16-bit hash make the estimate a
    (slight, deterministic) approximation of true n-gram Jaccard;
    exactness vs raw sets is sampled in tests."""
    m = np.zeros((len(texts), _NGRAM_DIM), dtype=np.float32)
    for row, t in enumerate(texts):
        b = t.encode("utf-8")
        if len(b) < n:
            continue
        grams = np.frombuffer(b, dtype=np.uint8)
        acc = np.zeros(len(b) - n + 1, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i in range(n):
                acc = acc * np.uint64(131) + grams[i: len(b) - n + 1 + i]
        from ..sources.synth import splitmix64

        idx = (splitmix64(acc) & np.uint64(_NGRAM_DIM - 1)).astype(np.int64)
        m[row, idx] = 1.0
    return m


def char_ngram_jaccard_pairs(texts, ids, threshold: float = 0.5,
                             n: int = 3, chunk: int = 512) -> pd.DataFrame:
    """All pairs (a < b) with char-n-gram Jaccard >= threshold.

    One binary presence matrix + chunked matmul: |A∩B| = X @ X.T over
    0/1 rows, |A∪B| = |A| + |B| - |A∩B|. Exact over the hashed gram
    space, fully vectorized. Quadratic in docs — the within-bucket
    verifier for LSH candidates at scale; standalone it handles the
    <= ~1e5-doc small side.
    """
    m = _char_ngram_matrix(list(texts), n)
    sizes = m.sum(axis=1)
    ids = np.asarray(ids)
    out_a, out_b, out_j = [], [], []
    for s in range(0, len(m), chunk):
        e = min(s + chunk, len(m))
        inter = m[s:e] @ m.T                     # (chunk, n_docs)
        union = sizes[s:e, None] + sizes[None, :] - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            j = np.where(union > 0, inter / union, 1.0)
        r, c = np.nonzero(j >= threshold)
        glob_r = r + s
        keep = ids[glob_r] < ids[c]
        out_a.append(ids[glob_r][keep])
        out_b.append(ids[c][keep])
        out_j.append(j[r, c][keep])
    if not out_a:
        return pd.DataFrame({"a": [], "b": [], "jaccard": []})
    return pd.DataFrame({
        "a": np.concatenate(out_a).astype(np.int64),
        "b": np.concatenate(out_b).astype(np.int64),
        "jaccard": np.round(np.concatenate(out_j), 6),
    }).sort_values(["a", "b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Connected components + full near-dup dedup
# ---------------------------------------------------------------------------

def connected_components(pairs_df: pd.DataFrame, nodes: np.ndarray,
                         max_rounds: int = 16):
    """(a, b) edge list + node universe -> DataFrame(node, component).

    Min-label propagation: each round every node takes the min label in
    its neighbourhood; converges in O(log diameter) rounds. Implemented
    in pandas over the edge list (candidate near-dup graphs are sparse
    and tiny relative to the corpus — they are the OUTPUT of LSH
    blocking); the same loop expressed with stages/hash_join.py +
    groupby(Min) runs distributed when the graph outgrows one block
    (documented scale path).
    """
    labels = pd.Series(nodes, index=nodes, dtype=np.int64)
    if len(pairs_df) == 0:
        return pd.DataFrame({"node": nodes, "component": nodes})
    e = pd.concat([
        pairs_df.rename(columns={"a": "u", "b": "v"})[["u", "v"]],
        pairs_df.rename(columns={"a": "v", "b": "u"})[["u", "v"]],
    ], ignore_index=True)
    for _ in range(max_rounds):
        neigh = e.assign(lbl=labels.reindex(e["v"]).to_numpy()) \
                 .groupby("u")["lbl"].min()
        new = labels.copy()
        upd = neigh[neigh < labels.reindex(neigh.index)]
        if upd.empty:
            break
        new.loc[upd.index] = upd
        labels = new
    return pd.DataFrame({"node": labels.index.to_numpy(),
                         "component": labels.to_numpy()})


def minhash_dedup_keep(ds, id_col: str = "doc_id", text_col: str = "text",
                       threshold: float = 0.5):
    """Full near-dup dedup: LSH candidates -> exact-Jaccard verify ->
    connected components -> keep min id per component.

    Returns a pandas DataFrame (doc_id, component, keep) covering every
    document (singletons keep themselves).
    """
    docs = ds.select_columns([id_col, text_col]).to_pandas()
    cands = candidate_pairs(ds, id_col, text_col).to_pandas()
    texts = dict(zip(docs[id_col], docs[text_col]))
    verified = verify_pairs(cands, texts, threshold=threshold)
    comp = connected_components(verified, docs[id_col].to_numpy())
    keep_of_comp = comp.groupby("component")["node"].min()
    comp["keep"] = comp["node"] == comp["component"].map(keep_of_comp)
    return comp.rename(columns={"node": id_col})


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(texts: pd.Series) -> np.ndarray:
    """64-bit SimHash over whitespace tokens (crc32 -> splitmix64 bits).

    Vectorized across the batch: all token hashes concatenate into one
    array; per-doc weighted bit sums come from ``np.add.reduceat`` over
    doc segments (summing per occurrence == count-weighting, so results
    match the textbook unique+counts formulation exactly).
    """
    from ..sources.synth import splitmix64

    n = len(texts)
    tok_lists = [_WS.split(t.strip()) if t.strip() else []
                 for t in texts.tolist()]
    segs = np.zeros(n + 1, dtype=np.int64)
    segs[1:] = np.cumsum([len(ws) for ws in tok_lists])
    if segs[-1] == 0:
        return np.zeros(n, dtype=np.uint64)
    flat = np.asarray([zlib.crc32(w.encode("utf-8"))
                       for ws in tok_lists for w in ws], dtype=np.uint64)
    h = splitmix64(flat)
    bit_idx = np.arange(64, dtype=np.uint64)
    signs = (((h[:, None] >> bit_idx[None, :]) & np.uint64(1))
             .astype(np.int64) * 2 - 1)                    # (T, 64)
    # empty docs produce a zero-length segment; reduceat can't express
    # those directly, so compute on the padded index list and zero after
    starts = np.minimum(segs[:-1], segs[-1] - 1)
    sums = np.add.reduceat(signs, starts, axis=0)          # (n, 64)
    lens = segs[1:] - segs[:-1]
    bits = (sums > 0).astype(np.uint64)
    out = (bits << bit_idx[None, :]).sum(axis=1, dtype=np.uint64)
    # empty docs: their reduceat range degenerates to a single stray
    # element — zero them (neighbouring rows are unaffected: reduceat
    # ranges end at the *next* index, which is still correct for them)
    out[lens == 0] = np.uint64(0)
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
