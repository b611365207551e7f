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
import pyarrow as pa

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
    if batch[text_col].isna().any():
        # factorize codes NaN as -1, which would WRAP to the last
        # unique's hash — fail loudly instead (the caller decides null
        # semantics; silent mis-dedup is the worst outcome)
        raise ValueError(f"add_text_hash: null values in {text_col!r}")
    # md5 once per unique text in the batch: on duplicate-heavy corpora
    # (the workload of this operator) copies co-batch frequently
    codes, uniques = pd.factorize(batch[text_col], sort=False)
    uh = np.asarray([hashlib.md5(t.encode("utf-8")).hexdigest()
                     for t in uniques], dtype=object)
    batch["text_hash"] = uh[codes]
    return batch


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """-> (text_hash, keep_id, n_dupes): hash-partitioned exact dedup.

    The hashing stage both DECLARES pyarrow batches and emits Arrow:
    Ray's sort-aggregate takes a vectorized path on Arrow blocks but a
    per-group python path on pandas blocks (measured 49 s vs 2.6 s for
    a 250k-row/5k-group string-keyed aggregate), and a stage *declared*
    ``batch_format="pandas"`` that is fused into the shuffle's map
    phase pays a further ~10x (22-26 s vs 2.7 s streaming at 960k rows
    — measured r3) even when it RETURNS Arrow. The pandas hop the
    kernel needs happens inside the UDF instead.
    """
    import pyarrow as pa

    def hashed_arrow(b: "pa.Table") -> "pa.Table":
        out = add_text_hash(b.to_pandas(), text_col)
        return pa.table({
            "text_hash": pa.array(out["text_hash"], pa.string()),
            id_col: pa.array(out[id_col].to_numpy())})

    hashed = ds.map_batches(hashed_arrow, batch_format="pyarrow")
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
    Arrow blocks into both aggregates (see exact_dedup).
    """
    import numpy as np
    import pyarrow as pa

    def hash_and_salt(b: "pa.Table") -> "pa.Table":
        out = add_text_hash(b.to_pandas(), text_col)
        return pa.table({
            "text_hash": pa.array(out["text_hash"], pa.string()),
            id_col: pa.array(out[id_col].to_numpy()),
            "salt": pa.array((out[id_col].to_numpy() % salt_buckets)
                             .astype(np.int64))})

    salted = ds.map_batches(hash_and_salt, batch_format="pyarrow")
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


def _batch_token_hashes(texts) -> tuple[np.ndarray, np.ndarray]:
    """Shared factorize-cached batch tokenizer (functions/text.py);
    same whitespace split, crc32 once per unique token per batch."""
    from ..functions.text import batch_token_hashes

    return batch_token_hashes(list(texts))


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


def _universal_min(sh: np.ndarray, segments: np.ndarray,
                   chunk_shingles: int = 1 << 14) -> np.ndarray:
    """Per-segment min of (a*sh + b) mod 2^32 for all NUM_PERM (a, b).

    sh: concatenated 32-bit shingle hashes of all docs in the batch;
    segments: start offset of each doc (len n+1). Returns (n, NUM_PERM)
    uint64. Exact int64 arithmetic (a < 2^31, sh < 2^32 -> a*sh < 2^63).

    Chunked at doc boundaries so the (NUM_PERM x shingles) intermediate
    stays ~8 MB (cache-resident) instead of one matrix over the whole
    batch: the unchunked form allocated ~0.7 GB per 60k-doc batch, and
    16 CONCURRENT tasks saturated this box's memory bandwidth — 2.4 s
    solo became 162 s under concurrency (measured r4). Same values
    exactly; reduceat boundaries never split a doc.
    """
    n = len(segments) - 1
    out = np.empty((n, NUM_PERM), dtype=np.uint64)
    i = 0
    while i < n:
        j = i + 1
        while j < n and segments[j + 1] - segments[i] <= chunk_shingles:
            j += 1
        x = sh[segments[i]:segments[j]].astype(np.int64)
        h = ((_A[:, None] * x[None, :]) + _B[:, None]) & _MASK32
        local = (segments[i:j + 1] - segments[i]).astype(np.int64)
        out[i:j] = np.minimum.reduceat(h, local[:-1], axis=1).T \
            .astype(np.uint64)
        i = j
    return out


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


def minhash_signatures_batch(texts: pd.Series, k: int = 3,
                             token_hashes=None) -> np.ndarray:
    """(n, NUM_PERM) uint64 — fully vectorized over the batch.

    One pass builds all token hashes, one rolling combine builds all
    shingles, one (NUM_PERM x total_shingles) matrix computes every
    permutation, and ``np.minimum.reduceat`` takes per-doc minima.
    Matches :func:`minhash_signature` over :func:`shingle_hashes`
    exactly (min is insensitive to the duplicate shingles we skip
    deduplicating here).
    """
    # token_hashes: optional precomputed (flat crc32s, segments) so a
    # multi-signature stage tokenizes ONCE per batch (features.py)
    th_flat, tsegs = token_hashes if token_hashes is not None else \
        _batch_token_hashes(
            texts.tolist() if hasattr(texts, "tolist") else list(texts))
    from ..sources.synth import splitmix64

    # raw rolling accumulators per doc; the splitmix64 finalizer is
    # elementwise, so ONE mix over the concatenation equals per-doc
    # mixing exactly while skipping 2 python calls + an errstate
    # context per doc (measured ~2x of this kernel's time)
    parts = []
    segs = [0]
    with np.errstate(over="ignore"):
        for i in range(len(tsegs) - 1):
            th = th_flat[tsegs[i]:tsegs[i + 1]]
            if len(th) < k:
                th = np.concatenate(
                    [th, np.zeros(k - len(th), dtype=np.uint64)])
            m = len(th) - k + 1
            acc = np.zeros(m, dtype=np.uint64)
            for j in range(k):
                acc = acc + _SHINGLE_C[j] * th[j: m + j]
            parts.append(acc)
            segs.append(segs[-1] + m)
    if not parts or segs[-1] == 0:
        return np.full((len(texts), NUM_PERM), np.iinfo(np.uint64).max,
                       dtype=np.uint64)
    flat = splitmix64(np.concatenate(parts)) >> np.uint64(32)
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


def _bucket_of_u64(key: np.ndarray, sub: np.ndarray,
                   n_buckets: int) -> np.ndarray:
    """Deterministic bucket in [0, n_buckets) from a uint64 key column
    mixed with a small int64 sub-key (band_id / block_id)."""
    k = np.asarray(key, dtype=np.uint64)
    s = np.asarray(sub, dtype=np.uint64)
    mixed = k ^ (s * np.uint64(0x9E3779B97F4A7C15))
    return (mixed % np.uint64(n_buckets)).astype(np.int64)


def _pairs_from_sorted_groups(grp_a: np.ndarray, grp_b: np.ndarray,
                              ids: np.ndarray, group_cap: int = 256):
    """Vectorized within-group pair emission (no per-group Python loop).

    Rows are lexsorted by (grp_a, grp_b, ids); run-length boundaries
    give group sizes; groups of equal size are stacked into one matrix
    and emitted with a single ``triu_indices`` gather per distinct size.
    Groups larger than ``group_cap`` (pathological hot buckets: e.g. a
    viral text whose every copy shares every band) emit STAR pairs
    (min id <-> each other id) — preserving connected components while
    avoiding the O(s^2) blow-up; all-pairs semantics for such clusters
    is the exact-dedup path's job.
    """
    order = np.lexsort((ids, grp_b, grp_a))
    ga, gb, ids = grp_a[order], grp_b[order], ids[order]
    n = len(ids)
    empty = np.empty(0, dtype=ids.dtype)
    if n == 0:
        return empty, empty
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = (ga[1:] != ga[:-1]) | (gb[1:] != gb[:-1])
    starts = np.flatnonzero(new)
    sizes = np.diff(np.append(starts, n))
    out_a, out_b = [], []
    for s in np.unique(sizes):
        if s < 2:
            continue
        st = starts[sizes == s]
        mat = ids[st[:, None] + np.arange(s)[None, :]]   # (g, s), rows asc
        if s <= group_cap:
            ii, jj = np.triu_indices(int(s), k=1)
            out_a.append(mat[:, ii].ravel())
            out_b.append(mat[:, jj].ravel())
        else:
            out_a.append(np.repeat(mat[:, 0], int(s) - 1))
            out_b.append(mat[:, 1:].ravel())
    if not out_a:
        return empty, empty
    return np.concatenate(out_a), np.concatenate(out_b)


def _pair_bucket_col(a: np.ndarray, b: np.ndarray,
                     n_buckets: int) -> np.ndarray:
    """Deterministic bucket of an (a, b) pair key — both ids mixed so
    pairs distribute evenly even when one endpoint is a hot hub."""
    from ..sources.synth import splitmix64

    au = np.asarray(a, dtype=np.int64).astype(np.uint64)
    bu = np.asarray(b, dtype=np.int64).astype(np.uint64)
    mixed = splitmix64(au ^ splitmix64(bu))
    return (mixed % np.uint64(n_buckets)).astype(np.int64)


def combine_pair_partials(partials, agg: dict, n_buckets: int = 16):
    """Keyed combine of per-bucket (a, b, value) partials: hash-bucket
    the pair key, ONE vectorized pandas aggregate per bucket. No
    single-task funnel — the pair set can be any size (at 100 TB the
    candidate list of a boilerplate-heavy crawl is O(corpus), so the
    combine must shuffle, not ``repartition(1)``).

    agg: column -> 'sum' | 'min' (pandas named-agg spec).
    """
    cols = list(agg)

    def bucketed(t) -> "pd.DataFrame":
        import pyarrow as pa

        df = t.to_pandas()
        if df.empty:
            return pa.table({c: pa.array(np.empty(0, np.int64))
                             for c in ["a", "b", *cols, "__cb"]})
        return pa.table({
            **{c: pa.array(df[c].to_numpy()) for c in ["a", "b", *cols]},
            "__cb": pa.array(_pair_bucket_col(
                df["a"].to_numpy(), df["b"].to_numpy(), n_buckets))})

    def combine_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["a", "b"], sort=False)[cols].agg(agg).reset_index()
        for c in cols:
            out[c] = out[c].astype(np.int64)
        return out

    return partials.map_batches(bucketed, batch_format="pyarrow") \
        .groupby("__cb").map_groups(combine_bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# Exact-duplicate collapse (pre-LSH volume reduction)
# ---------------------------------------------------------------------------

def _h64_of_texts(texts: pd.Series) -> np.ndarray:
    """Stable 64-bit content hash per text (blake2b-8), one digest per
    UNIQUE text in the batch (dup-heavy corpora co-batch copies).

    int64-reinterpreted so every downstream op stays on the SIMD int64
    path (numpy uint64 arithmetic is ~13x slower here). Collision odds
    are the standard birthday bound (~n_distinct^2 / 2^65); a collision
    can only over-merge a near-dup component — the exact-dedup op keeps
    its md5 path."""
    codes, uniques = pd.factorize(texts, sort=False)
    if (codes < 0).any():
        raise ValueError("_h64_of_texts: null text")
    if len(uniques) == 0:
        return np.empty(0, dtype=np.int64)
    uh = np.asarray(
        [int.from_bytes(hashlib.blake2b(u.encode("utf-8"),
                                        digest_size=8).digest(), "little")
         for u in uniques], dtype=np.uint64).view(np.int64)
    return uh[codes]


def _stars_from_sorted_groups(ga: np.ndarray, gb: np.ndarray,
                              ids: np.ndarray):
    """Vectorized star edges + group reps: within each (ga, gb) group,
    edges (min_id, other_id) and one (ga, min_id) marker per group."""
    order = np.lexsort((ids, gb, ga))
    ga, gb, ids = ga[order], gb[order], ids[order]
    n = len(ids)
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e, e
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = (ga[1:] != ga[:-1]) | (gb[1:] != gb[:-1])
    starts = np.flatnonzero(new)
    sizes = np.diff(np.append(starts, n))
    reps = ids[starts]                       # ids ascend within a group
    rep_for_row = np.repeat(reps, sizes)
    member = rep_for_row != ids
    return rep_for_row[member], ids[member], ga[starts], reps


def exact_star_edges(ds, id_col: str = "doc_id", text_col: str = "text",
                     salt_buckets: int = 8, n_buckets: int = 16):
    """(a=representative, b=member) edges connecting every exact-copy
    document to the minimum doc id of its text — the exact-duplicate
    half of the collapsed near-dup graph (see ``collapse_exact`` in
    :func:`candidate_pairs`).

    Star-of-stars, skew-safe: level 1 groups by (h64, salt) — a viral
    text's copies split across ``salt_buckets`` sub-groups, so no
    reducer sees the whole hot key — emitting (local_rep, member) edges
    plus one marker per sub-group; level 2 groups the <= salt_buckets
    markers per text and emits (global_rep, local_rep). The composed
    graph has identical connected components to the one-level star
    (and to all-pairs). Both exchanges are bucket-keyed with vectorized
    per-bucket kernels; edge volume is exactly n_copies - n_texts.
    """
    def prep(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        ids = df[id_col].to_numpy().astype(np.int64)
        h = _h64_of_texts(df[text_col])
        return pa.table({
            "h64": pa.array(h),
            "id": pa.array(ids),
            "salt": pa.array(ids % np.int64(salt_buckets)),
            "__b": pa.array(_bucket_of_u64(h.view(np.uint64),
                                           ids % np.int64(salt_buckets),
                                           n_buckets))})

    rows = ds.map_batches(prep, batch_format="pyarrow")

    def level1(g: pd.DataFrame) -> pa.Table:
        ea, eb, mh, mr = _stars_from_sorted_groups(
            g["h64"].to_numpy(np.int64), g["salt"].to_numpy(np.int64),
            g["id"].to_numpy(np.int64))
        # edges carry kind=0; markers (one per (h64, salt) group) kind=1
        return pa.table({
            "kind": pa.array(np.concatenate(
                [np.zeros(len(ea), np.int64), np.ones(len(mh), np.int64)])),
            "a": pa.array(np.concatenate([ea, mr])),
            "b": pa.array(np.concatenate([eb, np.zeros(len(mh),
                                                       np.int64)])),
            "h64": pa.array(np.concatenate(
                [np.zeros(len(ea), np.int64), mh]))})

    lvl1 = rows.groupby("__b").map_groups(level1, batch_format="pandas") \
        .materialize()
    if lvl1.count() == 0:                    # empty corpus: no edges
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}))
    edges1 = lvl1.filter(expr="kind == 0").select_columns(["a", "b"])

    def mark_bucket(t: pa.Table) -> pa.Table:
        h = t["h64"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "h64": pa.array(h),
            "rep": t["a"].combine_chunks()
            if isinstance(t["a"], pa.ChunkedArray) else t["a"],
            "__b": pa.array(h % np.int64(n_buckets))})

    markers = lvl1.filter(expr="kind == 1") \
        .map_batches(mark_bucket, batch_format="pyarrow")

    def level2(g: pd.DataFrame) -> pa.Table:
        h = g["h64"].to_numpy(np.int64)
        ea, eb, _, _ = _stars_from_sorted_groups(
            h, np.zeros(len(h), np.int64), g["rep"].to_numpy(np.int64))
        return pa.table({"a": pa.array(ea), "b": pa.array(eb)})

    edges2 = markers.groupby("__b").map_groups(level2,
                                               batch_format="pandas")
    return edges1.union(edges2)


def candidate_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                    n_buckets: int = 64, group_cap: int = 256,
                    combine: bool = True, collapse_exact: bool = False):
    """LSH candidate pairs (a < b) with a band-occurrence count.

    Fully distributed: band rows are hash-bucketed by (band_id,
    band_hash) — every band group lands wholly inside one bucket — and
    ONE ``groupby(bucket).map_groups`` call per bucket emits all of its
    groups' pairs with the vectorized run-length kernel above (the
    per-band-group map_groups variant pays ~60 us of pandas overhead
    per tiny group; at 32 bands x 1e5 docs that was the measured 11 s
    hot spot). The exchange moves only (band_id, band_hash, id) rows —
    text never shuffles. Per-bucket partial (a, b) counts combine via a
    keyed pair-hash groupby (:func:`combine_pair_partials`) — no
    single-task funnel, so the pair set may be any size.

    ``collapse_exact``: pre-collapse EXACT duplicates before pair
    emission — band rows carry the 64-bit text hash, and the per-bucket
    kernel keeps one row per (band group, distinct text) before the
    quadratic pair step. All copies of a text share every band hash, so
    they land in the same bucket and the kept id is the text's GLOBAL
    min id — pairs come out directly in representative-doc-id space.
    This is the measured scale-killer on duplicate-heavy corpora: a
    viral 192-copy text under the 256 star-cap otherwise emits 18k
    pairs per band per text (2.9e9 rows at 960k docs — object-store
    spill); collapsed, it emits none. Within-text connectivity comes
    from :func:`exact_star_edges`; the composed graph has provably
    identical connected components (copies have identical signatures
    and jaccard 1, so every cross-copy edge maps to a rep-rep edge).
    The keep pipelines default to this; the pairs OP keeps all-copy
    pairs (its n_bands contract counts every co-occurrence).
    """
    import ray.data as rd

    def band_rows_bucketed(b) -> "pd.DataFrame":
        import pyarrow as pa

        df = b.to_pandas()
        out = lsh_band_rows(df, id_col, text_col)
        # declared-pyarrow + arrow out: a pandas-DECLARED stage fused
        # into the shuffle map phase pays ~10x (exact_dedup docstring)
        cols = {
            "band_id": pa.array(out["band_id"].to_numpy()),
            "band_hash": pa.array(out["band_hash"].to_numpy()),
            id_col: pa.array(out[id_col].to_numpy()),
            "__bucket": pa.array(_bucket_of_u64(
                out["band_hash"].to_numpy(), out["band_id"].to_numpy(),
                n_buckets))}
        if collapse_exact:
            cols["h64"] = pa.array(np.repeat(_h64_of_texts(df[text_col]),
                                             LSH_BANDS))
        return pa.table(cols)

    bands = ds.map_batches(band_rows_bucketed, batch_format="pyarrow")

    def emit_bucket(g: pd.DataFrame) -> pd.DataFrame:
        band_id = g["band_id"].to_numpy()
        band_hash = g["band_hash"].to_numpy()
        ids = g[id_col].to_numpy()
        if collapse_exact:
            # one row per (band group, distinct text), keeping the
            # text's min id — the global rep, since every copy of a
            # text shares this band group and therefore this bucket
            h64 = g["h64"].to_numpy()
            order = np.lexsort((ids, h64, band_hash, band_id))
            band_id, band_hash, h64, ids = (band_id[order],
                                            band_hash[order],
                                            h64[order], ids[order])
            first = np.empty(len(ids), dtype=bool)
            if len(ids):
                first[0] = True
                first[1:] = ((band_id[1:] != band_id[:-1])
                             | (band_hash[1:] != band_hash[:-1])
                             | (h64[1:] != h64[:-1]))
            band_id, band_hash, ids = (band_id[first], band_hash[first],
                                       ids[first])
        a, b = _pairs_from_sorted_groups(band_id, band_hash, ids,
                                         group_cap)
        if len(a) == 0:
            return pd.DataFrame({"a": np.empty(0, np.int64),
                                 "b": np.empty(0, np.int64),
                                 "n_bands": np.empty(0, np.int64)})
        part = pd.DataFrame({"a": a, "b": b}).groupby(
            ["a", "b"], sort=False).size().reset_index(name="n_bands")
        part["n_bands"] = part["n_bands"].astype(np.int64)
        return part

    partials = bands.groupby("__bucket").map_groups(
        emit_bucket, batch_format="pandas")
    if not combine:
        # per-bucket partials: a pair co-occurring in bands of different
        # buckets appears once per bucket (callers that only need the
        # candidate SET — e.g. the verifier — dedupe distributedly and
        # save this exchange)
        return partials

    return combine_pair_partials(partials, {"n_bands": "sum"})


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


def candidate_feature_ds(ds, cand_ids_ref, feature: str = "shingles",
                         id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc feature sets for candidate docs only, computed where the
    text lives. ``cand_ids_ref`` is a broadcast (ray.put) sorted int64
    array of the LSH-candidate ids — the genuinely small side. The doc
    stream is filtered by searchsorted membership; only the *feature
    arrays* of candidate docs (never text) leave the map stage.

    feature: 'shingles' (word-3-shingle 32-bit hashes — MinHash-exact
    Jaccard) or 'char_ngram' (hashed char-3-gram indices).

    Task-based (not an actor pool): the per-batch ``ray.get`` of the
    broadcast id array is a zero-copy plasma read cached per NODE, so
    broadcast-once still holds on a cluster, and the stage skips actor
    startup — measured 2.5x faster than a 12-actor pool on this scan
    (the pool spent longer starting than scanning).
    """
    import ray

    feat_fn = (shingle_hashes if feature == "shingles"
               else _char_ngram_indices)

    def features(batch) -> "pd.DataFrame":
        import pyarrow as pa

        keep = ray.get(cand_ids_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keep, ids)
        pos = np.minimum(pos, max(len(keep) - 1, 0))
        sel = (keep[pos] == ids) if len(keep) else \
            np.zeros(len(ids), dtype=bool)
        texts = batch[text_col].take(
            pa.array(np.flatnonzero(sel))).to_pylist()
        # serialize each sorted-unique feature set to LE-uint32 bytes
        # (both feature kinds are < 2^32: shingle hashes keep the top
        # 32 bits, char-ngram indices are < 2^16) — HALF the bytes of
        # the former uint64 form through the two feature-carrying
        # exchanges, identical values; a binary Arrow column travels
        # the shuffle zero-copy, where a ragged ndarray column would
        # trip the tensor-extension path
        return pa.table({
            id_col: pa.array(ids[sel]),
            "feat": pa.array([feat_fn(t).astype(np.uint32).tobytes()
                              for t in texts], pa.binary()),
        })

    return ds.map_batches(features, batch_format="pyarrow", num_cpus=0.5)


def distinct_pairs(cands, n_buckets: int | None = None):
    """Distributed distinct of an (a, b) pair Dataset: hash-bucket the
    pair key, per-bucket ``drop_duplicates`` (a pair's every occurrence
    lands in one bucket, so per-bucket dedup is global dedup). Extra
    columns are dropped; output is (a, b) int64. ``n_buckets=None``
    auto-sizes to the cluster (each bucket is one task over pairs/B
    rows — a data-blind constant pins parallelism AND heap)."""
    if n_buckets is None:
        from .hash_join import auto_buckets

        n_buckets = auto_buckets()

    def bucketed(t) -> "pd.DataFrame":
        import pyarrow as pa

        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "__cb": pa.array(_pair_bucket_col(a, b,
                                                           n_buckets))})

    return cands.map_batches(bucketed, batch_format="pyarrow") \
        .groupby("__cb").map_groups(
            lambda g: g.drop_duplicates(["a", "b"])[["a", "b"]],
            batch_format="pandas")


def _unique_id_partial(members, id_col: str, n_buckets: int):
    """Per-batch ``np.unique`` pre-shrink of an id column, bucketed by
    id hash — the map side of the distinct exchange, separated so ONE
    pass over the (possibly corpus-sized) member stream can feed both
    the routing sketch and the distinct groupby."""

    def batch_unique(t) -> "pd.DataFrame":
        import pyarrow as pa

        u = np.unique(t[id_col].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        return pa.table({id_col: pa.array(u),
                         "__ib": pa.array(u % np.int64(n_buckets))})

    return members.map_batches(batch_unique, batch_format="pyarrow")


def _distinct_from_partial(uniq_partial, id_col: str):
    """Finish the distinct: bucket groupby makes per-bucket unique
    global (every occurrence of an id lands in one bucket)."""
    return uniq_partial.groupby("__ib").map_groups(
        lambda g: g.drop_duplicates(id_col)[[id_col]],
        batch_format="pandas")


def distinct_member_ids_ds(members, id_col: str = "doc_id",
                           n_buckets: int | None = None):
    """Distributed distinct of one int64 id column -> Dataset of the
    globally-unique ids; NOTHING reaches the driver.
    ``n_buckets=None`` auto-sizes to the cluster."""
    if n_buckets is None:
        from .hash_join import auto_buckets

        n_buckets = auto_buckets()
    return _distinct_from_partial(
        _unique_id_partial(members, id_col, n_buckets), id_col)


def distinct_member_ids(members, id_col: str = "doc_id",
                        n_buckets: int | None = None) -> np.ndarray:
    """Driver-collected form of :func:`distinct_member_ids_ds` -> sorted
    numpy array. ONLY the globally-unique id array is collected — never
    the pair list it came from (strictly smaller: ids <= 2 x pairs, and
    on dup-heavy corpora orders of magnitude smaller). Still
    O(#candidate docs) driver memory — callers at crawl scale use the
    Dataset variant + :func:`candidate_feature_semijoin`."""
    uniq = distinct_member_ids_ds(members, id_col, n_buckets).to_pandas()
    if len(uniq) == 0:
        return np.empty(0, dtype=np.int64)
    return np.sort(uniq[id_col].to_numpy().astype(np.int64))


def _approx_distinct_ids(members, id_col: str = "doc_id",
                         p: int = 12) -> float:
    """HyperLogLog estimate of the distinct-id count in ONE streaming
    map pass: per-batch 2^p-byte register blobs (sketch.hll_registers),
    elementwise-max merged on the driver (4 KB x n_batches — never the
    ids). Used only to pick the verify feature ROUTE, so ~1.6% error
    is irrelevant."""
    import pyarrow as pa

    from .sketch import hll_estimate, hll_registers

    def regs(t) -> "pa.Table":
        r = hll_registers(t[id_col].to_numpy(zero_copy_only=False)
                          .astype(np.int64), p)
        return pa.table({"reg": pa.array([r.tobytes()], pa.binary())})

    blobs = members.map_batches(regs, batch_format="pyarrow").to_pandas()
    if len(blobs) == 0:
        return 0.0
    merged = np.zeros(1 << p, dtype=np.uint8)
    for b in blobs["reg"]:
        np.maximum(merged, np.frombuffer(b, dtype=np.uint8), out=merged)
    return hll_estimate(merged)


def candidate_feature_semijoin(ds, ids_ds, feature: str = "shingles",
                               id_col: str = "doc_id",
                               text_col: str = "text",
                               n_buckets: int = 32):
    """Scale-path twin of :func:`candidate_feature_ds`: per-doc feature
    sets for candidate docs via a bucketed semi-join of the doc stream
    against the distinct-member-id *Dataset* — no driver-side id array
    at any point (the broadcast variant collects the distinct ids,
    O(#candidate docs) driver memory; on a boilerplate-heavy crawl LSH
    candidates cover a constant fraction of distinct docs, 1e9-1e10 ids
    at 100 TB).

    Shape: features are computed for EVERY doc in one vectorized pass
    where the text lives (text itself never moves), then the narrow
    (id, feat-bytes) rows inner-join the distinct-id Dataset in one
    bucketed exchange (:func:`~..stages.hash_join.hash_join`; inner
    join against a distinct left side IS a semi-join). Up-front
    featurization is the right trade exactly when this path is chosen:
    a large candidate fraction means little wasted feature work, and
    the exchange then moves sorted-unique uint32 feature bytes instead
    of raw text. Output schema identical to the broadcast variant:
    (id_col, feat binary)."""
    import pyarrow as pa

    from .hash_join import hash_join

    feat_fn = (shingle_hashes if feature == "shingles"
               else _char_ngram_indices)

    def features_all(batch) -> "pa.Table":
        # null text -> empty feature set (the broadcast path never
        # featurizes non-candidate rows, so a null there is invisible;
        # here every row is featurized)
        texts = batch[text_col].to_pylist()
        return pa.table({
            id_col: pa.array(batch[id_col].to_numpy(zero_copy_only=False)
                             .astype(np.int64)),
            "feat": pa.array([feat_fn(t if t is not None else "")
                              .astype(np.uint32).tobytes()
                              for t in texts], pa.binary()),
        })

    feats_all = ds.map_batches(features_all, batch_format="pyarrow",
                               num_cpus=0.5)
    return hash_join(ids_ds, feats_all, left_on=id_col, right_on=id_col,
                     left_cols=[id_col], right_cols=[id_col, "feat"],
                     n_buckets=n_buckets,
                     pad_types={"feat": pa.binary()})


#: above this many distinct candidate-member ids the verify path stops
#: broadcasting the id array (8M ids = a 64 MB driver allocation and a
#: per-node plasma copy) and routes features through the bucketed
#: semi-join instead — the driver then holds nothing O(data)
BROADCAST_ID_CAP = 8_000_000


def verify_pairs_distributed(cands, ds, id_col: str = "doc_id",
                             text_col: str = "text",
                             threshold: float = 0.5,
                             feature: str = "shingles",
                             n_buckets: int = 32,
                             id_route: str = "auto",
                             broadcast_id_cap: int = BROADCAST_ID_CAP):
    """Exact-Jaccard verification of LSH candidate pairs WITHOUT
    materialising the corpus — or the candidate pair list — on the
    driver.

    Exchange plan (the 100 TB shape):
    1. candidate pairs dedupe distributedly (:func:`distinct_pairs` —
       pair-hash bucket groupby) and explode Dataset-side to one row
       per (a, b, member); the pair list never reaches the driver (on a
       boilerplate-heavy crawl LSH candidates are O(corpus));
    2. the distinct member ids stay a *Dataset*
       (:func:`distinct_member_ids_ds`); ``id_route="auto"`` (default)
       estimates their count with a one-pass driver-merged HyperLogLog
       (:func:`_approx_distinct_ids` — no exchange, 4 KB per batch) and
       only when the estimate fits ``0.8 x broadcast_id_cap`` collects
       + ``ray.put``-broadcasts the array (the measured-fast
       small-candidate path). Above the cap — the crawl-scale regime —
       NOTHING id-sized touches the driver;
    3. features of candidate docs are computed inside the doc stream —
       text never moves — and meet the member rows in one bucketed hash
       join on doc id. Broadcast route: membership-filter then featurize
       (:func:`candidate_feature_ds`). Semi-join route: featurize the
       stream and semi-join the narrow (id, feat) rows against the id
       Dataset (:func:`candidate_feature_semijoin`);
    4. a second pair-key grouping reunites the two members and a
       vectorized set-intersection emits (a, b, jaccard). Duplicate
       (pair, member) rows — a dirty corpus carrying repeated doc_id
       rows — are dropped before the scan so a pair never compares a
       member against itself.

    Returns a Dataset (a, b, jaccard) filtered to >= threshold; values
    identical to the driver-side :func:`verify_pairs` (same feature
    functions, same single IEEE division).
    """
    import ray
    import ray.data as rd

    from .hash_join import hash_join

    if hasattr(cands, "to_numpy"):         # pandas compat (tests)
        cands = rd.from_pandas(cands)
    empty = pd.DataFrame({"a": pd.Series(dtype=np.int64),
                          "b": pd.Series(dtype=np.int64),
                          "jaccard": pd.Series(dtype=np.float64)})

    # one barrier for the raw candidate partials: both the pair-distinct
    # and the member-id distinct read them, and without pinning, the
    # whole LSH band scan would execute twice
    cands = cands.materialize()

    def member_rows(t) -> "pd.DataFrame":
        return pa.table({id_col: pa.array(np.concatenate([
            t["a"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["b"].to_numpy(zero_copy_only=False).astype(np.int64)]))})

    # member-id distinct off the RAW candidate rows (same distinct set
    # as off the deduped pairs — dedup only drops repeats), so the
    # feature scan starts without waiting on the pair-distinct exchange.
    # ONE pass over the candidate partials produces the pinned
    # per-batch-unique id rows (narrow int64 — strictly smaller than
    # the already-materialized cands); the routing sketch, the distinct
    # exchange and (on the broadcast route) the driver collect all
    # consume those pinned blocks — cands is never re-scanned.
    from .hash_join import auto_buckets

    member_ds = cands.map_batches(member_rows, batch_format="pyarrow")
    uniq_partial = _unique_id_partial(member_ds, id_col,
                                      auto_buckets()).materialize()
    if id_route == "auto":
        # route by a HyperLogLog estimate over the pinned partials —
        # no exchange, no extra scan (an exact pre-count cost a
        # measured ~3 s of fixed all-to-all overhead on the viral
        # stress); ~1.6% rel error at p=12, so an 0.8 safety factor on
        # the cap keeps the driver array comfortably bounded either way
        est = _approx_distinct_ids(uniq_partial, id_col)
        id_route = ("broadcast" if est <= 0.8 * broadcast_id_cap
                    else "semijoin")
    ids_ds = _distinct_from_partial(uniq_partial, id_col)
    if id_route == "broadcast":
        uniq = ids_ds.to_pandas()
        ids = (np.sort(uniq[id_col].to_numpy().astype(np.int64))
               if len(uniq) else np.empty(0, dtype=np.int64))
        ids_ref = ray.put(ids)
        feats = candidate_feature_ds(ds, ids_ref, feature, id_col,
                                     text_col)
    else:
        feats = candidate_feature_semijoin(ds, ids_ds, feature,
                                           id_col, text_col, n_buckets)

    # upfront pair-distinct: measured BETTER than folding the dedup
    # into the final groupby (143 s vs 65 s on the adversarial stress)
    # — the distinct exchange moves narrow int rows once and HALVES
    # both downstream streams (raw band partials repeat a pair up to
    # once per band-bucket)
    pairs = distinct_pairs(cands, n_buckets=max(n_buckets, 16)) \
        .materialize()                  # two consumers below

    from .hash_join import INT_FILL

    def pair_stream(t) -> "pa.Table":
        # union-schema P rows: one per pair, routed to its pair bucket
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(a)
        return pa.table({
            "kind": pa.array(np.zeros(n, np.int64)),
            "a": pa.array(a), "b": pa.array(b),
            "member": pa.array(np.full(n, INT_FILL)),
            "feat": pa.nulls(n, pa.binary()),
            "__pb": pa.array(_pair_bucket_col(a, b, n_buckets))})

    def member_stream(t) -> "pa.Table":
        # (member, pair-bucket) rows with PER-BATCH dedup: a member's
        # features will ship once per (member, bucket, source block)
        # instead of once per PAIR — on dup-heavy corpora the average
        # pair degree is the volume multiplier this removes (measured
        # 310x on the adversarial near-dup stress: 43.6M feature-
        # carrying join rows -> ~0.3M)
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        pb = _pair_bucket_col(a, b, n_buckets)
        mem = np.concatenate([a, b])
        mpb = np.concatenate([pb, pb])
        order = np.lexsort((mpb, mem))
        mem, mpb = mem[order], mpb[order]
        if len(mem):
            first = np.empty(len(mem), dtype=bool)
            first[0] = True
            first[1:] = (mem[1:] != mem[:-1]) | (mpb[1:] != mpb[:-1])
            mem, mpb = mem[first], mpb[first]
        return pa.table({"member": pa.array(mem), "__pb": pa.array(mpb)})

    mrows = pairs.map_batches(member_stream, batch_format="pyarrow")
    mfeat = hash_join(
        mrows, feats, left_on="member", right_on=id_col,
        left_cols=["member", "__pb"], right_cols=[id_col, "feat"],
        n_buckets=n_buckets, int_fill_cols=("member", "__pb"),
        pad_types={"feat": pa.binary()})

    def tag_members(t) -> "pa.Table":
        n = t.num_rows
        return pa.table({
            "kind": pa.array(np.ones(n, np.int64)),
            "a": pa.array(np.full(n, INT_FILL)),
            "b": pa.array(np.full(n, INT_FILL)),
            "member": t["member"].combine_chunks()
            if isinstance(t["member"], pa.ChunkedArray) else t["member"],
            "feat": t["feat"].combine_chunks()
            if isinstance(t["feat"], pa.ChunkedArray) else t["feat"],
            "__pb": t["__pb"].combine_chunks()
            if isinstance(t["__pb"], pa.ChunkedArray) else t["__pb"]})

    both = pairs.map_batches(pair_stream, batch_format="pyarrow").union(
        mfeat.map_batches(tag_members, batch_format="pyarrow"))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        p = g.loc[g["kind"] == 0]
        m = g.loc[g["kind"] == 1]
        if p.empty or m.empty:
            return empty
        # a dirty corpus with duplicate doc_id rows yields one feat row
        # per occurrence; keep the smallest feat BYTES per member so the
        # winner is layout-independent (shuffle arrival order must not
        # pick which of two conflicting texts represents an id)
        m = m.sort_values(["member", "feat"], kind="stable")              .drop_duplicates("member")
        mem = m["member"].to_numpy().astype(np.int64)   # sorted asc
        feats_m = m["feat"].to_numpy()
        lens = np.fromiter((len(f) >> 2 for f in feats_m), np.int64,
                           len(mem))
        offs = np.zeros(len(mem) + 1, dtype=np.int64)
        offs[1:] = np.cumsum(lens)
        flat = np.frombuffer(b"".join(feats_m), dtype=np.uint32)
        a = p["a"].to_numpy().astype(np.int64)
        b = p["b"].to_numpy().astype(np.int64)
        ia = np.searchsorted(mem, a)
        ib = np.searchsorted(mem, b)
        ia_c = np.minimum(ia, len(mem) - 1)
        ib_c = np.minimum(ib, len(mem) - 1)
        # both members must be present (a missing doc skips its pairs)
        ok = (mem[ia_c] == a) & (mem[ib_c] == b)
        ia, ib = ia_c[ok], ib_c[ok]
        a, b = a[ok], b[ok]
        if len(a) == 0:
            return empty
        # VECTORIZED exact jaccard: per pair, gather both members'
        # sorted-unique value arrays into one flat array tagged by pair
        # index; after a (pair, value) lexsort the intersection size is
        # the count of adjacent equal values within a pair (each value
        # is unique per member). Chunked to stay cache-friendly (the
        # per-pair python loop this replaces measured 294 s at 21.8M
        # candidates).
        CHUNK_VALS = 1 << 22
        out_frames = []
        i = 0
        n_pairs = len(a)
        pair_tot = lens[ia] + lens[ib]
        while i < n_pairs:
            j_end = i
            tot_vals = 0
            while j_end < n_pairs:
                t_p = int(pair_tot[j_end])
                if tot_vals and tot_vals + t_p > CHUNK_VALS:
                    break
                tot_vals += t_p
                j_end += 1
            sl = slice(i, j_end)
            nc = j_end - i
            la, lb = lens[ia[sl]], lens[ib[sl]]
            seg_lens = np.empty(2 * nc, dtype=np.int64)
            seg_lens[0::2] = la
            seg_lens[1::2] = lb
            seg_starts = np.empty(2 * nc, dtype=np.int64)
            seg_starts[0::2] = offs[ia[sl]]
            seg_starts[1::2] = offs[ib[sl]]
            cum = np.cumsum(seg_lens)
            total = int(cum[-1]) if nc else 0
            prev = np.concatenate([[0], cum[:-1]])
            idx = np.arange(total, dtype=np.int64)                 + np.repeat(seg_starts - prev, seg_lens)
            vals = flat[idx]
            pidx = np.repeat(np.repeat(np.arange(nc, dtype=np.int64), 2),
                             seg_lens)
            order = np.lexsort((vals, pidx))
            v_s = vals[order]
            p_s = pidx[order]
            eq = np.zeros(total, dtype=np.float64)
            if total > 1:
                eq[1:] = ((v_s[1:] == v_s[:-1])
                          & (p_s[1:] == p_s[:-1])).astype(np.float64)
            inter = np.bincount(pidx, weights=eq,
                                minlength=nc).astype(np.int64)
            union = (la + lb) - inter
            jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
            keep = jac >= threshold
            if keep.any():
                out_frames.append(pd.DataFrame({
                    "a": a[sl][keep], "b": b[sl][keep],
                    "jaccard": jac[keep]}))
            i = j_end
        if not out_frames:
            return empty
        return pd.concat(out_frames, ignore_index=True)

    return both.groupby("__pb").map_groups(per_bucket,
                                           batch_format="pandas")


# ---------------------------------------------------------------------------
# Character n-gram Jaccard (exact, vectorized)
# ---------------------------------------------------------------------------

_NGRAM_DIM = 1 << 16


def _char_ngram_indices(text: str, n: int = 3) -> np.ndarray:
    """Sorted-unique hashed char-n-gram indices of one document
    (int64 in [0, 2^16)) — the set representation shared by the
    presence-matrix kernel and the distributed per-pair verifier."""
    from ..sources.synth import splitmix64

    b = text.encode("utf-8")
    if len(b) < n:
        return np.empty(0, dtype=np.int64)
    grams = np.frombuffer(b, dtype=np.uint8)
    acc = np.zeros(len(b) - n + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(n):
            acc = acc * np.uint64(131) + grams[i: len(b) - n + 1 + i]
    idx = (splitmix64(acc) & np.uint64(_NGRAM_DIM - 1)).astype(np.int64)
    return np.unique(idx)


def _char_ngram_matrix(texts, n: int = 3) -> np.ndarray:
    """(n_docs, 2^16) float32 binary presence matrix of hashed char
    n-grams. Collisions under the 16-bit hash make the estimate a
    (slight, deterministic) approximation of true n-gram Jaccard;
    exactness vs raw sets is sampled in tests."""
    m = np.zeros((len(texts), _NGRAM_DIM), dtype=np.float32)
    for row, t in enumerate(texts):
        idx = _char_ngram_indices(t, n)
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
                         max_rounds: int = 64):
    """(a, b) edge list + node universe -> DataFrame(node, component),
    component = min node id of the component.

    Min-label propagation WITH pointer jumping (label = label[label]
    compressed to a fixpoint after every propagation round), so
    convergence takes O(log n) rounds even on a long chain — the plain
    one-hop variant needs O(diameter) rounds and silently split long
    chains under a fixed cap. The loop runs until a round makes no
    update; ``max_rounds`` is a safety limit that RAISES instead of
    returning partial components. Runs in numpy over the edge list
    (candidate near-dup graphs are the sparse OUTPUT of LSH blocking);
    the same rounds expressed with stages/hash_join.py + groupby(Min)
    run distributed when the graph outgrows one block.
    """
    nodes = np.asarray(nodes, dtype=np.int64)
    if len(pairs_df) == 0 or len(nodes) == 0:
        return pd.DataFrame({"node": nodes, "component": nodes})
    sort_nodes = np.sort(nodes)

    def index_of(vals: np.ndarray) -> np.ndarray:
        # membership-checked: an endpoint absent from ``nodes`` would
        # otherwise index out of range or silently alias to a wrong
        # node, corrupting components
        v = np.asarray(vals, dtype=np.int64)
        pos = np.minimum(np.searchsorted(sort_nodes, v),
                         len(sort_nodes) - 1)
        bad = sort_nodes[pos] != v
        if bad.any():
            raise ValueError(
                f"connected_components: {int(bad.sum())} edge endpoints "
                f"not in the node universe (e.g. {v[bad][:5].tolist()})")
        return pos

    a = index_of(pairs_df["a"].to_numpy())
    b = index_of(pairs_df["b"].to_numpy())
    eu = np.concatenate([a, b])
    ev = np.concatenate([b, a])
    lab = np.arange(len(sort_nodes), dtype=np.int64)
    for _ in range(max_rounds):
        new = lab.copy()
        np.minimum.at(new, eu, lab[ev])
        changed = not np.array_equal(new, lab)
        lab = new
        while True:                     # pointer jumping to fixpoint
            jump = np.minimum(lab, lab[lab])
            if np.array_equal(jump, lab):
                break
            lab = jump
        if not changed:
            break
    else:
        raise RuntimeError(
            f"connected_components: no convergence in {max_rounds} rounds")
    return pd.DataFrame({"node": sort_nodes, "component": sort_nodes[lab]})


def connected_components_distributed(pairs_ds, max_rounds: int = 64,
                                     n_buckets: int = 16):
    """Distributed min-label propagation over a Dataset edge list
    (a, b) -> Dataset(node, component). The scale path for candidate
    graphs that outgrow one block; verified equal to the in-memory
    :func:`connected_components` in tests.

    Per round: ONE bucketed join carries every (node, neighbor label)
    pair into a min-per-node group — SELF-EDGES planted at init make
    the node's own (previous) label ride the same join, so no second
    "own" stream or union is needed and the update count falls out of
    the same pass — then ONE label self-join performs a pointer jump
    (label <- min(label, label[label])), the same O(log n) convergence
    as the in-memory version's compression loop. The driver sees only
    per-round update counts, never the graph. Raises (not silently
    truncates) at ``max_rounds``.
    """
    from .hash_join import hash_join

    # cap block counts throughout: every all-to-all here costs
    # O(map_blocks x reduce_blocks) tiny objects, and letting blocks
    # accumulate across rounds measured ~40 s of pure scheduling on a
    # 25-edge graph. n_buckets blocks is the natural granularity.
    def explode_edges(batch: pa.Table) -> pa.Table:
        # declared-pyarrow throughout this loop: a pandas-DECLARED
        # stage fused into a shuffle/aggregate map phase pays ~10x
        # (BASELINE.md r3 measurement); pandas hops stay INSIDE the UDF
        df = batch.to_pandas()
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        # both directions + SELF-EDGES: the (u, u) rows carry each
        # node's own label through the neighbor join, so one join
        # replaces the join+own-union of the naive formulation
        out = pd.DataFrame({
            "u": np.concatenate([a, b, a, b]),
            "v": np.concatenate([b, a, a, b]),
        }).drop_duplicates()
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    edges = pairs_ds.map_batches(explode_edges, batch_format="pyarrow") \
        .repartition(n_buckets).materialize()

    if edges.count() == 0:
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame({
            "node": pd.Series(dtype=np.int64),
            "component": pd.Series(dtype=np.int64)}))

    def init_labels(t) -> "pd.DataFrame":
        u = np.unique(t["u"].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        return pa.table({"node": pa.array(u), "component": pa.array(u),
                         "__nb": pa.array(u % np.int64(n_buckets))})

    # per-bucket dedup is global dedup (a node lives in one bucket)
    def dedup_bucket(g: pd.DataFrame) -> pa.Table:
        out = g.drop_duplicates("node")[["node", "component"]]
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    labels = edges.map_batches(init_labels, batch_format="pyarrow") \
        .groupby("__nb").map_groups(dedup_bucket,
                                    batch_format="pandas").materialize()

    for _ in range(max_rounds):
        nbr = hash_join(edges, labels, left_on="v", right_on="node",
                        left_cols=["u", "v"],
                        right_cols=["node", "component"],
                        n_buckets=n_buckets,
                        int_fill_cols=("u", "v", "node", "component")) \
            .map_batches(lambda t: pa.table(
                {"node": pa.array(t["u"].to_numpy(zero_copy_only=False)
                                  .astype(np.int64)),
                 "cand": pa.array(t["component"]
                                  .to_numpy(zero_copy_only=False)
                                  .astype(np.int64)),
                 "own": pa.array(
                     (t["u"].to_numpy(zero_copy_only=False)
                      == t["v"].to_numpy(zero_copy_only=False))
                     .astype(np.int64)),
                 "__nb": pa.array(t["u"].to_numpy(zero_copy_only=False)
                                  .astype(np.int64)
                                  % np.int64(n_buckets))}),
                batch_format="pyarrow")

        def min_per_bucket(g: pd.DataFrame) -> pa.Table:
            # vectorized min-per-node within one node bucket (grouping
            # per NODE would invoke python once per node — per-row work)
            agg = g.groupby("node", sort=False).agg(
                component=("cand", "min")).reset_index()
            # self-edges dedupe only per source batch, so a node can
            # carry several identical own rows — collapse before merge
            old = g.loc[g["own"] == 1, ["node", "cand"]] \
                   .drop_duplicates("node") \
                   .rename(columns={"cand": "old"})
            out = agg.merge(old, on="node")
            return pa.Table.from_pandas(out, preserve_index=False) \
                .replace_schema_metadata(None)

        prop = nbr.groupby("__nb").map_groups(min_per_bucket,
                                              batch_format="pandas") \
            .repartition(n_buckets).materialize()

        # pointer jump: label(node) <- min(label, label[label]).
        # every stage here fuses into hash_join's sort exchange or the
        # trailing sum aggregate -> declare pyarrow (see module rule)
        def to_jump_side(t: pa.Table) -> pa.Table:
            return pa.table({
                "jnode": t["node"].combine_chunks(),
                "jcomp": t["component"].combine_chunks()})

        jump_side = prop.map_batches(to_jump_side, batch_format="pyarrow")

        def apply_jump(t: pa.Table) -> pa.Table:
            comp = t["component"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            jc = t["jcomp"].to_numpy(zero_copy_only=False).astype(np.int64)
            old = t["old"].to_numpy(zero_copy_only=False).astype(np.int64)
            new = np.minimum(comp, jc)
            return pa.table({
                "node": pa.array(t["node"].to_numpy(zero_copy_only=False)
                                 .astype(np.int64)),
                "component": pa.array(new),
                "changed": pa.array((new < old).astype(np.int64))})

        jumped = hash_join(prop, jump_side, left_on="component",
                           right_on="jnode",
                           left_cols=["node", "component", "old"],
                           right_cols=["jnode", "jcomp"],
                           n_buckets=n_buckets,
                           int_fill_cols=("node", "component", "old",
                                          "jnode", "jcomp")) \
            .map_batches(apply_jump, batch_format="pyarrow").materialize()

        n_changed = jumped.sum("changed")
        labels = jumped.select_columns(["node", "component"]) \
            .repartition(n_buckets).materialize()
        if not n_changed:
            return labels
    raise RuntimeError(
        f"connected_components_distributed: no convergence in "
        f"{max_rounds} rounds")


def minhash_dedup_keep(ds, id_col: str = "doc_id", text_col: str = "text",
                       threshold: float = 0.5):
    """Full near-dup dedup: LSH candidates -> distributed exact-Jaccard
    verify -> connected components -> keep min id per component.

    Returns a *Dataset* (doc_id, component, keep) covering every
    document. The corpus never materialises on the driver: only the
    verified edge list (sparse LSH output) does; components of the
    candidate subgraph are computed there (converged label propagation,
    see :func:`connected_components`), broadcast as two sorted arrays,
    and the keep decision streams over the id column — a doc outside
    every candidate pair keeps itself.

    Exact duplicates are collapsed BEFORE the LSH quadratic (r4):
    candidate pairs form between distinct texts' representative ids
    only, and copies attach through :func:`exact_star_edges` —
    components provably identical to the uncollapsed graph, but a
    viral text's copies cost linear edges instead of 18k pairs per
    band (the measured 2.9e9-row spill at 960k docs / 192 copies).
    """
    import ray

    cands = candidate_pairs(ds, id_col, text_col, combine=False,
                            collapse_exact=True)
    verified = verify_pairs_distributed(
        cands, ds, id_col=id_col, text_col=text_col, threshold=threshold)
    exact_edges = exact_star_edges(ds, id_col=id_col, text_col=text_col)
    parts = []
    for frame in (verified.to_pandas(), exact_edges.to_pandas()):
        if len(frame):                 # empty Datasets come back col-less
            parts.append(frame[["a", "b"]])
    vdf = pd.concat(parts, ignore_index=True) if parts else \
        pd.DataFrame({"a": pd.Series(dtype=np.int64),
                      "b": pd.Series(dtype=np.int64)})
    if len(vdf):
        edge_nodes = np.unique(np.concatenate(
            [vdf["a"].to_numpy(), vdf["b"].to_numpy()])).astype(np.int64)
    else:
        edge_nodes = np.empty(0, dtype=np.int64)
    comp = connected_components(vdf, edge_nodes)
    labels_ref = ray.put((comp["node"].to_numpy(),
                          comp["component"].to_numpy()))

    class AssignComponent:
        def __init__(self, ref):
            self.keys, self.vals = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            ids = df[id_col].to_numpy().astype(np.int64)
            component = ids.copy()
            if len(self.keys):
                pos = np.minimum(np.searchsorted(self.keys, ids),
                                 len(self.keys) - 1)
                hit = self.keys[pos] == ids
                component[hit] = self.vals[pos[hit]]
            return pd.DataFrame({
                id_col: ids,
                "component": component,
                "keep": component == ids,
            })

    from ..util import clamp_concurrency

    return ds.select_columns([id_col]).map_batches(
        AssignComponent, fn_constructor_args=(labels_ref,),
        batch_format="pandas",
        concurrency=clamp_concurrency(4, 0.5), num_cpus=0.5)


def minhash_dedup_keep_distributed(ds, id_col: str = "doc_id",
                                   text_col: str = "text",
                                   threshold: float = 0.5,
                                   n_buckets: int = 16):
    """The no-driver-materialization variant of
    :func:`minhash_dedup_keep`: components come from
    :func:`connected_components_distributed` (bucketed label
    propagation) and the keep decision is a bucketed LEFT join of the
    id stream against the label Dataset — the driver never holds the
    edge list. The path to take when the verified-duplicate graph
    itself outgrows one block (e.g. boilerplate-heavy web corpora where
    duplicates are a large fraction of all pages). Verified equal to
    the broadcast variant in tests.

    Same exact-duplicate collapse as :func:`minhash_dedup_keep` (rep
    pairs + :func:`exact_star_edges`); here the composed edge list
    stays a Dataset end-to-end.
    """
    from .hash_join import hash_join

    cands = candidate_pairs(ds, id_col, text_col, combine=False,
                            collapse_exact=True)
    verified = verify_pairs_distributed(
        cands, ds, id_col=id_col, text_col=text_col, threshold=threshold)
    edges = verified.select_columns(["a", "b"]).union(
        exact_star_edges(ds, id_col=id_col, text_col=text_col))
    labels = connected_components_distributed(edges, n_buckets=n_buckets)

    joined = hash_join(ds.select_columns([id_col]), labels,
                       left_on=id_col, right_on="node",
                       left_cols=[id_col], right_cols=["node", "component"],
                       n_buckets=n_buckets, how="left",
                       int_fill_cols=(id_col, "node", "component"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy().astype(np.int64)
        comp = df["component"]          # nullable Int64: 64-bit exact
        miss = comp.isna().to_numpy()
        component = ids.copy()
        component[~miss] = comp[~miss].astype(np.int64).to_numpy()
        return pd.DataFrame({
            id_col: ids,
            "component": component,
            "keep": component == ids,
        })

    return joined.map_batches(finish, batch_format="pandas")


def keep_best_per_component(labels, ds, id_col: str = "doc_id",
                            quality_col: str = "n_chars",
                            n_buckets: int = 16):
    """Rules-based near-dup keep: within each duplicate COMPONENT keep
    the highest-``quality_col`` member (ties -> smallest id) — what
    production corpus dedup actually does (keep the longest / highest-
    quality copy, e.g. RefinedWeb §4.2 keeps one representative per
    cluster), instead of the min-id convention.

    ``labels``: Dataset(node, component) covering every doc in a dup
    component (the :func:`connected_components_distributed` output).
    Docs absent from ``labels`` keep themselves. Two bucketed
    exchanges: the id+quality stream LEFT-joins labels on id, then a
    component-keyed grouping picks each component's argmax with a
    vectorized sort + boundary mask. -> Dataset(id, component, quality,
    keep).
    """
    from .hash_join import hash_join

    joined = hash_join(ds.select_columns([id_col, quality_col]), labels,
                       left_on=id_col, right_on="node",
                       left_cols=[id_col, quality_col],
                       right_cols=["node", "component"],
                       n_buckets=n_buckets, how="left",
                       int_fill_cols=(id_col, quality_col, "node",
                                      "component"))

    def route(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ids = df[id_col].to_numpy().astype(np.int64)
        q = df[quality_col].to_numpy().astype(np.int64)
        comp = df["component"]
        miss = comp.isna().to_numpy()
        component = ids.copy()
        component[~miss] = comp[~miss].astype(np.int64).to_numpy()
        return pa.table({
            id_col: pa.array(ids),
            "component": pa.array(component),
            quality_col: pa.array(q),
            "__cb": pa.array(component % np.int64(n_buckets))})

    def pick(g: pd.DataFrame) -> pa.Table:
        ids = g[id_col].to_numpy(np.int64)
        comp = g["component"].to_numpy(np.int64)
        q = g[quality_col].to_numpy(np.int64)
        order = np.lexsort((ids, -q, comp))
        comp_s = comp[order]
        first = np.empty(len(comp_s), dtype=bool)
        if len(comp_s):
            first[0] = True
            first[1:] = comp_s[1:] != comp_s[:-1]
        keep = np.zeros(len(comp_s), dtype=bool)
        keep[order] = first
        return pa.table({
            id_col: pa.array(ids), "component": pa.array(comp),
            quality_col: pa.array(q), "keep": pa.array(keep)})

    return joined.map_batches(route, batch_format="pyarrow") \
        .groupby("__cb").map_groups(pick, batch_format="pandas")


def minhash_dedup_keep_best(ds, id_col: str = "doc_id",
                            text_col: str = "text",
                            quality_col: str = "n_chars",
                            threshold: float = 0.5,
                            n_buckets: int = 16):
    """Full near-dup dedup with a QUALITY keep rule: same collapsed
    LSH -> verify -> components machinery as
    :func:`minhash_dedup_keep_distributed`, but each component keeps
    its highest-quality member rather than its min id."""
    cands = candidate_pairs(ds, id_col, text_col, combine=False,
                            collapse_exact=True)
    verified = verify_pairs_distributed(
        cands, ds, id_col=id_col, text_col=text_col, threshold=threshold)
    edges = verified.select_columns(["a", "b"]).union(
        exact_star_edges(ds, id_col=id_col, text_col=text_col))
    labels = connected_components_distributed(edges, n_buckets=n_buckets)
    return keep_best_per_component(labels, ds, id_col=id_col,
                                   quality_col=quality_col,
                                   n_buckets=n_buckets)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(texts: pd.Series, token_hashes=None) -> np.ndarray:
    """64-bit SimHash over whitespace tokens (crc32 -> splitmix64 bits).

    Vectorized across the batch: all token hashes concatenate into one
    array; per-doc weighted bit sums come from ``np.add.reduceat`` over
    doc segments (summing per occurrence == count-weighting, so results
    match the textbook unique+counts formulation exactly).
    """
    from ..sources.synth import splitmix64

    n = len(texts)
    flat, segs = token_hashes if token_hashes is not None else \
        _batch_token_hashes(texts.tolist())
    if segs[-1] == 0:
        return np.zeros(n, dtype=np.uint64)
    h = splitmix64(flat)
    bit_idx = np.arange(64, dtype=np.uint64)
    lens = segs[1:] - segs[:-1]
    out = np.empty(n, dtype=np.uint64)
    # chunk at doc boundaries: the (tokens, 64) sign matrix over the
    # whole batch streams DRAM under task concurrency (the same
    # bandwidth wall _universal_min hit — 70x solo->concurrent there);
    # ~16k-token blocks keep the intermediate ~8 MB / cache-resident
    chunk_tokens = 1 << 14
    i = 0
    while i < n:
        j = i + 1
        while j < n and segs[j + 1] - segs[i] <= chunk_tokens:
            j += 1
        sl = h[segs[i]:segs[j]]
        if len(sl) == 0:                       # all-empty docs
            out[i:j] = np.uint64(0)
            i = j
            continue
        signs = (((sl[:, None] >> bit_idx[None, :]) & np.uint64(1))
                 .astype(np.int64) * 2 - 1)    # (t, 64)
        # empty docs degenerate to a stray element; zeroed below
        starts = np.minimum(segs[i:j] - segs[i], len(sl) - 1)
        sums = np.add.reduceat(signs, starts, axis=0)
        bits = (sums > 0).astype(np.uint64)
        out[i:j] = (bits << bit_idx[None, :]).sum(axis=1, dtype=np.uint64)
        i = j
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


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (unpackbits over the byte
    view — no per-element Python ``bin()``)."""
    x = np.ascontiguousarray(x, dtype=np.uint64)
    if len(x) == 0:
        return np.empty(0, dtype=np.int64)
    return np.unpackbits(x.view(np.uint8)).reshape(len(x), 64) \
        .sum(axis=1).astype(np.int64)


def _simhash_group_pairs(ids: np.ndarray, sigs: np.ndarray,
                         max_hamming: int, star_cap: int = 256,
                         chunk: int = 1024):
    """All (a, b, hamming<=max) pairs within one SimHash block group.

    Collapses to UNIQUE signatures first (a hot block is almost always
    many copies of the same signature): pairwise hamming runs over the
    u unique sigs in ``chunk``-row slabs (memory O(chunk*u), still
    exact), then qualifying sig pairs expand to member id cross
    products. Identical-signature clusters (hamming 0) larger than
    ``star_cap`` emit star pairs (min id <-> rest) instead of the
    quadratic all-pairs — component-preserving, same rationale as the
    LSH hot-bucket cap.
    """
    # duplicate id rows (dirty/replicated input) would otherwise emit
    # self-pairs (x, x) from the identical-signature cluster
    ids, first = np.unique(ids, return_index=True)
    sigs = sigs[first]
    uniq, inv = np.unique(sigs, return_inverse=True)
    members = [ids[inv == i] for i in range(len(uniq))]
    out_a, out_b, out_h = [], [], []

    # within-cluster pairs: hamming 0
    for m in members:
        if len(m) < 2:
            continue
        if len(m) <= star_cap:
            ii, jj = np.triu_indices(len(m), k=1)
            out_a.append(m[ii])
            out_b.append(m[jj])
        else:
            ii = np.repeat(m[0], len(m) - 1)
            out_a.append(ii)
            out_b.append(m[1:])
        out_h.append(np.zeros(len(out_a[-1]), dtype=np.int64))

    # cross-cluster pairs over unique signatures, chunked
    u = len(uniq)
    for s in range(0, u, chunk):
        e = min(s + chunk, u)
        x = uniq[s:e, None] ^ uniq[None, :]
        ham = popcount64(x.ravel()).reshape(e - s, u)
        r, c = np.nonzero(ham <= max_hamming)
        keep = (r + s) < c                      # upper triangle only
        for ri, ci in zip(r[keep], c[keep]):
            ma, mb = members[ri + s], members[ci]
            ga = np.repeat(ma, len(mb))
            gb = np.tile(mb, len(ma))
            lo = np.minimum(ga, gb)
            hi = np.maximum(ga, gb)
            out_a.append(lo)
            out_b.append(hi)
            out_h.append(np.full(len(lo), ham[ri, ci], dtype=np.int64))
    if not out_a:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    return (np.concatenate(out_a), np.concatenate(out_b),
            np.concatenate(out_h))


def simhash_pairs(ds, max_hamming: int = 3, id_col: str = "doc_id",
                  text_col: str = "text", n_buckets: int = 64):
    """Near-dup pairs by SimHash blocking + exact hamming verify.

    Same exchange shape as :func:`candidate_pairs`: block rows are
    hash-bucketed by (block_id, block_val) so each of the ~n_buckets
    ``map_groups`` calls handles many groups with the vectorized
    kernel; only groups with >= 2 members do pair work. Final (a, b)
    min-hamming dedupe is a keyed pair-hash combine
    (:func:`combine_pair_partials`) — scales with the pair set.
    """
    def block_rows_bucketed(b) -> "pd.DataFrame":
        out = simhash_blocks(b.to_pandas(), id_col, text_col)
        # declared-pyarrow: pandas-declared stages fused into the
        # shuffle map phase pay ~10x (exact_dedup docstring)
        return pa.table({
            "block_id": pa.array(out["block_id"].to_numpy()),
            "block_val": pa.array(out["block_val"].to_numpy()),
            id_col: pa.array(out[id_col].to_numpy()),
            "simhash": pa.array(out["simhash"].to_numpy()),
            "__bucket": pa.array(_bucket_of_u64(
                out["block_val"].to_numpy(), out["block_id"].to_numpy(),
                n_buckets))})

    blocks = ds.map_batches(block_rows_bucketed, batch_format="pyarrow")

    def emit_bucket(g: pd.DataFrame) -> pd.DataFrame:
        bid = g["block_id"].to_numpy()
        bval = g["block_val"].to_numpy()
        ids = g[id_col].to_numpy()
        sigs = g["simhash"].to_numpy().astype(np.uint64)
        order = np.lexsort((ids, bval, bid))
        bid, bval, ids, sigs = (bid[order], bval[order], ids[order],
                                sigs[order])
        n = len(ids)
        new = np.empty(n, dtype=bool)
        if n:
            new[0] = True
            new[1:] = (bid[1:] != bid[:-1]) | (bval[1:] != bval[:-1])
        starts = np.flatnonzero(new) if n else np.empty(0, np.int64)
        ends = np.append(starts[1:], n)
        out_a, out_b, out_h = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            a, b, h = _simhash_group_pairs(ids[s:e], sigs[s:e], max_hamming)
            if len(a):
                out_a.append(a)
                out_b.append(b)
                out_h.append(h)
        if not out_a:
            return pd.DataFrame({"a": np.empty(0, np.int64),
                                 "b": np.empty(0, np.int64),
                                 "hamming": np.empty(0, np.int64)})
        part = pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b),
                             "hamming": np.concatenate(out_h)})
        return part.groupby(["a", "b"], sort=False)["hamming"].min() \
                   .reset_index()

    partials = blocks.groupby("__bucket").map_groups(
        emit_bucket, batch_format="pandas")
    return combine_pair_partials(partials, {"hamming": "min"})
