"""Dedup suite tests: signature dual-implementations, LSH precision and
high-similarity recall, simhash blocking correctness."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from socialmapper_ray.stages import dedup

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    df = pq.read_table(f"{SF}/documents.parquet",
                       columns=["doc_id", "text"]).to_pandas()
    return df.head(200)


def test_minhash_batch_matches_scalar(docs):
    texts = docs["text"].head(30)
    batch = dedup.minhash_signatures_batch(texts)
    for i, t in enumerate(texts):
        sh = dedup.shingle_hashes(t)
        want = dedup.minhash_signature(sh)
        assert np.array_equal(batch[i], want), f"row {i}"


def test_minhash_estimates_jaccard(docs):
    a = "the quick brown fox jumps over the lazy dog again and again ok"
    b = "the quick brown fox jumps over the lazy cat again and again ok"
    sa = dedup.minhash_signature(dedup.shingle_hashes(a))
    sb = dedup.minhash_signature(dedup.shingle_hashes(b))
    est = (sa == sb).mean()
    true = dedup.jaccard(dedup.shingle_hashes(a), dedup.shingle_hashes(b))
    assert abs(est - true) < 0.25


def test_simhash_properties(docs):
    texts = docs["text"].head(50)
    s1 = dedup.simhash64(texts)
    s2 = dedup.simhash64(texts)
    assert np.array_equal(s1, s2)
    # identical text -> identical signature; different texts differ mostly
    assert len(np.unique(s1)) > 40


def test_simhash_blocking_complete(docs):
    """Any pair with hamming <= 3 must share one of the 4 16-bit blocks
    (pigeonhole) — verified on synthetic near-identical signatures."""
    base = np.uint64(0x0123456789ABCDEF)
    flip = base ^ np.uint64((1 << 5) | (1 << 40) | (1 << 63))  # hamming 3
    blocks_a = [(int(base) >> (16 * i)) & 0xFFFF for i in range(4)]
    blocks_b = [(int(flip) >> (16 * i)) & 0xFFFF for i in range(4)]
    assert any(a == b for a, b in zip(blocks_a, blocks_b))


def test_lsh_pairs_precision_and_recall(ray_session, docs):
    import ray.data as rd

    ds = rd.from_pandas(docs)
    cands = dedup.candidate_pairs(ds).to_pandas()
    texts = dict(zip(docs["doc_id"], docs["text"]))
    verified = dedup.verify_pairs(cands, texts, threshold=0.35)
    # precision 1: every output pair really has jaccard >= threshold
    for a, b, j in verified.itertuples(index=False):
        true = dedup.jaccard(dedup.shingle_hashes(texts[a]),
                             dedup.shingle_hashes(texts[b]))
        assert true >= 0.35 and abs(true - j) < 1e-12
    # recall at high similarity: brute-force all pairs with j >= 0.6
    ids = docs["doc_id"].tolist()
    sh = {i: dedup.shingle_hashes(texts[i]) for i in ids}
    want_high = set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            if dedup.jaccard(sh[ids[x]], sh[ids[y]]) >= 0.6:
                want_high.add((min(ids[x], ids[y]), max(ids[x], ids[y])))
    got = set(zip(verified["a"], verified["b"]))
    missed = want_high - got
    assert not missed, f"LSH missed high-sim pairs: {missed}"


def test_char_ngram_jaccard_matches_sets(docs):
    texts = docs["text"].head(60).tolist()
    ids = docs["doc_id"].head(60).to_numpy()
    out = dedup.char_ngram_jaccard_pairs(texts, ids, threshold=0.3)

    def true_j(a, b):
        sa = {a[i:i+3] for i in range(len(a)-2)}
        sb = {b[i:i+3] for i in range(len(b)-2)}
        return len(sa & sb) / len(sa | sb)

    by_id = dict(zip(ids, texts))
    # every reported pair is close to the raw-set jaccard (hash collisions
    # in the 2^16 gram space shift it only slightly)
    for a, b, j in out.itertuples(index=False):
        assert abs(true_j(by_id[a], by_id[b]) - j) < 0.03
    # no high-sim pair is missed
    for x in range(len(ids)):
        for y in range(x+1, len(ids)):
            if true_j(texts[x], texts[y]) >= 0.4:
                lo, hi = sorted((ids[x], ids[y]))
                assert ((out["a"] == lo) & (out["b"] == hi)).any()
