"""Distributed k-means + SemDeDup (stages/cluster.py).

The rows-only queries' correctness story: layout-independence and
determinism of the distributed fit, agreement with an in-memory dual
oracle, and the SemDeDup keep-set invariants.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as papq
import pytest

SF = "/root/testdata/sf0.001"
EMB = f"{SF}/embeddings.parquet"


def _read(num_blocks: int):
    from socialmapper_ray.util import read_parquet_clean

    return lambda: read_parquet_clean(EMB, columns=["vec_id", "embedding"],
                                      override_num_blocks=num_blocks)


def _matrix():
    t = papq.read_table(EMB, columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    m = t["embedding"].combine_chunks().flatten().to_numpy() \
        .astype(np.float64).reshape(t.num_rows, -1)
    order = np.argsort(ids, kind="stable")
    return ids[order], m[order]


def _kmeans_inmemory(ids: np.ndarray, m: np.ndarray, k: int,
                     iters: int) -> np.ndarray:
    """Same semantics as kmeans_fit_distributed, single numpy process."""
    from socialmapper_ray.sources.synth import splitmix64
    from socialmapper_ray.stages.ann import _normalize

    h = splitmix64(ids.astype(np.uint64))
    seeds = m[np.argsort(h, kind="stable")[:k]]
    x = _normalize(m)
    c = _normalize(seeds)
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        sums = np.zeros_like(c)
        counts = np.zeros(k, dtype=np.int64)
        np.add.at(sums, assign, x)
        np.add.at(counts, assign, 1)
        empty = counts == 0
        sums[empty] = c[empty]
        c = _normalize(sums)
    return c


def test_kmeans_layout_independent(ray_session):
    from socialmapper_ray.stages import cluster as cl

    c1 = cl.kmeans_fit_distributed(_read(1), k=6, iters=4)
    c7 = cl.kmeans_fit_distributed(_read(7), k=6, iters=4)
    # same fixed pass count on any block layout; float fold order is
    # canonicalized, so only summation *grouping* can differ -> allclose
    assert np.allclose(c1, c7, atol=1e-9)
    # and the induced ASSIGNMENT (the actual output) must be identical
    a1 = cl.assign_clusters(_read(1)(), c1).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    a7 = cl.assign_clusters(_read(7)(), c7).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert a1.equals(a7)


def test_kmeans_matches_inmemory_oracle(ray_session):
    from socialmapper_ray.stages import cluster as cl

    ids, m = _matrix()
    want = _kmeans_inmemory(ids, m, k=8, iters=5)
    got = cl.kmeans_fit_distributed(_read(4), k=8, iters=5)
    assert np.allclose(got, want, atol=1e-9)


def test_kmeans_repeat_identical(ray_session):
    from socialmapper_ray.stages import cluster as cl

    c1 = cl.kmeans_fit_distributed(_read(4), k=5, iters=3)
    c2 = cl.kmeans_fit_distributed(_read(4), k=5, iters=3)
    assert np.array_equal(c1, c2)


def test_semantic_dedup_matches_reference(ray_session):
    from socialmapper_ray.stages import cluster as cl

    ids, m = _matrix()
    cents = cl.kmeans_fit_distributed(_read(4), k=6, iters=4)
    got = cl.semantic_dedup(_read(4)(), cents, threshold=0.3) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    from socialmapper_ray.stages.ann import _normalize

    clusters = np.argmax(_normalize(m) @ cents.T, axis=1)
    want = cl.semantic_dedup_reference(ids, m, clusters, threshold=0.3)
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)
    assert (~got["keep"]).sum() > 0, "threshold should prune something"


def test_semantic_dedup_invariants(ray_session):
    from socialmapper_ray.stages import cluster as cl
    from socialmapper_ray.stages.ann import _normalize

    ids, m = _matrix()
    cents = cl.kmeans_fit_distributed(_read(4), k=6, iters=4)
    out = cl.semantic_dedup(_read(4)(), cents, threshold=0.3).to_pandas()
    x = _normalize(m)
    by_id = {int(i): x[j] for j, i in enumerate(ids)}
    for cluster_id, g in out.groupby("cluster"):
        g = g.sort_values("vec_id")
        kept = [by_id[int(v)] for v in g.loc[g["keep"], "vec_id"]]
        # kept set is pairwise below threshold
        if len(kept) > 1:
            km = np.asarray(kept)
            s = km @ km.T
            np.fill_diagonal(s, -1)
            assert s.max() < 0.3
        # every dropped vec has a kept lower-id witness at >= threshold
        for _, row in g[~g["keep"]].iterrows():
            v = by_id[int(row["vec_id"])]
            wit = [w for kid, w in zip(g.loc[g["keep"], "vec_id"], kept)
                   if kid < row["vec_id"]]
            assert wit and max(float(w @ v) for w in wit) >= 0.3


def test_semantic_dedup_max_cluster_raises(ray_session):
    import ray.data as rd

    from socialmapper_ray.stages import cluster as cl

    n, d = 40, 8
    rows = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([np.ones(d) / np.sqrt(d)] * n,
                              pa.list_(pa.float64())),
    })
    ds = rd.from_arrow(rows)
    cents = np.ones((1, d)) / np.sqrt(d)
    with pytest.raises(Exception, match="max_cluster"):
        cl.semantic_dedup(ds, cents, threshold=0.99,
                          max_cluster=10).to_pandas()


def test_doc_shingles_semantics():
    from socialmapper_ray.functions.text import doc_shingles

    assert doc_shingles("a b c d", 3) == ["a b c", "b c d"]
    assert doc_shingles("a a a a", 2) == ["a a"]          # distinct
    assert doc_shingles("a b", 3) == []                    # too short
    assert doc_shingles("  a  b   c ", 2) == ["a b", "b c"]  # ws collapse
    assert doc_shingles("", 2) == []


def test_kmeans_k_exceeds_rows(ray_session):
    """k > n must still fit: dead centroids stay at their seed."""
    import ray.data as rd

    from socialmapper_ray.stages import cluster as cl

    n, d = 3, 4
    t = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([np.eye(d)[i % d] for i in range(n)],
                              pa.list_(pa.float64()))})
    cents = cl.kmeans_fit_distributed(lambda: rd.from_arrow(t),
                                      k=5, iters=2)
    assert cents.shape == (3, d)   # clamped to the row count
    # assignment still covers every row
    out = cl.assign_clusters(rd.from_arrow(t), cents).to_pandas()
    assert len(out) == n


def test_dup_shingles_short_docs_excluded(ray_session):
    """Docs with < k tokens produce no shingles and no output row
    (mirrors the SQL's len(ts) >= k filter)."""
    import duckdb

    from socialmapper_ray.pipelines import textops as tp

    sf = "/root/testdata/sf0.001"
    out = tp.dup_shingles_q(sf).to_pandas()
    short = duckdb.sql(f"""
        SELECT count(*) FROM read_parquet('{sf}/documents.parquet')
        WHERE len(regexp_split_to_array(trim(text), '\\s+')) < 5
           OR trim(text) = ''""").fetchone()[0]
    total = duckdb.sql(f"""
        SELECT count(*) FROM
        read_parquet('{sf}/documents.parquet')""").fetchone()[0]
    assert len(out) == total - short


def test_embedding_stages_tolerate_empty_blocks(ray_session):
    """A filter that empties some blocks must not crash any embedding
    stage (reshape(0, -1) raised before the r3 guard)."""
    import ray.data as rd

    from socialmapper_ray.stages import cluster as cl
    from socialmapper_ray.stages.ann import PartialTopK, final_topk
    from socialmapper_ray.util import read_parquet_clean

    ds = read_parquet_clean(EMB, columns=["vec_id", "embedding"],
                            override_num_blocks=8) \
        .filter(expr="vec_id < 40")     # most blocks become empty
    cents = cl.kmeans_fit_distributed(
        lambda: read_parquet_clean(EMB, columns=["vec_id", "embedding"],
                                   override_num_blocks=8)
        .filter(expr="vec_id < 40"), k=3, iters=2)
    out = cl.assign_clusters(ds, cents).to_pandas()
    assert len(out) == 40
    sd = cl.semantic_dedup(ds, cents, threshold=0.3).to_pandas()
    assert len(sd) == 40
    import ray as _ray

    qref = _ray.put({"query_id": np.arange(2),
                     "matrix": np.eye(64)[:2]})
    partials = ds.map_batches(
        PartialTopK, fn_constructor_kwargs=dict(queries_ref=qref, k=5),
        batch_format="pyarrow", concurrency=2, num_cpus=0.5)
    top = final_topk(partials, 5).to_pandas()
    assert len(top) == 10


def test_kmeans_sample_fit_equals_full_fit_when_corpus_fits(ray_session):
    """Default (sample-capped) fit and full streaming-pass fit must
    agree when the corpus is below the cap — the sample IS the corpus,
    only float summation grouping differs."""
    from socialmapper_ray.stages import cluster as cl

    got_sample = cl.kmeans_fit_distributed(_read(4), k=6, iters=4)
    got_full = cl.kmeans_fit_distributed(_read(4), k=6, iters=4,
                                         fit_sample_cap=None)
    assert np.allclose(got_sample, got_full, atol=1e-9)


def test_kmeans_sample_fit_capped_is_deterministic(ray_session):
    """With a cap SMALLER than the corpus the fit must be
    layout-independent and repeat-identical (sample membership is a
    pure function of vec_id), and still produce unit-norm centroids."""
    from socialmapper_ray.stages import cluster as cl

    c1 = cl.kmeans_fit_distributed(_read(1), k=4, iters=3,
                                   fit_sample_cap=100)
    c7 = cl.kmeans_fit_distributed(_read(7), k=4, iters=3,
                                   fit_sample_cap=100)
    assert np.array_equal(c1, c7)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)
    # a capped fit differs from the full-corpus fit input-wise but the
    # assignment over the whole corpus still covers every row
    a = cl.assign_clusters(_read(4)(), c1).to_pandas()
    assert len(a) == 500 and a["cluster"].between(0, 3).all()


def test_dup_shingles_hash_key_equals_string_key(ray_session):
    """The default 64-bit-hash exchange key must produce output
    identical to the oracle-exact string-keyed mode (collisions at test
    scale are astronomically unlikely; this pins the plumbing)."""
    from socialmapper_ray.pipelines import textops as tp

    sf = "/root/testdata/sf0.01"
    hashed = tp.dup_shingles_q(sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exact = tp.dup_shingles_q(sf, oracle_exact=True).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert hashed.equals(exact)
