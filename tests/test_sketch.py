"""HyperLogLog sketch: estimator accuracy + mergeability."""

from __future__ import annotations

import numpy as np
import pandas as pd

from socialmapper_ray.stages import sketch


def test_hll_accuracy_across_cardinalities():
    """Relative error within ~4 standard errors (p=12 -> ~1.6% RSE)
    from the linear-counting range through the raw-estimator range."""
    rng = np.random.RandomState(5)
    for true_n in (50, 500, 5_000, 50_000, 300_000):
        vals = rng.randint(0, 1 << 62, size=true_n).astype(np.int64)
        vals = np.unique(vals)
        est = sketch.hll_estimate(sketch.hll_registers(vals))
        rel = abs(est - len(vals)) / len(vals)
        assert rel < 0.065, (true_n, est, rel)


def test_hll_merge_equals_single_pass():
    """Elementwise-max merge of shard sketches == sketch of the union
    (the property that makes the combine retry/tree-shape safe)."""
    rng = np.random.RandomState(6)
    vals = rng.randint(0, 1 << 62, size=30_000).astype(np.int64)
    whole = sketch.hll_registers(vals)
    parts = np.array_split(vals, 7)
    merged = np.zeros_like(whole)
    for part in parts:
        merged = np.maximum(merged, sketch.hll_registers(part))
    assert np.array_equal(whole, merged)


def test_hll_duplicates_do_not_inflate():
    vals = np.arange(1000, dtype=np.int64)
    once = sketch.hll_estimate(sketch.hll_registers(vals))
    dup = sketch.hll_estimate(sketch.hll_registers(np.tile(vals, 50)))
    assert once == dup


def test_approx_distinct_per_group_matches_exact(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        "g": np.repeat(["a", "b"], 20_000),
        "v": np.concatenate([rng.randint(0, 3_000, 20_000),
                             rng.randint(0, 15_000, 20_000)]).astype(np.int64),
    })
    out = sketch.approx_distinct_per_group(
        rd.from_pandas(df), "g", "v").to_pandas().set_index("g")
    exact = df.groupby("g")["v"].nunique()
    for g in ("a", "b"):
        rel = abs(out.loc[g, "approx_distinct"] - exact[g]) / exact[g]
        assert rel < 0.065, (g, out.loc[g, "approx_distinct"], exact[g])


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives():
    from socialmapper_ray.stages.sketch import bloom_bits, bloom_contains

    rng = np.random.default_rng(7)
    members = rng.integers(0, 1 << 63, 5000).astype(np.uint64)
    bits = bloom_bits(members)
    assert bloom_contains(bits, members).all()


def test_bloom_fpr_bounded():
    from socialmapper_ray.stages.sketch import (BLOOM_K, BLOOM_M_BITS,
                                                bloom_bits, bloom_contains)

    rng = np.random.default_rng(8)
    members = rng.integers(0, 1 << 63, 20_000).astype(np.uint64)
    others = rng.integers(0, 1 << 63, 50_000).astype(np.uint64)
    others = np.setdiff1d(others, members)
    bits = bloom_bits(members)
    fpr = bloom_contains(bits, others).mean()
    # theoretical (1 - e^(-kn/m))^k at n=20k, m=2^20, k=7 ~= 2.2e-6;
    # allow two orders of margin — the point is "vanishingly small"
    assert fpr < 1e-3, fpr


def test_bloom_merge_is_or():
    from socialmapper_ray.stages.sketch import bloom_bits

    rng = np.random.default_rng(9)
    a = rng.integers(0, 1 << 63, 1000).astype(np.uint64)
    b = rng.integers(0, 1 << 63, 1000).astype(np.uint64)
    merged = bloom_bits(np.concatenate([a, b]))
    assert np.array_equal(merged, bloom_bits(a) | bloom_bits(b))


def test_bloom_of_dataset_matches_single_shot(ray_session):
    import ray.data as rd

    from socialmapper_ray.stages.sketch import bloom_bits, bloom_of_dataset

    rng = np.random.default_rng(10)
    vals = rng.integers(0, 1 << 63, 4000).astype(np.uint64)
    df = pd.DataFrame({"v": vals.astype(np.int64)})
    ds = rd.from_pandas(df).repartition(13)
    got = bloom_of_dataset(ds, lambda d: d["v"].to_numpy().astype(np.uint64))
    assert np.array_equal(got, bloom_bits(vals))


def test_incremental_bloom_equals_plain(ray_session):
    from socialmapper_ray.pipelines import textops as tp

    sf = "/root/testdata/sf0.001"
    plain = tp.dedup_incremental_q(sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    bloom = tp.dedup_incremental_bloom_q(sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(plain, bloom)


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------

def test_cms_one_sided_and_exact_when_sparse():
    from socialmapper_ray.stages.sketch import cms_estimate, cms_table

    rng = np.random.default_rng(11)
    keys = rng.integers(0, 1 << 62, 3000).astype(np.uint64)
    keys = np.unique(keys)
    counts = rng.integers(1, 100, len(keys)).astype(np.int64)
    t = cms_table(keys, counts)
    est = cms_estimate(t, keys)
    assert (est >= counts).all()                 # never under-counts
    # 3k keys in 4 x 16384 counters: collisions are rare; the vast
    # majority of estimates are exact
    assert (est == counts).mean() > 0.95


def test_cms_merge_is_add():
    from socialmapper_ray.stages.sketch import cms_table

    rng = np.random.default_rng(12)
    ka = rng.integers(0, 1 << 62, 500).astype(np.uint64)
    kb = rng.integers(0, 1 << 62, 500).astype(np.uint64)
    ca = rng.integers(1, 10, 500).astype(np.int64)
    cb = rng.integers(1, 10, 500).astype(np.int64)
    merged = cms_table(np.concatenate([ka, kb]),
                       np.concatenate([ca, cb]))
    assert np.array_equal(merged, cms_table(ka, ca) + cms_table(kb, cb))


def test_top_tokens_cms_matches_exact(ray_session):
    import zlib  # noqa: F401  (parity with the query's hashing)

    from socialmapper_ray.pipelines import textops as tp

    sf = "/root/testdata/sf0.001"
    got = tp.top_tokens_cms_q(sf, topk=20).to_pandas()
    # exact counts straight from the parquet
    import duckdb

    exact = duckdb.sql(f"""
        WITH t AS (SELECT unnest(regexp_split_to_array(trim(text),
                   '\\s+')) AS token
                   FROM read_parquet('{sf}/documents.parquet')
                   WHERE trim(text) <> '')
        SELECT token, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY token
        ORDER BY n DESC, token ASC LIMIT 20""").df()
    assert list(got["token"]) == list(exact["token"])
    assert list(got["est_count"]) == list(exact["n"])


def test_hex_to_u64_matches_int_parse():
    import hashlib

    from socialmapper_ray.stages.sketch import hex_to_u64

    hashes = [hashlib.md5(f"doc{i}".encode()).hexdigest()
              for i in range(500)]
    got = hex_to_u64(hashes)
    want = np.asarray([int(h[:16], 16) for h in hashes], dtype=np.uint64)
    assert np.array_equal(got, want)
    assert len(hex_to_u64([])) == 0
