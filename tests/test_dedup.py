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


def test_verify_pairs_distributed_matches_driver(ray_session, docs):
    """The shuffled verify path (feature arrays join pairs by doc id)
    must produce exactly the driver-side verify's pairs and values."""
    import ray.data as rd

    ds = rd.from_pandas(docs)
    cands = dedup.candidate_pairs(ds)
    got = dedup.verify_pairs_distributed(cands, ds, threshold=0.35) \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    texts = dict(zip(docs["doc_id"], docs["text"]))
    want = dedup.verify_pairs(cands.to_pandas(), texts, threshold=0.35) \
        .sort_values(["a", "b"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["a"].to_numpy() == want["a"].to_numpy()).all()
    assert (got["b"].to_numpy() == want["b"].to_numpy()).all()
    assert np.allclose(got["jaccard"], want["jaccard"], atol=0)


def test_verify_semijoin_route_equals_broadcast(ray_session, docs):
    """The crawl-scale feature route (bucketed semi-join of the doc
    stream against the distinct-member-id Dataset — zero driver-side id
    array) must emit exactly the broadcast route's pairs and values,
    for both feature kinds."""
    import ray.data as rd

    ds = rd.from_pandas(docs)
    cands = dedup.candidate_pairs(ds)
    for feature in ("shingles", "char_ngram"):
        kw = dict(threshold=0.35, feature=feature)
        want = dedup.verify_pairs_distributed(
            cands, ds, id_route="broadcast", **kw) \
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        got = dedup.verify_pairs_distributed(
            cands, ds, id_route="semijoin", **kw) \
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        assert len(got) == len(want)
        assert (got["a"].to_numpy() == want["a"].to_numpy()).all()
        assert (got["b"].to_numpy() == want["b"].to_numpy()).all()
        assert np.allclose(got["jaccard"], want["jaccard"], atol=0)
    # auto with a tiny cap takes the semi-join branch end-to-end
    got_auto = dedup.verify_pairs_distributed(
        cands, ds, threshold=0.35, broadcast_id_cap=0) \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    want_auto = dedup.verify_pairs_distributed(
        cands, ds, threshold=0.35) \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    assert got_auto.equals(want_auto)


def test_ngram_verify_distributed_exact_sets(ray_session, docs):
    """char_ngram feature through the distributed verify == exact set
    jaccard of hashed gram indices (precision 1 vs the brute kernel)."""
    import ray.data as rd

    ds = rd.from_pandas(docs)
    cands = dedup.candidate_pairs(ds)
    got = dedup.verify_pairs_distributed(
        cands, ds, threshold=0.5, feature="char_ngram").to_pandas()
    by_id = dict(zip(docs["doc_id"], docs["text"]))
    for a, b, j in got.itertuples(index=False):
        sa = dedup._char_ngram_indices(by_id[a])
        sb = dedup._char_ngram_indices(by_id[b])
        want = dedup.jaccard(sa.astype(np.uint64), sb.astype(np.uint64))
        assert abs(want - j) < 1e-12 and want >= 0.5


def test_connected_components_long_chain():
    """A 40-edge chain converges to one component (pointer jumping —
    one-hop propagation under a 16-round cap silently split this)."""
    n = 41
    pairs = pd.DataFrame({"a": np.arange(n - 1) + 100,
                          "b": np.arange(1, n) + 100})
    comp = dedup.connected_components(pairs, np.arange(n) + 100)
    assert (comp["component"] == 100).all()


def test_simhash_hot_block_star_cap(ray_session):
    """A viral duplicate (one text x 600 copies) must not emit the
    O(n^2) within-cluster pairs: star pairs keep every copy connected
    to the min id while bounding output."""
    import ray.data as rd

    base = "the same viral text repeated everywhere on the web ok"
    df = pd.DataFrame({
        "doc_id": np.arange(600, dtype=np.int64),
        "text": [base] * 600,
    })
    pairs = dedup.simhash_pairs(rd.from_pandas(df), max_hamming=3) \
        .to_pandas()
    # star: exactly n-1 pairs, all anchored at the min id, hamming 0
    assert len(pairs) == 599
    assert (pairs["a"] == 0).all()
    assert (pairs["hamming"] == 0).all()
    assert set(pairs["b"]) == set(range(1, 600))


def test_candidate_pairs_hot_group_star_cap(ray_session):
    """LSH hot band groups (every copy shares every band) emit star
    pairs above group_cap — components preserved, no quadratic pairs."""
    import ray.data as rd

    base = "another viral duplicate text spread across many mirrors yes"
    df = pd.DataFrame({
        "doc_id": np.arange(400, dtype=np.int64),
        "text": [base] * 400,
    })
    pairs = dedup.candidate_pairs(rd.from_pandas(df)).to_pandas()
    assert len(pairs) == 399
    assert (pairs["a"] == 0).all()
    # every band is the same hot group -> n_bands = LSH_BANDS per pair
    assert (pairs["n_bands"] == dedup.LSH_BANDS).all()


def test_popcount64_matches_python():
    rng = np.random.default_rng(7)
    x = rng.integers(0, 2**63, 1000, dtype=np.int64).astype(np.uint64)
    got = dedup.popcount64(x)
    want = np.asarray([bin(int(v)).count("1") for v in x])
    assert (got == want).all()


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


def test_connected_components_distributed_matches(ray_session):
    """The Dataset-native label propagation (bucketed joins + pointer
    jump) must produce the same components as the in-memory version on
    a graph with a long chain, branches, and singleton-free islands."""
    import ray.data as rd

    pairs = pd.DataFrame({
        "a": [0, 1, 2, 3, 4, 10, 11, 20, 30, 31, 32, 33, 34, 35],
        "b": [1, 2, 3, 4, 5, 11, 12, 21, 31, 32, 33, 34, 35, 36],
    }).astype(np.int64)
    nodes = np.unique(pairs[["a", "b"]].to_numpy())
    want = dedup.connected_components(pairs, nodes) \
        .sort_values("node").reset_index(drop=True)
    got = dedup.connected_components_distributed(rd.from_pandas(pairs)) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    assert (got["node"].to_numpy() == want["node"].to_numpy()).all()
    assert (got["component"].to_numpy() == want["component"].to_numpy()).all()


def test_minhash_keep_distributed_matches_broadcast(ray_session, docs):
    """minhash_dedup_keep_distributed (bucketed CC + left join) must
    produce the same (doc_id, component, keep) table as the
    broadcast-labels variant."""
    import ray.data as rd

    ds = rd.from_pandas(docs)
    a = dedup.minhash_dedup_keep(ds, threshold=0.35).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = dedup.minhash_dedup_keep_distributed(ds, threshold=0.35) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (a["doc_id"].to_numpy() == b["doc_id"].to_numpy()).all()
    assert (a["component"].to_numpy() == b["component"].to_numpy()).all()
    assert (a["keep"].to_numpy() == b["keep"].to_numpy()).all()


def test_hash_join_int_fill_exact_above_2_53(ray_session):
    """64-bit ids above 2^53 must survive the bucketed join exactly
    (float64 NA-fill promotion would corrupt the low bits)."""
    import ray.data as rd

    from socialmapper_ray.stages.hash_join import hash_join

    base = (1 << 60) + 1  # not representable in float64
    ids = np.array([base, base + 1, base + 2], dtype=np.int64)
    left = rd.from_pandas(pd.DataFrame({"k": ids}))
    right = rd.from_pandas(pd.DataFrame({"node": ids,
                                         "component": ids - 7}))
    out = hash_join(left, right, left_on="k", right_on="node",
                    left_cols=["k"], right_cols=["node", "component"],
                    n_buckets=4, how="left",
                    int_fill_cols=("k", "node", "component")).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert (out["k"].to_numpy() == ids).all()
    assert (out["component"].astype(np.int64).to_numpy() == ids - 7).all()
    # the right KEY column must also survive exactly (it promotes to
    # float64 if excluded from the Int64 cast)
    assert (out["node"].astype(np.int64).to_numpy() == ids).all()


def test_hash_join_auto_buckets_scale_with_cluster(ray_session):
    """The default bucket count is cluster-proportional (~2/CPU, floor
    16), never the old data-blind 16: on a >16-CPU cluster the default
    MUST exceed 16, and the default-bucketed join equals an explicit
    one."""
    import ray
    import ray.data as rd

    from socialmapper_ray.stages.hash_join import auto_buckets, hash_join

    cpus = int(ray.cluster_resources().get("CPU", 0))
    nb = auto_buckets()
    assert nb >= 16
    assert nb >= 2 * cpus
    if cpus > 16:
        assert nb > 16

    ids = np.arange(200, dtype=np.int64)
    left = rd.from_pandas(pd.DataFrame({"k": ids}))
    right = rd.from_pandas(pd.DataFrame({"node": ids, "val": ids * 3}))
    got = hash_join(left, right, left_on="k", right_on="node",
                    left_cols=["k"], right_cols=["node", "val"]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert (got["k"].to_numpy() == ids).all()
    assert (got["val"].to_numpy() == ids * 3).all()


def test_keep_distributed_ids_above_2_53(ray_session):
    """Full keep path with >2^53 doc ids: components and keep flags
    must be bit-exact (the 100 TB hash-id shape)."""
    import ray.data as rd

    base = 1 << 60
    docs = pd.DataFrame({
        "doc_id": np.array([base + 1, base + 2, base + 5], dtype=np.int64),
        "text": ["alpha beta gamma delta epsilon zeta"] * 2
                + ["completely different words entirely here now"],
    })
    out = dedup.minhash_dedup_keep_distributed(
        rd.from_pandas(docs), threshold=0.5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (out["doc_id"].to_numpy()
            == docs["doc_id"].to_numpy()).all()
    # the two identical docs share a component anchored at the min id
    assert out.loc[0, "component"] == base + 1
    assert out.loc[1, "component"] == base + 1
    assert bool(out.loc[0, "keep"]) and not bool(out.loc[1, "keep"])
    assert out.loc[2, "component"] == base + 5 and bool(out.loc[2, "keep"])


def test_verify_distributed_driver_collect_bounded(ray_session, monkeypatch):
    """The distributed verify path must never materialise the candidate
    PAIR list on the driver: with 40 texts x 60 copies the LSH pair set
    is ~40 * C(60,2) = 70k pairs but only 2,400 distinct doc ids. Every
    driver-side collection (to_pandas / take_all) during the run must be
    bounded by the id count, not the pair count."""
    import ray.data as rd
    from ray.data import Dataset

    texts = [f"unique document body number {i} with shared filler words "
             f"alpha beta gamma delta epsilon zeta eta theta" * 2
             for i in range(40)]
    n_copies = 60
    df = pd.DataFrame({
        "doc_id": np.arange(40 * n_copies, dtype=np.int64),
        "text": [texts[i % 40] for i in range(40 * n_copies)],
    })
    ds = rd.from_pandas(df)

    collected = []
    orig_to_pandas = Dataset.to_pandas

    def spy_to_pandas(self, *a, **k):
        out = orig_to_pandas(self, *a, **k)
        collected.append(len(out))
        return out

    monkeypatch.setattr(Dataset, "to_pandas", spy_to_pandas)
    cands = dedup.candidate_pairs(ds, combine=False, group_cap=1 << 30)
    verified = dedup.verify_pairs_distributed(cands, ds, threshold=0.9)
    got = orig_to_pandas(verified)
    n_pairs = len(got)
    assert n_pairs >= 40 * (n_copies * (n_copies - 1) // 2) * 9 // 10
    n_ids = df["doc_id"].nunique()
    # every driver collection inside the verify path is <= the distinct
    # id count (the broadcast side), never the O(pairs) edge list
    assert collected, "expected the distinct-id collection"
    assert max(collected) <= n_ids, (collected, n_ids, n_pairs)
    assert max(collected) * 10 < n_pairs


def test_connected_components_rejects_unknown_endpoints():
    pairs = pd.DataFrame({"a": [1, 2], "b": [2, 99]})
    with pytest.raises(ValueError, match="not in the node universe"):
        dedup.connected_components(pairs, np.asarray([1, 2, 3]))


def test_verify_distributed_dirty_duplicate_doc_ids(ray_session):
    """Duplicate doc_id rows in the corpus must not produce
    jaccard(a,a)=1 false duplicates (each pair sees exactly its two
    members once)."""
    import ray.data as rd

    df = pd.DataFrame({
        "doc_id": [1, 1, 2, 2, 3],
        "text": ["alpha beta gamma delta epsilon"] * 2
                + ["zeta eta theta iota kappa"] * 2
                + ["completely different words here now"],
    })
    ds = rd.from_pandas(df)
    cands = pd.DataFrame({"a": [1, 1], "b": [2, 3]})
    got = dedup.verify_pairs_distributed(cands, ds, threshold=0.99) \
        .to_pandas()
    # texts of 1 vs 2 and 1 vs 3 share nothing: no pair may survive
    assert len(got) == 0


def test_exact_star_edges_components_equal_direct_star(ray_session):
    """The salted star-of-stars must connect exactly the copies of each
    text (same components as a one-level star / all-pairs), with edge
    volume n_copies - n_texts."""
    import ray.data as rd

    texts = ["aa bb cc", "dd ee ff", "gg hh ii"]
    rows = []
    did = 0
    for t_i, t in enumerate(texts):
        for _ in range(t_i * 5 + 1):      # 1, 6, 11 copies
            rows.append({"doc_id": did, "text": t})
            did += 1
    df = pd.DataFrame(rows)
    edges = dedup.exact_star_edges(
        rd.from_pandas(df).repartition(4), salt_buckets=3) \
        .to_pandas()
    assert len(edges) == len(df) - len(texts)
    # components via the in-memory CC: every text's copies share one
    # component rooted at the min doc_id
    nodes = np.unique(np.concatenate([edges["a"], edges["b"],
                                      df["doc_id"].to_numpy()]))
    comp = dedup.connected_components(edges, nodes.astype(np.int64))
    lab = dict(zip(comp["node"], comp["component"]))
    for t in texts:
        ids = df.loc[df["text"] == t, "doc_id"].to_numpy()
        labs = {lab[i] for i in ids}
        assert labs == {ids.min()}


def test_collapse_paths_empty_and_singleton_inputs(ray_session):
    """The r4 collapse machinery must handle degenerate inputs: empty
    corpus, single doc, and all-unique corpus (no edges, all kept)."""
    import ray.data as rd

    empty = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.Series(dtype=np.int64),
        "text": pd.Series(dtype=object)}))
    assert dedup.exact_star_edges(empty).count() == 0

    one = rd.from_pandas(pd.DataFrame({"doc_id": [7], "text": ["solo"]}))
    assert dedup.exact_star_edges(one).count() == 0
    keep = dedup.minhash_dedup_keep(one).to_pandas()
    assert keep["keep"].tolist() == [True]

    uniq = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [f"totally distinct text number {i} with words" * (i + 1)
                 for i in range(6)]}))
    assert dedup.exact_star_edges(uniq).count() == 0
    keep = dedup.minhash_dedup_keep_distributed(uniq).to_pandas()
    assert keep["keep"].all() and len(keep) == 6


def test_keep_best_per_component_oracle(ray_session):
    """Quality-ruled keep must pick each component's longest member
    (ties -> min id) and keep every untouched doc — checked against an
    in-memory oracle built from the same verified edges."""
    import ray.data as rd

    sf = "/root/testdata/sf0.001"
    from socialmapper_ray.pipelines import textops as tp
    from socialmapper_ray.util import read_parquet_clean

    got = tp.dedup_keep_best_q(sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    docs = read_parquet_clean(f"{sf}/documents.parquet",
                              columns=["doc_id", "text", "n_chars"])
    cands = dedup.candidate_pairs(docs, combine=False,
                                  collapse_exact=True)
    edges = dedup.verify_pairs_distributed(
        cands, docs, threshold=0.35).to_pandas()
    nodes = np.unique(np.concatenate(
        [edges["a"].to_numpy(np.int64), edges["b"].to_numpy(np.int64)])) \
        if len(edges) else np.empty(0, np.int64)
    comp = dedup.connected_components(edges, nodes)
    lab = dict(zip(comp["node"], comp["component"]))
    ddf = docs.to_pandas()
    ddf["component"] = ddf["doc_id"].map(
        lambda i: lab.get(i, i)).astype(np.int64)
    want_keep = set()
    for _, g in ddf.groupby("component"):
        g = g.sort_values(["n_chars", "doc_id"],
                          ascending=[False, True], kind="stable")
        want_keep.add(int(g["doc_id"].iloc[0]))

    assert len(got) == len(ddf)
    assert set(got.loc[got["keep"], "doc_id"]) == want_keep
    # every component keeps exactly one member
    assert got.groupby("component")["keep"].sum().eq(1).all()
