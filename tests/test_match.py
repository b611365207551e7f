"""Single-pass multi-pattern matcher (decontamination kernel) —
exactness vs naive scan, unicode byte-boundary safety, 10^4-snippet
one-pass scaling, and the Ray decontaminate pipeline equivalence."""

from __future__ import annotations

import random
import time

import numpy as np
import pandas as pd

from socialmapper_ray.functions.match import SnippetMatcher

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "theta",
         "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi", "rho"]


def _mk_docs(n, seed=5):
    rng = random.Random(seed)
    docs = [" ".join(rng.choices(WORDS, k=rng.randint(20, 160)))
            for _ in range(n)]
    docs += ["héllo wörld ünïcode ┤" + " ".join(rng.choices(WORDS, k=25))
             for _ in range(max(2, n // 20))]
    return docs


def _naive(docs, snips):
    want = set()
    for sid, s in snips:
        if not s:
            continue
        for di, d in enumerate(docs):
            if s in d:
                want.add((di, sid))
    return want


def test_matcher_equals_naive_mixed_lengths():
    rng = random.Random(11)
    docs = _mk_docs(200)
    snips = []
    for i in range(250):
        d = rng.choice(docs)
        a = rng.randint(0, max(0, len(d) - 30))
        snips.append((i, d[a: a + rng.choice([6, 11, 23, 30])]))
    snips += [(900 + i, f"absent-{i}-zzz") for i in range(40)]
    snips.append((999, ""))                       # ignored, matches nothing
    # duplicate snippet strings under distinct ids both report
    snips.append((1000, snips[0][1]))
    rows, sids = SnippetMatcher(snips).find_in_batch(docs)
    assert set(zip(rows.tolist(), sids.tolist())) == _naive(docs, snips)


def test_matcher_unicode_and_empty_docs():
    docs = ["", "héllo wörld", "plain ascii", "wörld"]
    snips = [(1, "wörld"), (2, "ö"), (3, ""), (4, "missing")]
    rows, sids = SnippetMatcher(snips).find_in_batch(docs)
    assert set(zip(rows.tolist(), sids.tolist())) == \
        {(1, 1), (3, 1), (1, 2), (3, 2)}
    # all-empty batch
    r2, s2 = SnippetMatcher(snips).find_in_batch(["", ""])
    assert len(r2) == 0


def test_matcher_no_cross_document_matches():
    """A pattern equal to end-of-doc-A + start-of-doc-B must NOT match
    across the concatenation boundary."""
    docs = ["xxxAB", "CDyyy"]
    snips = [(1, "ABCD"), (2, "xxxA"), (3, "Dyyy")]
    rows, sids = SnippetMatcher(snips).find_in_batch(docs)
    assert set(zip(rows.tolist(), sids.tolist())) == {(0, 2), (1, 3)}


def test_matcher_one_pass_at_10k_snippets():
    """10^4 snippets cost one rolling-hash pass per distinct length
    (here: one), not 10^4 per-snippet scans — the whole batch finishes
    in well under a second of kernel time."""
    docs = _mk_docs(500, seed=3)
    snips = []
    for i in range(10_000):
        d = docs[i % len(docs)]
        a = (i * 13) % max(1, len(d) - 40)
        s = d[a: a + 40]
        if len(s) == 40:
            snips.append((i, s))
    m = SnippetMatcher(snips)
    t0 = time.time()
    rows, sids = m.find_in_batch(docs)
    dt = time.time() - t0
    assert len(rows) >= len(snips)        # every snippet hits its source
    assert dt < 30.0                      # generous vs minutes for K scans
    # exactness spot check on a 300-snippet random subset
    rng = random.Random(7)
    sub = rng.sample(snips, 300)
    got = {(r, s) for r, s in zip(rows.tolist(), sids.tolist())
           if s in {sid for sid, _ in sub}}
    assert got == _naive(docs, sub)


def test_decontaminate_query_matches_oracle(ray_session, tmp_path):
    """The Ray pipeline (broadcast matcher, actor pool) equals the
    DuckDB position oracle at sf0.001."""
    import duckdb

    from socialmapper_ray.pipelines import textops as tp

    sf = "/root/testdata/sf0.001"
    got = tp.decontaminate_q(sf).to_pandas() \
        .sort_values(["doc_id", "snip_id"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(tp.DECONTAMINATE_SQL).df() \
        .sort_values(["doc_id", "snip_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype(np.int64), want.astype(np.int64))


def test_many_distinct_lengths_cost_envelope():
    """~100 distinct snippet lengths must bucket into <= log2(max_len)
    scan passes (the pre-r4 per-length form did 100 passes), and the
    matcher must stay exact across mixed lengths."""
    import time

    rng = np.random.default_rng(11)
    # 100 snippets, lengths 8..107 — all distinct
    snips = []
    for i in range(100):
        ln = 8 + i
        s = "".join(chr(97 + c) for c in rng.integers(0, 26, ln))
        snips.append((i, s))
    m = SnippetMatcher(snips)
    # bucketed: lengths 8..107 span widths {8,16,32,64} only
    assert set(m.tables) <= {8, 16, 32, 64}
    assert len(m.tables) <= 4

    # plant snippets 3, 50, 99 into docs; add noise docs
    docs = ["xx " + snips[3][1] + " yy",
            snips[50][1],
            "aaa" + snips[99][1],
            "no match here at all"] + \
           ["".join(chr(97 + c) for c in rng.integers(0, 26, 200))
            for _ in range(50)]
    rows, sids = m.find_in_batch(docs)
    got = set(zip(rows.tolist(), sids.tolist()))
    assert {(0, 3), (1, 50), (2, 99)} <= got
    # exactness: brute-force oracle over every (doc, snippet)
    want = {(r, i) for r, d in enumerate(docs)
            for i, s in snips if s in d}
    assert got == want

    # cost envelope: scan time is flat in #distinct lengths — compare
    # 100-length set vs a single-length set of the same pattern count
    docs_big = ["".join(chr(97 + c) for c in rng.integers(0, 26, 2000))
                for _ in range(200)]
    one_len = [(i, "".join(chr(97 + c) for c in rng.integers(0, 26, 32)))
               for i in range(100)]
    m1 = SnippetMatcher(one_len)
    t0 = time.perf_counter(); m.find_in_batch(docs_big)
    t_many = time.perf_counter() - t0
    t0 = time.perf_counter(); m1.find_in_batch(docs_big)
    t_one = time.perf_counter() - t0
    # <= 4 passes vs 1 pass: allow generous headroom for noise, but a
    # per-length implementation (100 passes) cannot pass this bound
    assert t_many < 12 * max(t_one, 1e-3)
