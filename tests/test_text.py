"""Text function tests: extraction byte-identity, token/quality parity
with DuckDB semantics, fingerprint/lang-id determinism."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from socialmapper_ray.functions import geoparse as gp
from socialmapper_ray.functions import text as tx
from socialmapper_ray.sources import synth

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def world():
    docs = pq.read_table(f"{SF}/documents.parquet")
    pages, truth = synth.build_pages(docs)
    return docs, pages.to_pandas(), truth.to_pandas()


def test_extraction_byte_identity(world):
    docs, pages, _ = world
    got = tx.extract_main_text(pages["html"])
    want = docs["text"].to_pandas()
    assert (got == want).all()
    # and is independent of row order / slicing (parallelism proxy)
    shuf = pages.sample(frac=1.0, random_state=3)
    got2 = tx.extract_main_text(shuf["html"])
    assert (got2.sort_index() == want).all()
    for piece in np.array_split(np.arange(len(pages)), 7):
        part = tx.extract_main_text(pages["html"].iloc[piece])
        assert (part == want.iloc[piece]).all()


def test_geoparse_matches_truth(world):
    _, pages, truth = world
    geo = gp.geoparse(pages["html"])
    has = truth["has_geo"]
    assert (geo["geo_kind"] == truth["geo_kind"]).all()
    # doubles bit-identical where geo exists
    assert np.array_equal(geo["lat"][has].to_numpy(),
                          truth["lat"][has].to_numpy())
    assert np.array_equal(geo["lon"][has].to_numpy(),
                          truth["lon"][has].to_numpy())
    assert (geo["name"][has] == truth["name"][has]).all()
    assert geo["lat"][~has].isna().all()


def test_token_count_matches_duckdb():
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    got = tx.token_count(docs["text"])
    con = duckdb.connect()
    con.register("docs", docs)
    want = con.execute(
        "SELECT len(regexp_split_to_array(trim(text), '\\s+')) FROM docs"
    ).df().iloc[:, 0]
    assert (got.to_numpy() == want.to_numpy()).all()


def test_quality_scaled_ratio_edges():
    s = pd.Series(["", "abc", "a1!", "    "])
    out = tx.alpha_ratio_scaled(s)
    assert out.tolist() == [0, 1000000, 333333, 0]
    assert tx.token_count(s).tolist() == [0, 1, 1, 0]


def test_fingerprint_and_langid_deterministic():
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas().head(100)
    f1 = tx.doc_fingerprint(docs["text"])
    f2 = tx.doc_fingerprint(docs["text"].sample(frac=1.0, random_state=1)
                            ).sort_index()
    assert (f1 == f2).all()
    l1 = tx.predict_lang(docs["text"])
    assert set(l1.unique()) <= {"en", "fr", "es", "de", "und"}


def test_fingerprint_batch_matches_scalar():
    """Batched fingerprint kernel vs the per-doc reference path —
    including empty, whitespace-only, and sub-shingle docs."""
    import numpy as np
    import pandas as pd

    from socialmapper_ray.functions import text as tx

    docs = pd.Series([
        "", "   ", "one", "two words", "three word doc",
        "a slightly longer document with several words in it",
        "one two three four five six seven eight nine ten",
        "repeated repeated repeated repeated",
    ])
    got = tx.doc_fingerprint(docs)
    want = np.asarray([tx.doc_fingerprint_scalar(t) for t in docs],
                      dtype=np.uint64)
    assert (got.to_numpy() == want).all()


def test_arrow_extract_kernels_match_pandas(world):
    """The Arrow hot-path kernels (extract_main_text_arrow /
    geoparse_arrow / validate_coords_arrow) are byte-identical to the
    pandas reference kernels over the full synthetic page world."""
    import pyarrow as pa

    _, pages, _ = world
    arr = pa.chunked_array([pa.array(pages["html"].tolist())])

    t_p = tx.extract_main_text(pages["html"])
    t_a = tx.extract_main_text_arrow(arr).to_pandas()
    assert t_p.tolist() == t_a.tolist()

    g_p = gp.geoparse(pages["html"])
    g_a = gp.geoparse_arrow(arr)
    assert g_p["lat"].fillna(-999).tolist() == \
        g_a["lat"].to_pandas().fillna(-999).tolist()
    assert g_p["lon"].fillna(-999).tolist() == \
        g_a["lon"].to_pandas().fillna(-999).tolist()
    assert g_p["name"].tolist() == g_a["name"].to_pandas().tolist()
    assert g_p["geo_kind"].tolist() == g_a["geo_kind"].to_pandas().tolist()

    v_p = gp.validate_coords(g_p["lat"], g_p["lon"])
    v_a = gp.validate_coords_arrow(g_a["lat"], g_a["lon"]).to_pandas()
    assert v_p.tolist() == v_a.tolist()


# ---------------------------------------------------------------------------
# PII scrub (functions/pii.py)
# ---------------------------------------------------------------------------

def test_pii_scrub_counts_and_redaction():
    from socialmapper_ray.functions import pii

    df = pd.DataFrame({"text": [
        "write to alice.b+spam@sub.example.co.uk or bob@x.io today",
        "server at 10.0.255.3 and 192.168.1.1, call +1 555 010 99",
        "no pii here at all",
        "",
    ]})
    out = pii.scrub_batch(df)
    assert out["n_email"].tolist() == [2, 0, 0, 0]
    assert out["n_ipv4"].tolist() == [0, 2, 0, 0]
    assert out["n_phone"].tolist() == [0, 1, 0, 0]
    assert out["redacted"].tolist() == [
        "write to <EMAIL> or <EMAIL> today",
        "server at <IP> and <IP>, call <PHONE>",
        "no pii here at all",
        "",
    ]


def test_pii_scrub_matches_duckdb_re2_on_adversarial_text():
    """The gate relies on Python re and DuckDB RE2 agreeing for these
    patterns — pin that on text designed to probe the edges (adjacent
    matches, dots around IPs, versions that look like IPs, emails with
    plus/percent, phone-like fragments)."""
    from socialmapper_ray.functions import pii

    texts = [
        "v1.2.3.4 release vs 1.2.3.4 the ip",
        "a@b.cd.e@f.gh",
        "x+1 555 010 99y and +12 123-456-7890 end",
        "dots...10.1.1.1...more",
        "u%a_b-c.d@host-name.travel!",
        "+1 555 010 99+1 555 010 98",
        "999.999.999.999 and 0.0.0.0",
    ]
    got = pii.scrub_batch(pd.DataFrame({"text": texts}))
    con = duckdb.connect()
    for i, t in enumerate(texts):
        for pat, tok, col in ((pii.EMAIL_RE, "<EMAIL>", "n_email"),
                              (pii.IPV4_RE, "<IP>", "n_ipv4"),
                              (pii.PHONE_RE, "<PHONE>", "n_phone")):
            n, = con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [t, pat]).fetchone()
            assert n == got[col].iloc[i], (t, col)
        want, = con.execute(
            "SELECT regexp_replace(regexp_replace(regexp_replace("
            "?, ?, '<EMAIL>', 'g'), ?, '<IP>', 'g'), ?, '<PHONE>', 'g')",
            [t, pii.EMAIL_RE, pii.IPV4_RE, pii.PHONE_RE]).fetchone()
        assert want == got["redacted"].iloc[i], t


def test_pii_scrub_dataset_stage(ray_session):
    import ray.data as rd

    from socialmapper_ray.functions import pii

    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2], "text": ["mail me: z@q.org", "nothing"]}))
    out = pii.pii_scrub(ds).to_pandas().sort_values("doc_id")
    assert out["redacted"].tolist() == ["mail me: <EMAIL>", "nothing"]
    assert out["n_email"].tolist() == [1, 0]


def test_url_filter_classify():
    from socialmapper_ray.functions import urlfilter

    urls = pd.Series([
        "https://src1.example.org/doc/1",        # exact blocklist hit
        "https://ads.src3.example.org/doc/2",    # subdomain hit
        "https://notsrc1.example.org/doc/3",     # NOT a subdomain (no dot)
        "https://ok.org/free-CASINO-night",      # word, case-insensitive
        "https://src1.example.org/casino",       # domain wins precedence
        "https://ok.org/doc/4",                  # kept
        "not-a-url",                             # no host -> word/kept path
    ])
    v = urlfilter.classify_urls(urls, ["src1.example.org",
                                       "src3.example.org"],
                                ["casino", "bonus"])
    assert v.tolist() == ["blocked_domain", "blocked_domain", "kept",
                          "blocked_word", "blocked_domain", "kept",
                          "kept"]


def test_url_filter_stage_keep_only(ray_session):
    import ray.data as rd

    from socialmapper_ray.functions import urlfilter

    ds = rd.from_pandas(pd.DataFrame({"url": [
        "https://bad.org/x", "https://good.org/y"]}))
    out = urlfilter.url_filter(ds, ["bad.org"], ["casino"],
                               keep_only=True).to_pandas()
    assert out["url"].tolist() == ["https://good.org/y"]
