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
