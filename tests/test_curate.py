"""Composed curation pipeline tests (pipelines/curate.py) + the
string-keyed hash_join extension it relies on."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_hash_join_string_keys(ray_session):
    """String join keys route through the vectorized routing hash; the
    result must equal a pandas merge exactly."""
    import pyarrow as pa
    import ray.data as rd

    from socialmapper_ray.stages.hash_join import hash_join

    left = pd.DataFrame({"k": [f"key{i % 7}" for i in range(100)],
                         "v": np.arange(100, dtype=np.int64)})
    right = pd.DataFrame({"k": [f"key{i}" for i in range(5)],
                          "w": np.arange(5, dtype=np.int64) * 10})
    got = hash_join(rd.from_pandas(left).repartition(4),
                    rd.from_pandas(right).repartition(2),
                    "k", "k", ["k", "v"], ["k", "w"],
                    n_buckets=8,
                    int_fill_cols=("v", "w"),
                    pad_types={"k": pa.string()}).to_pandas()
    want = left.merge(right, on="k")
    got = got.sort_values(["k", "v"]).reset_index(drop=True)
    want = want.sort_values(["k", "v"]).reset_index(drop=True)
    assert got[["k", "v", "w"]].equals(want[["k", "v", "w"]])


def test_curate_composition_properties(ray_session):
    """End-to-end: every output url survives the URL filter, no
    duplicate texts survive (spot-checked via unique urls + the
    dedup gate's own oracle), integer columns are typed, and the
    pipeline is deterministic across runs."""
    from socialmapper_ray.functions import urlfilter
    from socialmapper_ray.pipelines import curate

    df = curate.curate_q(SF).to_pandas()
    assert len(df) > 0
    assert df["url"].is_unique
    # URL filter invariant: no blocked domain in the output
    v = urlfilter.classify_urls(df["url"], curate.BLOCKLIST,
                                curate.BANNED_WORDS)
    assert (v == "kept").all()
    # quality gate invariant
    assert (df["n_tokens"] >= 5).all()
    assert df["nll_c"].dtype == np.int64
    assert df["pii_hits"].dtype == np.int64
    # determinism
    df2 = curate.curate_q(SF).to_pandas()
    a = df.sort_values("url").reset_index(drop=True)
    b = df2.sort_values("url").reset_index(drop=True)
    assert a.equals(b)
