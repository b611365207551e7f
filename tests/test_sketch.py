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
