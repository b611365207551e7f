"""Explicit partitioned hash join — the both-sides-large join.

The engine's other joins broadcast the small side (enrich, q3, J6).
When BOTH sides are large the portable Ray Data pattern (per the Ray
guide; ``Dataset.join`` exists in recent releases but this form makes
the shuffle explicit and versionable) is:

1. add ``bucket = hash(key) % B`` to both sides (one vectorized
   map_batches each) and pad each side to the union schema so the
   tagged sides can union without a shuffle,
2. ``groupby(bucket).map_groups``: inside each bucket split by tag and
   pandas-merge.

One all-to-all exchange total (the groupby), hash-partitioned on the
bucket — exactly the exchange a distributed hash join needs. B chosen
so a bucket's two sides fit a worker's heap; skew handling = salt hot
keys into sub-buckets before step 1 (same mechanism as
dedup.exact_dedup_salted).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _bucket_of(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    """Bucket id per key. Integer keys take the Fibonacci-multiply
    route; string (or any non-numeric) keys route through the
    vectorized fixed-key siphash (util.route_hash64 — ROUTING only,
    which is all a bucket id is): both sides of a join hash the same
    key identically, so co-location holds for any key dtype."""
    if getattr(keys, "dtype", None) is not None \
            and keys.dtype.kind in "iu":
        k = keys.astype(np.int64)
        return ((k * np.int64(0x9E3779B1)) % np.int64(2 ** 31)
                % np.int64(n_buckets)).astype(np.int64)
    from ..util import route_hash64

    return (route_hash64(keys) % np.int64(n_buckets)).astype(np.int64)


#: fill value for absent int columns — never read (join_bucket selects
#: side-specific columns), chosen so both sides' blocks stay plain int64
INT_FILL = np.int64(np.iinfo(np.int64).min)


def auto_buckets(floor: int = 16) -> int:
    """Cluster-proportional bucket count: ~2 buckets per CPU (never
    below ``floor``), so per-bucket merge parallelism — each bucket is
    ONE pandas-merge task over corpus/B rows — grows with the cluster
    instead of pinning at a data-blind constant. The heap bound is
    rows-based: a bucket's two sides must fit one worker's heap, so at
    fixed cluster size B must ALSO grow ~linearly with corpus rows —
    callers joining >> 1M rows/CPU should pass n_buckets explicitly
    (and salt hot keys into sub-buckets, cf. dedup.exact_dedup_salted,
    when one key exceeds a heap by itself)."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(floor, 2 * cpus)


def hash_join(left_ds, right_ds, left_on: str, right_on: str,
              left_cols: list[str], right_cols: list[str],
              n_buckets: int | None = None, how: str = "inner",
              int_fill_cols: tuple = (), pad_types: dict | None = None):
    """Partitioned hash join of two Datasets on int64 keys.

    left_cols / right_cols: the output columns contributed by each side
    (must be disjoint apart from the join keys). Returns the merged
    Dataset with columns left_cols + right_cols (minus right_on if it
    duplicates left_on).

    ``int_fill_cols``: int64 columns among the union schema — filled on
    the side that lacks them with an int64 SENTINEL instead of float64
    NaN, keeping both sides' block schemas identical plain int64. This
    matters beyond noise: a float64 NA-fill promotes the column across
    the whole exchange, silently corrupting 64-bit ids above 2^53 (the
    100 TB doc-id shape). For ``how="left"`` those columns arrive as
    pandas nullable Int64 in the output (pd.NA where unmatched) —
    exact at full 64-bit width.

    ``pad_types``: Arrow types for non-int pad columns (e.g.
    ``{"feat": pa.binary()}``); Arrow unions need the missing side's
    null column typed like the owning side (default float64).
    """
    import pyarrow as pa

    if n_buckets is None:
        n_buckets = auto_buckets()
    all_cols = list(dict.fromkeys(left_cols + right_cols))
    pad_types = pad_types or {}

    def prep(side: str, cols: list[str], key: str):
        def fn(batch: "pa.Table") -> "pa.Table":
            # declared-pyarrow in AND out: a pandas-DECLARED stage fused
            # into the shuffle's map phase pays ~10x (dedup.exact_dedup
            # notes); pads are typed Arrow nulls, never read downstream
            # (join_bucket selects side-specific columns)
            n = batch.num_rows
            arrs = {}
            for c in all_cols:
                if c in cols:
                    col = batch[c]
                    arrs[c] = col.combine_chunks() \
                        if isinstance(col, pa.ChunkedArray) else col
                elif c in int_fill_cols:
                    arrs[c] = pa.array(np.full(n, INT_FILL))
                else:
                    arrs[c] = pa.nulls(n, pad_types.get(c, pa.float64()))
            arrs["__bucket"] = pa.array(_bucket_of(
                batch[key].to_numpy(zero_copy_only=False), n_buckets))
            arrs["__side"] = pa.array([side] * n, pa.string())
            return pa.table(arrs)

        return fn

    lt = left_ds.map_batches(prep("l", left_cols, left_on),
                             batch_format="pyarrow")
    rt = right_ds.map_batches(prep("r", right_cols, right_on),
                              batch_format="pyarrow")
    both = lt.union(rt)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["__side"] == "l", left_cols]
        r = g.loc[g["__side"] == "r", right_cols]
        if how == "left" and int_fill_cols:
            # nullable Int64 keeps unmatched rows exact (a numpy int64
            # column would promote to float64 on merge, corrupting
            # 64-bit values); matched values round-trip losslessly
            r = r.astype({c: "Int64" for c in right_cols
                          if c in int_fill_cols})
        if l.empty or (r.empty and how == "inner"):
            # typed empty (dtypes from the actual sides): an untyped
            # object-dtype empty block makes Ray log a schema-mismatch
            # warning per bundle and fall into per-batch schema unify
            merged = l.iloc[0:0].merge(r.iloc[0:0], how="inner",
                                       left_on=left_on, right_on=right_on)
            return merged[[c for c in all_cols if c in merged.columns]]
        merged = l.merge(r, how=how, left_on=left_on, right_on=right_on)
        return merged[[c for c in all_cols if c in merged.columns]]

    return both.groupby("__bucket").map_groups(join_bucket,
                                               batch_format="pandas")
