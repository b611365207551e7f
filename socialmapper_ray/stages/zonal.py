"""Zonal aggregation + keyed dedup (reference A2/A8/U2).

- ``zonal_counts``: the product's headline number ("total X within the
  zone", reference README.md:19) as a grouped aggregate with partial
  pre-aggregation inside ``map_batches`` before the shuffle
  (SURVEY.md §7.3: shuffle key = zone_id, partial+final combine), so the
  all-to-all exchange moves one row per (zone, batch) instead of one
  row per joined pair.
- ``dedup_first``: exact keyed dedup with per-column first/min rules
  (reference export/preparation.py:143-187, rules export/base.py:66-83).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Count, Min


def _auto_buckets() -> int:
    """Cluster-proportional combine width: ~one bucket per CPU, so the
    final combine's parallelism grows with the cluster, never the data
    (partial rows per bucket stay ~n_batches x zones-per-batch / CPUs)."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(8, cpus)


def zonal_counts(join_ds, value_col: str | None = None,
                 zone_col: str = "zone_id", n_buckets: int | None = None):
    """(url, zone_id[, value]) pairs -> per-zone n_pois (+ value sum).

    Topology: per-batch partial aggregate (combiner) -> hash-partitioned
    keyed combine. The heavy join stream never shuffles; only partial
    rows (bounded by n_batches x zones-touched-per-batch) move, and they
    move in ONE keyed exchange: the partial stage routes each zone to
    ``route_hash64(zone) % n_buckets`` (vectorized — no per-key Python
    in the partial) and the combine is a per-bucket
    vectorized groupby-sum — every bucket holds COMPLETE zones, so no
    second level is needed and no stage is a single-task funnel (the
    previous ``repartition(1)`` final was exactly that: invisible at
    sf0.1, a 1e8-row single task at 100 TB). Measured cost of the keyed
    exchange vs the funnel at sf0.1/32cpus: +0.23 s min-of-4 interleaved
    — inside the box's own drift band.

    ``n_buckets=None`` auto-sizes to the cluster CPU count.
    """
    from ..util import route_hash64

    if n_buckets is None:
        n_buckets = _auto_buckets()
    nb = np.int64(n_buckets)

    def partial(batch: pa.Table) -> pa.Table:
        # declared-pyarrow (feeds the keyed exchange; a pandas-declared
        # stage fused into a shuffle map phase pays ~10x), pandas hop
        # inside for the grouped partial
        gb_cols = [zone_col]
        df = batch.select(gb_cols + ([value_col] if value_col else [])) \
                  .to_pandas()
        if value_col:
            g = df.groupby(zone_col, sort=False).agg(
                n=(value_col, "size"), v=(value_col, "sum")).reset_index()
        else:
            g = df.groupby(zone_col, sort=False).size() \
                  .reset_index(name="n")
        g["__zb"] = route_hash64(g[zone_col].to_numpy()) % nb
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    def combine_bucket(g: pd.DataFrame) -> pa.Table:
        # Arrow out with explicit types: a sort's empty reduce blocks
        # otherwise surface as schema-less pandas blocks and trip Ray's
        # per-bundle schema check at scale
        agg_cols = ["n", "v"] if value_col else ["n"]
        c = g.groupby(zone_col, sort=False)[agg_cols].sum().reset_index()
        cols = {zone_col: pa.array(c[zone_col]),
                "n_pois": pa.array(c["n"].to_numpy(dtype=np.int64))}
        if value_col:
            # dtype-preserving: the value column may be float
            cols[f"sum_{value_col}"] = pa.array(c["v"].to_numpy())
        return pa.table(cols)

    partials = join_ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("__zb").map_groups(combine_bucket,
                                               batch_format="pandas")


def dedup_first(ds, keys: list[str], min_cols: list[str] = (),
                first_cols: list[str] = ()):
    """groupby(keys) with min() for min_cols and deterministic first
    (ordered by the first min_col, else by keys) for first_cols."""
    aggs = [Count(alias_name="n_dupes")]
    for c in min_cols:
        aggs.append(Min(c, alias_name=c))
    if not first_cols:
        return ds.groupby(keys).aggregate(*aggs)

    sort_col = min_cols[0] if min_cols else None

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        if sort_col is not None:
            g = g.sort_values(sort_col, kind="stable")
        row = {k: [g[k].iloc[0]] for k in keys}
        for c in min_cols:
            row[c] = [g[c].min()]
        for c in first_cols:
            row[c] = [g[c].iloc[0]]
        row["n_dupes"] = [len(g)]
        return pd.DataFrame(row)

    return ds.groupby(keys).map_groups(per_group, batch_format="pandas")
