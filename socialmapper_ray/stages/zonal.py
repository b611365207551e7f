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

import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Count, Min


def zonal_counts(join_ds, value_col: str | None = None,
                 zone_col: str = "zone_id", final_blocks: int = 1):
    """(url, zone_id[, value]) pairs -> per-zone n_pois (+ value sum).

    Topology: per-batch partial aggregate (combiner) -> tree combine.
    The heavy join stream never shuffles; only partial rows (bounded by
    n_batches x n_zones) move. The final combine is a repartition +
    pandas groupby rather than Ray's Aggregate operator: zonal
    cardinality (~1e5 zones even nationally) is small enough that the
    all-to-all barrier costs more than it saves (measured ~6 s fixed on
    this workload). Raise ``final_blocks`` for a 2-level tree when
    partials outgrow one block.
    """
    def partial(batch: pa.Table) -> pa.Table:
        gb_cols = [zone_col]
        df = batch.select(gb_cols + ([value_col] if value_col else [])) \
                  .to_pandas()
        if value_col:
            g = df.groupby(zone_col, sort=False).agg(
                n=(value_col, "size"), v=(value_col, "sum")).reset_index()
            return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)
        g = df.groupby(zone_col, sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    def combine_raw(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(zone_col, sort=False).sum().reset_index()

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = {zone_col: df[zone_col], "n_pois": df["n"]}
        if value_col:
            out[f"sum_{value_col}"] = df["v"]
        return pd.DataFrame(out)

    partials = join_ds.map_batches(partial, batch_format="pyarrow")
    t = partials.repartition(final_blocks) \
        .map_batches(combine_raw, batch_format="pandas", batch_size=None)
    if final_blocks > 1:
        # repartition is round-robin, not hash: a zone can span blocks,
        # so the 2-level tree needs this second (tiny) combine level —
        # its input is <= final_blocks rows per zone
        t = t.repartition(1).map_batches(combine_raw,
                                         batch_format="pandas",
                                         batch_size=None)
    return t.map_batches(finish, batch_format="pandas", batch_size=None)


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
