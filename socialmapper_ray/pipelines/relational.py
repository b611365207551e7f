"""Relational pipelines over the driver's TPC-H-ish tables.

These exercise the engine's generic wide operators — partial-aggregate
before shuffle, broadcast hash join, sort/limit top-k, sessionization —
with DuckDB-checkable semantics (SURVEY.md §7.1 step 4). Float outputs
are rounded at a precision far coarser than accumulated FP error so the
driver's value-hash is stable across summation orders (see
__ray_entry__ docstring).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd
from ray.data.aggregate import Count


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _read(sf_dir: str, table: str, columns: list[str]):
    """Column-pruned read, split into enough blocks to feed every CPU
    (driver test files are single-parquet; without override_num_blocks
    they arrive as one block and the pipeline serializes)."""
    from .flagship import _default_blocks

    from ..util import read_parquet_clean

    return read_parquet_clean(_p(sf_dir, table), columns=columns,
                              override_num_blocks=_default_blocks())


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 flavour: grouped sums over lineitem with a date filter.

    Partial per-batch combine before the groupby shuffle: the exchange
    moves one row per (group, batch), not one per lineitem row.
    """
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_shipdate"])

    cutoff = pa.scalar(pd.Timestamp("1998-09-02"), pa.timestamp("us"))

    # Money columns are decimal-quantized (2-dec prices, 2-dec discounts),
    # so float sums land exactly on rounding half-boundaries and numpy
    # (half-even) vs DuckDB (half-away) disagree. Scale to exact int64
    # before summing: cents (e2) for price, 1e-4 units (e4) for
    # discounted price. Integer sums are order-independent and exact.
    # Pure-Arrow partial: pc kernels + Table.group_by run zero-copy on
    # the object-store block — no per-batch pandas conversion.
    # pc.round defaults to half-even, the same tie rule as
    # numpy/pandas, so values are bit-identical to the pandas form.
    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        ext = t["l_extendedprice"]
        qty = pc.cast(pc.round(t["l_quantity"]), pa.int64())
        bp_e2 = pc.cast(pc.round(pc.multiply(ext, 100.0)), pa.int64())
        # same IEEE op order as the SQL: ext * (1 - disc), then * 1e4
        dp_e4 = pc.cast(pc.round(pc.multiply(
            pc.multiply(ext, pc.subtract(1.0, t["l_discount"])),
            10000.0)), pa.int64())
        g = pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "sq": qty, "sbp": bp_e2, "sdp": dp_e4,
            "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        }).group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("sq", "sum"), ("sbp", "sum"), ("sdp", "sum"), ("n", "sum")])
        return g.rename_columns(["l_returnflag", "l_linestatus",
                                 "sq", "sbp", "sdp", "n"])

    # tiny bounded key set (6 groups): 2-level round-robin tree combine
    # beats the Aggregate all-to-all barrier AND stays bounded in block
    # count (util.tree_combine; the final task sees width x 6 rows)
    from ..util import tree_combine

    agg = tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        lambda df: df.groupby(["l_returnflag", "l_linestatus"],
                              sort=False).sum().reset_index())

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_returnflag": df["l_returnflag"],
            "l_linestatus": df["l_linestatus"],
            "sum_qty": df["sq"].astype(np.int64),
            "sum_base_price_e2": df["sbp"].astype(np.int64),
            "sum_disc_price_e4": df["sdp"].astype(np.int64),
            "avg_qty_e6": np.floor(1e6 * df["sq"] / df["n"]).astype(np.int64),
            "count_order": df["n"].astype(np.int64),
        })

    return agg.map_batches(finish, batch_format="pandas")


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS sum_base_price_e2,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0)
                     AS BIGINT)) AS BIGINT) AS sum_disc_price_e4,
       CAST(floor(1e6 * SUM(CAST(round(l_quantity, 0) AS BIGINT))
                  / COUNT(*)) AS BIGINT) AS avg_qty_e6,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 flavour: pure filter + global sum (no groupby at all —
    partial sums tree-combine to one row). Predicates: shipdate year,
    discount band, quantity cap."""
    ds = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])
    lo = pd.Timestamp("1994-01-01")
    hi = pd.Timestamp("1995-01-01")

    lo_s = pa.scalar(lo, pa.timestamp("us"))
    hi_s = pa.scalar(hi, pa.timestamp("us"))

    # pure-Arrow partial (see q1): zero-copy filter + scaled-int sum
    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.greater_equal(t["l_shipdate"], lo_s),
                    pc.less(t["l_shipdate"], hi_s)),
            pc.and_(pc.and_(pc.greater_equal(t["l_discount"], 0.05),
                            pc.less_equal(t["l_discount"], 0.07)),
                    pc.less(t["l_quantity"], 24.0)))
        t = t.filter(m)
        rev = pc.cast(pc.round(pc.multiply(
            pc.multiply(t["l_extendedprice"], t["l_discount"]), 10000.0)),
            pa.int64())
        total = pc.sum(rev).as_py()
        return pa.table({"rev": pa.array([int(total or 0)], pa.int64()),
                         "n": pa.array([t.num_rows], pa.int64())})

    from ..util import tree_combine

    agg = tree_combine(ds.map_batches(partial, batch_format="pyarrow"),
                       lambda df: df.sum().to_frame().T)
    return agg.map_batches(
        lambda df: pd.DataFrame({
            "revenue_e4": df["rev"].astype(np.int64),
            "n_rows": df["n"].astype(np.int64)}),
        batch_format="pandas")


Q6_SQL = """
SELECT CAST(COALESCE(SUM(CAST(round(l_extendedprice * l_discount * 10000,
                                  0) AS BIGINT)), 0) AS BIGINT) AS revenue_e4,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01'
  AND l_shipdate <  TIMESTAMP '1995-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q3_top_orders(sf_dir: str, segment: str = "BUILDING",
                  cutoff: str = "1995-03-15", k: int = 10,
                  n_buckets: int = 16):
    """Segment top-k revenue orders with NO large-side materialisation.

    The only broadcast is the filtered customer KEY SET (a key array of
    one dimension segment — genuinely small; orders itself is a large
    fact table and never touches the driver). Orders and lineitem both
    stream: each side filters and partial-aggregates per batch, tags
    itself, and the two sides meet in ONE hash-bucketed exchange on
    orderkey (the stages/hash_join.py pattern, specialised here so the
    per-bucket group also finishes the aggregation and keeps only its
    local top-k — the global top-k is a subset of the union of bucket
    top-ks, so the final merge sees k * n_buckets rows, not every
    order).
    """
    cust = pq.read_table(_p(sf_dir, "customer"),
                         columns=["c_custkey", "c_mktsegment"])
    cust_keys = np.sort(
        cust.filter(pc.equal(cust["c_mktsegment"], segment))["c_custkey"]
        .to_numpy())
    keys_ref = ray.put(cust_keys)
    cut = pd.Timestamp(cutoff)

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    from ..stages.hash_join import _bucket_of

    def bucket_of(keys: np.ndarray) -> np.ndarray:
        return _bucket_of(keys, n_buckets)

    class FilterOrders:
        def __init__(self, ref):
            self.keys = ray.get(ref)

        def __call__(self, batch) -> "pd.DataFrame":
            # declared-pyarrow: a pandas-declared stage fused into the
            # shuffle map phase pays ~10x (dedup.exact_dedup notes)
            import pyarrow as pa

            df = batch.to_pandas()
            m = ((df["o_orderdate"] < cut)
                 & np.isin(df["o_custkey"].to_numpy(), self.keys))
            sub = df[m]
            okey = sub["o_orderkey"].to_numpy()
            return pa.table({
                "key": pa.array(okey),
                "o_orderdate": pa.array(sub["o_orderdate"]
                                        .to_numpy().astype("datetime64[us]")),
                "rev": pa.array(np.zeros(len(sub), dtype=np.int64)),
                "__bucket": pa.array(bucket_of(okey)),
                "__side": pa.array(["o"] * len(sub), pa.string()),
            })

    def li_partial(batch) -> "pd.DataFrame":
        import pyarrow as pa

        df = batch.to_pandas()
        df = df[df["l_shipdate"] > cut]
        # exact int64 1e-4 units (see q1 note on decimal quantization)
        rev = (df["l_extendedprice"] * (1 - df["l_discount"]) * 10000) \
            .round().astype(np.int64)
        part = pd.DataFrame({"key": df["l_orderkey"].to_numpy(),
                             "rev": rev.to_numpy()}) \
            .groupby("key", sort=False)["rev"].sum().reset_index()
        n = len(part)
        return pa.table({
            "key": pa.array(part["key"].to_numpy()),
            "o_orderdate": pa.nulls(n, pa.timestamp("us")),
            "rev": pa.array(part["rev"].to_numpy(dtype=np.int64)),
            "__bucket": pa.array(bucket_of(part["key"].to_numpy())),
            "__side": pa.array(["l"] * n, pa.string())})

    ot = orders.map_batches(FilterOrders, fn_constructor_args=(keys_ref,),
                            batch_format="pyarrow", concurrency=2,
                            num_cpus=0.5)
    lt = li.map_batches(li_partial, batch_format="pyarrow")

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["__side"] == "o"]
        l = g[g["__side"] == "l"]
        if o.empty or l.empty:
            return pd.DataFrame({
                "o_orderkey": pd.Series(dtype=np.int64),
                "revenue_e4": pd.Series(dtype=np.int64),
                "o_orderdate": pd.Series(dtype="datetime64[us]")})
        rev = l.groupby("key", sort=False)["rev"].sum()
        dates = o.set_index("key")["o_orderdate"]
        rev = rev[rev.index.isin(dates.index)]          # inner join
        out = pd.DataFrame({
            "o_orderkey": rev.index.to_numpy().astype(np.int64),
            "revenue_e4": rev.to_numpy().astype(np.int64),
            "o_orderdate": dates.reindex(rev.index).to_numpy(),
        })
        return out.sort_values(["revenue_e4", "o_orderkey"],
                               ascending=[False, True]).head(k)

    top = ot.union(lt).groupby("__bucket").map_groups(
        join_bucket, batch_format="pandas")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["revenue_e4", "o_orderkey"],
                            ascending=[False, True]).head(k)
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].astype(np.int64),
            "revenue_e4": df["revenue_e4"].astype(np.int64),
            "o_orderdate": df["o_orderdate"],
        }).reset_index(drop=True)

    return top.repartition(1).map_batches(finish, batch_format="pandas",
                                          batch_size=None)


Q3_SQL = """
SELECT l.l_orderkey AS o_orderkey,
       CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000, 0)
                     AS BIGINT)) AS BIGINT) AS revenue_e4,
       ANY_VALUE(o.o_orderdate) AS o_orderdate
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15'
  AND l.l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l.l_orderkey
ORDER BY revenue_e4 DESC, o_orderkey
LIMIT 10
"""


def events_hourly(sf_dir: str):
    """Tumbling-window aggregate (§2.9 guide: batch groupby on a
    truncated timestamp), partial-combined per batch."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    # pure-Arrow partial (see q1): floor_temporal == date_trunc('hour');
    # event values are 4-decimal quantized -> exact int64 e4 units
    def partial(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        v = pc.cast(pc.round(pc.multiply(t["value"], 10000.0)), pa.int64())
        g = pa.table({
            "event_type": t["event_type"], "hour": hour, "v": v,
            "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        }).group_by(["event_type", "hour"]).aggregate(
            [("n", "sum"), ("v", "sum")])
        g = g.rename_columns(["event_type", "hour", "n", "v"])
        # day-bucket key: window cardinality grows with the corpus's
        # time SPAN, so the final combine must be keyed (a
        # repartition(1) final's input would be windows x batches)
        day = pc.cast(pc.floor_temporal(g["hour"], unit="day"),
                      pa.int64())
        return g.append_column("__db", day)

    def combine_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop(columns="__db").groupby(
            ["event_type", "hour"], sort=False).sum().reset_index()

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("__db").map_groups(combine_bucket,
                                    batch_format="pandas")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"],
            "hour": df["hour"],
            "n_events": df["n"].astype(np.int64),
            "sum_value_e4": df["v"].astype(np.int64),
        })

    return agg.map_batches(finish, batch_format="pandas")


EVENTS_HOURLY_SQL = """
SELECT event_type, date_trunc('hour', ts) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * 10000, 0) AS BIGINT)) AS BIGINT)
         AS sum_value_e4
FROM events GROUP BY 1, 2
"""


def sessionize(sf_dir: str, gap_minutes: int = 30, n_buckets: int = 16):
    """Session windows per user (gap-based), §2.9 pattern.

    Exchange keyed on a USER-HASH BUCKET, not the user: grouping per
    user would invoke the python UDF once per user (per-tiny-group
    overhead, the candidate_pairs lesson); one bucket call sessionizes
    thousands of users with a single sort + vectorized boundary scan +
    one pandas groupby. Ordering: (user_id, ts) is unique, so session
    boundaries are deterministic.
    """
    from ..stages.hash_join import _bucket_of

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def add_bucket(t) -> "pd.DataFrame":
        import pyarrow as pa

        # pure-arrow, declared-pyarrow: pandas-declared stages fused
        # into the shuffle map phase pay ~10x (dedup.exact_dedup notes)
        return t.append_column("__ub", pa.array(_bucket_of(
            t["user_id"].to_numpy(zero_copy_only=False), n_buckets)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        uid = g["user_id"].to_numpy()
        n = len(g)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        new_sess = new_user | (g["ts"].diff() > gap).to_numpy()
        cs = np.cumsum(new_sess)                 # global session ordinal
        # restart numbering at 1 per user: subtract the count of
        # sessions that started before each user's segment
        seg = np.cumsum(new_user) - 1
        sess = (cs - (cs[new_user] - 1)[seg]).astype(np.int64)
        out = g.assign(session_id=sess) \
            .groupby(["user_id", "session_id"], sort=False).agg(
                n_events=("ts", "size"), session_start=("ts", "min"),
                session_end=("ts", "max")).reset_index()
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__ub").map_groups(per_bucket, batch_format="pandas")


SESSIONIZE_SQL = """
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM (
    SELECT user_id, ts,
           CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_sess
    FROM events))
GROUP BY user_id, session_id
"""


def top_events_by_value(sf_dir: str, k: int = 20):
    """Global sort desc + limit (O3 pattern), deterministic tiebreak."""
    ds = _read(sf_dir, "events", ["event_id", "value"])
    top = ds.sort(["value", "event_id"], descending=[True, False]).limit(k)
    return top.map_batches(
        lambda df: pd.DataFrame({"event_id": df["event_id"].astype(np.int64),
                                 "value": df["value"].round(6)}),
        batch_format="pandas")


TOP_EVENTS_SQL = """
SELECT event_id, ROUND(value, 6) AS value
FROM events ORDER BY value DESC, event_id LIMIT 20
"""


def top_events_per_type(sf_dir: str, k: int = 5):
    """Grouped top-k (top k events by value PER event_type) — the
    windowed O3 variant. Per-batch partial top-k per group (vectorized
    sort + groupby head) bounds the exchange to k rows per (group,
    batch); the tiny final combine re-ranks. Deterministic tiebreak on
    event_id, mirrored in the SQL window ORDER BY.
    """
    ds = _read(sf_dir, "events", ["event_type", "event_id", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["value", "event_id"],
                            ascending=[False, True], kind="stable")
        return df.groupby("event_type", sort=False).head(k)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        # idempotent grouped head — runs at both tree levels
        df = df.sort_values(["value", "event_id"],
                            ascending=[False, True], kind="stable")
        return df.groupby("event_type", sort=False).head(k) \
                 .reset_index(drop=True)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["value", "event_id"],
                            ascending=[False, True], kind="stable").copy()
        df["rank"] = df.groupby("event_type", sort=False).cumcount() + 1
        return pd.DataFrame({
            "event_type": df["event_type"],
            "rank": df["rank"].astype(np.int64),
            "event_id": df["event_id"].astype(np.int64),
            "value": df["value"].round(6),
        }).reset_index(drop=True)

    from ..util import tree_combine

    return tree_combine(ds.map_batches(partial, batch_format="pandas"),
                        combine) \
        .map_batches(finish, batch_format="pandas", batch_size=None)


TOP_EVENTS_PER_TYPE_SQL = """
SELECT event_type,
       CAST(row_number() OVER (PARTITION BY event_type
                               ORDER BY value DESC, event_id) AS BIGINT)
         AS rank,
       event_id, ROUND(value, 6) AS value
FROM events
QUALIFY rank <= 5
"""


def events_median_by_type(sf_dir: str):
    """EXACT distributed median per group without collecting values.

    Event values are 4-decimal quantized, so the distribution reduces
    losslessly to a histogram of int64 e4 keys: per-batch counts ->
    one small combine keyed by (group, value_e4) -> cumulative-count
    walk reads off the exact median. The exchange moves one row per
    distinct (group, value) per batch — never the event stream. (For
    unquantized data the scale path is a mergeable quantile sketch;
    for quantized data this IS exact.) Median is emitted doubled
    (``median_x2_e4``) so the even-count midpoint stays an integer.
    """
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(batch) -> "pa.Table":
        # declared-pyarrow: feeds the keyed exchange (module rule)
        import pyarrow as pa

        df = batch.to_pandas()
        df = df.assign(v=(df["value"] * 10000).round().astype(np.int64))
        g = df.groupby(["event_type", "v"], sort=False) \
              .size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    def med_group(g: pd.DataFrame) -> pd.DataFrame:
        # ONE group's histogram -> one row; groups combine in parallel
        # (the pre-r4 repartition(1) funneled every group's histogram —
        # cardinality tracks distinct e4 values — into a single task)
        et = g["event_type"].iloc[0]
        h = g.groupby("v", sort=True)["n"].sum()
        n = int(h.sum())
        c = h.cumsum().to_numpy()
        v = h.index.to_numpy()
        if n % 2:
            m2 = 2 * int(v[np.searchsorted(c, (n + 1) // 2)])
        else:
            m2 = int(v[np.searchsorted(c, n // 2)]) \
                + int(v[np.searchsorted(c, n // 2 + 1)])
        return pd.DataFrame({"event_type": [et], "n_events": [n],
                             "median_x2_e4": [m2]})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("event_type") \
        .map_groups(med_group, batch_format="pandas")


EVENTS_MEDIAN_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(round(median(CAST(round(value * 10000, 0) AS BIGINT)) * 2, 0)
            AS BIGINT) AS median_x2_e4
FROM events GROUP BY event_type
"""


def nation_rollup(sf_dir: str):
    """Two-hop broadcast join customer -> nation -> region + grouped agg
    (reference J6 neighbor-lookup flavour: tiny static dimension join)."""
    nation = pq.read_table(_p(sf_dir, "nation")).to_pandas()
    region = pq.read_table(_p(sf_dir, "region")).to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    dim_ref = ray.put(dim[["n_nationkey", "n_name", "r_name"]])

    ds = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    class JoinDim:
        def __init__(self, ref):
            self.dim = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = df.merge(self.dim, left_on="c_nationkey",
                         right_on="n_nationkey")
            m = m.assign(bal=(m["c_acctbal"] * 100).round().astype(np.int64))
            return m.groupby(["r_name", "n_name"], sort=False).agg(
                n=("bal", "size"), bal=("bal", "sum")).reset_index()

    from ..util import tree_combine

    agg = tree_combine(
        ds.map_batches(JoinDim, fn_constructor_args=(dim_ref,),
                       batch_format="pandas", concurrency=2,
                       num_cpus=0.5),
        lambda df: df.groupby(["r_name", "n_name"], sort=False).sum()
        .reset_index())

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "r_name": df["r_name"], "n_name": df["n_name"],
            "n_customers": df["n"].astype(np.int64),
            "sum_acctbal_e2": df["bal"].astype(np.int64),
        })

    return agg.map_batches(finish, batch_format="pandas")


NATION_ROLLUP_SQL = """
SELECT r.r_name, n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(round(c.c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
         AS sum_acctbal_e2
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
"""


def order_lineitem_join(sf_dir: str):
    """Both-sides-large partitioned hash join (orders x lineitem),
    aggregated per order priority. Neither side broadcasts: both are
    bucketed by orderkey hash and joined per bucket
    (stages/hash_join.py)."""
    from ..stages.hash_join import hash_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    import pyarrow as pa

    joined = hash_join(
        orders, li, left_on="o_orderkey", right_on="l_orderkey",
        left_cols=["o_orderkey", "o_orderpriority"],
        right_cols=["l_orderkey", "l_quantity"],
        pad_types={"o_orderpriority": pa.string()})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(q=df["l_quantity"].round().astype(np.int64))
        return df.groupby("o_orderpriority", sort=False).agg(
            n=("q", "size"), sq=("q", "sum")).reset_index()

    from ..util import tree_combine

    agg = tree_combine(
        joined.map_batches(partial, batch_format="pandas"),
        lambda df: df.groupby("o_orderpriority", sort=False).sum()
        .reset_index())
    return agg.map_batches(
        lambda df: pd.DataFrame({
            "o_orderpriority": df["o_orderpriority"],
            "n_lineitems": df["n"].astype(np.int64),
            "sum_qty": df["sq"].astype(np.int64)}),
        batch_format="pandas")


ORDER_LINEITEM_JOIN_SQL = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       CAST(SUM(CAST(round(l.l_quantity, 0) AS BIGINT)) AS BIGINT) AS sum_qty
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
"""


def order_lineitem_join_native(sf_dir: str):
    """Same join via Ray's native ``Dataset.join`` (hash-partitioned;
    available since recent Ray releases) — checked against the same SQL
    oracle as the explicit bucketed implementation."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    joined = orders.join(li, join_type="inner", num_partitions=16,
                         on=("o_orderkey",), right_on=("l_orderkey",))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(q=df["l_quantity"].round().astype(np.int64))
        return df.groupby("o_orderpriority", sort=False).agg(
            n=("q", "size"), sq=("q", "sum")).reset_index()

    from ..util import tree_combine

    agg = tree_combine(
        joined.map_batches(partial, batch_format="pandas"),
        lambda df: df.groupby("o_orderpriority", sort=False).sum()
        .reset_index())
    return agg.map_batches(
        lambda df: pd.DataFrame({
            "o_orderpriority": df["o_orderpriority"],
            "n_lineitems": df["n"].astype(np.int64),
            "sum_qty": df["sq"].astype(np.int64)}),
        batch_format="pandas")


def dedup_events_first(sf_dir: str):
    """A2 dedup-with-agg-rules (reference export/preparation.py:143-187:
    GROUP BY key, min for some columns, deterministic-first for others):
    per (user_id, event_type) keep the row with the smallest event_id,
    carrying its value, plus the duplicate count.

    Shape: per-batch partial (sort + drop_duplicates keeps each group's
    min-event_id row and counts rows) -> tree combine (same rule over
    partials, counts sum). The exchange moves one row per (group,
    batch), never the event stream.
    """
    ds = _read(sf_dir, "events",
               ["user_id", "event_type", "event_id", "value"])
    n_buckets = 32

    def partial(batch) -> "pa.Table":
        # declared-pyarrow: feeds the keyed exchange (module rule)
        import pyarrow as pa

        df = batch.to_pandas()
        cnt = df.groupby(["user_id", "event_type"], sort=False) \
                .size().reset_index(name="n")
        first = df.sort_values("event_id", kind="stable") \
                  .drop_duplicates(["user_id", "event_type"], keep="first")
        out = first.merge(cnt, on=["user_id", "event_type"])
        out["__ub"] = (out["user_id"].to_numpy(np.int64)
                       % np.int64(n_buckets))
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        # one user-hash bucket per call: a (user, type) group lives
        # wholly inside its bucket, so per-bucket combine is global —
        # the pre-r4 repartition(1) funneled one row per (group, batch),
        # unbounded in the user count, into a single task
        cnt = df.groupby(["user_id", "event_type"], sort=False)["n"] \
                .sum().reset_index()
        first = df.sort_values("event_id", kind="stable") \
                  .drop_duplicates(["user_id", "event_type"], keep="first") \
                  .drop(columns=["n", "__ub"])
        return first.merge(cnt, on=["user_id", "event_type"])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("__ub").map_groups(combine, batch_format="pandas")
    return agg.map_batches(
        lambda df: pd.DataFrame({
            "user_id": df["user_id"].astype(np.int64),
            "event_type": df["event_type"],
            "n_dupes": df["n"].astype(np.int64),
            "event_id": df["event_id"].astype(np.int64),
            "value_r": df["value"].round(6)}),
        batch_format="pandas")


DEDUP_EVENTS_FIRST_SQL = """
SELECT user_id, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_dupes,
       CAST(MIN(event_id) AS BIGINT) AS event_id,
       ROUND(arg_min(value, event_id), 6) AS value_r
FROM events GROUP BY user_id, event_type
"""


def union_all_docs(sf_dir: str):
    """U1 union/concat (reference pd.concat of per-county frames,
    block_group_service.py:140-144): two filtered views of documents
    unioned without a shuffle."""
    en = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"]) \
        .filter(expr="lang == 'en'")
    fr = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"]) \
        .filter(expr="lang == 'fr'")
    u = en.union(fr)
    return u.map_batches(
        lambda df: pd.DataFrame({
            "doc_id": df["doc_id"].astype(np.int64),
            "lang": df["lang"],
            "n_chars": df["n_chars"].astype(np.int64)}),
        batch_format="pandas")


UNION_ALL_SQL = """
SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'en'
UNION ALL
SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'fr'
"""


def events_sliding(sf_dir: str, window_min: int = 30, slide_min: int = 10):
    """Sliding-window counts per event type (window 30 min, slide 10):
    each event explodes to the windows covering it (flat-map) and a
    grouped count follows — the §2.9 window pattern without an
    event-time engine."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])
    n_win = window_min // slide_min

    def explode(batch) -> "pa.Table":
        # declared-pyarrow (fuses into the shuffle map phase)
        df = batch.to_pandas()
        base = df["ts"].dt.floor(f"{slide_min}min")
        parts = []
        for i in range(n_win):
            parts.append(pd.DataFrame({
                "event_type": df["event_type"],
                "window_start": base - pd.Timedelta(minutes=slide_min * i),
            }))
        out = pd.concat(parts, ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    def partial(batch) -> "pa.Table":
        # declared-pyarrow: feeds the keyed exchange (module rule)
        df = batch.to_pandas()
        g = df.groupby(["event_type", "window_start"], sort=False) \
              .size().reset_index(name="n")
        # day-bucket the combine: window cardinality grows with the
        # corpus time span, so the final must be keyed, not a
        # repartition(1) funnel (see events_hourly)
        g["__db"] = g["window_start"].dt.floor("D").astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    def combine_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop(columns="__db").groupby(
            ["event_type", "window_start"], sort=False).sum() \
            .reset_index()

    agg = ds.map_batches(explode, batch_format="pyarrow") \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("__db").map_groups(combine_bucket,
                                    batch_format="pandas")
    return agg.map_batches(
        lambda df: pd.DataFrame({
            "event_type": df["event_type"],
            "window_start": df["window_start"],
            "n_events": df["n"].astype(np.int64)}),
        batch_format="pandas")


EVENTS_SLIDING_SQL = """
SELECT event_type,
       make_timestamp(600000000 *
         (CAST(floor(epoch(ts) / 600) AS BIGINT) - u.w)) AS window_start,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events, (SELECT unnest([0, 1, 2]) AS w) u
GROUP BY 1, 2
"""


def lang_counts(sf_dir: str):
    """Distinct + count per lang (A7 sorted-distinct flavour)."""
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["lang"])
    agg = ds.groupby("lang").aggregate(Count(alias_name="n_docs"))
    return agg.map_batches(
        lambda df: df.assign(n_docs=df["n_docs"].astype(np.int64)),
        batch_format="pandas")


LANG_COUNTS_SQL = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
"""


def asof_purchase(sf_dir: str):
    """As-of join: for each click, the most recent purchase by the same
    user at or before the click timestamp (inner; clicks with no prior
    purchase drop).

    Ray Data has no as-of join; the engine composes one: bucket BOTH
    event streams by user hash (one all-to-all exchange total), then
    inside each bucket a ts-sorted ``pd.merge_asof(by=user)`` — the
    textbook partition-by-key + local-merge as-of. Scale: the exchange
    is hash-partitioned on the equality key, so each bucket holds a
    user-disjoint slice; skewed users salt like exact_dedup_salted.
    (user_id, ts) is unique in events, so the match is deterministic.
    Reference analogue: nearest-preceding lookup in the travel-time
    cache (socialmapper/isochrone/travel.py time-bucket reuse).
    """
    from ..stages.hash_join import _bucket_of

    n_buckets = 16
    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "event_type", "value"])

    def prep(t) -> "pd.DataFrame":
        import pyarrow as pa
        import pyarrow.compute as pc

        m = pc.is_in(t["event_type"],
                     value_set=pa.array(["click", "purchase"]))
        sub = t.filter(m).select(
            ["event_id", "user_id", "ts", "event_type", "value"])
        return sub.append_column("__bucket", pa.array(_bucket_of(
            sub["user_id"].to_numpy(zero_copy_only=False), n_buckets)))

    def asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g.loc[g["event_type"] == "click",
                     ["event_id", "user_id", "ts"]].sort_values("ts")
        right = g.loc[g["event_type"] == "purchase",
                      ["user_id", "ts", "value"]].sort_values("ts")
        # merge_asof consumes the right "ts" as the join key; carry the
        # purchase timestamp through as an explicit value column
        right = right.assign(p_ts=right["ts"])
        cols = ["event_id", "user_id", "click_ts", "purchase_ts",
                "wait_us", "purchase_value"]
        if left.empty or right.empty:
            return pd.DataFrame(columns=cols)
        m = pd.merge_asof(left, right, on="ts", by="user_id",
                          direction="backward", allow_exact_matches=True)
        m = m.dropna(subset=["value"])
        click_us = m["ts"].astype("datetime64[us]").to_numpy().view(np.int64)
        purch_us = m["p_ts"].astype("datetime64[us]").to_numpy() \
            .view(np.int64)
        return pd.DataFrame({
            "event_id": m["event_id"].astype(np.int64),
            "user_id": m["user_id"].astype(np.int64),
            "click_ts": m["ts"],
            "purchase_ts": m["p_ts"],
            "wait_us": click_us - purch_us,
            "purchase_value": m["value"].round(6),
        })

    return ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(asof_bucket, batch_format="pandas")


ASOF_PURCHASE_SQL = """
SELECT e.event_id, e.user_id, e.ts AS click_ts, p.ts AS purchase_ts,
       CAST(epoch_us(e.ts) - epoch_us(p.ts) AS BIGINT) AS wait_us,
       ROUND(p.value, 6) AS purchase_value
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'click') e
ASOF JOIN (SELECT user_id, ts, value FROM events
           WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND e.ts >= p.ts
"""


def orders_without_lineitem(sf_dir: str):
    """Anti-join: orders with no lineitem rows (both sides large, so no
    broadcast — ONE bucketed exchange, per-bucket key-set difference).

    The probe side pre-dedups l_orderkey per batch (combiner), so the
    exchange carries at most one key per (batch, key), never the
    lineitem stream. Reference analogue: the invalid-coordinate side
    channel (filter-by-absence) in pipeline/coordinate_validation.py.
    """
    from ..stages.hash_join import _bucket_of

    n_buckets = 16
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])
    line = _read(sf_dir, "lineitem", ["l_orderkey"])

    def prep_orders(t) -> "pd.DataFrame":
        import pyarrow as pa

        key = t["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "key": pa.array(key),
            "o_custkey": pa.array(t["o_custkey"]
                                  .to_numpy(zero_copy_only=False)
                                  .astype(np.float64)),
            "o_totalprice_e2": pa.array(
                np.round(t["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100)),
            "probe": pa.array(np.zeros(len(key), dtype=np.int64)),
            "__bucket": pa.array(_bucket_of(key, n_buckets))})

    def prep_line(t) -> "pd.DataFrame":
        import pyarrow as pa

        keys = np.unique(t["l_orderkey"].to_numpy(zero_copy_only=False)
                         .astype(np.int64))
        return pa.table({
            "key": pa.array(keys),
            "o_custkey": pa.nulls(len(keys), pa.float64()),
            "o_totalprice_e2": pa.nulls(len(keys), pa.float64()),
            "probe": pa.array(np.ones(len(keys), dtype=np.int64)),
            "__bucket": pa.array(_bucket_of(keys, n_buckets))})

    def anti_bucket(g: pd.DataFrame) -> pd.DataFrame:
        probe = g.loc[g["probe"] == 1, "key"].to_numpy()
        build = g.loc[g["probe"] == 0]
        keep = build.loc[~build["key"].isin(probe)]
        return pd.DataFrame({
            "o_orderkey": keep["key"].astype(np.int64),
            "o_custkey": keep["o_custkey"].astype(np.int64),
            "o_totalprice_e2": keep["o_totalprice_e2"].astype(np.int64),
        })

    return orders.map_batches(prep_orders, batch_format="pyarrow") \
        .union(line.map_batches(prep_line, batch_format="pyarrow")) \
        .groupby("__bucket").map_groups(anti_bucket, batch_format="pandas")


ORDERS_WITHOUT_LINEITEM_SQL = """
SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(round(o_totalprice * 100, 0) AS BIGINT) AS o_totalprice_e2
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey)
"""


def event_type_reach(sf_dir: str):
    """COUNT(DISTINCT user_id) per event_type — distributed distinct:
    per-batch (type, user) dedup (combiner) shrinks the exchange to
    distinct pairs per batch, then one groupby counts uniques per type
    vectorized. For user cardinalities that outgrow a group block, the
    scale path is a second-level exchange keyed on (type, user) — same
    machinery as dedup.exact_dedup.
    """
    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    def reach(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n_users": np.int64(g["user_id"].nunique()),
        })

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby("event_type").map_groups(reach, batch_format="pandas")


EVENT_TYPE_REACH_SQL = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
"""


def user_running_total(sf_dir: str, n_buckets: int = 16):
    """Per-user cumulative value over time (the ROWS UNBOUNDED
    PRECEDING window): one exchange keyed on a user-hash BUCKET (one
    python call per bucket, not per user — see sessionize), per-bucket
    ts-sorted vectorized grouped cumsum over int64-e4 values
    (order-independent exactness — values are 4-decimal quantized).
    (user_id, ts) uniqueness makes the order total, so the running sum
    is deterministic; the windowed-SUM HUGEINT trap is CAST in the
    oracle (the sessionize lesson).
    """
    from ..stages.hash_join import _bucket_of

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def add_bucket(t) -> "pd.DataFrame":
        import pyarrow as pa

        # pure-arrow, declared-pyarrow: pandas-declared stages fused
        # into the shuffle map phase pay ~10x (dedup.exact_dedup notes)
        return t.append_column("__ub", pa.array(_bucket_of(
            t["user_id"].to_numpy(zero_copy_only=False), n_buckets)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        v = (g["value"] * 10000).round().astype(np.int64)
        cum = v.groupby(g["user_id"].to_numpy()).cumsum()
        return pd.DataFrame({
            "event_id": g["event_id"].astype(np.int64),
            "user_id": g["user_id"].astype(np.int64),
            "ts": g["ts"],
            "cum_value_e4": cum.astype(np.int64),
        })

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__ub").map_groups(per_bucket, batch_format="pandas")


USER_RUNNING_TOTAL_SQL = """
SELECT event_id, user_id, ts,
       CAST(SUM(CAST(round(value * 10000, 0) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_value_e4
FROM events
"""


def events_quartiles_by_type(sf_dir: str):
    """EXACT distributed p25/p50/p75 per group — the quantile
    generalisation of :func:`events_median_by_type`: same lossless
    int64-e4 histogram exchange, three cumulative-count walks at ranks
    ceil(q * n). No value stream ever moves; for unquantized data the
    scale path is a mergeable quantile sketch (documented trade)."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(batch) -> "pa.Table":
        # declared-pyarrow: feeds the keyed exchange (module rule)
        import pyarrow as pa

        df = batch.to_pandas()
        df = df.assign(v=(df["value"] * 10000).round().astype(np.int64))
        g = df.groupby(["event_type", "v"], sort=False) \
              .size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    def quart_group(g: pd.DataFrame) -> pd.DataFrame:
        # one group's histogram per call — parallel across groups (the
        # pre-r4 repartition(1) final's input tracked distinct values)
        et = g["event_type"].iloc[0]
        h = g.groupby("v", sort=True)["n"].sum()
        n = int(h.sum())
        c = h.cumsum().to_numpy()
        v = h.index.to_numpy()
        qs = [int(v[np.searchsorted(c, int(np.ceil(q * n)))])
              for q in (0.25, 0.5, 0.75)]
        return pd.DataFrame({"event_type": [et], "n_events": [n],
                             "p25_e4": [qs[0]], "p50_e4": [qs[1]],
                             "p75_e4": [qs[2]]})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("event_type") \
        .map_groups(quart_group, batch_format="pandas")


EVENTS_QUARTILES_SQL = """
WITH s AS (
  SELECT event_type, CAST(round(value * 10000, 0) AS BIGINT) AS v,
         row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events)
SELECT event_type, CAST(ANY_VALUE(n) AS BIGINT) AS n_events,
       CAST(MAX(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT)
                     THEN v END) AS BIGINT) AS p25_e4,
       CAST(MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                     THEN v END) AS BIGINT) AS p50_e4,
       CAST(MAX(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT)
                     THEN v END) AS BIGINT) AS p75_e4
FROM s GROUP BY event_type
"""


def events_p99_filter(sf_dir: str):
    """Per-group exact-percentile OUTLIER FILTER: rows with value above
    their event_type's exact p99.

    Composes the lossless e4-histogram exchange (events_quartiles) with
    a broadcast-threshold second pass: pass 1 reduces the value
    distribution to per-(group, value_e4) counts and reads off p99 per
    group (<= one row per group — broadcast via ray.put, never a join);
    pass 2 streams the events again and keeps rows above the group's
    threshold. The value stream crosses the wire once as histogram
    partials; the filter pass moves only survivors.
    """
    import ray

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def partial(batch) -> "pa.Table":
        # declared-pyarrow: feeds the keyed exchange below (a
        # pandas-declared stage fused into a shuffle map phase pays ~10x)
        import pyarrow as pa

        df = batch.to_pandas()
        df = df.assign(v=(df["value"] * 10000).round().astype(np.int64))
        g = df.groupby(["event_type", "v"], sort=False) \
              .size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    def threshold_per_group(g: pd.DataFrame) -> pd.DataFrame:
        # one group's histogram partials -> ONE threshold row; the
        # per-group input is bounded by distinct e4 values in the group,
        # never by the corpus, and groups combine in parallel (the
        # pre-r4 repartition(1) funneled EVERY group's histogram —
        # cardinality tracks distinct values — into a single task)
        et = g["event_type"].iloc[0]
        h = g.groupby("v", sort=True)["n"].sum()
        n = int(h.sum())
        c = h.cumsum().to_numpy()
        v = h.index.to_numpy()
        p99 = int(v[np.searchsorted(c, int(np.ceil(0.99 * n)))])
        return pd.DataFrame({"event_type": [et], "p99_e4": [p99]})

    thr = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("event_type") \
        .map_groups(threshold_per_group, batch_format="pandas") \
        .to_pandas()
    thr_ref = ray.put(dict(zip(thr["event_type"], thr["p99_e4"])))

    def keep_outliers(df: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(thr_ref)
        v = (df["value"] * 10000).round().astype(np.int64)
        cut = df["event_type"].map(t).to_numpy(dtype=np.int64)
        m = v.to_numpy() > cut
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy()[m].astype(np.int64),
            "event_type": df["event_type"].to_numpy()[m],
            "value_e4": v.to_numpy()[m]})

    return ds.map_batches(keep_outliers, batch_format="pandas")


EVENTS_P99_SQL = """
WITH s AS (
  SELECT event_id, event_type,
         CAST(round(value * 10000, 0) AS BIGINT) AS v
  FROM events),
r AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM s),
thr AS (
  SELECT event_type,
         MAX(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN v END)
           AS p99
  FROM r GROUP BY event_type)
SELECT s.event_id, s.event_type, s.v AS value_e4
FROM s JOIN thr USING (event_type)
WHERE s.v > thr.p99
"""


def funnel_counts(sf_dir: str):
    """Ordered-funnel analysis: users reaching view -> click (strictly
    after their first view) -> purchase (strictly after that click).

    The sessionize exchange shape: ONE user-hash-bucket groupby puts
    each user's events in one kernel call; inside the bucket the three
    stage times resolve with vectorized grouped min/joins (no per-user
    python); each bucket emits 3 partial count rows and a tiny combine
    sums them. Strict ts inequality (ties excluded) keeps the rule
    deterministic and identical to the SQL.
    """
    from ..stages.hash_join import _bucket_of

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    n_buckets = 32

    def prep(batch) -> "pd.DataFrame":
        import pyarrow as pa

        df = batch.to_pandas()
        df = df.loc[df["event_type"].isin(("view", "click", "purchase")),
                    ["user_id", "event_type", "ts"]]
        return pa.table({
            "user_id": pa.array(df["user_id"].to_numpy()),
            "event_type": pa.array(df["event_type"].astype(str),
                                   pa.string()),
            "ts": pa.array(df["ts"].to_numpy().astype("datetime64[us]")),
            "__bucket": pa.array(_bucket_of(df["user_id"].to_numpy(),
                                            n_buckets))})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        v = g.loc[g["event_type"] == "view"] \
            .groupby("user_id")["ts"].min().rename("t1")
        c = g.loc[g["event_type"] == "click"].join(v, on="user_id")
        c = c.loc[c["ts"] > c["t1"]] \
            .groupby("user_id")["ts"].min().rename("t2")
        p = g.loc[g["event_type"] == "purchase"].join(c, on="user_id")
        p = p.loc[p["ts"] > p["t2"]] \
            .groupby("user_id")["ts"].min().rename("t3")
        return pd.DataFrame({
            "stage": ["view", "click", "purchase"],
            "n": np.asarray([len(v), len(c), len(p)], dtype=np.int64)})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("stage", sort=False)["n"].sum().reset_index()
        return pd.DataFrame({"stage": g["stage"],
                             "n_users": g["n"].astype(np.int64)})

    return ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(per_bucket, batch_format="pandas") \
        .repartition(1) \
        .map_batches(combine, batch_format="pandas", batch_size=None)


FUNNEL_SQL = """
WITH e AS (
  SELECT user_id, event_type, ts FROM events
  WHERE event_type IN ('view', 'click', 'purchase')),
v AS (SELECT user_id, min(ts) AS t1 FROM e
      WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t2
      FROM e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t3
      FROM e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
SELECT 'view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
UNION ALL
SELECT 'click', CAST(count(*) AS BIGINT) FROM c
UNION ALL
SELECT 'purchase', CAST(count(*) AS BIGINT) FROM p
"""


def events_props_extract(sf_dir: str):
    """JSON field extraction (§2.8 json flavour over the events side
    channel): pull ``k`` out of the ``props`` JSON string with a
    vectorized regex (no per-row json.loads) and aggregate per type.
    The SQL oracle parses with DuckDB's real JSON extractor, so the
    regex path is checked against a genuine JSON parser.
    """
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # coerce like the SQL's json_extract: a row without an integer
        # k becomes NULL and drops out of SUM/MAX while still counting
        # in n_events (pandas sum/max skip NaN by default)
        k = pd.to_numeric(
            df["props"].str.extract(r'"k"\s*:\s*(-?\d+)', expand=False),
            errors="coerce")
        return pd.DataFrame({"event_type": df["event_type"], "k": k}) \
            .groupby("event_type", sort=False) \
            .agg(n=("k", "size"), sum_k=("k", "sum"), max_k=("k", "max")) \
            .reset_index()

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", sort=False) \
              .agg(n=("n", "sum"), sum_k=("sum_k", "sum"),
                   max_k=("max_k", "max")).reset_index()
        # SQL NULL semantics: a type with NO integer k anywhere yields
        # NULL sum/max (pandas would give sum=0 and a non-finite-cast
        # crash on max). max_k is NaN exactly when no partial saw a
        # valid k; mask sum_k by it and emit nullable Int64 only on
        # that pathological shape (plain int64 on normal data).
        no_k = g["max_k"].isna()
        if no_k.any():
            sum_k = g["sum_k"].where(~no_k).astype("Int64")
            max_k = g["max_k"].astype("Int64")
        else:
            sum_k = g["sum_k"].astype(np.int64)
            max_k = g["max_k"].astype(np.int64)
        return pd.DataFrame({
            "event_type": g["event_type"],
            "n_events": g["n"].astype(np.int64),
            "sum_k": sum_k,
            "max_k": max_k,
        })

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        # idempotent partial fold (NaN-skipping sum/max match the
        # finish's NULL masking: max_k stays NaN iff no partial saw k)
        return df.groupby("event_type", sort=False) \
            .agg(n=("n", "sum"), sum_k=("sum_k", "sum"),
                 max_k=("max_k", "max")).reset_index()

    from ..util import tree_combine

    return tree_combine(ds.map_batches(partial, batch_format="pandas"),
                        combine) \
        .map_batches(finish, batch_format="pandas", batch_size=None)


EVENTS_PROPS_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS max_k
FROM events GROUP BY event_type
"""


def user_rolling_sum(sf_dir: str, window: int = 3, n_buckets: int = 16):
    """Per-user ROWS-window rolling sum (value over the current + 2
    preceding events in ts order) — the bounded-frame window op. Same
    bucket-exchange shape as user_running_total; the frame sum is a
    vectorized grouped rolling over exact int64-e4 values."""
    from ..stages.hash_join import _bucket_of

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def add_bucket(t) -> "pd.DataFrame":
        import pyarrow as pa

        # pure-arrow, declared-pyarrow: pandas-declared stages fused
        # into the shuffle map phase pay ~10x (dedup.exact_dedup notes)
        return t.append_column("__ub", pa.array(_bucket_of(
            t["user_id"].to_numpy(zero_copy_only=False), n_buckets)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        v = (g["value"] * 10000).round().astype(np.int64)
        roll = v.groupby(g["user_id"].to_numpy()) \
                .rolling(window, min_periods=1).sum() \
                .reset_index(drop=True)
        return pd.DataFrame({
            "event_id": g["event_id"].astype(np.int64).to_numpy(),
            "user_id": g["user_id"].astype(np.int64).to_numpy(),
            "ts": g["ts"].to_numpy(),
            "roll_sum_e4": roll.astype(np.int64).to_numpy(),
        })

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__ub").map_groups(per_bucket, batch_format="pandas")


USER_ROLLING_SUM_SQL = """
SELECT event_id, user_id, ts,
       CAST(SUM(CAST(round(value * 10000, 0) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts
                  ROWS 2 PRECEDING) AS BIGINT) AS roll_sum_e4
FROM events
"""


def user_event_gaps(sf_dir: str, n_buckets: int = 16):
    """LAG: microseconds since the user's previous event (first event
    per user drops — inner-lag semantics, no nullable column)."""
    from ..stages.hash_join import _bucket_of

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def add_bucket(t) -> "pd.DataFrame":
        import pyarrow as pa

        # pure-arrow, declared-pyarrow: pandas-declared stages fused
        # into the shuffle map phase pay ~10x (dedup.exact_dedup notes)
        return t.append_column("__ub", pa.array(_bucket_of(
            t["user_id"].to_numpy(zero_copy_only=False), n_buckets)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        uid = g["user_id"].to_numpy()
        ts_us = g["ts"].astype("datetime64[us]").to_numpy().view(np.int64)
        same = np.empty(len(g), dtype=bool)
        same[0] = False
        same[1:] = uid[1:] == uid[:-1]
        gap = np.empty(len(g), dtype=np.int64)
        gap[1:] = ts_us[1:] - ts_us[:-1]
        keep = same
        return pd.DataFrame({
            "event_id": g["event_id"].astype(np.int64).to_numpy()[keep],
            "user_id": uid[keep].astype(np.int64),
            "gap_us": gap[keep],
        })

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__ub").map_groups(per_bucket, batch_format="pandas")


USER_EVENT_GAPS_SQL = """
SELECT event_id, user_id,
       CAST(epoch_us(ts) - epoch_us(prev_ts) AS BIGINT) AS gap_us
FROM (
  SELECT event_id, user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events)
WHERE prev_ts IS NOT NULL
"""


def user_type_pivot(sf_dir: str):
    """Pivot: one row per user, one count column per event type
    (long -> wide, the enrichment-join shape exposed as its own op).
    Per-batch crosstab partials keep the exchange at one row per
    (user, batch)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    types = ["click", "error", "purchase", "signup", "view"]

    n_buckets = 32

    def partial(batch) -> "pa.Table":
        # declared-pyarrow: feeds the keyed exchange (module rule)
        import pyarrow as pa

        df = batch.to_pandas()
        ct = pd.crosstab(df["user_id"], df["event_type"])
        for t in types:
            if t not in ct.columns:
                ct[t] = 0
        ct = ct[types].reset_index()
        ct.columns = ["user_id"] + [f"n_{t}" for t in types]
        ct["__ub"] = (ct["user_id"].to_numpy(np.int64)
                      % np.int64(n_buckets))
        return pa.Table.from_pandas(ct, preserve_index=False) \
            .replace_schema_metadata(None)

    cols = [f"n_{t}" for t in types]

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        # per user-hash bucket (a user's partials share the bucket) —
        # the pre-r4 repartition(1) final was unbounded in user count
        g = df.groupby("user_id", sort=False)[cols].sum().reset_index()
        out = {"user_id": g["user_id"].astype(np.int64)}
        for c in cols:
            out[c] = g[c].astype(np.int64)
        return pd.DataFrame(out)

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("__ub").map_groups(combine, batch_format="pandas")


USER_TYPE_PIVOT_SQL = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_view
FROM events GROUP BY user_id
"""


def event_type_reach_approx(sf_dir: str):
    """Approximate COUNT DISTINCT via a mergeable HyperLogLog sketch
    (stages/sketch.py) — the bounded-exchange variant of
    event_type_reach for cardinalities where even the distinct-pair
    stream is too big. Rows-only; estimator accuracy and merge
    associativity are pytest-bounded (tests/test_sketch.py)."""
    from ..stages.sketch import approx_distinct_per_group

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    out = approx_distinct_per_group(ds, "event_type", "user_id")
    return out.map_batches(
        lambda df: pd.DataFrame({
            "event_type": df["event_type"],
            "approx_distinct": df["approx_distinct"].astype(np.int64)}),
        batch_format="pandas")
