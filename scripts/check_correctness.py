"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at the given sf dir, compares against
``oracle_sql()`` via DuckDB (row count + column names + order-insensitive
value comparison). Usage:

    PYTHONPATH=/root/repo python scripts/check_correctness.py [sf_dir] [names...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == np.float32:
            df[c] = df[c].astype(np.float64)
        elif str(df[c].dtype) in ("int32", "uint32", "int16", "uint64"):
            df[c] = df[c].astype(np.int64)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable") \
             .reset_index(drop=True)


def compare(got: pd.DataFrame, want: pd.DataFrame) -> str | None:
    if sorted(got.columns) != sorted(want.columns):
        return f"columns {sorted(got.columns)} != {sorted(want.columns)}"
    if len(got) != len(want):
        return f"rows {len(got)} != {len(want)}"
    g, w = canon(got), canon(want)
    for c in g.columns:
        gv, wv = g[c], w[c]
        if gv.dtype == np.float64:
            ok = (gv.isna() & wv.isna()) | np.isclose(gv, wv, rtol=0,
                                                      atol=1e-12,
                                                      equal_nan=True)
        else:
            ok = (gv.isna() & wv.isna()) | (gv == wv)
        if not ok.all():
            i = int(np.flatnonzero(~ok)[0])
            return (f"value mismatch col={c} row={i}: "
                    f"got={gv.iloc[i]!r} want={wv.iloc[i]!r} "
                    f"(dtype {gv.dtype}/{wv.dtype})")
    return None


def main():
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().enable_tensor_extension_casting = False

    import __ray_entry__ as entrymod
    from socialmapper_ray.sources import synth

    d = synth.ensure_synth(sf_dir)
    qs = entrymod.queries()
    # rebuild oracles against THIS sf dir (the driver pins sf0.01)
    import socialmapper_ray.pipelines.relational as rel
    import socialmapper_ray.pipelines.spatial as sp
    import socialmapper_ray.pipelines.textops as tp
    oracles = dict(entrymod.oracle_sql())
    for name, fn in (("extract_pois", sp.extract_pois_sql),
                     ("pip_join", sp.pip_join_sql),
                     ("pip_join_concave", sp.pip_join_concave_sql),
                     ("pip_join_partitioned", sp.pip_join_sql),
                     ("knn_nearest_pruned", sp.knn_sql),
                     ("zonal_agg", sp.zonal_agg_sql),
                     ("knn_nearest", sp.knn_sql),
                     ("band_assign", sp.bands_sql),
                     ("enrich_zones", sp.enrich_zones_sql),
                     ("geoid_components", sp.geoid_components_sql),
                     ("scrub_demographics", sp.scrub_demographics_sql),
                     ("custom_pois", sp.custom_pois_sql),
                     ("zone_centroids", sp.zone_centroids_sql),
                     ("zone_neighbors", sp.zone_neighbors_sql),
                     ("tract_semijoin", sp.tract_semijoin_sql),
                     ("zone_kind_stats", sp.zone_kind_stats_sql),
                     ("zcta_by_prefix", sp.zcta_by_prefix_sql),
                     ("zone_choropleth", sp.zone_choropleth_sql),
                     ("band_polygons", sp.band_polygons_sql),
                     ("network_bands", sp.network_bands_sql),
                     ("network_bands_multimode",
                      sp.network_bands_multimode_sql),
                     ("radius_join", sp.radius_join_sql),
                     ("geocode_pois", sp.geocode_pois_sql),
                     # reads the synth pages parquet directly — its SQL
                     # embeds the sf-specific path, so it MUST be
                     # rebuilt per sf dir (sf0.001 and sf0.01 have the
                     # same doc count but different texts: a stale
                     # sf0.01 path passes rows and fails sum_chars)
                     ("domain_stats", tp.domain_stats_sql),
                     ("url_dedup", tp.url_dedup_sql),
                     ("zone_area_stats", sp.zone_area_stats_sql)):
        oracles[name] = fn(d)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = 0
    for name, q in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_df(q(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(got)} rows "
                  f"({time.time() - t0:.1f}s)")
            n_pass += 1
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        err = compare(got, want)
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows ({time.time() - t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
