"""Driver-contract replica: every queries() entry with an oracle must
match DuckDB at sf0.001 (the driver gates at sf0.01 with the same
logic; scripts/check_correctness.py runs that by hand)."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo/scripts")

from check_correctness import TABLES, compare, to_df  # noqa: E402

SF = "/root/testdata/sf0.001"


def _oracles_for(sf_dir: str) -> dict[str, str]:
    import __ray_entry__ as entrymod
    from socialmapper_ray.pipelines import spatial as sp
    from socialmapper_ray.sources import synth

    d = synth.ensure_synth(sf_dir)
    oracles = dict(entrymod.oracle_sql())
    for name, fn in (("extract_pois", sp.extract_pois_sql),
                     ("pip_join", sp.pip_join_sql),
                     ("pip_join_concave", sp.pip_join_concave_sql),
                     ("pip_join_partitioned", sp.pip_join_sql),
                     ("knn_nearest_pruned", sp.knn_sql),
                     ("knn_topk", sp.knn_topk_sql),
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
                     ("zone_area_stats", sp.zone_area_stats_sql),
                     ("geocode_pois", sp.geocode_pois_sql)):
        oracles[name] = fn(d)
    from socialmapper_ray.pipelines import textops as _tp

    oracles["domain_stats"] = _tp.domain_stats_sql(d)
    return oracles


def _query_names():
    import __ray_entry__ as entrymod

    return sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(name, ray_session):
    import __ray_entry__ as entrymod

    got = to_df(entrymod.queries()[name](SF))
    oracles = _oracles_for(SF)
    if name not in oracles:
        assert len(got) >= 0  # rows-only contract
        return
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    want = con.execute(oracles[name]).df()
    err = compare(got, want)
    assert err is None, f"{name}: {err}"


@pytest.mark.parametrize("name", ["pip_join", "dedup_exact",
                                  "events_quartiles_by_type",
                                  "pack_sequences", "network_bands"])
def test_query_repeatable_within_session(name, ray_session):
    """Running the same query twice in one Ray session must yield
    identical rows (synth caches under /tmp are idempotent; no state
    leaks between executions)."""
    import __ray_entry__ as entrymod

    q = entrymod.queries()[name]
    a = to_df(q(SF))
    b = to_df(q(SF))
    a = a[sorted(a.columns)].sort_values(list(sorted(a.columns))) \
        .reset_index(drop=True)
    b = b[sorted(b.columns)].sort_values(list(sorted(b.columns))) \
        .reset_index(drop=True)
    assert a.equals(b), f"{name} differs across repeat runs"
