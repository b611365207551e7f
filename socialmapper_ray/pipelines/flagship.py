"""Flagship pipeline: pages -> POIs -> tiles -> PIP join -> zonal -> enrich.

The graft restatement of the reference's primary entry point
(SocialMapperClient.run_analysis, api/client.py:78-250 ->
pipeline/orchestrator.py:145-162 stage list ``extract -> validate ->
isochrone -> census -> export``): one lazy Ray Data pipeline, streaming
end-to-end — stage outputs are chained Datasets, not driver-memory
materialisations (contrast orchestrator.py:283-339 stage_outputs dict).
"""

from __future__ import annotations

from ..sources import synth
from ..stages import enrich as enrich_mod
from ..stages import extract as extract_mod
from ..stages import pip_join as pip_mod
from ..stages import tile as tile_mod
from ..stages import zonal as zonal_mod


def _default_blocks() -> int:
    """Split reads into ~2 blocks per CPU so every downstream stage
    (extract tasks, PIP/kNN actor pools) has work to pipeline; a single
    parquet file otherwise arrives as ONE block and serializes the run."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(8, 2 * cpus)


#: columns the extract stage actually consumes. The synth pages table
#: also carries a pre-extracted ``text`` column (~40% of the non-html
#: bytes); ``extract_batch`` re-derives text from ``html``, so reading
#: it would scan tens of TB of parquet at crawl scale only to drop it.
PAGE_COLUMNS = ["url", "warc_ts", "html", "lang"]


def read_pages(sf_dir: str, replicate: int = 1,
               columns: list[str] | None = None):
    """Pages source, pruned to the columns extract consumes (html is
    kept — extract drops it first thing). Uses the metadata-free-schema
    read so downstream block schemas stay hashable."""
    from .. import util

    path = synth.table_path(sf_dir, "pages", replicate)
    return util.read_parquet_clean(
        path, columns=list(columns) if columns is not None
        else list(PAGE_COLUMNS),
        override_num_blocks=_default_blocks())


def flagship(sf_dir: str, concurrency: int = 4, replicate: int = 1):
    """-> per-zone enriched accessibility table (Dataset).

    Columns: zone_id, n_pois, sum_n_chars, kind?, demographics columns.
    """
    synth.ensure_synth(sf_dir, replicate)
    pages = read_pages(sf_dir, replicate)
    extracted = extract_mod.extract_pois(pages)
    valid = extracted.filter(expr="valid == True")
    tiled = tile_mod.tile_points(valid)
    index_ref = pip_mod.build_zone_index(synth.table_path(sf_dir, "zones"))
    joined = pip_mod.pip_join(tiled, index_ref,
                              keep_cols=("url", "n_chars"),
                              concurrency=concurrency)
    zonal = zonal_mod.zonal_counts(joined, value_col="n_chars")
    demo_ref = enrich_mod.demographics_ref(
        synth.table_path(sf_dir, "demographics"))
    return enrich_mod.enrich(zonal, demo_ref)


def full_corpus(sf_dir: str, concurrency: int = 8, replicate: int = 1):
    """Compute-dense headline job: one pass over every page computing
    extraction + per-doc signatures (MinHash bands / SimHash /
    fingerprint / quality) + tiling + PIP join + zonal counts.

    This is the shape of a real 100 TB corpus run — per-page CPU
    dominates, framework overhead amortises — and is the workload the
    scaling benchmark (bench.py --scaling) measures.
    """
    from ..stages import features as features_mod

    synth.ensure_synth(sf_dir, replicate)
    pages = read_pages(sf_dir, replicate)
    extracted = extract_mod.extract_pois(pages)
    featured = features_mod.with_text_features(extracted)
    valid = featured.filter(expr="valid == True")
    tiled = tile_mod.tile_points(valid)
    index_ref = pip_mod.build_zone_index(synth.table_path(sf_dir, "zones"))
    joined = pip_mod.pip_join(tiled, index_ref,
                              keep_cols=("url", "n_chars"),
                              concurrency=concurrency)
    return zonal_mod.zonal_counts(joined, value_col="n_chars")
