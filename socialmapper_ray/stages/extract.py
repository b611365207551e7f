"""Extract stage: pages -> POIs (url, lat, lon, name, ...).

Slice 0 of the build plan (SURVEY.md §7.1): ``read_parquet(pages) ->
map_batches(extract) -> ...``. Combines the reference's text/POI
extraction (S1/S2: pipeline/extraction.py:24-202,
query/__init__.py:193-326) with the M2 coordinate validation filter
(util/coordinate_validation.py:27-56, pipeline/validation.py:11-51).

Scale notes (100 TB): ``html`` is the wide binary column — it is
dropped in the very first stage output, and callers should read pages
with a reduced block size so a batch of raw HTML fits worker heaps
(SURVEY.md §7.4 "wide binary rows"). The stage is a stateless task
(pure function), so Ray Data schedules it elastically.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions import geoparse as gp
from ..functions import text as tx


def extract_batch(batch: pa.Table) -> pa.Table:
    """pages batch -> extracted batch; html is dropped on output.

    Output columns: url, warc_ts, lang, text, n_chars, lat, lon, name,
    geo_kind, valid. Pure + vectorized: per-url output is byte-identical
    at any parallelism (BASELINE.json invariant).

    Arrow in, Arrow out — the whole hot path runs on RE2 / Arrow
    kernels with ZERO pandas conversion (blocks enter zero-copy from
    the object store and the pass-through columns are reused
    zero-copy), and the emitted table is metadata-free so downstream
    block schemas stay hashable.
    """
    import pyarrow.compute as pc

    text = tx.extract_main_text_arrow(batch["html"])
    geo = gp.geoparse_arrow(batch["html"])
    valid = gp.validate_coords_arrow(geo["lat"], geo["lon"])
    return pa.table({
        "url": batch["url"],
        "warc_ts": batch["warc_ts"],
        "lang": batch["lang"],
        "text": text,
        "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        "lat": geo["lat"],
        "lon": geo["lon"],
        "name": geo["name"],
        "geo_kind": geo["geo_kind"],
        "valid": valid,
    })


def extract_pois(pages_ds, batch_size: int = 2048):
    """pages Dataset -> extracted Dataset (html dropped inside the task)."""
    return pages_ds.map_batches(extract_batch, batch_format="pyarrow",
                                batch_size=batch_size)


def split_valid(extracted_ds):
    """(valid_pois, invalid_rows) — the invalid side channel of the
    reference's validation stage (util/invalid_data_tracker.py) expressed
    as a second filtered Dataset instead of a mutable global."""
    valid = extracted_ds.filter(expr="valid == True")
    invalid = extracted_ds.filter(expr="valid == False")
    return valid, invalid
