"""Sinks (reference K1/K2/K5): CSV + (Geo)Parquet export strategies.

Reference semantics re-created:
- column reorder/exclusion projection before export
  (export/preparation.py:115-140, O5),
- keyed dedup with min/first rules applied pre-export
  (export/preparation.py:143-187, A2 — available via stages.zonal),
- Parquet with snappy compression (export/formats/geoparquet.py:23-97),
  written as a partitioned directory (many files) for resumability —
  never the reference's read-modify-write append
  (census/infrastructure/streaming.py:334-427 pathology, K4).

Exporters follow the reference's plugin shape (BaseExporter ABC,
export/base.py:86-127): one strategy object per format.
"""

from __future__ import annotations

import json
import os


class ParquetExporter:
    file_extension = "parquet"
    supports_geometry = True  # WKB binary columns pass through

    def __init__(self, compression: str = "snappy",
                 min_rows_per_file: int | None = None):
        self.compression = compression
        self.min_rows_per_file = min_rows_per_file

    def export(self, ds, out_dir: str, columns: list[str] | None = None,
               exclude: list[str] | None = None) -> str:
        ds = project(ds, columns, exclude)
        kw = {"compression": self.compression}
        if self.min_rows_per_file:
            kw["min_rows_per_file"] = self.min_rows_per_file
        ds.write_parquet(out_dir, **kw)
        return out_dir


class GeoParquetExporter(ParquetExporter):
    """Parquet with the GeoParquet ``geo`` schema-metadata key
    (reference export/formats/geoparquet.py:67 writes real GeoParquet;
    plain WKB parquet loses interop with geopandas/GDAL readers).
    Geometry stays WKB; only file metadata is added, per the GeoParquet
    1.0 spec layout."""

    def __init__(self, geometry_column: str = "wkb", crs=None, **kw):
        super().__init__(**kw)
        self.geometry_column = geometry_column
        # GeoParquet 1.0 `crs` is a PROJJSON OBJECT, not an "EPSG:x"
        # string (strict geopandas/GDAL validators reject the string
        # form). None omits the key entirely — the spec default is
        # OGC:CRS84, i.e. lon/lat WGS84, exactly this engine's frame.
        self.crs = crs

    def geo_metadata(self) -> bytes:
        col = {"encoding": "WKB", "geometry_types": []}
        if self.crs is not None:
            col["crs"] = self.crs     # caller-supplied PROJJSON dict
        return json.dumps({
            "version": "1.0.0",
            "primary_column": self.geometry_column,
            "columns": {self.geometry_column: col},
        }).encode()

    def export(self, ds, out_dir: str, columns: list[str] | None = None,
               exclude: list[str] | None = None) -> str:
        import pyarrow as pa

        ds = project(ds, columns, exclude)
        meta = self.geo_metadata()
        gcol = self.geometry_column

        def attach(t: pa.Table) -> pa.Table:
            if gcol not in t.schema.names:
                raise ValueError(f"geometry column {gcol!r} missing "
                                 f"from {t.schema.names}")
            existing = dict(t.schema.metadata or {})
            existing[b"geo"] = meta
            return t.replace_schema_metadata(existing)

        kw = {"compression": self.compression}
        if self.min_rows_per_file:
            kw["min_rows_per_file"] = self.min_rows_per_file
        ds.map_batches(attach, batch_format="pyarrow") \
            .write_parquet(out_dir, **kw)
        return out_dir


class CsvExporter:
    file_extension = "csv"
    supports_geometry = False  # geometry columns are excluded (K1 rule)

    GEOMETRY_COLUMNS = ("wkb", "geometry")

    def export(self, ds, out_dir: str, columns: list[str] | None = None,
               exclude: list[str] | None = None) -> str:
        drop = list(exclude or [])
        schema_names = ds.schema().names
        drop += [c for c in self.GEOMETRY_COLUMNS if c in schema_names]
        ds = project(ds, columns, drop)
        ds.write_csv(out_dir)
        return out_dir


EXPORTERS = {"parquet": ParquetExporter, "geoparquet": GeoParquetExporter,
             "csv": CsvExporter}


def project(ds, columns: list[str] | None = None,
            exclude: list[str] | None = None):
    """Column reorder/exclusion (reference export/preparation.py:115-140)."""
    if columns is None and not exclude:
        return ds
    names = ds.schema().names
    if columns is None:
        columns = [c for c in names if c not in set(exclude or [])]
    else:
        columns = [c for c in columns if c in names]
    return ds.select_columns(columns)


def export(ds, out_dir: str, fmt: str = "parquet", **kw) -> str:
    exporter = EXPORTERS[fmt]()
    os.makedirs(os.path.dirname(out_dir) or ".", exist_ok=True)
    return exporter.export(ds, out_dir, **kw)
