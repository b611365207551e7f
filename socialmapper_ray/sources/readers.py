"""Readers (reference S1 + K3): custom-coordinate files, CSV->Parquet.

S1 — flexible POI file reader (reference pipeline/extraction.py:24-202
``parse_custom_coordinates``): accepts CSV/JSON with any of the
reference's column aliases (lat/latitude/y; lon/lng/long/longitude/x;
name/title/label), validates coordinates, and folds every unrecognised
column into a ``tags`` map — re-expressed as a vectorized
``map_batches`` normalizer over a Ray CSV/JSON read.

K3 — streaming CSV -> Parquet conversion (reference
census/infrastructure/streaming.py:195-333): Ray Data's streaming
executor does the chunking; one lazy read chained to one write.
"""

from __future__ import annotations

import json

import pandas as pd
import ray.data as rd

LAT_ALIASES = ("lat", "latitude", "y")
LON_ALIASES = ("lon", "lng", "long", "longitude", "x")
NAME_ALIASES = ("name", "title", "label")
ID_ALIASES = ("id", "poi_id", "key")
TYPE_ALIASES = ("type", "category", "kind")


def _pick(columns: list[str], aliases: tuple[str, ...]) -> str | None:
    lower = {c.lower(): c for c in columns}
    for a in aliases:
        if a in lower:
            return lower[a]
    return None


def normalize_poi_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Alias resolution + validation + tags fold (pure, vectorized)."""
    cols = list(df.columns)
    lat_c = _pick(cols, LAT_ALIASES)
    lon_c = _pick(cols, LON_ALIASES)
    if lat_c is None or lon_c is None:
        raise ValueError(f"no lat/lon column among {cols} "
                         f"(aliases: {LAT_ALIASES} / {LON_ALIASES})")
    name_c = _pick(cols, NAME_ALIASES)
    id_c = _pick(cols, ID_ALIASES)
    type_c = _pick(cols, TYPE_ALIASES)

    lat = pd.to_numeric(df[lat_c], errors="coerce")
    lon = pd.to_numeric(df[lon_c], errors="coerce")
    valid = (lat.notna() & lon.notna()
             & lat.between(-90, 90) & lon.between(-180, 180))

    used = {lat_c, lon_c} | {c for c in (name_c, id_c, type_c) if c}
    extras = [c for c in cols if c not in used]
    tags = (df[extras].astype(str).apply(
        lambda r: json.dumps(dict(zip(extras, r)), sort_keys=True), axis=1)
        if extras else pd.Series([""] * len(df), index=df.index))

    out = pd.DataFrame({
        "id": (df[id_c].astype(str) if id_c
               else pd.Series([f"custom_{i}" for i in range(len(df))],
                              index=df.index)),
        "name": df[name_c].astype(str) if name_c else "",
        "type": df[type_c].astype(str) if type_c else "poi",
        "lat": lat,
        "lon": lon,
        "tags": tags,
        "valid": valid,
    })
    return out


def read_custom_coordinates(path: str, keep_invalid: bool = False):
    """CSV or JSON POI file -> normalized Dataset (S1)."""
    if path.endswith(".json"):
        ds = rd.read_json(path)
    else:
        ds = rd.read_csv(path)
    out = ds.map_batches(normalize_poi_batch, batch_format="pandas")
    return out if keep_invalid else out.filter(expr="valid == True")


def convert_csv_to_parquet(src: str, dst: str,
                           compression: str = "snappy") -> str:
    """Streaming CSV -> Parquet (K3): lazy read chained to a write; the
    streaming executor pipelines chunks with backpressure (no driver
    materialisation, unlike the reference's in-process chunk loop)."""
    rd.read_csv(src).write_parquet(dst, compression=compression)
    return dst


PAGE_COLUMNS = ("url", "warc_ts", "html", "text", "lang")


def read_jsonl_pages(path: str, strict: bool = False):
    """JSON-lines page source (the Common-Crawl-style corpus interchange
    format; BASELINE.json input_hint schema ``url, warc_ts, html, text,
    lang``). Ray's JSON reader streams line-delimited files; this
    normalizer projects/para-fills to the canonical page schema so a
    JSONL drop-in behaves exactly like the parquet pages source.

    strict=True raises on missing columns instead of filling defaults.
    """
    ds = rd.read_json(path)

    def normalize(df: pd.DataFrame) -> pd.DataFrame:
        missing = [c for c in PAGE_COLUMNS if c not in df.columns]
        if missing and strict:
            raise ValueError(f"jsonl pages missing columns {missing}")
        out = pd.DataFrame(index=df.index)
        for c in PAGE_COLUMNS:
            # fillna BEFORE astype: a JSON null is None in pandas and
            # astype(str) would stringify it to the literal 'None'
            out[c] = (df[c].fillna("").astype(str)
                      if c in df.columns else "")
        # canonical pages schema stores html as utf-8 bytes (parquet
        # binary); JSONL carries it as a string
        out["html"] = out["html"].str.encode("utf-8")
        return out

    return ds.map_batches(normalize, batch_format="pandas")


def convert_jsonl_to_parquet(src: str, dst: str,
                             compression: str = "snappy") -> str:
    """Streaming JSONL -> Parquet (K3 for the webtext interchange
    format): lazy read chained to a write, pipelined with backpressure."""
    read_jsonl_pages(src).write_parquet(dst, compression=compression)
    return dst
