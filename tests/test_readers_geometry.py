"""Tests for S1 reader, K3 converter, geometry ops, multimodal stubs."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from socialmapper_ray import geom
from socialmapper_ray.sources import readers, synth
from socialmapper_ray.stages import geometry_ops, multimodal

SF = "/root/testdata/sf0.001"
TMP = "/tmp/smray_test_readers"


@pytest.fixture(autouse=True)
def clean():
    shutil.rmtree(TMP, ignore_errors=True)
    os.makedirs(TMP, exist_ok=True)
    yield
    shutil.rmtree(TMP, ignore_errors=True)


def test_normalize_poi_aliases():
    df = pd.DataFrame({
        "Latitude": ["10.5", "95.0", "x"],
        "LONG": ["-70.25", "-70.0", "-70.0"],
        "title": ["a", "b", "c"],
        "extra": ["e1", "e2", "e3"],
    })
    out = readers.normalize_poi_batch(df)
    assert out["valid"].tolist() == [True, False, False]
    assert out["lat"].iloc[0] == 10.5 and out["lon"].iloc[0] == -70.25
    assert out["name"].tolist() == ["a", "b", "c"]
    assert '"extra": "e1"' in out["tags"].iloc[0]
    with pytest.raises(ValueError, match="no lat/lon"):
        readers.normalize_poi_batch(pd.DataFrame({"foo": [1]}))


def test_read_custom_coordinates(ray_session):
    path = synth.aux_path(SF, "custom_coords.csv")
    ds = readers.read_custom_coordinates(path)
    df = ds.to_pandas()
    assert len(df) > 100
    assert df["lat"].between(-90, 90).all()
    assert (df["type"] == "library").all()
    kept = readers.read_custom_coordinates(path, keep_invalid=True)
    assert kept.count() > len(df)  # invalid rows retained when asked


def test_csv_to_parquet_roundtrip(ray_session):
    src = os.path.join(TMP, "in.csv")
    with open(src, "w") as f:
        f.write("a,b\n1,x\n2,y\n3,z\n")
    dst = os.path.join(TMP, "out")
    readers.convert_csv_to_parquet(src, dst)
    back = rd.read_parquet(dst).to_pandas().sort_values("a")
    assert back["a"].tolist() == [1, 2, 3]
    assert back["b"].tolist() == ["x", "y", "z"]


def test_geometry_ops_roundtrip(ray_session):
    zones = rd.read_parquet(synth.table_path(SF, "zones"),
                            columns=["zone_id", "wkb"])
    simplified = geometry_ops.simplify_zones(zones, 0.05).to_pandas()
    orig = zones.to_pandas()
    nv = lambda blob: len(geom.wkb_decode(blob)[1])
    assert sum(nv(b) for b in simplified["wkb"]) <= \
        sum(nv(b) for b in orig["wkb"])

    hulls = geometry_ops.zone_hulls(zones).to_pandas()
    assert len(hulls) == len(orig)

    union = geometry_ops.hull_union(zones).to_pandas()
    assert len(union) == 1
    _, hull = geom.wkb_decode(union["wkb"].iloc[0])
    # hull must contain every zone vertex (shrunk slightly inward)
    ps = geom.PolygonSet([hull[:-1]])
    c = hull[:-1].mean(axis=0)
    for blob in orig["wkb"].head(10):
        _, coords = geom.wkb_decode(blob)
        inner = coords * (1 - 1e-9) + c * 1e-9
        mask = geom.points_in_polygons(
            inner[:, 0], inner[:, 1], ps,
            np.arange(len(inner)), np.zeros(len(inner), dtype=int))
        assert mask.all()


def test_multimodal_fake_decoder(ray_session):
    pages = rd.read_parquet(synth.table_path(SF, "pages")) \
        .select_columns(["url", "html"]).rename_columns(["url", "payload"])
    out = multimodal.decode_media(pages).to_pandas()
    assert len(out) == 500
    assert "payload" not in out.columns       # wide binary dropped
    assert (out["n_bytes"] > 0).all()
    f = np.vstack(out["features"].to_numpy())
    assert f.shape == (500, multimodal.FEATURE_DIM)
    assert ((f >= 0) & (f < 1)).all()
    # determinism across runs
    out2 = multimodal.decode_media(pages).to_pandas()
    m1 = out.sort_values("url")["features"].map(tuple).tolist()
    m2 = out2.sort_values("url")["features"].map(tuple).tolist()
    assert m1 == m2


def test_real_decoder_raises():
    with pytest.raises(NotImplementedError, match="codec libraries"):
        multimodal.RealDecoder()


def test_geoparquet_export_metadata(ray_session):
    """K5/K2: the geoparquet exporter writes the GeoParquet 1.0 'geo'
    schema metadata key so geopandas/GDAL readers recognise the WKB
    column (reference export/formats/geoparquet.py:67)."""
    import json

    import pyarrow.parquet as pq

    from socialmapper_ray.sources import sinks
    from socialmapper_ray.stages import bands

    centers = pq.read_table(synth.table_path(SF, "band_centers")) \
        .to_pandas().head(4)
    polys = bands.band_polygons(centers)
    out = os.path.join(TMP, "band_polys")
    sinks.export(rd.from_pandas(polys), out, fmt="geoparquet")
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert files
    meta = pq.ParquetFile(os.path.join(out, files[0])).schema_arrow.metadata
    geo = json.loads(meta[b"geo"])
    assert geo["primary_column"] == "wkb"
    assert geo["columns"]["wkb"]["encoding"] == "WKB"
    # GeoParquet 1.0: crs must be PROJJSON or ABSENT (default OGC:CRS84
    # = lon/lat WGS84); the "EPSG:4326" string form fails strict readers
    assert "crs" not in geo["columns"]["wkb"]
    # round-trip: WKB survives and decodes
    back = pq.read_table(os.path.join(out, files[0])).to_pandas()
    _, coords = geom.wkb_decode(back["wkb"].iloc[0])
    assert coords.shape[1] == 2

    # missing geometry column is a loud error
    with pytest.raises(Exception, match="geometry column"):
        sinks.export(rd.from_pandas(polys.drop(columns=["wkb"])),
                     os.path.join(TMP, "nope"), fmt="geoparquet")


def test_jsonl_pages_roundtrip(ray_session):
    """JSONL page source reads the interchange schema and matches the
    parquet source row-for-row; the streaming converter round-trips."""
    import json as _json

    import pyarrow.parquet as pq

    d = synth.ensure_synth(SF)
    pages = pq.read_table(os.path.join(d, "pages.parquet")).to_pandas() \
        .head(50)
    src = os.path.join(TMP, "pages.jsonl")
    with open(src, "w") as f:
        for r in pages.itertuples(index=False):
            html = r.html.decode("utf-8") if isinstance(r.html, bytes) \
                else r.html
            f.write(_json.dumps({"url": r.url, "warc_ts": str(r.warc_ts),
                                 "html": html, "text": r.text,
                                 "lang": r.lang}) + "\n")
    back = readers.read_jsonl_pages(src).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    want = pages.sort_values("url").reset_index(drop=True)
    assert list(back.columns) == list(readers.PAGE_COLUMNS)
    assert (back["url"] == want["url"]).all()
    want_html = want["html"].map(
        lambda h: h if isinstance(h, bytes) else h.encode("utf-8"))
    assert (back["html"] == want_html).all()

    dst = os.path.join(TMP, "pages_pq")
    readers.convert_jsonl_to_parquet(src, dst)
    again = rd.read_parquet(dst).to_pandas()
    assert len(again) == len(pages)

    # extraction over the JSONL source == extraction over parquet
    from socialmapper_ray.stages import extract
    a = extract.extract_pois(readers.read_jsonl_pages(src)) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    import ray.data as _rd
    b = extract.extract_pois(_rd.read_parquet(os.path.join(d, "pages.parquet"))
                             .limit(0).union(_rd.from_pandas(pages))) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    assert (a["url"] == b["url"]).all()
    assert (a["valid"].to_numpy() == b["valid"].to_numpy()).all()
