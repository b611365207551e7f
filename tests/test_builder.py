"""PipelineBuilder / sinks tests (§2.10 user-extension surface)."""

from __future__ import annotations

import os
import shutil

import pytest

from socialmapper_ray.pipelines.builder import Err, Ok, PipelineBuilder

SF = "/root/testdata/sf0.001"
OUT = "/tmp/smray_test_export"


@pytest.fixture(autouse=True)
def clean():
    shutil.rmtree(OUT, ignore_errors=True)
    yield
    shutil.rmtree(OUT, ignore_errors=True)


def test_builder_end_to_end(ray_session):
    p = (PipelineBuilder()
         .with_pages(SF)
         .with_extract()
         .with_validation()
         .with_tiles()
         .with_pip_join(keep_cols=("url", "n_chars"))
         .with_zonal(value_col="n_chars")
         .with_enrichment()
         .build())
    assert p.stage_names == ["extract", "validate", "tile", "pip_join",
                             "zonal", "enrich"]
    res = p.run()
    assert isinstance(res, Ok)
    df = res.unwrap().to_pandas()
    assert len(df) > 0 and "total_population" in df.columns


def test_builder_custom_stage_and_export(ray_session):
    calls = []

    def udf(ds):
        calls.append(1)
        return ds.filter(expr="lang == 'en'")

    res = (PipelineBuilder()
           .with_pages(SF)
           .with_extract()
           .with_validation()
           .with_stage("only_english", udf)
           .with_export(OUT, fmt="parquet")
           .build()
           .run())
    assert isinstance(res, Ok) and calls == [1]
    import ray.data as rd

    out = rd.read_parquet(OUT).to_pandas()
    assert set(out["lang"].unique()) == {"en"}


def test_builder_error_monad(ray_session):
    def boom(ds):
        raise RuntimeError("stage exploded")

    res = (PipelineBuilder().with_pages(SF).with_extract()
           .with_stage("boom", boom).build().run())
    assert isinstance(res, Err) and not res.is_ok()
    with pytest.raises(RuntimeError, match="stage exploded"):
        res.unwrap()


def test_builder_stage_output_addressable(ray_session):
    p = (PipelineBuilder().with_pages(SF).with_extract().with_validation()
         .build())
    mid = p.stage_output("extract")
    assert mid.count() >= p.stage_output("validate").count() > 0
    with pytest.raises(KeyError):
        p.stage_output("nope")


def test_csv_exporter_drops_geometry(ray_session):
    import ray.data as rd

    from socialmapper_ray.sources import sinks, synth

    zones = rd.read_parquet(synth.table_path(SF, "zones"))
    sinks.export(zones, OUT, fmt="csv")
    files = [f for f in os.listdir(OUT) if f.endswith(".csv")]
    assert files
    with open(os.path.join(OUT, files[0])) as f:
        header = f.readline()
    assert "wkb" not in header and "zone_id" in header


def test_builder_requires_source():
    with pytest.raises(ValueError, match="source"):
        PipelineBuilder().with_extract().build()
    with pytest.raises(ValueError, match="with_pages"):
        PipelineBuilder().with_source(lambda: None).with_pip_join()
