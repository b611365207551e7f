"""Partition-level resumable write tests (north rule: resume skips
finished partitions)."""

from __future__ import annotations

import os
import shutil

import pytest

import ray.data as rd

from socialmapper_ray.sources import synth
from socialmapper_ray.state import manifest

SF = "/root/testdata/sf0.001"
OUT = "/tmp/smray_test_partwrite"


@pytest.fixture(autouse=True)
def clean():
    shutil.rmtree(OUT, ignore_errors=True)
    yield
    shutil.rmtree(OUT, ignore_errors=True)


def _zones():
    return rd.read_parquet(synth.table_path(SF, "zones"),
                           columns=["zone_id", "kind", "n_vertices"])


def test_partitioned_write_and_resume(ray_session):
    r1 = manifest.resumable_partitioned_write(_zones(), OUT, "kind")
    assert sorted(r1["written"]) == ["blockgroup", "isochrone", "zcta"]
    assert r1["skipped"] == []

    # full rerun: everything skipped, nothing rewritten
    r2 = manifest.resumable_partitioned_write(_zones(), OUT, "kind")
    assert r2["written"] == []
    assert sorted(r2["skipped"]) == ["blockgroup", "isochrone", "zcta"]

    # losing one partition manifest -> only that partition is rewritten,
    # and the stale (present-but-unmarked) files are REPLACED, not
    # appended to: a re-read must show the original row count
    os.remove(os.path.join(OUT, "_manifests", "zcta.json"))
    r3 = manifest.resumable_partitioned_write(_zones(), OUT, "kind")
    assert r3["written"] == ["zcta"]
    assert sorted(r3["skipped"]) == ["blockgroup", "isochrone"]
    back = rd.read_parquet(OUT).to_pandas()
    want = _zones().to_pandas()
    assert len(back) == len(want), "resume duplicated partition rows"
    zcta = manifest.read_partitions(OUT, "kind", ["zcta"]).to_pandas()
    assert len(zcta) == (want["kind"] == "zcta").sum()
    assert sorted(zcta["zone_id"]) == sorted(
        want.loc[want["kind"] == "zcta", "zone_id"])


def test_partitioned_write_killed_run_resumes_clean(ray_session):
    """A 'killed' run (staged files present, no manifest) must be
    invisible to readers and fully replaced by the next run."""
    r1 = manifest.resumable_partitioned_write(_zones(), OUT, "kind")
    assert len(r1["written"]) == 3
    want = _zones().to_pandas()

    # simulate a killed run: a stale staging dir + a stale visible file
    # in a partition whose manifest is then lost
    pdir = os.path.join(OUT, "kind=zcta")
    stale_stage = os.path.join(pdir, ".run-deadbeef")
    os.makedirs(stale_stage, exist_ok=True)
    existing = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
    shutil.copy(os.path.join(pdir, existing[0]),
                os.path.join(stale_stage, "part-zzz.parquet"))
    shutil.copy(os.path.join(pdir, existing[0]),
                os.path.join(pdir, "part-stale.parquet"))
    os.remove(os.path.join(OUT, "_manifests", "zcta.json"))

    # dot-prefixed staging is invisible to arrow discovery even now
    r2 = manifest.resumable_partitioned_write(_zones(), OUT, "kind")
    assert r2["written"] == ["zcta"]
    back = rd.read_parquet(OUT).to_pandas()
    assert len(back) == len(want), "stale files leaked into the resume"
    assert not os.path.isdir(stale_stage)


def test_partitioned_output_readable(ray_session):
    manifest.resumable_partitioned_write(_zones(), OUT, "kind")
    back = rd.read_parquet(OUT).to_pandas()
    want = _zones().to_pandas()
    assert len(back) == len(want)
    assert set(back["zone_id"]) == set(want["zone_id"])
    # hive-style partition dirs exist
    assert os.path.isdir(os.path.join(OUT, "kind=zcta"))


def test_read_partitions_prunes(ray_session):
    manifest.resumable_partitioned_write(_zones(), OUT, "kind")
    one = manifest.read_partitions(OUT, "kind", ["zcta"]).to_pandas()
    assert len(one) > 0
    # hive dirs don't carry the partition column inside the files;
    # the pruned read returns exactly the zcta rows
    want = _zones().to_pandas()
    assert len(one) == (want["kind"] == "zcta").sum()
    with pytest.raises(FileNotFoundError, match="no partitions"):
        manifest.read_partitions(OUT, "kind", ["nope"])


def test_identical_content_batches_both_survive(ray_session, tmp_path):
    """Two distinct batches with byte-identical rows for the same
    partition must BOTH publish (a content-hash file name would
    collide and silently halve the data)."""
    import pandas as pd
    import ray.data as rd

    from socialmapper_ray.state import manifest as mf

    df = pd.DataFrame({"k": ["a"] * 4, "v": [1, 2, 3, 4]})
    # two blocks with identical content -> identical batch rows
    ds = rd.from_pandas([df.copy(), df.copy()])
    out = str(tmp_path / "out")
    mf.resumable_partitioned_write(ds, out, "k")
    import pyarrow.parquet as pq

    got = pq.read_table(out + "/k=a").to_pandas()
    assert len(got) == 8, f"expected both identical batches, got {len(got)}"
