"""Checkpoint / lineage manifest tests."""

from __future__ import annotations

import json
import os
import shutil

import pytest

import ray.data as rd

from socialmapper_ray.state import manifest

SF = "/root/testdata/sf0.001"
OUT = "/tmp/smray_test_ckpt"


@pytest.fixture(autouse=True)
def clean():
    shutil.rmtree(OUT, ignore_errors=True)
    yield
    shutil.rmtree(OUT, ignore_errors=True)


def test_checkpoint_runs_then_skips(ray_session):
    calls = []

    def factory():
        calls.append(1)
        return rd.read_parquet(f"{SF}/nation.parquet")

    ds1 = manifest.checkpoint_stage(factory, OUT, stage="s1",
                                    inputs=[f"{SF}/nation.parquet"],
                                    partition_col="n_regionkey")
    assert ds1.count() == 25
    assert calls == [1]

    ds2 = manifest.checkpoint_stage(factory, OUT, stage="s1",
                                    inputs=[f"{SF}/nation.parquet"])
    assert ds2.count() == 25
    assert calls == [1]  # resumed, not recomputed

    with open(os.path.join(OUT, "manifest.json")) as f:
        meta = json.load(f)
    assert meta["status"] == "complete" and meta["rows"] == 25
    lin = manifest.read_lineage(OUT)
    assert lin is not None
    ldf = lin.to_pandas()
    assert ldf["count()"].sum() == 25


def test_checkpoint_invalidates_on_param_change(ray_session):
    calls = []

    def factory():
        calls.append(1)
        return rd.read_parquet(f"{SF}/region.parquet")

    manifest.checkpoint_stage(factory, OUT, stage="s2",
                              inputs=[f"{SF}/region.parquet"],
                              params={"v": 1})
    manifest.checkpoint_stage(factory, OUT, stage="s2",
                              inputs=[f"{SF}/region.parquet"],
                              params={"v": 2})
    assert calls == [1, 1]  # param change -> recompute


def test_incomplete_checkpoint_not_trusted(ray_session):
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "manifest.json"), "w") as f:
        f.write("{broken")
    calls = []

    def factory():
        calls.append(1)
        return rd.read_parquet(f"{SF}/region.parquet")

    ds = manifest.checkpoint_stage(factory, OUT, stage="s3",
                                   inputs=[f"{SF}/region.parquet"])
    assert ds.count() == 5 and calls == [1]
