"""Fault-tolerance: transient task failures are retried by Ray and the
pipeline completes with correct results (north rule: retries are free
at the Ray level; the engine's job is idempotent stages —
SURVEY.md §4 'Retries')."""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd
import pytest

import ray.data as rd

FLAG_DIR = os.path.join(tempfile.gettempdir(), "smray_test_faults")


@pytest.fixture(autouse=True)
def clean():
    shutil.rmtree(FLAG_DIR, ignore_errors=True)
    os.makedirs(FLAG_DIR, exist_ok=True)
    yield
    shutil.rmtree(FLAG_DIR, ignore_errors=True)


def test_transient_task_failure_is_retried(ray_session):
    """Each batch fails exactly once (marker file per batch id), then
    succeeds on retry; the dataset must still produce every row."""

    def flaky(df: pd.DataFrame) -> pd.DataFrame:
        key = f"batch-{int(df['id'].iloc[0])}"
        marker = os.path.join(FLAG_DIR, key)
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("failed-once")
            raise RuntimeError(f"transient failure for {key}")
        return df

    # user-code exceptions are only retried when the stage opts in
    # (system failures/worker deaths retry by default)
    ds = rd.range(1000).map_batches(
        flaky, batch_format="pandas", batch_size=100,
        retry_exceptions=[RuntimeError], max_retries=3)
    out = ds.to_pandas()
    assert len(out) == 1000
    assert sorted(out["id"]) == list(range(1000))
    # every batch really did fail once before succeeding
    assert len(os.listdir(FLAG_DIR)) > 0


def test_extraction_idempotent_under_retry(ray_session):
    """Retrying the extract stage cannot corrupt results: the stage is
    pure, so a re-executed batch yields byte-identical rows (the
    invariant that makes Ray-level retries safe)."""
    from socialmapper_ray.sources import synth
    from socialmapper_ray.stages import extract

    SF = "/root/testdata/sf0.001"
    synth.ensure_synth(SF)
    fail_flag = os.path.join(FLAG_DIR, "extract-failed")

    def flaky_extract(tbl) -> "pa.Table":
        out = extract.extract_batch(tbl)
        if not os.path.exists(fail_flag):
            with open(fail_flag, "w") as f:
                f.write("x")
            raise RuntimeError("transient extract failure")
        return out

    pages = rd.read_parquet(synth.table_path(SF, "pages"))
    got = pages.map_batches(
        flaky_extract, batch_format="pyarrow",
        retry_exceptions=[RuntimeError], max_retries=3) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    want = extract.extract_pois(pages).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert (got["text"] == want["text"]).all()
    assert len(got) == len(want)
