"""CLI surface tests (§2.10 reference cli.py analogue)."""

from __future__ import annotations

import json
import shutil

import pytest

from socialmapper_ray import cli

OUT = "/tmp/smray_test_cli"


@pytest.fixture(autouse=True)
def clean():
    shutil.rmtree(OUT, ignore_errors=True)
    yield
    shutil.rmtree(OUT, ignore_errors=True)


def test_dry_run_prints_plan(capsys):
    assert cli.main(["run", "--dry-run", "--sf-dir", "/x"]) == 0
    plan = json.loads(capsys.readouterr().out.strip())
    assert plan["plan"][0] == "read_pages" and "pip_join" in plan["plan"]


def test_list_ops(capsys):
    assert cli.main(["list-ops"]) == 0
    out = capsys.readouterr().out
    assert "pip_join " in out or "pip_join" in out
    assert "sql-oracle" in out and "rows-only" in out


def test_run_exports(ray_session, capsys):
    assert cli.main(["run", "--sf-dir", "/root/testdata/sf0.001",
                     "--out", OUT, "--concurrency", "2"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["status"] == "ok"
    import ray.data as rd

    assert rd.read_parquet(OUT).count() > 0


def test_cli_list_variables(capsys):
    from socialmapper_ray import cli

    assert cli.main(["list-variables"]) == 0
    out = capsys.readouterr().out
    assert "total_population" in out and "B01003_001E" in out
    assert "households_no_vehicle" in out and "B25044_010E" in out
