"""Builder-level checkpoint-resume test."""

from __future__ import annotations

import shutil

import pytest

from socialmapper_ray.pipelines.builder import Ok, PipelineBuilder

SF = "/root/testdata/sf0.001"
OUT = "/tmp/smray_test_builder_ckpt"


@pytest.fixture(autouse=True)
def clean():
    shutil.rmtree(OUT, ignore_errors=True)
    yield
    shutil.rmtree(OUT, ignore_errors=True)


def test_with_checkpoint_resumes(ray_session):
    import os

    def build():
        return (PipelineBuilder()
                .with_pages(SF)
                .with_extract()
                .with_validation()
                .with_checkpoint(OUT)
                .build())

    r1 = build().run()
    assert isinstance(r1, Ok)
    n1 = r1.unwrap().count()
    assert n1 > 0
    manifest_path = os.path.join(OUT, "manifest.json")
    mtime1 = os.path.getmtime(manifest_path)

    # second run: manifest hit -> checkpoint is read, not rewritten
    r2 = build().run()
    n2 = r2.unwrap().count()
    assert n2 == n1
    assert os.path.getmtime(manifest_path) == mtime1
