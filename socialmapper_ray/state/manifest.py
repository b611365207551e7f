"""Lineage manifests + checkpoint-resume (north rule: "resumable from
checkpoint with per-partition lineage + metrics").

The reference has no checkpointing — only warm caches
(isochrone/cache.py, census/infrastructure/repository.py). Here every
persisted stage gets:

- a **stage manifest** ``manifest.json`` with the input fingerprint
  (paths + mtimes + stage params), row count and status — a rerun with
  the same fingerprint skips the stage and reads its parquet output;
- a **lineage table** ``lineage.parquet`` with per-partition metrics
  (partition key -> rows), computed as a grouped count during the write.

Outputs are written to a temp dir and renamed (atomic publish), so a
killed run never leaves a half-written stage that a resume would trust.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

import ray.data as rd


def fingerprint(inputs: list[str], stage: str, params: dict | None = None) -> str:
    h = hashlib.sha256()
    h.update(stage.encode())
    for p in sorted(inputs):
        st = os.stat(p)
        h.update(f"{p}:{st.st_size}:{int(st.st_mtime)}".encode())
    h.update(json.dumps(params or {}, sort_keys=True, default=str).encode())
    return h.hexdigest()[:32]


def is_complete(out_dir: str, fp: str) -> bool:
    m = os.path.join(out_dir, "manifest.json")
    if not os.path.exists(m):
        return False
    try:
        with open(m) as f:
            meta = json.load(f)
        return meta.get("fingerprint") == fp and meta.get("status") == "complete"
    except (json.JSONDecodeError, OSError):
        return False


def checkpoint_stage(ds_factory, out_dir: str, *, stage: str,
                     inputs: list[str], params: dict | None = None,
                     partition_col: str | None = None):
    """Run ``ds_factory()`` -> write parquet + lineage; or skip if done.

    Returns a Dataset reading the (existing or fresh) checkpoint. This is
    the stage-boundary persistence of SURVEY.md §7.1 step 7: placed
    after shuffles, it makes groupby/sort pipelines resumable.
    """
    fp = fingerprint(inputs, stage, params)
    if is_complete(out_dir, fp):
        return rd.read_parquet(os.path.join(out_dir, "data"))

    tmp = f"{out_dir}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "data"), exist_ok=True)

    ds = ds_factory()
    ds.write_parquet(os.path.join(tmp, "data"))
    out = rd.read_parquet(os.path.join(tmp, "data"))
    n_rows = out.count()

    lineage_path = os.path.join(tmp, "lineage.parquet")
    if partition_col is not None and n_rows > 0:
        lin = out.groupby(partition_col).count()
        lin.write_parquet(lineage_path)

    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump({"stage": stage, "fingerprint": fp, "rows": n_rows,
                   "status": "complete", "partition_col": partition_col,
                   "written_at": time.time()}, f)

    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)
    return rd.read_parquet(os.path.join(out_dir, "data"))


def read_lineage(out_dir: str):
    p = os.path.join(out_dir, "lineage.parquet")
    return rd.read_parquet(p) if os.path.exists(p) else None
