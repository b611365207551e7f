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

import pandas as pd
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


# ---------------------------------------------------------------------------
# Partition-level resumable writes
# ---------------------------------------------------------------------------

def _part_manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifests")


def read_partitions(out_dir: str, partition_col: str,
                    values: list[str] | None = None):
    """Read a hive-partitioned output, pruning to ``values`` at the READ
    (only the matching partition directories are listed and opened —
    SURVEY.md 'prune at the read'). ``values=None`` reads everything."""
    if values is None:
        return rd.read_parquet(out_dir)
    # expand to explicit files: read_parquet with a LIST of directories
    # is unreliable (tries to open the dirs as files)
    paths = []
    for v in values:
        p = os.path.join(out_dir, f"{partition_col}={v}")
        if os.path.isdir(p):
            paths.extend(os.path.join(p, f) for f in sorted(os.listdir(p))
                         if f.endswith(".parquet"))
    if not paths:
        raise FileNotFoundError(
            f"no partitions {values!r} under {out_dir} "
            f"(completed: {sorted(completed_partitions(out_dir))})")
    return rd.read_parquet(paths)


def completed_partitions(out_dir: str) -> set[str]:
    d = _part_manifest_dir(out_dir)
    if not os.path.isdir(d):
        return set()
    return {f[:-5] for f in os.listdir(d) if f.endswith(".json")}


def resumable_partitioned_write(ds, out_dir: str, partition_col: str,
                                fp: str = "") -> dict:
    """Write ``ds`` as one parquet directory per partition value, with a
    per-partition manifest; a rerun skips partitions whose manifest
    exists (north rule: "resume = anti-join manifest vs plan").

    Crash safety: every run writes its files into a hidden per-run
    staging dir inside each partition (``.run-<id>/`` — dot-prefixed
    paths are invisible to Arrow dataset discovery, so readers never
    see in-flight files). After the stream finishes, each partition is
    PUBLISHED: stale visible files and other runs' staging dirs are
    cleared first (the partition has no manifest, so nothing trusted is
    lost), then this run's files move up and the manifest is written.
    A killed run therefore leaves either (a) only invisible staging
    files, or (b) a partition mid-publish without a manifest — both
    rewritten cleanly by the next resume, never silently duplicated.
    Ray-retried write tasks are also safe: every staged file gets a
    fresh unique name AND the writing batch RECORDS that name in its
    output table — publish moves exactly the files recorded in the
    collected stats. Ray discards the outputs of failed task attempts,
    so a retried task's earlier partial files are never in the stats;
    they linger invisibly in the staging dir and are deleted with it.
    (Deterministic (task, seq) names cannot serve here: Ray caches
    deserialized UDFs per worker process, so a retry on a live worker
    resumes the closure's counter and mints NEW names — silently
    publishing both attempts.) The manifest row count comes from the
    published files' parquet metadata, which now equals the stats sum.
    """
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as papq

    done = completed_partitions(out_dir)
    os.makedirs(_part_manifest_dir(out_dir), exist_ok=True)
    run_id = uuid.uuid4().hex[:12]

    written: set[str] = set()

    def write_batch(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out_rows = {"partition": [], "rows": [], "fname": []}
        for val, grp in df.groupby(partition_col, sort=False):
            key = str(val)
            if key in done:
                continue
            stage = os.path.join(out_dir, f"{partition_col}={key}",
                                 f".run-{run_id}")
            os.makedirs(stage, exist_ok=True)
            fname = f"part-{uuid.uuid4().hex}.parquet"
            tmp = os.path.join(stage, f".tmp-{fname}")
            papq.write_table(pa.Table.from_pandas(grp, preserve_index=False),
                             tmp, compression="snappy")
            os.rename(tmp, os.path.join(stage, fname))
            out_rows["partition"].append(key)
            out_rows["rows"].append(len(grp))
            out_rows["fname"].append(fname)
        return pa.table(out_rows)

    stats = ds.map_batches(write_batch, batch_format="pyarrow").to_pandas()
    if len(stats):
        for key, part_stats in stats.groupby("partition"):
            key = str(key)
            pdir = os.path.join(out_dir, f"{partition_col}={key}")
            stage = os.path.join(pdir, f".run-{run_id}")
            # publish: clear stale visible files + other runs' staging
            # (partition is unmarked -> nothing here is trusted yet)
            for entry in os.listdir(pdir):
                p = os.path.join(pdir, entry)
                if entry == f".run-{run_id}":
                    continue
                if os.path.isdir(p):
                    shutil.rmtree(p, ignore_errors=True)
                else:
                    os.remove(p)
            n_pub = 0
            # only files recorded by SUCCESSFUL task attempts move up;
            # failed-attempt leftovers die with the staging dir below
            for fname in sorted(part_stats["fname"]):
                src = os.path.join(stage, fname)
                os.rename(src, os.path.join(pdir, fname))
                n_pub += papq.ParquetFile(
                    os.path.join(pdir, fname)).metadata.num_rows
            shutil.rmtree(stage, ignore_errors=True)
            with open(os.path.join(_part_manifest_dir(out_dir),
                                   f"{key}.json"), "w") as f:
                json.dump({"partition": key, "rows": int(n_pub),
                           "fingerprint": fp,
                           "written_at": time.time()}, f)
            written.add(key)
    return {"written": sorted(written), "skipped": sorted(done)}
