"""Small engine utilities."""

from __future__ import annotations


def clamp_concurrency(requested: int, num_cpus_per_actor: float = 0.5,
                      reserve_cpus: float = 1.0) -> int:
    """Clamp an actor-pool size so the pool cannot starve upstream
    task-based stages: pool_cpus <= cluster_cpus - reserve.

    An oversized pool on a small session does not fail — it stalls the
    whole pipeline to a crawl (measured: flagship at concurrency=6 on a
    4-cpu session runs ~7x slower than at 3). A pipeline typically runs
    up to TWO actor pools concurrently (e.g. PIP join + enrich), so each
    pool gets half of the non-reserved CPUs. Library stage wrappers
    call this so callers' concurrency hints are safe by construction.
    """
    try:
        import ray

        cpus = float(ray.cluster_resources().get("CPU", 0)) or None
    except Exception:
        cpus = None
    if not cpus:
        return max(1, requested)
    budget = max(0.5, (cpus - reserve_cpus) / 2.0)
    max_pool = max(1, int(budget / max(num_cpus_per_actor, 1e-6)))
    return max(1, min(requested, max_pool))


def read_parquet_clean(path: str, columns: list[str] | None = None,
                       **kwargs):
    """``ray.data.read_parquet`` with the file's ``pandas`` schema
    metadata stripped.

    Driver-written parquet carries pyarrow's pandas metadata blob; Ray's
    batcher hashes block schemas to dedup them before unify and a
    metadata dict makes ``hash(schema)`` raise, logging a per-task
    warning and forcing the slow unify path on every batch. Passing an
    explicit metadata-free (column-pruned) schema to the read makes
    every downstream block schema hashable.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    import glob
    import os

    f = path
    if os.path.isdir(path):
        f = sorted(glob.glob(os.path.join(path, "*.parquet")))[0]
    full = pq.read_schema(f).remove_metadata()
    if columns is not None:
        schema = pa.schema([full.field(c) for c in columns])
        return rd.read_parquet(path, columns=columns, schema=schema,
                               **kwargs)
    return rd.read_parquet(path, schema=full, **kwargs)


def lcg32(ids):
    """Repartition-stable 32-bit LCG hash of int64 keys — THE sampling
    hash of this engine (sample_docs_hash / stratified_sample / IVF fit
    all share it, and its SQL form is written literally in their
    oracles: ((x % 2^32) * 1103515245 + 12345) % 2^32). All arithmetic
    stays below 2^63, so int64 is exact on both engines."""
    import numpy as np

    ids = np.asarray(ids, dtype=np.int64)
    return ((ids % 4294967296) * 1103515245 + 12345) % 4294967296


def tree_combine(partials, combine_fn, width: int | None = None,
                 batch_format: str = "pandas"):
    """2-level ROUND-ROBIN combine of per-batch partial aggregates.

    For finals whose KEY cardinality is bounded (a handful of groups, a
    config-sized top-k) but whose PARTIAL count grows with the input
    block count: a single ``repartition(1)`` final is unbounded in
    blocks (groups x n_blocks rows into one task at 1e7 blocks), while
    a keyed shuffle costs a sort the tiny key set doesn't need. Level 1
    folds into <= width blocks of <= |keys| rows each; level 2 folds
    those in one task whose input is <= width x |keys| rows — bounded
    by CONFIG, not by data. ``combine_fn`` must be associative and
    idempotent on its own output (grouped sum/min/max/top-k over
    partial rows). Unbounded-key finals need a keyed exchange instead
    (see stages/zonal.py).
    """
    if width is None:
        from .stages.zonal import _auto_buckets

        width = _auto_buckets()
    lvl1 = partials.repartition(width).map_batches(
        combine_fn, batch_format=batch_format, batch_size=None)
    return lvl1.repartition(1).map_batches(
        combine_fn, batch_format=batch_format, batch_size=None)


def route_hash64(values) -> "np.ndarray":
    """Vectorized deterministic 64-bit hash of a key column for bucket
    ROUTING (never a semantic fingerprint — the engine's content hashes
    stay crc32/splitmix64). Routing only needs the same key to land in
    the same bucket on every worker; pandas' fixed-key siphash gives
    that at C speed and replaces the per-unique-key Python
    ``zlib.crc32`` loops that were the last per-row Python inside any
    partial stage. Returns non-negative int64."""
    import numpy as np
    import pandas as pd

    arr = np.asarray(values)
    h = pd.util.hash_array(arr, categorize=True)
    # int64 view + mask instead of uint64 arithmetic (uint64 ops have
    # no SIMD path on this box — memory: 13x slower than int64)
    return h.view(np.int64) & np.int64(0x7FFFFFFFFFFFFFFF)
