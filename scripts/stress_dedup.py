"""Viral-duplicate dedup stress (the r2/r3 comparison workload).

960k docs = 4,992 unique texts x ~192 copies each — the hot-key shape
the salted/star-cap paths exist for. Times exact dedup and the full
distributed minhash keep decision (LSH -> distributed verify ->
distributed connected components -> bucketed left join).

    PYTHONPATH=/root/repo python scripts/stress_dedup.py [n_docs]

Recorded history (32 cpus): exact 9.6 s (r2) -> 3.6 s (r3);
keep_distributed 50.5 s (r2).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 960_000
N_UNIQUE = max(1, N_DOCS // 192)

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
         "hotel", "india", "juliet", "kilo", "lima", "mike", "november"]


def make_corpus():
    import ray.data as rd

    rng = np.random.default_rng(42)
    uniq = [" ".join(rng.choice(WORDS, size=24)) + f" tail{u}"
            for u in range(N_UNIQUE)]
    ids = np.arange(N_DOCS, dtype=np.int64)
    which = ids % N_UNIQUE
    frames = []
    for lo in range(0, N_DOCS, 60_000):
        hi = min(lo + 60_000, N_DOCS)
        frames.append(pd.DataFrame({
            "doc_id": ids[lo:hi],
            "text": [uniq[w] for w in which[lo:hi]]}))
    return rd.from_pandas(frames)


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from socialmapper_ray.stages import dedup

    ds = make_corpus().materialize()

    t0 = time.perf_counter()
    n_kept_exact = dedup.exact_dedup(ds).count()
    t_exact = time.perf_counter() - t0

    t0 = time.perf_counter()
    keep = dedup.minhash_dedup_keep_distributed(ds).materialize()
    t_keep = time.perf_counter() - t0
    n_kept = keep.to_pandas()["keep"].sum()

    print(json.dumps({
        "n_docs": N_DOCS, "n_unique": N_UNIQUE,
        "exact_sec": round(t_exact, 2),
        "exact_docs_per_sec": round(N_DOCS / t_exact, 1),
        "exact_kept": int(n_kept_exact),
        "keep_distributed_sec": round(t_keep, 2),
        "keep_docs_per_sec": round(N_DOCS / t_keep, 1),
        "kept": int(n_kept)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
