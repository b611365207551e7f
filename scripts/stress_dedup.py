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

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 \
    and sys.argv[1].isdigit() else 960_000
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


def near_dup_stress(n_docs: int = 200_000, n_unique: int = 10_000):
    """Near-duplicate (NOT exact) stress: each unique text spawns ~20
    variants with one word replaced per variant, so the exact
    collapse is a no-op and the LSH -> distributed verify -> CC path
    carries the full load. Expect ~n_unique components."""
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from socialmapper_ray.stages import dedup

    rng = np.random.default_rng(7)
    bases = [list(rng.choice(WORDS, size=30)) + [f"tail{u}"]
             for u in range(n_unique)]
    ids = np.arange(n_docs, dtype=np.int64)
    which = ids % n_unique
    variant = ids // n_unique
    frames = []
    for lo in range(0, n_docs, 50_000):
        hi = min(lo + 50_000, n_docs)
        texts = []
        for i in range(lo, hi):
            w = list(bases[which[i]])
            # variant v replaces word (v mod 30) with a variant marker —
            # ~1/31 token difference, jaccard >> 0.5 vs the base
            v = int(variant[i])
            if v:
                w[v % 30] = f"var{v}"
            texts.append(" ".join(w))
        frames.append(pd.DataFrame({"doc_id": ids[lo:hi], "text": texts}))
    ds = rd.from_pandas(frames).materialize()

    t0 = time.perf_counter()
    keep = dedup.minhash_dedup_keep_distributed(ds).materialize()
    dt = time.perf_counter() - t0
    kdf = keep.to_pandas()
    print(json.dumps({
        "mode": "near_dup", "n_docs": n_docs, "n_unique": n_unique,
        "keep_sec": round(dt, 2),
        "docs_per_sec": round(n_docs / dt, 1),
        "n_components": int(kdf["component"].nunique()),
        "kept": int(kdf["keep"].sum())}))
    ray.shutdown()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--near-dup":
        near_dup_stress()
    else:
        main()
