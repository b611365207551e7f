"""Distributed embedding clustering + cluster-based semantic dedup.

Two training-data operators beyond the reference's surface (the
reference's only clustering is driver-side DBSCAN batching,
ref: socialmapper/isochrone/clustering.py:200-290 — used to batch
isochrone work, not to cluster data at scale):

- :func:`kmeans_fit_distributed` — Lloyd's k-means where every pass over
  the corpus is a ``map_batches`` partial-sufficient-statistics scan:
  each batch emits ONE (k x d sums, k counts) row, the driver folds the
  tiny partial table (bounded by block count, never by corpus size) and
  re-broadcasts centroids. This is the textbook mergeable-statistics
  reduction (same shape as the e4-histogram median in
  pipelines/relational.py), so at 100 TB the driver holds k*d floats
  and nothing else.
- :func:`semantic_dedup` — SemDeDup-style near-duplicate pruning
  (Abbas et al. 2023, arXiv:2303.09540): assign every vector to its
  k-means cluster, then find cosine near-dups ONLY within a cluster
  (groupby(cluster).map_groups) and keep the smallest vec_id of each
  near-dup group. Pairwise work is O(sum cluster_size^2), not
  O(corpus^2); skewed clusters are bounded by ``max_cluster`` with a
  loud error rather than a silent quadratic blowup.

Determinism: centroid init is the k vectors with the smallest
splitmix64(vec_id) — layout/parallelism-independent, no RNG — and every
reduction is a sum of floats in a FIXED fold order (partials sorted by
block index before folding), so refits on any block layout produce
byte-identical centroids (pytest: tests/test_cluster.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .ann import _emb_matrix, _normalize


def _seed_partial(batch: pa.Table, k: int) -> pa.Table:
    """Per-batch candidate seeds: the k locally smallest splitmix64(id)."""
    from ..sources.synth import splitmix64

    if batch.num_rows == 0:
        return pa.table({"hash": pa.array([], pa.uint64()),
                         "vec_id": pa.array([], pa.int64()),
                         "emb": pa.array([], pa.list_(pa.float64()))})
    ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    h = splitmix64(ids.astype(np.uint64))
    take = np.argsort(h, kind="stable")[:k]
    m = _emb_matrix(batch)[take]
    return pa.table({
        "hash": pa.array(h[take], pa.uint64()),
        "vec_id": pa.array(ids[take], pa.int64()),
        "emb": pa.array(list(m), pa.list_(pa.float64())),
    })


def _init_centroids(ds, k: int) -> np.ndarray:
    """Deterministic seeds: global k smallest splitmix64(vec_id).

    Partial top-k per batch -> driver merge of <= n_blocks * k tiny
    rows. Ties impossible (splitmix64 is a bijection over distinct ids).
    """
    parts = ds.map_batches(_seed_partial, batch_format="pyarrow",
                           fn_kwargs=dict(k=k)).to_pandas()
    parts = parts.sort_values("hash", kind="stable").head(k)
    return np.asarray([np.asarray(e, dtype=np.float64)
                       for e in parts["emb"]])


def _stats_partial(batch: pa.Table, cents_ref) -> pa.Table:
    """One row per batch: flattened per-cluster sum matrix + counts."""
    c = ray.get(cents_ref) if not isinstance(cents_ref, np.ndarray) \
        else cents_ref
    k, d = c.shape
    if batch.num_rows == 0:
        return pa.table({
            "sums": pa.array([np.zeros(k * d)], pa.list_(pa.float64())),
            "counts": pa.array([np.zeros(k, dtype=np.int64)],
                               pa.list_(pa.int64()))})
    x = _normalize(_emb_matrix(batch))
    assign = np.argmax(x @ c.T, axis=1)
    sums = np.zeros((k, d), dtype=np.float64)
    counts = np.zeros(k, dtype=np.int64)
    np.add.at(sums, assign, x)
    np.add.at(counts, assign, 1)
    return pa.table({
        "sums": pa.array([sums.ravel()], pa.list_(pa.float64())),
        "counts": pa.array([counts], pa.list_(pa.int64())),
    })


def _fit_on_sample(make_ds, k: int, iters: int, cap: int) -> np.ndarray:
    """Driver-side Lloyd on the ``cap`` rows with the smallest
    splitmix64(vec_id): ONE pass over the corpus collects the sample
    (per-batch partial top-cap, driver merge), then all ``iters``
    iterations run on the in-memory sample.

    Sample membership is a pure function of vec_id (layout- and
    parallelism-independent), rows are summed in vec_id-sorted order,
    and the k seeds are the k globally smallest hashes — which are BY
    CONSTRUCTION inside the sample — so the fit is byte-reproducible
    and uses the exact same seeding rule as the full-pass fit.
    """
    from ..sources.synth import splitmix64

    parts = make_ds().map_batches(_seed_partial, batch_format="pyarrow",
                                  fn_kwargs=dict(k=cap)).to_pandas()
    if len(parts) == 0:
        raise ValueError("kmeans_fit_distributed: no embedding rows to fit")
    parts = parts.sort_values("hash", kind="stable").head(cap)
    ids = parts["vec_id"].to_numpy(dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    m = np.asarray([np.asarray(e, dtype=np.float64)
                    for e in parts["emb"]])[order]
    h = splitmix64(ids.astype(np.uint64))
    c = _normalize(m[np.argsort(h, kind="stable")[:k]])
    k = c.shape[0]
    x = _normalize(m)
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        sums = np.zeros_like(c)
        counts = np.zeros(k, dtype=np.int64)
        np.add.at(sums, assign, x)
        np.add.at(counts, assign, 1)
        empty = counts == 0
        sums[empty] = c[empty]
        c = _normalize(sums)
    return c


def kmeans_fit_distributed(make_ds, k: int = 10, iters: int = 8,
                           fit_sample_cap: int | None = 65536) -> np.ndarray:
    """Fit k-means centroids; by default on a bounded deterministic
    sample, optionally with full streaming passes.

    ``fit_sample_cap`` (the 100 TB default, same economics as
    ann.fit_ivf_centroids): collect the ``cap`` rows with smallest
    splitmix64(vec_id) in ONE corpus pass and run Lloyd's on the driver
    — centroid QUALITY saturates far below corpus size, while full-pass
    fitting costs ``iters`` x corpus I/O just to move centroids. The
    caller then spends exactly one more pass on assignment. Set
    ``fit_sample_cap=None`` for exact full-corpus passes (mergeable
    k x d statistics per batch — the driver never holds more than the
    per-block partials): one streaming pass per iteration.

    ``make_ds`` is a zero-arg callable returning a fresh Dataset of
    (vec_id, embedding) — re-created per pass so no full-corpus
    materialization is pinned between iterations (at 100 TB each pass
    streams from storage; only the k x d statistics ever concentrate).
    Fixed ``iters`` (not a convergence test) keeps the pass count — and
    therefore the result — independent of float summation noise.

    When the corpus is <= ``fit_sample_cap`` the sample IS the corpus
    and both paths agree to summation-grouping float noise (pytest:
    tests/test_cluster.py).
    """
    if fit_sample_cap is not None:
        return _fit_on_sample(make_ds, k, iters, fit_sample_cap)
    c = _init_centroids(make_ds(), k)
    if c.size == 0:
        raise ValueError(
            "kmeans_fit_distributed: no embedding rows to fit")
    c = _normalize(c)
    # fewer rows than requested clusters: fit what exists (c's row
    # count, not the request, drives every downstream shape)
    k = c.shape[0]
    d = c.shape[1]
    for _ in range(iters):
        ref = ray.put(c)
        parts = make_ds().map_batches(
            _stats_partial, batch_format="pyarrow",
            fn_kwargs=dict(cents_ref=ref)).to_pandas()
        # bounded: one row per input block. Fold in a fixed order so the
        # float sums are reproducible across runs and layouts.
        sums = np.zeros((k, d), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        # the partials carry no block id, so sort by the raw bytes of
        # the counts+sums vectors for a total deterministic fold order
        rows = [(np.asarray(r["counts"], dtype=np.int64),
                 np.asarray(r["sums"], dtype=np.float64).reshape(k, d))
                for _, r in parts.iterrows()]
        rows.sort(key=lambda t: (t[0].tobytes(), t[1].tobytes()))
        for cnt, sm in rows:
            sums += sm
            counts += cnt
        new = sums
        empty = counts == 0
        new[empty] = c[empty]           # keep dead centroids in place
        c = _normalize(new)
    return c


def assign_clusters(ds, centroids: np.ndarray, keep_embedding: bool = False):
    """(vec_id, cluster[, embedding]) via one broadcast-matmul pass."""
    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def fn(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        if batch.num_rows == 0:
            cols = {"vec_id": pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64())}
            if keep_embedding:
                cols["embedding"] = pa.array([], pa.list_(pa.float64()))
            return pa.table(cols)
        x = _normalize(_emb_matrix(batch))
        assign = np.argmax(x @ c.T, axis=1).astype(np.int64)
        cols = {
            "vec_id": batch["vec_id"],
            "cluster": pa.array(assign, pa.int64()),
        }
        if keep_embedding:
            cols["embedding"] = batch["embedding"]
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def semantic_dedup(ds, centroids: np.ndarray, threshold: float = 0.95,
                   max_cluster: int = 200_000):
    """SemDeDup keep flags: within each k-means cluster, drop any vector
    whose cosine similarity to an already-kept lower-id vector is
    >= ``threshold``.

    -> Dataset(vec_id int64, cluster int64, keep bool). One shuffle
    (groupby cluster); per-cluster work is a vectorized greedy scan in
    vec_id order (deterministic independent of layout). Clusters larger
    than ``max_cluster`` RAISE: at that size the caller should refit
    with a larger k rather than let one group go quadratic.
    """
    assigned = assign_clusters(ds, centroids, keep_embedding=True)

    def per_cluster(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > max_cluster:
            raise ValueError(
                f"semantic_dedup: cluster of {len(g)} rows exceeds "
                f"max_cluster={max_cluster}; refit with larger k")
        order = np.argsort(g["vec_id"].to_numpy(), kind="stable")
        ids = g["vec_id"].to_numpy()[order]
        m = _normalize(np.asarray(
            [np.asarray(e, dtype=np.float64) for e in g["embedding"]]
        )[order])
        n = len(ids)
        keep = np.ones(n, dtype=bool)
        # greedy in id order: vec i is dropped iff some kept j<i is
        # close. The kept set grows incrementally into a preallocated
        # buffer — one matvec per row, no per-step boolean recopy.
        kept_buf = np.empty_like(m)
        kept_buf[0] = m[0]
        n_kept = 1
        for i in range(1, n):
            if (kept_buf[:n_kept] @ m[i]).max() >= threshold:
                keep[i] = False
            else:
                kept_buf[n_kept] = m[i]
                n_kept += 1
        return pd.DataFrame({
            "vec_id": ids.astype(np.int64),
            "cluster": np.full(n, int(g["cluster"].iloc[0]), dtype=np.int64),
            "keep": keep,
        })

    return assigned.groupby("cluster").map_groups(
        per_cluster, batch_format="pandas")


def semantic_dedup_reference(ids: np.ndarray, m: np.ndarray,
                             clusters: np.ndarray,
                             threshold: float = 0.95) -> pd.DataFrame:
    """In-memory dual oracle for tests: same semantics, plain loops."""
    out = []
    for cl in np.unique(clusters):
        sel = clusters == cl
        cids = ids[sel]
        cm = _normalize(m[sel])
        order = np.argsort(cids, kind="stable")
        cids, cm = cids[order], cm[order]
        kept_idx: list[int] = []
        for i in range(len(cids)):
            drop = any(float(cm[j] @ cm[i]) >= threshold for j in kept_idx)
            out.append((int(cids[i]), int(cl), not drop))
            if not drop:
                kept_idx.append(i)
    return pd.DataFrame(out, columns=["vec_id", "cluster", "keep"]) \
        .sort_values("vec_id").reset_index(drop=True)
