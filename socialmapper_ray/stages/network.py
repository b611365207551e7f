"""Network-based isochrone bands: shortest-path travel times over a
road graph (the TRUE reference ST2 semantics — reference
isochrone/clustering.py:335-432 runs ego-graph traversals over an
OSMnx network per POI and hulls the reachable nodes; here the traversal
itself is the operator).

Ray-Data shape: the road graph is the classic *broadcast small side*
(a continental road network is ~10^8 edges — fits one worker heap; the
POI/source stream is the unbounded side). Edges ship ONCE per actor via
``ray.put``; the source Dataset streams through an actor pool where
each batch runs one vectorized single-source relaxation per source.

The per-source kernel is Bellman-Ford-by-rounds on dense numpy arrays
(``np.minimum.at`` scatter over the full edge list per round, terminate
when no distance improves). For lattice-ish graphs this converges in
O(diameter) rounds of O(E) vectorized work — no Python per-node loop,
no heap. A priority-queue Dijkstra wins asymptotically but loses to
vectorization at the graph sizes a single actor holds; partitioned
graphs (beyond one heap) would shard by region and stitch boundary
nodes — documented, not needed at this scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

BAND_S = 300  # band width: 5 simulated minutes
MAX_DIST_S = 900  # isochrone horizon (3 bands)

# Per-highway-class speed model (reference M13,
# isochrone/travel_modes.py:12-152: default + per-highway-type speeds
# per travel mode). Integer km/h so the derived edge weights are exact
# integers in both the engine and the SQL oracle:
#   w_s = max(1, (len_m * 36) // (speed_kmh * 10))
# (= len_m / (speed_kmh / 3.6) floored — same single integer division
# on both sides).
SPEED_KMH = {
    "drive": {"motorway": 110, "primary": 80, "residential": 40, "path": 10},
    "bike": {"motorway": 24, "primary": 20, "residential": 15, "path": 12},
    "walk": {"motorway": 4, "primary": 5, "residential": 5, "path": 6},
}
#: per-mode isochrone horizon (slow modes need a wider time window to
#: reach anything; band width stays BAND_S for every mode)
MODE_CAP_S = {"drive": 900, "bike": 1800, "walk": 3600}


def mode_edge_weights(len_m: np.ndarray, hw_class, mode: str) -> np.ndarray:
    """Mode-dependent integer edge travel times from physical length +
    highway class. Vectorized: classes factorize once, speeds gather."""
    codes, uniq = pd.factorize(np.asarray(hw_class), sort=False)
    table = SPEED_KMH[mode]
    speed = np.asarray([table[c] for c in uniq], dtype=np.int64)[codes]
    w = (np.asarray(len_m, dtype=np.int64) * 36) // (speed * 10)
    return np.maximum(w, 1)


def edges_ref_from_parquet(path: str, mode: str | None = None):
    """Load the edge list once on the driver and pin it in the object
    store (src, dst, w int64 arrays). ``mode=None`` uses the static
    per-edge ``w_s``; a travel mode derives weights from (len_m,
    hw_class) via :data:`SPEED_KMH`."""
    import pyarrow.parquet as pq

    if mode is None:
        t = pq.read_table(path, columns=["src", "dst", "w_s"])
        w = t["w_s"].to_numpy().astype(np.int64)
    else:
        t = pq.read_table(path, columns=["src", "dst", "hw_class", "len_m"])
        w = mode_edge_weights(t["len_m"].to_numpy(),
                              t["hw_class"].to_pylist(), mode)
    return ray.put((t["src"].to_numpy().astype(np.int64),
                    t["dst"].to_numpy().astype(np.int64), w))


def edges_ref_allmodes_from_parquet(path: str):
    """Load the edge list once and derive EVERY mode's weight vector
    into a single broadcast object ``(src, dst, {mode: w})``.

    One ``ray.put`` for the whole multi-mode job: the multimode band
    query runs as ONE actor pool over a mode-expanded source stream
    (each actor picks the weight vector by the row's mode), not as one
    pool per mode. Three fixed-size pools in one union DAG can reserve
    every CPU of a small session and starve the upstream read tasks —
    a deadlock, not a slowdown (observed at num_cpus=8: 8 actors, 0
    CPUs left, reads backpressured forever)."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["src", "dst", "hw_class", "len_m"])
    len_m = t["len_m"].to_numpy()
    hw = t["hw_class"].to_pylist()
    w_by_mode = {m: mode_edge_weights(len_m, hw, m) for m in SPEED_KMH}
    return ray.put((t["src"].to_numpy().astype(np.int64),
                    t["dst"].to_numpy().astype(np.int64), w_by_mode))


def sssp_dists(src_arr: np.ndarray, dst_arr: np.ndarray, w_arr: np.ndarray,
               n_nodes: int, source: int, cap: int = MAX_DIST_S
               ) -> np.ndarray:
    """Vectorized single-source shortest paths (dist array, inf where
    unreachable or beyond ``cap``). Pure function — reused by tests as
    its own oracle harness against the SQL recursive-CTE oracle."""
    dist = np.full(n_nodes, np.iinfo(np.int64).max // 2, dtype=np.int64)
    dist[source] = 0
    for _ in range(n_nodes):  # diameter-bounded; lattice: ~2*sqrt(n)
        cand = dist[src_arr] + w_arr
        nxt = dist.copy()
        np.minimum.at(nxt, dst_arr, cand)
        if np.array_equal(nxt, dist):
            break
        dist = nxt
    dist[dist > cap] = np.iinfo(np.int64).max // 2
    return dist


def _band_rows_for_source(src_arr, dst_arr, w_arr, n_nodes_min: int,
                          node: int, cap: int,
                          extra: dict) -> pd.DataFrame:
    """One source's (node_id, dist_s, band) frame + constant extra
    columns — the kernel both routers share."""
    big = np.iinfo(np.int64).max // 2
    # a source beyond every edge endpoint (isolated node) still reaches
    # itself at distance 0 — size the array to include it
    n_nodes = max(n_nodes_min, node + 1)
    dist = sssp_dists(src_arr, dst_arr, w_arr, n_nodes, node, cap)
    reach = np.flatnonzero(dist < big)
    cols = {k: np.repeat(v, len(reach)) for k, v in extra.items()}
    cols.update({
        "node_id": reach.astype(np.int64),
        "dist_s": dist[reach],
        "band": dist[reach] // BAND_S,
    })
    return pd.DataFrame(cols)


def _empty_band_frame(extra_cols: tuple) -> pd.DataFrame:
    cols = {k: pd.Series(dtype=object) for k in extra_cols}
    cols.update({"node_id": pd.Series(dtype=np.int64),
                 "dist_s": pd.Series(dtype=np.int64),
                 "band": pd.Series(dtype=np.int64)})
    return pd.DataFrame(cols)


class NetworkBandRouter:
    """Actor-pool stage: source rows (center_id, node_id) ->
    (center_id, node_id, dist_s, band) rows for every node within the
    horizon. Graph CSR-ish arrays are fetched once in __init__."""

    def __init__(self, edges_ref, cap: int = MAX_DIST_S):
        self.src, self.dst, self.w = ray.get(edges_ref)
        self.n_nodes = int(max(self.src.max(), self.dst.max())) + 1
        self.cap = cap

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        outs = [
            _band_rows_for_source(self.src, self.dst, self.w,
                                  self.n_nodes, int(node), self.cap,
                                  {"center_id": cid})
            for cid, node in zip(df["center_id"], df["node_id"])]
        if not outs:
            return _empty_band_frame(("center_id",))
        return pd.concat(outs, ignore_index=True)[
            ["center_id", "node_id", "dist_s", "band"]]


class MultiModeBandRouter:
    """Single actor pool for every travel mode: rows are
    (mode, center_id, node_id); the actor picks the mode's weight
    vector + horizon per source. All modes share one broadcast edge
    object and one pool — the DAG stays one read -> one pool, so
    pool sizing composes the same as every other stage."""

    def __init__(self, edges_ref):
        self.src, self.dst, self.w_by_mode = ray.get(edges_ref)
        self.n_nodes = int(max(self.src.max(), self.dst.max())) + 1

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        outs = [
            _band_rows_for_source(self.src, self.dst,
                                  self.w_by_mode[mode], self.n_nodes,
                                  int(node), MODE_CAP_S[mode],
                                  {"mode": mode, "center_id": cid})
            for mode, cid, node in zip(df["mode"], df["center_id"],
                                       df["node_id"])]
        if not outs:
            return _empty_band_frame(("mode", "center_id"))
        return pd.concat(outs, ignore_index=True)[
            ["mode", "center_id", "node_id", "dist_s", "band"]]


def network_bands_multimode(sources_ds, edges_ref, concurrency: int = 4):
    """sources (center_id, node_id) -> per-(mode, node) band rows for
    every mode in SPEED_KMH, via ONE mode-expanded actor pool."""
    from ..util import clamp_concurrency

    modes = sorted(SPEED_KMH)

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.concat([df.assign(mode=m) for m in modes],
                        ignore_index=True)
        return out

    return sources_ds.map_batches(
        expand, batch_format="pandas").map_batches(
        MultiModeBandRouter,
        fn_constructor_args=(edges_ref,),
        batch_format="pandas", batch_size=8,
        concurrency=clamp_concurrency(concurrency, 1), num_cpus=1)


def network_bands(sources_ds, edges_ref, cap: int = MAX_DIST_S,
                  concurrency: int = 4):
    """sources Dataset (center_id, node_id) -> per-node travel-time
    band rows within ``cap`` seconds of each source."""
    from ..util import clamp_concurrency

    return sources_ds.map_batches(
        NetworkBandRouter,
        fn_constructor_args=(edges_ref, cap),
        batch_format="pandas", batch_size=8,
        concurrency=clamp_concurrency(concurrency, 1), num_cpus=1)
