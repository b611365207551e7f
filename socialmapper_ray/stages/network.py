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


def edges_ref_from_parquet(path: str):
    """Load the edge list once on the driver and pin it in the object
    store (src, dst, w_s int64 arrays)."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["src", "dst", "w_s"])
    return ray.put((t["src"].to_numpy().astype(np.int64),
                    t["dst"].to_numpy().astype(np.int64),
                    t["w_s"].to_numpy().astype(np.int64)))


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


class NetworkBandRouter:
    """Actor-pool stage: source rows (center_id, node_id) ->
    (center_id, node_id, dist_s, band) rows for every node within the
    horizon. Graph CSR-ish arrays are fetched once in __init__."""

    def __init__(self, edges_ref, cap: int = MAX_DIST_S):
        self.src, self.dst, self.w = ray.get(edges_ref)
        self.n_nodes = int(max(self.src.max(), self.dst.max())) + 1
        self.cap = cap

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        big = np.iinfo(np.int64).max // 2
        for cid, node in zip(df["center_id"], df["node_id"]):
            # a source beyond every edge endpoint (isolated node) still
            # reaches itself at distance 0 — size the array to include it
            n_nodes = max(self.n_nodes, int(node) + 1)
            dist = sssp_dists(self.src, self.dst, self.w, n_nodes,
                              int(node), self.cap)
            reach = np.flatnonzero(dist < big)
            outs.append(pd.DataFrame({
                "center_id": np.repeat(cid, len(reach)),
                "node_id": reach.astype(np.int64),
                "dist_s": dist[reach],
                "band": dist[reach] // BAND_S,
            }))
        if not outs:
            return pd.DataFrame({
                "center_id": pd.Series(dtype=object),
                "node_id": pd.Series(dtype=np.int64),
                "dist_s": pd.Series(dtype=np.int64),
                "band": pd.Series(dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)


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
