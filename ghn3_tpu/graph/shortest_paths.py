"""All-pairs shortest path lengths for DAG computational graphs (virtual edges).

Replaces the reference's networkx `all_pairs_shortest_path_length`
(/root/reference/ghn3/graph.py:791-797) with a vectorized numpy DP that exploits
the topological ordering of the graph: processing nodes in topo order, the
distance column of node v is the elementwise min over predecessor columns + 1.
Complexity O(E·N) with N-length vector ops, instead of per-source Python BFS.
"""

from __future__ import annotations

import numpy as np

_INF = np.int32(2 ** 20)


def topological_order(adj: np.ndarray) -> np.ndarray:
    """Kahn's algorithm. ``adj`` is a (possibly weighted) [N, N] matrix where
    nonzero adj[i, j] means an edge i -> j. Returns the node order; raises if cyclic."""
    a = adj > 0
    n = a.shape[0]
    indeg = a.sum(0)
    order = np.empty(n, dtype=np.int64)
    stack = list(np.where(indeg == 0)[0][::-1])
    k = 0
    while stack:
        u = stack.pop()
        order[k] = u
        k += 1
        for v in np.where(a[u])[0][::-1]:
            indeg[v] -= 1
            if indeg[v] == 0:
                stack.append(v)
    if k != n:
        raise ValueError('graph has a cycle; topological sort impossible')
    return order


def dag_all_pairs_shortest_paths(adj: np.ndarray, cutoff: int = 50,
                                 order: np.ndarray | None = None) -> np.ndarray:
    """Shortest path length between every node pair of a DAG.

    :param adj: [N, N] adjacency; nonzero entries are (1-hop) edges. Values > 1 are
        ignored (treated as existing edges of length 1 — callers should pass a binary
        matrix when recomputing virtual edges).
    :param cutoff: maximum path length to record; longer pairs get 0.
    :param order: topological order if already known.
    :return: [N, N] int32 matrix D with D[i, j] = shortest path length i -> j
        (0 where no path within cutoff; diagonal is 0).
    """
    a = adj > 0
    n = a.shape[0]
    if order is None:
        order = topological_order(a)
    dist = np.full((n, n), _INF, dtype=np.int32)
    np.fill_diagonal(dist, 0)
    for v in order:
        preds = np.where(a[:, v])[0]
        if len(preds) == 0:
            continue
        # dist[:, v] = min over predecessors u of dist[:, u] + 1
        cand = dist[:, preds].min(axis=1) + 1
        np.minimum(dist[:, v], cand, out=dist[:, v])
    dist[dist > cutoff] = 0
    np.fill_diagonal(dist, 0)
    return dist


def add_virtual_edges(adj: np.ndarray, cutoff: int = 50) -> np.ndarray:
    """Augment a binary DAG adjacency with virtual edges: entry (i, j) becomes the
    shortest path length i -> j for all pairs within ``cutoff`` (reference semantics:
    graph.py:791-797 — existing 1-hop edges keep value 1).

    Uses the native C++ BFS kernel when available (ghn3_tpu/native), falling back
    to the vectorized numpy DP."""
    if cutoff <= 1:
        return adj.astype(np.int32)
    try:
        from .. import native
        out = native.add_virtual_edges(adj, cutoff)
        if out is not None:
            return out
    except Exception:
        pass
    dist = dag_all_pairs_shortest_paths(adj, cutoff=cutoff)
    out = adj.astype(np.int32).copy()
    fill = (out == 0) & (dist > 0)
    out[fill] = dist[fill]
    return out
