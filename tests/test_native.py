"""Native C++ graph kernels: correctness vs numpy/networkx and availability."""
import numpy as np
import pytest

from ghn3_tpu.graph.shortest_paths import dag_all_pairs_shortest_paths
from ghn3_tpu import native


def _random_dag(n, p, rng):
    a = (rng.random((n, n)) < p).astype(np.int32)
    return np.triu(a, k=1)  # topo-ordered DAG


def test_native_builds():
    assert native.get_lib() is not None, 'C++ toolchain failed to build graphfast'


def test_apsp_matches_numpy():
    rng = np.random.default_rng(0)
    for n, p in [(10, 0.3), (50, 0.1), (200, 0.02)]:
        a = _random_dag(n, p, rng)
        ref = dag_all_pairs_shortest_paths(a, cutoff=50)
        out = native.apsp(a, 50)
        np.testing.assert_array_equal(out, ref)


def test_apsp_matches_networkx():
    import networkx as nx
    rng = np.random.default_rng(1)
    a = _random_dag(60, 0.08, rng)
    out = native.apsp(a, 7)
    g = nx.DiGraph(a)
    lengths = dict(nx.all_pairs_shortest_path_length(g, cutoff=7))
    ref = np.zeros_like(out)
    for i, row in lengths.items():
        for j, d in row.items():
            ref[i, j] = d
    np.testing.assert_array_equal(out, ref)


def test_virtual_edges_preserve_one_hop():
    rng = np.random.default_rng(2)
    a = _random_dag(40, 0.1, rng)
    out = native.add_virtual_edges(a, 50)
    assert ((out == 1) >= (a == 1)).all()
    assert (out[a == 1] == 1).all()
