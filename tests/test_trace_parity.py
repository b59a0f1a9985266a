"""Golden parity: our torch tracer must produce byte-identical graphs to the
reference builder (/root/reference/ghn3/graph.py) for a family of architectures.
The pretrained checkpoints depend on these exact graph semantics."""
import copy

import numpy as np
import pytest

torch = pytest.importorskip('torch')

from conftest import enable_reference_import, reference_available
from torch_model_zoo import ZOO

from ghn3_tpu.graph.torch_trace import trace_torch_model

pytestmark = pytest.mark.skipif(not reference_available(), reason='reference repo not mounted')


def _reference_graph(model, ve_cutoff=50):
    enable_reference_import()
    from ghn3.graph import Graph
    return Graph(model, ve_cutoff=ve_cutoff)


@pytest.mark.parametrize('name', sorted(ZOO))
def test_graph_matches_reference(name):
    torch.manual_seed(0)
    model = ZOO[name]()
    ref = _reference_graph(copy.deepcopy(model))
    ours = trace_torch_model(model)

    assert ours.n_nodes == ref.n_nodes, (name, ours.n_nodes, ref.n_nodes)
    np.testing.assert_array_equal(ours.node_op, ref.node_feat.numpy().reshape(-1),
                                  err_msg=f'{name}: node primitive mismatch')
    np.testing.assert_array_equal(ours.adj, ref._Adj.numpy(),
                                  err_msg=f'{name}: adjacency (incl. virtual edges) mismatch')

    ref_shapes = [None if s is None else tuple(s) for s in ref._param_shapes]
    ours_shapes = [None if s is None else tuple(s) for s in ours.param_shapes]
    assert ours_shapes == ref_shapes, name

    assert len(ours.node_info) == len(ref.node_info)
    for cell_ours, cell_ref in zip(ours.node_info, ref.node_info):
        assert len(cell_ours) == len(cell_ref), name
        for np_ours, row_ref in zip(cell_ours, cell_ref):
            node_ind, p_name, op, sz, last_w, last_b = row_ref
            assert np_ours.node_ind == node_ind, (name, np_ours, row_ref)
            assert np_ours.param_name == p_name, (name, np_ours, row_ref)
            assert np_ours.op == op, (name, np_ours, row_ref)
            assert (np_ours.sz is None) == (sz is None)
            if sz is not None:
                assert tuple(np_ours.sz) == tuple(sz), (name, np_ours, row_ref)
            assert np_ours.is_last_weight == bool(last_w)
            assert np_ours.is_last_bias == bool(last_b)


@pytest.mark.parametrize('depth', [60])
def test_deep_graph_parity(depth):
    """Deep chains (hundreds of nodes): recursion limits, virtual-edge cutoff."""
    from torch_model_zoo import PlainCNN
    torch.manual_seed(0)
    model = PlainCNN(depth=depth)
    ref = _reference_graph(copy.deepcopy(model))
    ours = trace_torch_model(model)
    assert ours.n_nodes == ref.n_nodes > 100
    np.testing.assert_array_equal(ours.adj, ref._Adj.numpy())
    # virtual edges capped at the cutoff
    assert ours.adj.max() == 50
