"""Constructive genotype graphs vs traced torch-twin graphs.

Node order differs (both are valid topological orders), but the GHN is
permutation-equivariant, so the decisive check is equality of the predicted
parameters; plus structural invariants (node/op multisets, degree sums)."""
import collections

import numpy as np
import pytest

torch = pytest.importorskip('torch')

from ghn3_tpu import GHN3, GHNConfig
from ghn3_tpu.graph.genotypes import DARTS, Genotype, VIT
from ghn3_tpu.graph.graphdef import GraphBatch
from ghn3_tpu.graph.torch_trace import trace_torch_model
from ghn3_tpu.nets.darts import Network
from ghn3_tpu.nets.darts_graph import build_genotype_graph
from ghn3_tpu.nets.torch_darts import build_torch_network
from ghn3_tpu.predict import predict_batch

CFG = GHNConfig(hid=32, heads=2, layers=2, max_shape=(16, 16, 11, 11), num_classes=10)

CASES = [
    (Genotype(normal=[('conv_3x3', 0), ('conv_5x5', 1)], normal_concat=[2],
              reduce=[('conv_3x3', 0), ('skip_connect', 1)], reduce_concat=[2]),
     dict(n_cells=3, C=8, glob_avg=True, preproc=True, C_mult=1, fc_layers=1,
          fc_dim=0, stem_type=0, stem_pool=False, norm='bn', ks=3)),
    (Genotype(normal=[('sep_conv_3x3', 0), ('max_pool_3x3', 1)], normal_concat=[2],
              reduce=[('dil_conv_3x3', 0), ('avg_pool_3x3', 1)], reduce_concat=[2]),
     dict(n_cells=3, C=8, glob_avg=True, preproc=True, C_mult=2, fc_layers=1,
          fc_dim=0, stem_type=1, stem_pool=False, norm='bn', ks=3)),
    (VIT,
     dict(n_cells=2, C=8, glob_avg=True, preproc=True, C_mult=1, fc_layers=1,
          fc_dim=0, stem_type=0, stem_pool=False, norm='bn', ks=3)),
    (Genotype(normal=[('conv2_3x3', 0), ('avg_pool_3x3', 1)], normal_concat=[2],
              reduce=[('conv_3x3', 0), ('skip_connect', 1)], reduce_concat=[2]),
     dict(n_cells=3, C=8, glob_avg=True, preproc=True, C_mult=1, fc_layers=2,
          fc_dim=16, stem_type=0, stem_pool=True, norm='bn', ks=3)),
    (DARTS,
     dict(n_cells=5, C=8, glob_avg=True, preproc=True, C_mult=2, fc_layers=1,
          fc_dim=0, stem_type=0, stem_pool=False, norm='bn', ks=3)),
]


@pytest.mark.parametrize('case', range(len(CASES)))
def test_constructive_graph_matches_traced(case):
    genotype, args = CASES[case]
    twin = build_torch_network(genotype, num_classes=10, is_imagenet_input=False, **args)
    g_traced = trace_torch_model(twin, ve_cutoff=CFG.ve_cutoff)
    g_built = build_genotype_graph(genotype, num_classes=10, is_imagenet_input=False,
                                   ve_cutoff=CFG.ve_cutoff, **args)

    # structural invariants
    assert g_built.n_nodes == g_traced.n_nodes, case
    assert (collections.Counter(g_built.node_op.tolist())
            == collections.Counter(g_traced.node_op.tolist())), case
    assert (g_built.adj == 1).sum() == (g_traced.adj == 1).sum(), case
    assert g_built.adj.sum() == g_traced.adj.sum(), (case, 'virtual-edge mass differs')
    names_b = sorted(r.param_name for cell in g_built.node_info for r in cell)
    names_t = sorted(r.param_name for cell in g_traced.node_info for r in cell)
    assert names_b == names_t, case

    # decisive: identical predicted parameters (GHN is permutation-equivariant)
    ghn = GHN3(CFG, seed=4)
    fnet_a = Network(genotype=genotype, num_classes=10, is_imagenet_input=False,
                     imagenet_stride=4, auxiliary=False, **args)
    fnet_b = Network(genotype=genotype, num_classes=10, is_imagenet_input=False,
                     imagenet_stride=4, auxiliary=False, **args)
    predict_batch(ghn.params, CFG, GraphBatch.from_graphs([g_traced]),
                  [fnet_a.param_table()], sanity_check=True)
    predict_batch(ghn.params, CFG, GraphBatch.from_graphs([g_built]),
                  [fnet_b.param_table()], sanity_check=True)
    assert set(fnet_a.predicted) == set(fnet_b.predicted)
    for k in fnet_a.predicted:
        np.testing.assert_allclose(np.asarray(fnet_b.predicted[k]),
                                   np.asarray(fnet_a.predicted[k]),
                                   atol=2e-5, rtol=1e-4, err_msg=(case, k))


def test_cse_follows_dataset_convention():
    """The reference's traced CSE heuristic is traversal-order dependent
    (graph.py:721-729) and can drop the cse node, while DeepNets-1M dataset
    graphs always carry it; the constructive builder follows the dataset
    convention (the GHN training distribution)."""
    geno = Genotype(normal=[('cse', 0), ('skip_connect', 1)], normal_concat=[2],
                    reduce=[('cse', 0), ('skip_connect', 1)], reduce_concat=[2])
    args = dict(n_cells=2, C=8, glob_avg=True, preproc=True, C_mult=1, fc_layers=1,
                fc_dim=0, stem_type=0, stem_pool=False, norm='bn', ks=3)
    g = build_genotype_graph(geno, num_classes=10, is_imagenet_input=False,
                             ve_cutoff=50, **args)
    from ghn3_tpu.graph.primitives import PRIMITIVES
    ops = [PRIMITIVES[i] for i in g.node_op]
    assert ops.count('cse') == 2  # one per cell
    # every cse node has exactly two one-hop inputs (stream + gate chain)
    import numpy as np
    for i, op in enumerate(ops):
        if op == 'cse':
            assert int((g.adj[:, i] == 1).sum()) == 2

    ghn = GHN3(CFG, seed=0)
    fnet = Network(genotype=geno, num_classes=10, is_imagenet_input=False,
                   imagenet_stride=4, auxiliary=False, **args)
    predict_batch(ghn.params, CFG, GraphBatch.from_graphs([g]),
                  [fnet.param_table()], sanity_check=True)
    assert {n for n, _, _ in fnet.named_params()} == set(fnet.predicted)
