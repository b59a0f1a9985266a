"""Full-size zoo architectures: graphs identical to the reference builder and
every parameter matched/predictable (the reference's debug_level-1 guarantee)."""
import copy

import numpy as np
import pytest

torch = pytest.importorskip('torch')

from conftest import enable_reference_import, reference_available

from ghn3_tpu import GHNConfig
from ghn3_tpu.graph.graphdef import GraphBatch
from ghn3_tpu.graph.torch_trace import trace_torch_model
from ghn3_tpu.predict import build_plan, plan_stats
from ghn3_tpu.torch_interop import torch_param_table
from ghn3_tpu.zoo.torch_zoo import TORCH_ZOO

CFG = GHNConfig(hid=16, heads=2, layers=1, max_shape=(16, 16, 11, 11), num_classes=10)

NEW_FAMILIES = ['alexnet', 'vgg11', 'googlenet', 'mnasnet1_0',
                'shufflenet_v2_x1_0', 'regnet_y_400mf', 'efficientnet_v2_s_ish']

ARCHS = ['mobilenet_v2', 'squeezenet1_1', 'densenet121', 'efficientnet_b0ish',
         'vgg16_bn', 'resnet50', 'vit_b_16', 'inception_v3ish'] + NEW_FAMILIES


def _small(name):
    kwargs = {'num_classes': 10}
    if name == 'vit_b_16':
        kwargs.update(dim=32, depth=2, heads=2, patch=8)
    if name == 'inception_v3ish':
        kwargs.update(c=8)
    if name in NEW_FAMILIES:
        kwargs.update(w=0.25)
    m = TORCH_ZOO[name](**kwargs)
    if name == 'vit_b_16':
        m.expected_input_sz = 32
    elif name != 'inception_v3ish':   # inception keeps its 299px default
        m.expected_input_sz = 64
    m.train()   # aux-head families trace their training-mode graphs
    return m


@pytest.mark.parametrize('name', ARCHS)
def test_all_params_predictable(name):
    m = _small(name)
    g = trace_torch_model(m)
    plan = build_plan(GraphBatch.from_graphs([g]), [torch_param_table(m)], CFG,
                      sanity_check=True)
    stats = plan_stats(plan)
    total = sum(p.numel() for p in m.parameters())
    assert stats['n_params_pred'] == total, (name, stats, total)


@pytest.mark.skipif(not reference_available(), reason='reference repo not mounted')
@pytest.mark.parametrize('name', ['mobilenet_v2', 'squeezenet1_1', 'densenet121',
                                  'efficientnet_b0ish', 'vgg16_bn', 'inception_v3ish']
                                 + NEW_FAMILIES)
def test_zoo_graph_matches_reference(name):
    enable_reference_import()
    from ghn3.graph import Graph
    torch.manual_seed(0)
    m = _small(name)
    ref = Graph(copy.deepcopy(m))
    ours = trace_torch_model(m)
    assert ours.n_nodes == ref.n_nodes, name
    np.testing.assert_array_equal(ours.node_op, ref.node_feat.numpy().reshape(-1))
    np.testing.assert_array_equal(ours.adj, ref._Adj.numpy())


@pytest.mark.skipif(not reference_available(), reason='reference repo not mounted')
def test_convnext_partial_coverage_matches_reference():
    """ConvNeXt layer_scale tensors are bare parameters neither implementation
    predicts; everything else is covered, and graphs match."""
    enable_reference_import()
    from ghn3.graph import Graph
    from ghn3_tpu.zoo.torch_zoo import convnext_tiny_ish
    torch.manual_seed(0)
    m = convnext_tiny_ish(num_classes=10, dims=(16, 32, 64, 128), depths=(1, 1, 2, 1))
    m.expected_input_sz = 64
    ref = Graph(copy.deepcopy(m))
    ours = trace_torch_model(m)
    np.testing.assert_array_equal(ours.adj, ref._Adj.numpy())
    np.testing.assert_array_equal(ours.node_op, ref.node_feat.numpy().reshape(-1))

    plan = build_plan(GraphBatch.from_graphs([ours]), [torch_param_table(m)], CFG)
    stats = plan_stats(plan)
    total = sum(p.numel() for p in m.parameters())
    ls = sum(p.numel() for n, p in m.named_parameters() if 'layer_scale' in n)
    assert stats['n_params_pred'] == total - ls
