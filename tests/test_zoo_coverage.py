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

NEW_KWARGS = {'alexnet': dict(w=0.25), 'vgg11': dict(w=0.25),
              'googlenet': dict(w=0.25), 'mnasnet1_0': dict(w=0.25),
              'shufflenet_v2_x1_0': dict(w=0.25), 'regnet_y_400mf': dict(w=0.25),
              'regnet_x_400mf': dict(w=0.25),
              'efficientnet_v2_s_ish': dict(w=0.25),
              'mobilenet_v3_small': dict(w=0.5), 'resnext50_32x4d': {},
              'inception_v3': dict(w=0.25), 'mobilenet_v3_large': dict(w=0.5),
              'squeezenet1_0': {}, 'efficientnet_b0': dict(w=0.5),
              'efficientnet_v2_m': dict(w=0.25)}
NEW_FAMILIES = sorted(NEW_KWARGS)


def _small_swin():
    m = TORCH_ZOO['swin_t'](num_classes=10, embed_dim=16, depths=(2, 2),
                            heads=(2, 2), window=4, input_sz=64)
    m.train()
    return m

ARCHS = ['mobilenet_v2', 'squeezenet1_1', 'densenet121', 'efficientnet_b0ish',
         'vgg16_bn', 'resnet50', 'vit_b_16', 'inception_v3ish'] + NEW_FAMILIES


def _small(name):
    kwargs = {'num_classes': 10}
    if name == 'vit_b_16':
        kwargs.update(dim=32, depth=2, heads=2, patch=8, img_size=32)
    if name == 'inception_v3ish':
        kwargs.update(c=8)
    if name in NEW_KWARGS:
        kwargs.update(NEW_KWARGS[name])
    m = TORCH_ZOO[name](**kwargs)
    if name == 'vit_b_16':
        pass                                 # img_size=32 set the right input
    elif not name.startswith('inception'):   # inception keeps its 299px default
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
    if name == 'vit_b_16':
        # the bare class_token is traced-but-never-predicted, matching the
        # reference (its node is filtered, graph.py:658-683; named_layered_modules
        # never lists it) — it keeps torchvision's zeros init
        total -= m.class_token.numel()
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
def test_swin_t_graph_and_predict_match_reference():
    """Real Swin-T (shifted windows, patch merging, stochastic depth): traced
    graph byte-identical AND predicted parameters equal to the reference's at
    1e-5 — the reference's Swin-specific edge fixes (graph.py:579-598) engage on
    the true structure via the torchvision shim class. The
    relative_position_bias_table tensors are bare parameters neither
    implementation predicts (verified unchanged on both sides)."""
    enable_reference_import()
    from ghn3.graph import Graph
    from ghn3.nn import GHN3 as RefGHN3
    from ghn3_tpu import GHN3
    from ghn3_tpu.checkpoint import params_from_state_dict

    torch.manual_seed(0)
    m = _small_swin()
    ref_g = Graph(copy.deepcopy(m))
    ours_g = trace_torch_model(m)
    assert ours_g.n_nodes == ref_g.n_nodes
    np.testing.assert_array_equal(ours_g.node_op, ref_g.node_feat.numpy().reshape(-1))
    np.testing.assert_array_equal(ours_g.adj, ref_g._Adj.numpy())

    torch.manual_seed(7)
    ref_ghn = RefGHN3(max_shape=CFG.max_shape, num_classes=CFG.num_classes,
                      hid=CFG.hid, heads=CFG.heads, layers=CFG.layers,
                      is_ghn2=False, pretrained=False, ve=True, weight_norm=True,
                      layernorm=True, debug_level=0)
    ref_ghn.eval()
    sd = {k: v.detach().cpu().numpy() for k, v in ref_ghn.state_dict().items()}
    our_ghn = GHN3(CFG, params=params_from_state_dict(sd, CFG))

    torch.manual_seed(0)
    m_ref = _small_swin()
    m_ours = copy.deepcopy(m_ref)
    before = {n: p.detach().clone() for n, p in m_ref.named_parameters()}
    with torch.no_grad():
        ref_ghn(m_ref, keep_grads=False, reduce_graph=False,
                bn_track_running_stats=True)
    our_ghn(m_ours, reduce_graph=False, bn_track_running_stats=True)
    for (k, pr), (_, po) in zip(m_ref.named_parameters(), m_ours.named_parameters()):
        if k.endswith('relative_position_bias_table'):
            assert torch.equal(pr, before[k]), f'{k} must stay at init (reference)'
            assert torch.equal(po, before[k]), f'{k} must stay at init (ours)'
            continue
        np.testing.assert_allclose(po.detach().numpy(), pr.detach().numpy(),
                                   atol=1e-5, rtol=1e-4,
                                   err_msg=f'swin_t: predicted {k} differs')


def test_regnet_generator_matches_published_tables():
    """The quantized generator (configs.regnet_stages) must reproduce the
    published pycls/torchvision stage tables; full-size parameter counts are
    pinned against torchvision's model summaries."""
    from ghn3_tpu.zoo.configs import regnet_config

    tables = {  # widths, depths (group width = generator param clamped to width)
        'regnet_x_400mf': ([32, 64, 160, 400], [1, 2, 7, 12]),
        'regnet_x_3_2gf': ([96, 192, 432, 1008], [2, 6, 15, 2]),
        'regnet_y_400mf': ([48, 104, 208, 440], [1, 3, 6, 6]),
        'regnet_y_8gf': ([224, 448, 896, 2016], [2, 4, 10, 1]),
    }
    for name, (widths, depths) in tables.items():
        got_w, got_d, _, _ = regnet_config(name)
        assert (got_w, got_d) == (widths, depths), name

    counts = {'regnet_x_400mf': 5495976, 'regnet_y_400mf': 4344144,
              'regnet_y_8gf': 39381472}
    for name, want in counts.items():
        m = TORCH_ZOO[name](num_classes=1000)
        assert sum(p.numel() for p in m.parameters()) == want, name


def test_param_counts_match_torchvision():
    """Full-size parameter counts pinned against torchvision's published model
    summaries — one representative per generated/scaled family. This is the
    structural-fidelity guarantee the zero-egress environment permits (graph
    byte-parity vs the reference builder is tested separately)."""
    counts = {
        'efficientnet_b0': 5288548, 'efficientnet_b3': 12233232,
        'efficientnet_b7': 66347960,
        'efficientnet_v2_s': 21458488, 'efficientnet_v2_m': 54139356,
        'efficientnet_v2_l': 118515272,
        'convnext_tiny': 28589128, 'convnext_base': 88591464,
        'swin_t': 28288354, 'swin_s': 49606258, 'swin_b': 87768224,
        'densenet161': 28681000,
        'mobilenet_v3_small': 2542856, 'mobilenet_v3_large': 5483032,
        'squeezenet1_0': 1248424, 'squeezenet1_1': 1235496,
        'mnasnet0_5': 2218512, 'mnasnet0_75': 3170208,
        'mnasnet1_0': 4383312, 'mnasnet1_3': 6282256,
        'resnext101_64x4d': 83455272, 'shufflenet_v2_x1_5': 3503624,
        'vgg11_bn': 132868840, 'vgg16_bn': 138365992, 'vgg16': 138357544,
        'googlenet': 13004888,      # fresh torchvision construction w/ both aux
        'inception_v3': 27161264,   # with AuxLogits
        'resnet50': 25557032, 'densenet121': 7978856, 'mobilenet_v2': 3504872,
        'alexnet': 61100840,
        # torchvision-exact ViTs: bare class_token + qkv bias + pos_embedding
        # with class-token row (reference eval split rows, eval_ghn.py:73-91)
        'vit_b_16': 86567656, 'vit_b_32': 88224232,
        'vit_l_16': 304326632, 'vit_l_32': 306535400,
    }
    for name, want in counts.items():
        m = TORCH_ZOO[name](num_classes=1000)
        got = sum(p.numel() for p in m.parameters())
        assert got == want, (name, got, want)


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


def test_sweep_covers_all_74_metadata_archs():
    """Every architecture in the md5-pinned results table (the reference's
    --split torch sweep, eval_ghn.py:73-91) must exist in BOTH zoos so the
    framework can predict AND evaluate the full split."""
    from ghn3_tpu.metadata import get_metadata
    from ghn3_tpu.zoo.jax_zoo import JAX_ZOO
    norms = get_metadata('ghn3xlm16.pt', attr='paramnorm')
    assert len(norms) == 74
    missing_torch = sorted(set(norms) - set(TORCH_ZOO))
    missing_jax = sorted(set(norms) - set(JAX_ZOO))
    assert not missing_torch, missing_torch
    assert not missing_jax, missing_jax


@pytest.mark.slow
@pytest.mark.parametrize('name', ['efficientnet_b0', 'regnet_x_800mf',
                                  'inception_v3', 'mobilenet_v3_large'])
def test_full_size_plan_covers_everything(name):
    """Full-size (num_classes=1000) plan coverage for new-family entries: the
    GHN predicts every parameter at the real scale, not just the test scale."""
    m = TORCH_ZOO[name](num_classes=1000)
    m.train()
    g = trace_torch_model(m)
    cfg = GHNConfig(hid=16, heads=2, layers=1, max_shape=(16, 16, 11, 11),
                    num_classes=1000)
    plan = build_plan(GraphBatch.from_graphs([g]), [torch_param_table(m)], cfg,
                      sanity_check=True)
    total = sum(p.numel() for p in m.parameters())
    assert plan_stats(plan)['n_params_pred'] == total
