"""GHN-2 (GatedGNN, experimental): construction, prediction, determinism."""
import numpy as np
import jax.numpy as jnp

from ghn3_tpu import GHN3, GHNConfig
from ghn3_tpu.checkpoint import infer_config, state_dict_from_params
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


def test_ghn2_forward_uses_sequential_levels():
    """Deeper nodes must be influenced by earlier-updated shallow nodes (the
    sequential GRU sweep), i.e. output differs from a pure parallel update."""
    from ghn3_tpu.models.gatedgnn import topo_levels
    net = ConvNet(channels=(8, 8, 8))
    g = net.graph_def()
    levels = topo_levels(g.adj, g.n_nodes)
    assert levels.max() >= 3  # chain graph has increasing levels
    assert (np.diff(levels[levels >= 0]) >= 0).any()
